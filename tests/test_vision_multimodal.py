"""CvImageClassifier / ImageTower / MultimodalClassifier contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
from multimodalsimilar_tpu.models.vision import CvImageClassifier, ImageTower
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()
ECFG = EfficientNetConfig.tiny()
TCFG = BertConfig.tiny()


def _imgs(batch=2, size=16, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=(batch, size, size, 3)).astype(np.float32))


def test_image_tower_l2_normalized():
    tower = ImageTower(ECFG, policy=FP32)
    x = _imgs()
    variables = tower.init(jax.random.key(0), x)
    emb = tower.apply(variables, x)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_cv_classifier_routing_and_neck():
    model = CvImageClassifier(ECFG, num_labels=7, fc_dim=12, policy=FP32)
    x = _imgs()
    label = jnp.asarray([1, 3], jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x, label=label)
    train_logits, _ = model.apply(
        variables, x, label=label, train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
    eval_logits = model.apply(variables, x, is_test=True)
    assert train_logits.shape == (2, 7) and eval_logits.shape == (2, 7)
    emb = model.apply(variables, x, method=model.predict_emb)
    assert emb.shape == (2, 12)  # fc neck dim


def test_cv_classifier_no_fc_uses_raw_features():
    model = CvImageClassifier(ECFG, num_labels=5, use_fc=False, policy=FP32)
    x = _imgs()
    variables = model.init({"params": jax.random.key(0)}, x,
                           label=jnp.zeros(2, jnp.int32))
    emb = model.apply(variables, x, method=model.predict_emb)
    assert emb.shape == (2, ECFG.num_features)


def test_multimodal_fusion_dim_and_routing():
    model = MultimodalClassifier(TCFG, ECFG, num_labels=9, fc_dim=12,
                                 policy=FP32)
    imgs = _imgs()
    ids = jnp.asarray(np.random.default_rng(1).integers(
        1, TCFG.vocab_size, size=(2, 10)).astype(np.int32))
    label = jnp.asarray([0, 4], jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, imgs, ids,
                           label=label)
    emb = model.apply(variables, imgs, ids, method=model.predict_emb)
    # fused dim = fc_dim + hidden_size, both halves unit-norm
    assert emb.shape == (2, 12 + TCFG.hidden_size)
    img_part = np.asarray(emb)[:, :12]
    txt_part = np.asarray(emb)[:, 12:]
    np.testing.assert_allclose(np.linalg.norm(img_part, axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt_part, axis=-1), 1.0,
                               rtol=1e-5)
    logits = model.apply(variables, imgs, ids, label=label)
    assert logits.shape == (2, 9)
    eval_logits = model.apply(variables, imgs, ids, is_test=True)
    assert float(jnp.max(jnp.abs(eval_logits))) <= 1 + 1e-5
