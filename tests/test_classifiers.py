"""Task-model contracts: shapes, train/eval logit routing, weight sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import (
    NlpMultilabelClassifier, NlpTextClassifier, SiamesePairModel)
from multimodalsimilar_tpu.models.towers import TextTower
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

CFG = BertConfig.tiny()
FP32 = DTypePolicy.full_precision()


def _text_batch(batch=4, seq=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, CFG.vocab_size, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    mask[0, 6:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_mean_pool_matches_manual():
    ids, mask = _text_batch()
    tower = TextTower(CFG, pool="mean", policy=FP32)
    params = tower.init(jax.random.key(0), ids, mask)
    emb = tower.apply(params, ids, mask)
    # manual masked mean over the raw encoder output
    from multimodalsimilar_tpu.models.bert import BertEncoderModel
    enc = BertEncoderModel(CFG, FP32)
    out = enc.apply({"params": params["params"]["encoder"]}, ids, mask)
    h = np.asarray(out["last_hidden_state"], np.float32)
    m = np.asarray(mask, np.float32)[:, :, None]
    want = (h * m).sum(1) / m.sum(1)
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-5, atol=1e-5)


def test_nlp_classifier_routing():
    ids, mask = _text_batch()
    label = jnp.asarray([0, 3, 5, 1], jnp.int32)
    model = NlpTextClassifier(CFG, num_labels=10, policy=FP32)
    params = model.init(jax.random.key(0), ids, mask, label=label)
    train_logits = model.apply(params, ids, mask, label=label)
    eval_logits = model.apply(params, ids, mask, is_test=True)
    assert train_logits.shape == (4, 10) and eval_logits.shape == (4, 10)
    # eval logits are cosines in [-1, 1]; train logits are scaled by s=64
    assert float(jnp.max(jnp.abs(eval_logits))) <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(train_logits) / 64.0,
                               np.asarray(eval_logits), atol=0.45)
    emb = model.apply(params, ids, mask, method=model.predict_emb)
    assert emb.shape == (4, CFG.hidden_size)


def test_multilabel_three_heads():
    ids, mask = _text_batch()
    model = NlpMultilabelClassifier(CFG, lv1_labels=5, lv2_labels=7,
                                    tag_labels=11, policy=FP32)
    labels = dict(lv1_label=jnp.zeros(4, jnp.int32),
                  lv2_label=jnp.ones(4, jnp.int32),
                  tag_label=jnp.full(4, 2, jnp.int32))
    params = model.init(jax.random.key(0), ids, mask, **labels)
    l1, l2, lt = model.apply(params, ids, mask, **labels)
    assert l1.shape == (4, 5) and l2.shape == (4, 7) and lt.shape == (4, 11)
    e1, e2, et = model.apply(params, ids, mask, is_test=True)
    assert float(jnp.max(jnp.abs(jnp.concatenate(
        [e1, e2, et], -1)))) <= 1 + 1e-5


def test_siamese_shared_encoder():
    ids, mask = _text_batch()
    ids2, mask2 = _text_batch(seed=7)
    model = SiamesePairModel(CFG, policy=FP32)
    params = model.init(jax.random.key(0), ids, ids2, mask, None, mask2)
    logits = model.apply(params, ids, ids2, mask, None, mask2)
    assert logits.shape == (4, 2)
    # identical pair -> |u-v| = 0 path; must be symmetric in the towers:
    same = model.apply(params, ids, ids, mask, None, mask)
    # encoder params exist only once (shared tower)
    flat = jax.tree_util.tree_leaves_with_path(params)
    tower_keys = {jax.tree_util.keystr(p) for p, _ in flat if "tower" in
                  jax.tree_util.keystr(p)}
    assert tower_keys and not any("tower_1" in k for k in tower_keys)
    emb = model.apply(params, ids, mask, method=model.predict_emb)
    assert emb.shape == (4, CFG.hidden_size)
