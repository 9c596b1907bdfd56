"""BN folding: folded EfficientNet / CvImageClassifier match eval-mode BN."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsimilar_tpu.models.efficientnet import (
    EfficientNet, EfficientNetConfig)
from multimodalsimilar_tpu.models.fold_bn import (
    fold_cv_classifier, fold_efficientnet_bn)
from multimodalsimilar_tpu.models.vision import CvImageClassifier
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()
CFG = EfficientNetConfig(
    stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3), (6, 24, 2, 2, 5)),
    stem_channels=8, head_channels=64, drop_path_rate=0.0)


def _randomized_stats(variables, seed=1):
    rng = np.random.default_rng(seed)

    def jiggle(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        a = np.asarray(a)
        if name == "mean":
            return a + rng.normal(0, 0.3, a.shape).astype(np.float32)
        if name == "var":
            return a * rng.uniform(0.5, 2.0, a.shape).astype(np.float32)
        return a

    stats = jax.tree_util.tree_map_with_path(jiggle,
                                             variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


def test_backbone_fold_exact():
    model = EfficientNet(CFG, FP32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    v = _randomized_stats(model.init({"params": jax.random.key(0)}, x))
    ref = np.asarray(model.apply(v, x, method=model.features))
    folded = fold_efficientnet_bn(v["params"], v["batch_stats"], CFG)
    fmodel = EfficientNet(dataclasses.replace(CFG, folded=True), FP32)
    got = np.asarray(fmodel.apply({"params": folded}, x,
                                  method=fmodel.features))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cv_classifier_fold_exact():
    model = CvImageClassifier(CFG, num_labels=5, fc_dim=12, policy=FP32)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    v = _randomized_stats(model.init(
        {"params": jax.random.key(0)}, x, label=jnp.zeros(2, jnp.int32)))
    ref = np.asarray(model.apply(v, x, method=model.predict_emb))
    fcfg, fv = fold_cv_classifier(jax.device_get(v), CFG)
    fmodel = CvImageClassifier(fcfg, num_labels=5, fc_dim=12, policy=FP32)
    got = np.asarray(fmodel.apply(fv, x, method=fmodel.predict_emb))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # eval logits too
    ref_l = np.asarray(model.apply(v, x, is_test=True))
    got_l = np.asarray(fmodel.apply(fv, x, is_test=True))
    np.testing.assert_allclose(got_l, ref_l, rtol=1e-4, atol=1e-5)
