"""Task-level fused-loss paths == plain paths (value and gradients).

ops/arcface_loss.py has op-level parity tests; these pin the TASK wiring —
in particular that the fused branches read each head's own ArcFaceParams
(margin/scale/easy_margin) rather than hardcoded constants (round-2 fix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import (
    NlpMultilabelClassifier, NlpTextClassifier)
from multimodalsimilar_tpu.ops.arcface import ArcFaceParams
from multimodalsimilar_tpu.train.tasks import (
    multilabel_arcface_task, text_arcface_task)
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()
CFG = BertConfig.tiny()


def _batch(rng, B=8, S=10, extra=()):
    out = {"input_ids": rng.integers(1, CFG.vocab_size,
                                     size=(B, S)).astype(np.int32),
           "attention_mask": np.ones((B, S), np.int32)}
    for name, n_cls in extra:
        out[name] = rng.integers(0, n_cls, size=(B,)).astype(np.int32)
    return out


def _compare(model, make_task, batch, margin):
    plain = make_task(fused=False)
    fused = make_task(fused=True)
    variables = jax.jit(plain.init)(jax.random.key(0), batch)
    params = variables["params"]
    rng = jax.random.key(1)

    def loss_of(task):
        def f(p):
            return task.train_loss(p, {}, batch, rng,
                                   jnp.asarray(margin, jnp.float32))[0]
        return f

    lp, gp = jax.value_and_grad(loss_of(plain))(params)
    lf, gf = jax.value_and_grad(loss_of(fused))(params)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_text_task_fused_matches_plain_custom_scale():
    """Non-default s/margin must flow through the fused path too."""
    rng = np.random.default_rng(0)
    model = NlpTextClassifier(CFG, num_labels=9,
                              arcface=ArcFaceParams(s=30.0, m=0.35),
                              policy=FP32)
    batch = _batch(rng, extra=[("labels", 9)])

    def make(fused):
        return text_arcface_task(model, fused_loss=fused, loss_tile_c=4)

    _compare(model, make, batch, margin=0.35)


def test_multilabel_task_fused_matches_plain_custom_heads():
    """Per-head ArcFaceParams (incl. non-default scales) must be read from
    the model in the fused branch (round-2 de-hardcoding)."""
    rng = np.random.default_rng(1)
    model = NlpMultilabelClassifier(
        CFG, lv1_labels=5, lv2_labels=7, tag_labels=11,
        lv1_arcface=ArcFaceParams(s=30.0, m=0.3),
        lv2_arcface=ArcFaceParams(s=48.0, m=0.15),
        tag_arcface=ArcFaceParams(s=64.0, m=0.05),
        policy=FP32)
    batch = _batch(rng, extra=[("lv1_label", 5), ("lv2_label", 7),
                               ("tag_label", 11)])

    def make(fused):
        return multilabel_arcface_task(model, fused_loss=fused,
                                       loss_tile_c=4)

    _compare(model, make, batch, margin=0.3)
