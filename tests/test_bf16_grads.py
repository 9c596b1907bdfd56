"""bf16 gradient all-reduce (`TrainerConfig.bf16_grad_allreduce`).

Pure DP's per-step ICI cost is one f32 all-reduce of the whole grad tree
(PERF.md "Projected multi-chip scaling": 439 MB at roberta-base scale).
The bf16 path computes grads under shard_map over `data` and psums
bf16-cast grads — these tests pin (a) numerical parity with the pjit
path within bf16 rounding, (b) that the compiled HLO's gradient
all-reduces actually run on bf16 operands at half the bytes, (c) the
CLI wiring and the model_parallel incompatibility guard.
"""

import importlib.util
import os

import jax
import numpy as np
import pytest


def _mcp():
    spec = importlib.util.spec_from_file_location(
        "mcp", os.path.join(os.path.dirname(__file__), "..",
                            "benchmarks", "multichip_projection.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _text_trainer(mesh, bf16_grads, dropout=0.0):
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.train.optim import (
        dual_group_adamw, linear_schedule_with_warmup)
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = NlpTextClassifier(
        BertConfig.tiny(hidden_dropout=dropout, attention_dropout=dropout),
        num_labels=32, policy=DTypePolicy.full_precision())
    tx = dual_group_adamw(linear_schedule_with_warmup(5e-4, 0, 100),
                          linear_schedule_with_warmup(1e-2, 0, 100))
    return Trainer(text_arcface_task(model), tx, mesh,
                   TrainerConfig(log_every=10**9, seed=0,
                                 bf16_grad_allreduce=bf16_grads))


def _batches(n=3, B=16, S=12):
    rng = np.random.default_rng(0)
    return [{
        "input_ids": rng.integers(1, 128, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": rng.integers(0, 32, size=(B,)).astype(np.int32),
    } for _ in range(n)]


def _run(mesh, bf16_grads, batches):
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    trainer = _text_trainer(mesh, bf16_grads)
    state = trainer.init_state(batches[0])
    rng = jax.random.key(1)
    losses = []
    for b in batches:
        state, metrics = trainer._train_step(state, shard_batch(mesh, b),
                                             rng)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_bf16_grads_match_f32_path_within_rounding():
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(data=8, model=1)
    batches = _batches()
    losses_f32, state_f32 = _run(mesh, False, batches)
    losses_b16, state_b16 = _run(mesh, True, batches)
    # step-1 loss is computed from IDENTICAL params (dropout off, same
    # init) — per-shard mean + pmean must equal the pjit global mean
    np.testing.assert_allclose(losses_b16[0], losses_f32[0], rtol=1e-5)
    # later steps diverge only by bf16 grad rounding in the updates
    np.testing.assert_allclose(losses_b16[1:], losses_f32[1:], rtol=2e-2)
    # params stay f32 and close after 3 steps
    leaves = zip(jax.tree_util.tree_leaves(state_f32.params),
                 jax.tree_util.tree_leaves(state_b16.params))
    for a, b in leaves:
        assert b.dtype == a.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=2e-3)


def test_bf16_grads_psum_in_bf16_at_half_the_bytes():
    """The lowered program must reduce EVERY grad leaf over `data` in
    bfloat16 — total all_reduce traffic = half the f32 param-tree bytes.
    Asserted on the lowered StableHLO because the CPU *backend* upcasts
    bf16 collectives back to f32 during its own optimization
    (FloatNormalization: CPUs have no native bf16) — on TPU the optimized
    HLO keeps them bf16."""
    import re
    from multimodalsimilar_tpu.parallel.mesh import create_mesh, shard_batch
    mesh = create_mesh(data=8, model=1)
    batch = _batches(1)[0]
    trainer = _text_trainer(mesh, True)
    state = trainer.init_state(batch)
    db = shard_batch(mesh, batch)
    txt = trainer._train_step.lower(state, db, jax.random.key(1)).as_text()
    reduces = re.findall(
        r'stablehlo\.all_reduce.*?\) -> tensor<([^>]*)>', txt, re.S)
    assert reduces, "no all_reduce in the lowered bf16-grads step"

    def nbytes(t):
        *dims, dtype = t.split("x")
        n = int(np.prod([int(d) for d in dims])) if dims else 1
        return n * {"bf16": 2, "f32": 4}[dtype]

    bf16_bytes = sum(nbytes(t) for t in reduces if t.endswith("bf16"))
    f32_bytes = sum(nbytes(t) for t in reduces if t.endswith("f32"))
    param_bytes = sum(x.size * 4 for x in
                      jax.tree_util.tree_leaves(state.params))
    # every grad leaf reduced once, in bf16, at exactly half its f32 size
    assert bf16_bytes == param_bytes // 2, (bf16_bytes, param_bytes)
    # the only f32 reductions left are scalar metrics/batch-stat means
    assert f32_bytes <= 64, f32_bytes


def test_bf16_grads_rejects_model_parallel():
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    mesh = create_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="model_parallel"):
        Trainer(task=None, optimizer=None, mesh=mesh,
                config=TrainerConfig(bf16_grad_allreduce=True,
                                     model_parallel_heads=True))


def test_bf16_grads_non_divisible_batch_fails_loud():
    """Regression: a batch dim not divisible by the data axis used to fall
    back to P() replication — every shard silently recomputing the FULL
    batch (data_n-fold redundant compute, per-shard dropout draws
    averaged). Must raise instead."""
    from multimodalsimilar_tpu.parallel.mesh import create_mesh, shard_batch
    mesh = create_mesh()
    if mesh.shape["data"] <= 1:
        pytest.skip("needs a >1-device data mesh")
    trainer = _text_trainer(mesh, bf16_grads=True)
    good = _batches(1, B=16)[0]
    state = trainer.init_state(good)
    bad = _batches(1, B=mesh.shape["data"] + 1)[0]
    with pytest.raises(ValueError, match="not divisible"):
        trainer._train_step(state, shard_batch(mesh, bad),
                            jax.random.key(0))


def test_cli_bf16_grads_end_to_end(tmp_path):
    import pandas as pd
    from multimodalsimilar_tpu.cli import main
    rng = np.random.default_rng(0)
    words = ["苹果", "香蕉", "牛奶", "酸奶", "可乐", "汽水"]
    df = pd.DataFrame({
        "spu_name": [" ".join(rng.choice(words, 2)) + f" 商品{i}"
                     for i in range(64)],
        "labels": rng.integers(0, 4, 64)})
    data = tmp_path / "data.csv"
    df.to_csv(data, index=False)
    out = tmp_path / "out"
    main(["train", "nlp", "--data", str(data), "--output", str(out),
          "--bert_preset", "tiny", "--batch_size", "16", "--epochs", "1",
          "--max_length", "12", "--bf16_grads", "--eval_every", "1000000",
          "--save_every", "1000", "--log_every", "2"])
    assert (out / "metrics.jsonl").exists()
