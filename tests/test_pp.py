"""Pipeline parallelism (parallel/pp.py, models/bert.py pipeline_parallel,
TrainerConfig.pipeline_parallel).

The reference has no pipeline parallelism (SURVEY.md §2.6 — its only
scaling is single-process nn.DataParallel); these tests pin the TPU-native
GPipe path: schedule correctness (outputs and gradients bit-comparable to
the sequential oracle), the stacked-layout converters, the Trainer's
stage-sharded placement (params AND Adam moments), and loss parity of the
productized train step vs the fully replicated run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalsimilar_tpu.parallel import pp
from multimodalsimilar_tpu.parallel.mesh import MODEL_AXIS, create_mesh


def _toy_layer(p, h, c, key):
    del key
    return jnp.tanh(h @ p["w"] + p["b"] + c)


def _toy_problem(L=8, B=8, D=16):
    rng = np.random.default_rng(0)
    stacked = {
        "w": jnp.asarray(rng.normal(size=(L, D, D)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, D)) * 0.2, jnp.float32)
    return stacked, x, c


@pytest.mark.parametrize("data,model,m", [(2, 4, 2), (4, 2, 2), (1, 8, 1)])
def test_gpipe_matches_sequential(data, model, m):
    """The GPipe schedule (stages x microbatches) reproduces the
    sequential scan exactly — including gradients through scan+ppermute."""
    mesh = create_mesh(jax.devices(), data=data, model=model)
    stacked, x, c = _toy_problem()
    key = jax.random.key(1)

    def out_seq(s, x, c, k):
        return pp.sequential_scan(_toy_layer, s, x, c, k)

    def out_pp(s, x, c, k):
        return pp.gpipe(_toy_layer, s, x, c, k, m)

    ref = jax.jit(out_seq)(stacked, x, c, key)
    with pp.active(mesh):
        got = jax.jit(out_pp)(stacked, x, c, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss(fn):
        return lambda s, x: (fn(s, x, c, key) ** 2).mean()

    g_ref = jax.jit(jax.grad(loss(out_seq), argnums=(0, 1)))(stacked, x)
    with pp.active(mesh):
        g_got = jax.jit(jax.grad(loss(out_pp), argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_no_mesh_is_sequential():
    stacked, x, c = _toy_problem()
    key = jax.random.key(0)
    a = pp.gpipe(_toy_layer, stacked, x, c, key, 4)
    b = pp.sequential_scan(_toy_layer, stacked, x, c, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_gpipe_validation():
    mesh = create_mesh(jax.devices(), data=2, model=4)
    stacked, x, c = _toy_problem(L=6)   # 6 % 4 != 0
    with pp.active(mesh), pytest.raises(ValueError, match="not divisible"):
        pp.gpipe(_toy_layer, stacked, x, c, jax.random.key(0), 2)
    stacked, x, c = _toy_problem(L=8, B=8)
    # per-chip batch 8/2=4 not divisible by 3 microbatches: rides the
    # sequential fallback (partial eval batches must not crash)
    with pp.active(mesh):
        out = jax.jit(lambda s, x, c: pp.gpipe(
            _toy_layer, s, x, c, jax.random.key(0), 3))(stacked, x, c)
    ref = pp.sequential_scan(_toy_layer, stacked, x, c, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)
    with pp.active(mesh), pytest.raises(ValueError, match="pp_microbatches"):
        pp.gpipe(_toy_layer, stacked, x, c, jax.random.key(0), 0)
    with pytest.raises(ValueError, match="model axis"):
        with pp.active(create_mesh(jax.devices(), data=8, model=1)):
            pass


def test_pipelined_bert_matches_sequential_encoder():
    """BertConfig.pipeline_parallel: same weights (bridged via
    stack_layer_params) -> same outputs as the per-layer encoder, on both
    the no-mesh fallback and the pipelined path; converters round-trip."""
    from multimodalsimilar_tpu.models.bert import (
        BertConfig, BertEncoderModel, stack_layer_params,
        unstack_layer_params)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    L, B, S = 4, 8, 16
    pol = DTypePolicy.full_precision()
    cfg_s = BertConfig.tiny(num_layers=L)
    cfg_p = BertConfig.tiny(num_layers=L, pipeline_parallel=True,
                            pp_microbatches=2)
    seq = BertEncoderModel(cfg_s, pol)
    pip = BertEncoderModel(cfg_p, pol)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, cfg_s.vocab_size, size=(B, S)),
                      jnp.int32)
    mask = jnp.asarray((rng.random((B, S)) > 0.2), jnp.int32)

    vars_s = jax.jit(seq.init)(jax.random.key(0), ids, mask)
    params_p = stack_layer_params(vars_s["params"], L)
    ref = jax.jit(seq.apply)(vars_s, ids, mask)

    # no-mesh fallback (sequential scan over the stacked tree)
    out0 = jax.jit(pip.apply)({"params": params_p}, ids, mask)
    # pipelined over a 4x2 mesh
    mesh = create_mesh(jax.devices(), data=4, model=2)
    with pp.active(mesh):
        out1 = jax.jit(pip.apply)({"params": params_p}, ids, mask)

    for out in (out0, out1):
        np.testing.assert_allclose(
            np.asarray(out["pooler_output"]),
            np.asarray(ref["pooler_output"]), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["last_hidden_state"]),
            np.asarray(ref["last_hidden_state"]), rtol=1e-5, atol=1e-5)

    # converter round-trip is exact
    back = unstack_layer_params(params_p)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(
                vars_s["params"])[0], key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(back)[0],
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # gradient parity: d mean(pooler^2) / d params, stacked vs per-layer
    def loss_s(p):
        return (seq.apply({"params": p}, ids, mask)["pooler_output"]
                ** 2).mean()

    def loss_p(p):
        return (pip.apply({"params": p}, ids, mask)["pooler_output"]
                ** 2).mean()

    g_s = jax.jit(jax.grad(loss_s))(vars_s["params"])
    with pp.active(mesh):
        g_p = jax.jit(jax.grad(loss_p))(params_p)
    g_s_stacked = stack_layer_params(g_s, L)
    for a, b in zip(jax.tree_util.tree_leaves(g_s_stacked),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def _ml_batch(rng, B=16, S=12, vocab=128):
    return {
        "input_ids": rng.integers(1, vocab, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": rng.integers(0, 8, size=(B,)).astype(np.int32),
        "lv2_label": rng.integers(0, 16, size=(B,)).astype(np.int32),
        "tag_label": rng.integers(0, 64, size=(B,)).astype(np.int32),
    }


def _trainer(mesh, bert_cfg, **cfg_kw):
    from multimodalsimilar_tpu.models.classifiers import (
        NlpMultilabelClassifier)
    from multimodalsimilar_tpu.train.optim import (
        dual_group_adamw, linear_schedule_with_warmup)
    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = NlpMultilabelClassifier(bert_cfg, lv1_labels=8, lv2_labels=16,
                                    tag_labels=64,
                                    policy=DTypePolicy.full_precision())
    tx = dual_group_adamw(linear_schedule_with_warmup(5e-5, 0, 100),
                          linear_schedule_with_warmup(1e-2, 10, 100))
    return Trainer(multilabel_arcface_task(model), tx, mesh,
                   TrainerConfig(log_every=10**9, seed=0, **cfg_kw))


def test_trainer_pipeline_parallel_matches_replicated():
    """Productized path: TrainerConfig.pipeline_parallel on a (4 data x 2
    model) mesh — the stacked layer tree (params AND Adam moments) lands
    stage-sharded, and 3 optimizer steps reproduce the fully replicated
    sequential run's losses (weights bridged via stack_layer_params;
    dropout disabled — the two paths fold dropout keys differently)."""
    from multimodalsimilar_tpu.models.bert import (
        BertConfig, stack_layer_params)
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    from multimodalsimilar_tpu.train.trainer import TrainState

    L = 4
    kw = dict(num_layers=L, hidden_dropout=0.0, attention_dropout=0.0)
    cfg_s = BertConfig.tiny(**kw)
    cfg_p = BertConfig.tiny(pipeline_parallel=True, pp_microbatches=2, **kw)

    rng = np.random.default_rng(0)
    batches = [_ml_batch(rng) for _ in range(3)]

    # replicated sequential baseline
    mesh_r = create_mesh(jax.devices(), data=8, model=1)
    tr_r = _trainer(mesh_r, cfg_s)
    state_r = tr_r.init_state_from_device_batch(
        shard_batch(mesh_r, batches[0]))

    # pipeline-parallel run from the SAME weights
    mesh_p = create_mesh(jax.devices(), data=4, model=2)
    tr_p = _trainer(mesh_p, cfg_p, pipeline_parallel=True)
    host_params = jax.device_get(state_r.params)
    params_p = dict(host_params)
    params_p["tower"] = dict(host_params["tower"])
    params_p["tower"]["encoder"] = stack_layer_params(
        params_p["tower"]["encoder"], L)
    state_p = tr_p._place_state(TrainState(
        step=jnp.zeros((), jnp.int32), params=params_p,
        batch_stats=jax.device_get(state_r.batch_stats),
        opt_state=tr_p.tx.init(params_p),
        margin=jnp.asarray(0.4, jnp.float32)))

    # placement: stacked leaves AND their Adam moments are stage-sharded
    stack = state_p.params["tower"]["encoder"]["pp_layers"]["stack"]
    for leaf in jax.tree_util.tree_leaves(stack):
        want = NamedSharding(mesh_p, P(MODEL_AXIS,
                                       *([None] * (leaf.ndim - 1))))
        assert leaf.sharding.is_equivalent_to(want, ndim=leaf.ndim)
    moments = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(state_p.opt_state)[0]
               if any(str(getattr(k, "key", k)) == "pp_layers"
                      for k in path) and getattr(leaf, "ndim", 0) >= 1]
    assert moments, "no pp_layers moments found in opt_state"
    assert all(
        m.sharding.is_equivalent_to(
            NamedSharding(mesh_p, P(MODEL_AXIS, *([None] * (m.ndim - 1)))),
            ndim=m.ndim) for m in moments)

    losses_r, losses_p = [], []
    for b in batches:
        state_r, met_r = tr_r._train_step(state_r, shard_batch(mesh_r, b),
                                          jax.random.key(1))
        state_p, met_p = tr_p._train_step(state_p, shard_batch(mesh_p, b),
                                          jax.random.key(1))
        losses_r.append(float(met_r["loss"]))
        losses_p.append(float(met_p["loss"]))
    np.testing.assert_allclose(losses_p, losses_r, rtol=1e-4)


def test_trainer_pipeline_parallel_validation():
    from multimodalsimilar_tpu.models.bert import BertConfig

    cfg_p = BertConfig.tiny(pipeline_parallel=True)
    # model axis 1: refuse
    with pytest.raises(ValueError, match="model axis"):
        _trainer(create_mesh(jax.devices(), data=8, model=1),
                 cfg_p, pipeline_parallel=True)
    # incompatible with tensor/sequence parallel
    with pytest.raises(ValueError, match="pick one"):
        _trainer(create_mesh(jax.devices(), data=4, model=2), cfg_p,
                 pipeline_parallel=True, tensor_parallel=True)
    # flag on, model config off: placement fails fast (no stacked tree)
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    mesh = create_mesh(jax.devices(), data=4, model=2)
    tr = _trainer(mesh, BertConfig.tiny(), pipeline_parallel=True)
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="pp_layers"):
        tr.init_state_from_device_batch(shard_batch(mesh, _ml_batch(rng)))


def test_pipelined_bert_dropout_runs():
    """Training mode (dropout on) through the pipelined path: runs, is
    finite, and differs from the deterministic output (dropout applied)."""
    from multimodalsimilar_tpu.models.bert import BertConfig, BertEncoderModel
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    cfg = BertConfig.tiny(num_layers=4, pipeline_parallel=True,
                          pp_microbatches=2, hidden_dropout=0.3)
    model = BertEncoderModel(cfg, DTypePolicy.full_precision())
    B, S = 8, 16
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, S)),
                      jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), ids, mask)
    mesh = create_mesh(jax.devices(), data=4, model=2)
    with pp.active(mesh):
        det = jax.jit(model.apply, static_argnames="deterministic")(
            variables, ids, mask, deterministic=True)
        tra = jax.jit(model.apply, static_argnames="deterministic")(
            variables, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.key(7)})
    p_det = np.asarray(det["pooler_output"])
    p_tra = np.asarray(tra["pooler_output"])
    assert np.all(np.isfinite(p_tra))
    assert not np.allclose(p_det, p_tra)


def test_cli_train_nlp_pipeline_parallel(tmp_path):
    """End-to-end: `cli train nlp --model_parallel 2 --pipeline_parallel 2`
    trains, checkpoints, and logs on the virtual 4x2 mesh (tiny preset:
    2 layers = 2 stages of 1)."""
    import os

    import pandas as pd

    from multimodalsimilar_tpu.cli import main

    n = 64
    df = pd.DataFrame({
        "spu_name": [f"{'甲乙丙丁'[i % 4] * 3}商品{i}" for i in range(n)],
        "labels": [i % 4 for i in range(n)],
        "spu_sn": [f"sku{i}" for i in range(n)],
        "goods_sku": [str(i) for i in range(n)]})
    data = str(tmp_path / "train.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "nlp", "--data", data, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "12",
          "--eval_every", "1000000", "--save_every", "4",
          "--model_parallel", "2", "--pipeline_parallel", "2",
          "--head_lr", "0.01"])
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.listdir(os.path.join(out, "ckpt"))

    # checkpoint consumers auto-detect the stacked (pp_layers) layout —
    # eval and embed run WITHOUT any pipeline flag (single-chip inference
    # of a PP checkpoint rides the sequential-scan fallback)
    ckpt = os.path.join(out, "ckpt")
    vocab = os.path.join(out, "vocab.txt")
    main(["eval", "--data", data, "--tokenizer", vocab,
          "--checkpoint", ckpt, "--max_length", "12", "--batch_size", "16",
          "--num_labels", "4"])
    table = str(tmp_path / "w.parquet")
    main(["embed", "incremental", "--data", data, "--table", table,
          "--tokenizer", vocab, "--checkpoint", ckpt, "--num_labels", "4",
          "--max_length", "12", "--batch_size", "16",
          "--dt", "2026-08-16"])
    import pandas as pd
    assert len(pd.read_parquet(table)) == n


def test_cli_import_checkpoint_pipeline_parallel(tmp_path, capsys):
    """`import-checkpoint --pipeline_parallel` writes the stacked layout:
    reference torch weights warm-start PP training, and the imported
    checkpoint drives eval via the same auto-detection as trained ones."""
    import json
    import os

    import pandas as pd
    import torch
    import torch.nn as nn_t
    from transformers import BertConfig as HFBertConfig, BertModel

    from multimodalsimilar_tpu.cli import main
    from multimodalsimilar_tpu.models.bert import BertConfig

    cfg = BertConfig.tiny()
    hf = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")

    class TorchNlp(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.ptm = BertModel(hf)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(4, cfg.hidden_size))

    torch.manual_seed(0)
    sd_path = str(tmp_path / "ref.pt")
    torch.save(TorchNlp().state_dict(), sd_path)
    ckpt = str(tmp_path / "ckpt")
    main(["import-checkpoint", "--kind", "nlp", "--state_dict", sd_path,
          "--out", ckpt, "--bert_preset", "tiny",
          "--pipeline_parallel", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["imported"] == "nlp"

    # the stacked layout is what landed on disk (metadata detection)
    from multimodalsimilar_tpu.cli import _ckpt_has_pp
    assert _ckpt_has_pp(ckpt)

    # eval consumes it with no pipeline flags (auto-detect + fallback scan)
    n = 32
    df = pd.DataFrame({
        "spu_name": [f"{'甲乙丙丁'[i % 4] * 3}商品{i}" for i in range(n)],
        "labels": [i % 4 for i in range(n)]})
    data = str(tmp_path / "d.csv")
    df.to_csv(data, index=False)
    vocab = str(tmp_path / "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
                          + list("甲乙丙丁商品0123456789")))
    main(["eval", "--data", data, "--tokenizer", vocab,
          "--checkpoint", ckpt, "--max_length", "12", "--batch_size", "16"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "acc" in metrics


def test_pipeline_parallel_eval_partial_batch_falls_back():
    """In-loop eval sees partial batches (drop_remainder=False); shapes
    that can't split over data x microbatches must ride the sequential
    fallback instead of crashing the scoped eval step."""
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    mesh = create_mesh(jax.devices(), data=4, model=2)
    cfg = BertConfig.tiny(num_layers=4, pipeline_parallel=True,
                          pp_microbatches=2, hidden_dropout=0.0,
                          attention_dropout=0.0)
    tr = _trainer(mesh, cfg, pipeline_parallel=True)
    rng = np.random.default_rng(0)
    state = tr.init_state_from_device_batch(
        shard_batch(mesh, _ml_batch(rng, B=16)))
    # full batch: pipelined path
    full = tr._eval_step(state, shard_batch(mesh, _ml_batch(rng, B=16)))
    # partial batches: 12 splits over data(4) but not into 2 microbatches
    # per chip... (12/4=3 % 2 != 0); 10 doesn't even split over data
    for b in (12, 10):
        partial = tr._eval_step(state, shard_batch(mesh, _ml_batch(rng,
                                                                   B=b)))
        assert np.isfinite(float(partial["acc"])), b
    assert np.isfinite(float(full["acc"]))
