"""Model-axis (class-sharded ArcFace) correctness on the virtual mesh.

The widest reference head is 10205 classes (nlp_classifier_train_daodian_v2)
— at large class counts the [C, D] ArcFace weight and its [B, C] logits
shard over the `model` axis. These tests pin that the sharded program
computes the SAME loss and gradients as the replicated one (GSPMD inserts
the collectives; math must be invariant).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalsimilar_tpu.ops.arcface import arcface_logits
from multimodalsimilar_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, create_mesh)


def _problem():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
    label = rng.integers(0, 64, size=(16,)).astype(np.int32)
    return x, w, label


def _loss(x, w, label):
    logits = arcface_logits(x, w, label, m=0.4)
    return jnp.mean(jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
        logits, label[:, None], 1)[:, 0])


def test_class_sharded_loss_and_grads_match_replicated():
    mesh = create_mesh(data=4, model=2)
    x, w, label = _problem()

    grad_fn = jax.jit(jax.value_and_grad(_loss, argnums=(0, 1)))

    # replicated run
    loss_r, (gx_r, gw_r) = grad_fn(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(label))

    # sharded run: batch over data, classes over model
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(DATA_AXIS)))
    ws = jax.device_put(jnp.asarray(w),
                        NamedSharding(mesh, P(MODEL_AXIS, None)))
    ls = jax.device_put(jnp.asarray(label),
                        NamedSharding(mesh, P(DATA_AXIS)))
    loss_s, (gx_s, gw_s) = grad_fn(xs, ws, ls)

    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    # collective accumulation order differs from the single-program sum;
    # agreement is up to float32 reduction noise
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)
    # the weight gradient must come back sharded over classes (no silent
    # full replication of the big head)
    assert gw_s.sharding.is_equivalent_to(
        NamedSharding(mesh, P(MODEL_AXIS, None)), ndim=2)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip validation path runs end-to-end here too."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def _multilabel_trainer(mesh, model_parallel_heads, bert_cfg=None, **cfg_kw):
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import (
        NlpMultilabelClassifier)
    from multimodalsimilar_tpu.train.optim import (
        dual_group_adamw, linear_schedule_with_warmup)
    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = NlpMultilabelClassifier(
        bert_cfg or BertConfig.tiny(), lv1_labels=8, lv2_labels=16,
        tag_labels=64, policy=DTypePolicy.full_precision())
    tx = dual_group_adamw(linear_schedule_with_warmup(5e-5, 0, 100),
                          linear_schedule_with_warmup(1e-2, 10, 100))
    return Trainer(multilabel_arcface_task(model), tx, mesh,
                   TrainerConfig(log_every=10**9, seed=0,
                                 model_parallel_heads=model_parallel_heads,
                                 **cfg_kw))


def test_model_parallel_full_train_step_matches_replicated():
    """Trainer-level class sharding (TrainerConfig.model_parallel_heads):
    3 optimizer steps on a (4 data x 2 model) mesh must produce the same
    params and losses as the fully replicated (8 x 1) run, and the head
    weights plus their Adam moments must actually live class-sharded."""
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    B, S = 16, 12
    batches = [{
        "input_ids": rng.integers(1, 128, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": rng.integers(0, 8, size=(B,)).astype(np.int32),
        "lv2_label": rng.integers(0, 16, size=(B,)).astype(np.int32),
        "tag_label": rng.integers(0, 64, size=(B,)).astype(np.int32),
    } for _ in range(3)]

    def run(mesh, mp):
        trainer = _multilabel_trainer(mesh, mp)
        db = shard_batch(mesh, batches[0])
        state = trainer.init_state_from_device_batch(db)
        losses = []
        for b in batches:
            state, metrics = trainer._train_step(
                state, shard_batch(mesh, b), jax.random.key(1))
            losses.append(float(metrics["loss"]))
        return state, losses

    state_r, losses_r = run(create_mesh(data=8, model=1), False)
    mesh_s = create_mesh(data=4, model=2)
    state_s, losses_s = run(mesh_s, True)

    # sharding actually applied: head weight AND its Adam moments
    cs = NamedSharding(mesh_s, P(MODEL_AXIS, None))
    assert state_s.params["tag_head"]["weight"].sharding.is_equivalent_to(
        cs, ndim=2)
    mus = [leaf for path, leaf in
           jax.tree_util.tree_flatten_with_path(state_s.opt_state)[0]
           if any(getattr(k, "key", None) == "tag_head" for k in path)
           and getattr(leaf, "ndim", 0) == 2]
    assert mus, "no tag_head moments found in opt_state"
    assert all(m.sharding.is_equivalent_to(cs, ndim=2) for m in mus)

    np.testing.assert_allclose(losses_s, losses_r, rtol=1e-4)

    # gradient equivalence at the initial point (params identical by seed).
    # Post-Adam params are NOT comparable across reduction orders — where a
    # grad entry is ~0, Adam's m/sqrt(v) amplifies float noise into full
    # lr-sized sign flips — so the invariant pinned here is the math the
    # sharded program computes: loss and grads.
    def grads_of(mesh, mp):
        trainer = _multilabel_trainer(mesh, mp)
        db = shard_batch(mesh, batches[0])
        state = trainer.init_state_from_device_batch(db)

        def loss_fn(params):
            return trainer.task.train_loss(params, state.batch_stats, db,
                                           jax.random.key(1),
                                           state.margin)[0]

        return jax.jit(jax.grad(loss_fn))(state.params)

    g_r = grads_of(create_mesh(data=8, model=1), False)
    g_s = grads_of(mesh_s, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_train_step_hlo_collectives():
    """Compile-level SPMD check: the partitioner must turn our sharding
    annotations into the expected collective structure (the scaling-book
    recipe — annotate, let XLA insert collectives, verify).

    * pure DP (8x1): gradient all-reduces only — params are replicated, so
      no resharding all-gathers belong in the step
    * DP+MP (4x2, class-sharded heads): additional all-gathers where the
      [B, C]-sharded head logits meet the (full-C) softmax/loss
    """
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    B, S = 16, 12
    batch = {
        "input_ids": rng.integers(1, 128, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": rng.integers(0, 8, size=(B,)).astype(np.int32),
        "lv2_label": rng.integers(0, 16, size=(B,)).astype(np.int32),
        "tag_label": rng.integers(0, 64, size=(B,)).astype(np.int32),
    }

    def hlo(mesh, mp):
        tr = _multilabel_trainer(mesh, mp)
        db = shard_batch(mesh, batch)
        state = tr.init_state_from_device_batch(db)
        return tr._train_step.lower(state, db,
                                    jax.random.key(1)).compile().as_text()

    dp = hlo(create_mesh(data=8, model=1), False)
    assert dp.count("all-reduce") > 0          # gradient reductions
    assert dp.count("all-gather") == 0         # nothing needs resharding
    mp = hlo(create_mesh(data=4, model=2), True)
    assert mp.count("all-reduce") > 0
    assert mp.count("all-gather") > 0          # sharded head -> full softmax


def test_state_shardings_matches_place_state():
    """Trainer.state_shardings (the AOT-lowering hook used by
    benchmarks/multichip_projection.py) must return exactly the shardings
    _place_state applies — head weights class-sharded iff divisible,
    everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import MODEL_AXIS, shard_batch
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    mesh = create_mesh(data=4, model=2)
    model = NlpTextClassifier(BertConfig.tiny(), num_labels=8,
                              policy=DTypePolicy.full_precision())
    trainer = Trainer(text_arcface_task(model),
                      dual_group_adamw(lambda s: 1e-3, lambda s: 1e-2),
                      mesh, TrainerConfig(model_parallel_heads=True))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "input_ids": rng.integers(1, 128, size=(8, 12)).astype(np.int32),
        "attention_mask": np.ones((8, 12), np.int32),
        "labels": rng.integers(0, 8, size=(8,)).astype(np.int32)})
    state = trainer.init_state_from_device_batch(batch)
    shardings = trainer.state_shardings(state)
    cs = NamedSharding(mesh, P(MODEL_AXIS, None))
    flat_s = dict(jax.tree_util.tree_flatten_with_path(shardings)[0])
    flat_x = dict(jax.tree_util.tree_flatten_with_path(state)[0])
    assert flat_s.keys() == flat_x.keys()
    for path, want in flat_s.items():
        got = flat_x[path].sharding
        assert got.is_equivalent_to(want, ndim=flat_x[path].ndim), path
    # the head weight really is the class-sharded one
    head_paths = [p for p in flat_s
                  if "head" in jax.tree_util.keystr(p)
                  and flat_x[p].ndim == 2]
    assert head_paths
    for p in head_paths:
        assert flat_s[p].is_equivalent_to(cs, ndim=2), p


def test_padded_head_masking_is_exact():
    """--model_parallel padding (cli._pad_for_model_parallel +
    tasks._mask_pad): a head padded with extra class rows must produce
    EXACTLY the unpadded loss/accuracy, zero grads for pad rows, and
    identical grads everywhere else."""
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    rng = np.random.default_rng(5)
    batch = {
        "input_ids": rng.integers(1, 128, size=(8, 10)).astype(np.int32),
        "attention_mask": np.ones((8, 10), np.int32),
        "labels": rng.integers(0, 7, size=(8,)).astype(np.int32)}
    cfg = BertConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0)
    pol = DTypePolicy.full_precision()

    m7 = NlpTextClassifier(cfg, num_labels=7, policy=pol)
    t7 = text_arcface_task(m7)
    p7 = m7.init({"params": jax.random.key(0)},
                 jnp.asarray(batch["input_ids"]),
                 label=jnp.zeros(8, jnp.int32))["params"]

    m8 = NlpTextClassifier(cfg, num_labels=8, policy=pol)
    t8 = text_arcface_task(m8, num_valid=7)
    p8 = jax.tree_util.tree_map(lambda x: x, p7)
    pad_row = np.full((1, p7["head"]["weight"].shape[1]), 3.7, np.float32)
    p8["head"] = {"weight": jnp.concatenate(
        [p7["head"]["weight"], jnp.asarray(pad_row)])}

    def run(task, params):
        return jax.value_and_grad(task.train_loss, has_aux=True)(
            params, None, batch, jax.random.key(1), 0.4)

    (l7, (met7, _)), g7 = run(t7, p7)
    (l8, (met8, _)), g8 = run(t8, p8)
    np.testing.assert_allclose(float(l7), float(l8), rtol=1e-6)
    np.testing.assert_allclose(float(met7["acc"]), float(met8["acc"]))
    # pad row: zero grad
    np.testing.assert_array_equal(
        np.asarray(g8["head"]["weight"])[7], 0.0)
    # all shared leaves: identical grads (head compared on its 7 rows)
    g8["head"] = {"weight": g8["head"]["weight"][:7]}
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g7, g8)
    # eval metrics identical too
    e7 = t7.eval_metrics(p7, None, batch)
    p8["head"] = {"weight": jnp.concatenate(
        [p7["head"]["weight"], jnp.asarray(pad_row)])}
    e8 = t8.eval_metrics(p8, None, batch)
    np.testing.assert_allclose(float(e7["acc"]), float(e8["acc"]))


def test_cli_model_parallel_pads_indivisible_classes(tmp_path, capsys):
    """cli train nlp --model_parallel 2 with an odd class count used to
    die on the divisibility check; it now pads the head and trains (the
    v2 recipe's C=10205 shares no factor with an 8-chip model axis)."""
    import pandas as pd

    from multimodalsimilar_tpu.cli import main

    df = pd.DataFrame({
        "spu_name": [f"商品 类别{i % 5} 编号{i}" for i in range(64)],
        "labels": [i % 5 for i in range(64)]})       # 5 % 2 != 0
    data = str(tmp_path / "d.csv")
    df.to_csv(data, index=False)
    main(["train", "nlp", "--data", data,
          "--output", str(tmp_path / "out"), "--batch_size", "16",
          "--epochs", "1", "--max_length", "12", "--model_parallel", "2",
          "--eval_every", "1000000", "--save_every", "1000000",
          "--log_every", "1000000"])
    err = capsys.readouterr().err
    assert "padding head 5 -> 6" in err

    # `cli eval` on the padded checkpoint: the data implies 5 classes but
    # the checkpoint head is 6. Only the user knows the TRAINING class
    # count (an inferred one would mask real classes whenever the eval
    # split lacks the top labels, silently inflating accuracy vs the
    # in-loop eval), so the wider-head case requires --num_labels...
    import json as _json

    import pytest
    eval_args = ["eval", "--data", data,
                 "--tokenizer", str(tmp_path / "out" / "vocab.txt"),
                 "--checkpoint", str(tmp_path / "out" / "ckpt"),
                 "--max_length", "12", "--batch_size", "16"]
    with pytest.raises(SystemExit, match="--num_labels"):
        main(eval_args)
    capsys.readouterr()
    # ...and with it, evals at the checkpoint's width masking ONLY the
    # pad classes, like the in-loop eval
    main(eval_args + ["--num_labels", "5"])
    cap = capsys.readouterr()
    assert "masking 1 pad classes" in cap.err
    metrics = _json.loads(cap.out.strip().splitlines()[-1])
    assert 0.0 <= metrics["acc"] <= 1.0 and "loss" in metrics

    # a head NARROWER than the data implies is never valid: labels out
    # of range hit clamped gathers and silently bogus metrics (old code
    # proceeded; now fails fast)
    wide = pd.DataFrame({
        "spu_name": [f"商品 类别{i % 9} 编号{i}" for i in range(32)],
        "labels": [i % 9 for i in range(32)]})       # 9 > head's 6
    wide_csv = str(tmp_path / "wide.csv")
    wide.to_csv(wide_csv, index=False)
    with pytest.raises(SystemExit, match="out of the head's range"):
        main(["eval", "--data", wide_csv,
              "--tokenizer", str(tmp_path / "out" / "vocab.txt"),
              "--checkpoint", str(tmp_path / "out" / "ckpt"),
              "--max_length", "12", "--batch_size", "16"])
    capsys.readouterr()


def _load_mcp():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "mcp", os.path.join(os.path.dirname(__file__), "..",
                            "benchmarks", "multichip_projection.py"))
    mcp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mcp)
    return mcp


def test_hlo_collective_parser():
    """multichip_projection's HLO parser: variadic tuple all-reduce bytes
    and replica-group sizes extracted correctly."""
    mcp = _load_mcp()
    hlo = """
  %all-reduce.1 = (f32[4,8]{1,0}, bf16[16]{0}) all-reduce(f32[4,8] %a, bf16[16] %b), replica_groups={{0,1,2,3},{4,5,6,7}}, to_apply=%add
  %all-gather.2 = f32[32,8]{1,0} all-gather(f32[16,8] %c), replica_groups={{0,4},{1,5},{2,6},{3,7}}, dimensions={0}
"""
    colls = mcp.collect_collectives(hlo)
    assert [c["op"] for c in colls] == ["all-reduce", "all-gather"]
    assert colls[0]["bytes"] == 4 * 8 * 4 + 16 * 2
    assert colls[0]["group_size"] == 4
    assert colls[1]["bytes"] == 32 * 8 * 4
    assert colls[1]["group_size"] == 2


def test_model_parallel_composes_with_grad_accum():
    """--model_parallel + --grad_accum together: the path-wise placement
    rule must also shard MultiSteps' accumulated-grad buffers for the head
    weights (they mirror the params tree), and two micro-steps must leave
    params exactly unchanged until the optimizer fires."""
    import optax

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import (
        NlpMultilabelClassifier)
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    mesh = create_mesh(data=4, model=2)
    model = NlpMultilabelClassifier(
        BertConfig.tiny(), lv1_labels=8, lv2_labels=16, tag_labels=64,
        policy=DTypePolicy.full_precision())
    tx = optax.MultiSteps(
        dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2),
        every_k_schedule=2)
    trainer = Trainer(multilabel_arcface_task(model), tx, mesh,
                      TrainerConfig(log_every=10**9, seed=0,
                                    model_parallel_heads=True))
    rng = np.random.default_rng(0)
    B, S = 16, 12
    batch = {
        "input_ids": rng.integers(1, 128, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": rng.integers(0, 8, size=(B,)).astype(np.int32),
        "lv2_label": rng.integers(0, 16, size=(B,)).astype(np.int32),
        "tag_label": rng.integers(0, 64, size=(B,)).astype(np.int32),
    }
    db = shard_batch(mesh, batch)
    state = trainer.init_state_from_device_batch(db)

    cs = NamedSharding(mesh, P(MODEL_AXIS, None))
    head_leaves = [leaf for path, leaf in
                   jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
                   if any(getattr(k, "key", None) == "tag_head"
                          for k in path) and getattr(leaf, "ndim", 0) == 2]
    # Adam moments AND the MultiSteps acc_grads buffer for the head
    assert len(head_leaves) >= 3, "expected moments + acc_grads for tag_head"
    assert all(m.sharding.is_equivalent_to(cs, ndim=2) for m in head_leaves)

    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, m1 = trainer._train_step(state, db, jax.random.key(1))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.params, before)         # accumulating: params untouched
    state, m2 = trainer._train_step(state, db, jax.random.key(1))
    assert np.isfinite(float(m2["loss"]))
    delta = np.abs(np.asarray(state.params["tag_head"]["weight"])
                   - before["tag_head"]["weight"]).max()
    assert delta > 1e-6               # optimizer fired on the 2nd micro-step


def test_cli_multilabel_model_parallel(tmp_path):
    """`cli train multilabel --model_parallel 2` end-to-end on the 8-device
    CPU mesh (VERDICT round-1 'done' criterion)."""
    import os

    import pandas as pd

    from multimodalsimilar_tpu.cli import main

    n = 32
    rng = np.random.default_rng(0)
    lv1 = rng.integers(0, 2, n)
    df = pd.DataFrame({
        "spu_name": [f"{'甲乙'[l] * 3}商品{i}" for i, l in enumerate(lv1)],
        "lv1_category_id": lv1,
        "lv2_category_id": lv1 * 2 + rng.integers(0, 2, n),
        "tag_new_id": rng.integers(0, 6, n)})
    data = str(tmp_path / "ml.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "multilabel", "--data", data, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "10",
          "--eval_every", "1000000", "--save_every", "2",
          "--model_parallel", "2"])
    assert os.listdir(os.path.join(out, "ckpt"))


def _mp_batch(mesh, lv1=8, lv2=16, tag=64):
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    rng = np.random.default_rng(0)
    B, S = 8, 8
    return shard_batch(mesh, {
        "input_ids": rng.integers(1, 128, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": np.zeros(B, np.int32),
        "lv2_label": np.zeros(B, np.int32),
        "tag_label": np.zeros(B, np.int32)})


def _mp_trainer(mesh, lv1, lv2, tag):
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import (
        NlpMultilabelClassifier)
    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy
    trainer = _multilabel_trainer(mesh, True)
    trainer.task = multilabel_arcface_task(NlpMultilabelClassifier(
        BertConfig.tiny(), lv1_labels=lv1, lv2_labels=lv2, tag_labels=tag,
        policy=DTypePolicy.full_precision()))
    return trainer


def test_model_parallel_rejects_when_nothing_shards():
    """All heads indivisible: replicating everything while shrinking the
    data axis is a pure slowdown — fail loudly with guidance."""
    import pytest

    mesh = create_mesh(data=4, model=2)
    trainer = _mp_trainer(mesh, lv1=7, lv2=9, tag=63)
    with pytest.raises(ValueError, match="cannot shard"):
        trainer.init_state_from_device_batch(_mp_batch(mesh))


def test_model_parallel_heterogeneous_heads_shard_the_divisible_ones():
    """Reference-realistic multilabel (tag wide and divisible, lv1 tiny and
    odd): the wide head must shard, the odd one replicate — not raise."""
    mesh = create_mesh(data=4, model=2)
    trainer = _mp_trainer(mesh, lv1=7, lv2=16, tag=64)
    state = trainer.init_state_from_device_batch(_mp_batch(mesh))
    cs = NamedSharding(mesh, P(MODEL_AXIS, None))
    assert state.params["tag_head"]["weight"].sharding.is_equivalent_to(
        cs, ndim=2)
    assert state.params["lv1_head"]["weight"].sharding.is_equivalent_to(
        NamedSharding(mesh, P()), ndim=2)


def test_sharded_knn_collective_structure():
    """Compile-level pin of the warehouse-retrieval scaling story
    (PERF.md "projected multi-chip", benchmarks/multichip_projection.py
    --retrieval): the ONLY collectives in the sharded kNN program
    (retrieval/knn.py:361 sharded_knn_search) must be the two
    [D, Q, local_k] candidate all-gathers (f32 scores + s32 indices).
    Nothing corpus-sized may cross ICI — a regression that reshards the
    corpus or the [Q, rows] score tiles would invalidate the 0.05%
    ICI-share projection by orders of magnitude."""
    from jax.sharding import NamedSharding

    from multimodalsimilar_tpu.retrieval.knn import _sharded_search_fn

    mcp = _load_mcp()
    mesh = create_mesh()                      # 8 x 1
    n_dev = mesh.shape[DATA_AXIS]
    n, d, q, k = 512, 16, 32, 8               # tiny: structure, not scale
    rows = n // n_dev
    fn = _sharded_search_fn(mesh, k, k, "ip", rows, n_dev, rows, n)
    corpus_sd = jax.ShapeDtypeStruct(
        (n, d), np.float32, sharding=NamedSharding(mesh, P(DATA_AXIS, None)))
    q_sd = jax.ShapeDtypeStruct((q, d), np.float32,
                                sharding=NamedSharding(mesh, P()))
    lim_sd = jax.ShapeDtypeStruct((), np.int32,
                                  sharding=NamedSharding(mesh, P()))
    colls = mcp.collect_collectives(
        fn.lower(corpus_sd, q_sd, lim_sd).compile().as_text())

    assert colls, "expected the candidate all-gathers in the HLO"
    assert {c["op"] for c in colls} == {"all-gather"}, colls
    # candidate tensors only: f32 [D, Q, k] + s32 [D, Q, k] (possibly fused
    # into one variadic all-gather) — and nothing larger
    cand_bytes = n_dev * q * k * 4
    assert sum(c["bytes"] for c in colls) == 2 * cand_bytes, colls
    assert max(c["bytes"] for c in colls) <= 2 * cand_bytes
    assert all(c["group_size"] == n_dev for c in colls)


def test_graft_entry_compiles_and_runs():
    """The driver's other artifact: entry() must build, jit-compile, and
    execute the flagship forward on whatever backend is attached (CPU
    here) — a broken entry() would otherwise only surface in the driver's
    own run."""
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    logits = np.asarray(out)
    assert logits.shape == (4, 796)
    assert np.isfinite(logits).all()


# -- tensor parallelism (parallel/tp.py) --------------------------------


def _ml_batch(rng, B=16, S=12, vocab=128):
    return {
        "input_ids": rng.integers(1, vocab, size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": rng.integers(0, 8, size=(B,)).astype(np.int32),
        "lv2_label": rng.integers(0, 16, size=(B,)).astype(np.int32),
        "tag_label": rng.integers(0, 64, size=(B,)).astype(np.int32),
    }


def test_tensor_parallel_train_step_matches_replicated():
    """Megatron-style tower sharding (TrainerConfig.tensor_parallel),
    composed with class-sharded heads on a (2 data x 4 model) mesh: the
    placements must actually land (QKV column-parallel, MLP-in column,
    embeddings vocab-sharded — params AND Adam moments) and 3 optimizer
    steps must reproduce the fully replicated run's losses and the
    initial-point gradients (GSPMD inserts the collectives; the math is
    invariant)."""
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    batches = [_ml_batch(rng) for _ in range(3)]

    def run(mesh, **kw):
        trainer = _multilabel_trainer(mesh, **kw)
        state = trainer.init_state_from_device_batch(
            shard_batch(mesh, batches[0]))
        losses = []
        for b in batches:
            state, metrics = trainer._train_step(
                state, shard_batch(mesh, b), jax.random.key(1))
            losses.append(float(metrics["loss"]))
        return state, losses

    state_r, losses_r = run(create_mesh(data=8, model=1),
                            model_parallel_heads=False)
    mesh_t = create_mesh(data=2, model=4)
    state_t, losses_t = run(mesh_t, model_parallel_heads=True,
                            tensor_parallel=True)

    enc = state_t.params["tower"]["encoder"]
    expect = {
        ("layer_0", "attention", "query", "kernel"): P(None, MODEL_AXIS,
                                                       None),
        ("layer_0", "attention", "out", "kernel"): P(MODEL_AXIS, None,
                                                     None),
        ("layer_1", "intermediate", "kernel"): P(None, MODEL_AXIS),
        ("layer_1", "intermediate", "bias"): P(MODEL_AXIS),
        ("layer_1", "output", "kernel"): P(MODEL_AXIS, None),
        ("word_embeddings", "embedding"): P(MODEL_AXIS, None),
    }
    for path, spec in expect.items():
        leaf = enc
        for k in path:
            leaf = leaf[k]
        want = NamedSharding(mesh_t, spec)
        assert leaf.sharding.is_equivalent_to(want, ndim=leaf.ndim), path
    # replicated leaves stay replicated
    for path in (("layer_0", "attention", "out", "bias"),
                 ("layer_0", "output", "bias"),
                 ("embeddings_norm", "scale")):
        leaf = enc
        for k in path:
            leaf = leaf[k]
        assert leaf.sharding.is_equivalent_to(
            NamedSharding(mesh_t, P()), ndim=leaf.ndim), path
    # heads still class-sharded (composition)
    assert state_t.params["tag_head"]["weight"].sharding.is_equivalent_to(
        NamedSharding(mesh_t, P(MODEL_AXIS, None)), ndim=2)
    # Adam moments mirror the tower placements
    q_moments = [
        leaf for path, leaf in
        jax.tree_util.tree_flatten_with_path(state_t.opt_state)[0]
        if [str(getattr(k, "key", k)) for k in path][-3:]
        == ["attention", "query", "kernel"]]
    assert q_moments, "no query-kernel moments found in opt_state"
    want_q = NamedSharding(mesh_t, P(None, MODEL_AXIS, None))
    assert all(m.sharding.is_equivalent_to(want_q, ndim=3)
               for m in q_moments)

    np.testing.assert_allclose(losses_t, losses_r, rtol=1e-4)

    # initial-point gradient equivalence (same invariant as the
    # model-parallel test: post-Adam params are not comparable across
    # reduction orders, the computed loss/grads are)
    def grads_of(mesh, **kw):
        trainer = _multilabel_trainer(mesh, **kw)
        db = shard_batch(mesh, batches[0])
        state = trainer.init_state_from_device_batch(db)

        def loss_fn(params):
            return trainer.task.train_loss(params, state.batch_stats, db,
                                           jax.random.key(1),
                                           state.margin)[0]

        return jax.jit(jax.grad(loss_fn))(state.params)

    g_r = grads_of(create_mesh(data=8, model=1), model_parallel_heads=False)
    g_t = grads_of(mesh_t, model_parallel_heads=True, tensor_parallel=True)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tensor_parallel_hlo_collectives():
    """The TP step must carry the Megatron boundary all-reduces on top of
    the head/grad collectives — compile-level proof the tower actually
    computes sharded (if GSPMD had silently all-gathered the weights
    instead, the all-reduce count would not grow)."""
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    batch = _ml_batch(rng)

    def hlo(**kw):
        mesh = create_mesh(data=4, model=2)
        tr = _multilabel_trainer(mesh, **kw)
        db = shard_batch(mesh, batch)
        state = tr.init_state_from_device_batch(db)
        return tr._train_step.lower(state, db,
                                    jax.random.key(1)).compile().as_text()

    heads_only = hlo(model_parallel_heads=True)
    tp = hlo(model_parallel_heads=True, tensor_parallel=True)
    assert tp.count("all-reduce") > heads_only.count("all-reduce")


def test_tensor_parallel_rejects_when_nothing_shards():
    """A model whose heads/intermediate/vocab none divide the axis would
    leave --tensor_parallel a silent no-op; the Trainer must refuse."""
    import pytest

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    cfg = BertConfig.tiny(vocab_size=122, hidden_size=48, num_heads=3,
                          intermediate_size=90)
    mesh = create_mesh(data=2, model=4)
    trainer = _multilabel_trainer(mesh, model_parallel_heads=False,
                                  bert_cfg=cfg, tensor_parallel=True)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, _ml_batch(rng, vocab=122))
    with pytest.raises(ValueError, match="shards nothing"):
        trainer.init_state_from_device_batch(batch)


def test_tensor_parallel_requires_model_axis():
    import pytest

    with pytest.raises(ValueError, match="model axis"):
        _multilabel_trainer(create_mesh(data=8, model=1),
                            model_parallel_heads=False,
                            tensor_parallel=True)


def test_cli_tensor_parallel(tmp_path):
    """cli train nlp --model_parallel 2 --tensor_parallel end-to-end on
    the virtual mesh: trains, checkpoints, and the checkpoint serves a
    similar job (sharded save/restore round-trip)."""
    import pandas as pd

    from multimodalsimilar_tpu.cli import main

    df = pd.DataFrame({
        "spu_name": [f"商品 类别{i % 4} 编号{i}" for i in range(64)],
        "labels": [i % 4 for i in range(64)]})
    data = str(tmp_path / "d.csv")
    df.to_csv(data, index=False)
    out = tmp_path / "out"
    main(["train", "nlp", "--data", data, "--output", str(out),
          "--batch_size", "16", "--epochs", "1", "--max_length", "12",
          "--model_parallel", "2", "--tensor_parallel",
          "--eval_every", "1000000", "--save_every", "1000000",
          "--log_every", "1000000"])
    assert (out / "ckpt").is_dir()


# ------------------------------------------------- sequence parallelism


def _sp_cfg(**kw):
    from multimodalsimilar_tpu.models.bert import BertConfig
    return BertConfig.tiny(**kw)


def test_sequence_parallel_train_step_matches_replicated():
    """Megatron-SP (TrainerConfig.sequence_parallel over TP on a
    2 data x 4 model mesh): 3 optimizer steps must reproduce the fully
    replicated run's losses, and the initial-point grads must match —
    the sequence-sharded LN/dropout/residual regions are a pure layout
    change (GSPMD decomposes the boundary collectives)."""
    from multimodalsimilar_tpu.parallel import sp
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    batches = [_ml_batch(rng) for _ in range(3)]

    def run(mesh, bert_cfg, **kw):
        trainer = _multilabel_trainer(mesh, model_parallel_heads=False,
                                      bert_cfg=bert_cfg, **kw)
        db0 = shard_batch(mesh, batches[0])
        state = trainer.init_state_from_device_batch(db0)

        def loss_fn(params):
            return trainer.task.train_loss(params, state.batch_stats, db0,
                                           jax.random.key(1),
                                           state.margin)[0]

        grads = jax.jit(jax.grad(loss_fn))(state.params)
        losses = []
        for b in batches:
            state, metrics = trainer._train_step(
                state, shard_batch(mesh, b), jax.random.key(1))
            losses.append(float(metrics["loss"]))
        return losses, grads

    losses_r, g_r = run(create_mesh(data=8, model=1), _sp_cfg())
    losses_s, g_s = run(create_mesh(data=2, model=4),
                        _sp_cfg(sequence_parallel=True),
                        tensor_parallel=True, sequence_parallel=True)
    # the Trainer scopes the SP mesh per call — nothing may leak out
    assert sp.applied_count() > 0 and sp._mesh() is None
    np.testing.assert_allclose(losses_s, losses_r, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sequence_parallel_hlo_and_memory():
    """Compile-level proof of what --sequence_parallel buys: vs plain TP
    the train step must (a) DROP boundary all-reduces (the partial-sum
    reductions become gather-style collectives into sequence-sharded
    tensors), (b) introduce all-gathers feeding the column-parallel
    matmuls, and (c) shrink XLA's own per-chip temp-memory accounting —
    the saved residual-stream activations live at [B, S/4, H]. Shapes
    are chosen big enough (H=256, 4 layers, B=32, S=64) that activation
    buffers dominate the temp pool."""
    from multimodalsimilar_tpu.parallel import sp
    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    batch = _ml_batch(rng, B=32, S=64)
    cfg_kw = dict(hidden_size=256, num_heads=8, intermediate_size=1024,
                  num_layers=4)

    def compiled(bert_cfg, **kw):
        mesh = create_mesh(data=2, model=4)
        tr = _multilabel_trainer(mesh, model_parallel_heads=False,
                                 bert_cfg=bert_cfg, **kw)
        db = shard_batch(mesh, batch)
        state = tr.init_state_from_device_batch(db)
        return tr._train_step.lower(state, db,
                                    jax.random.key(1)).compile()

    tp = compiled(_sp_cfg(**cfg_kw), tensor_parallel=True)
    tp_sp = compiled(_sp_cfg(sequence_parallel=True, **cfg_kw),
                     tensor_parallel=True, sequence_parallel=True)
    assert sp._mesh() is None   # lower() must scope, not leak
    hlo_tp, hlo_sp = tp.as_text(), tp_sp.as_text()
    assert hlo_sp.count(" all-reduce") < hlo_tp.count(" all-reduce")
    assert hlo_sp.count(" all-gather") > hlo_tp.count(" all-gather")
    temp_tp = tp.memory_analysis().temp_size_in_bytes
    temp_sp = tp_sp.memory_analysis().temp_size_in_bytes
    assert temp_sp < temp_tp, (temp_sp, temp_tp)


def test_sequence_parallel_requires_tensor_parallel():
    import pytest

    with pytest.raises(ValueError, match="tensor_parallel"):
        _multilabel_trainer(create_mesh(data=2, model=4),
                            model_parallel_heads=False,
                            sequence_parallel=True)


def test_sequence_parallel_detects_model_not_opted_in():
    """TrainerConfig.sequence_parallel with a model config that was NOT
    built with sequence_parallel=True would silently train plain TP (no
    constraint points fire) — the first step must fail loud instead."""
    import pytest

    from multimodalsimilar_tpu.parallel.mesh import shard_batch

    mesh = create_mesh(data=2, model=4)
    trainer = _multilabel_trainer(mesh, model_parallel_heads=False,
                                  bert_cfg=_sp_cfg(),   # flag NOT set
                                  tensor_parallel=True,
                                  sequence_parallel=True)
    rng = np.random.default_rng(0)
    db = shard_batch(mesh, _ml_batch(rng))
    state = trainer.init_state_from_device_batch(db)
    with pytest.raises(ValueError,
                       match="applied no sequence_parallel behavior"):
        trainer._train_step(state, db, jax.random.key(0))


def test_cli_sequence_parallel(tmp_path):
    """cli train nlp --tensor_parallel --sequence_parallel end-to-end on
    the virtual mesh, and the checkpoint restores into a mesh-less eval
    (the restore template's sequence_parallel constraints must be a
    no-op outside the trainer)."""
    import json as _json

    import pandas as pd

    from multimodalsimilar_tpu.cli import main
    from multimodalsimilar_tpu.parallel import sp

    df = pd.DataFrame({
        "spu_name": [f"商品 类别{i % 4} 编号{i}" for i in range(64)],
        "labels": [i % 4 for i in range(64)]})
    data = str(tmp_path / "d.csv")
    df.to_csv(data, index=False)
    out = tmp_path / "out"
    main(["train", "nlp", "--data", data, "--output", str(out),
          "--batch_size", "16", "--epochs", "1", "--max_length", "12",
          "--model_parallel", "2", "--tensor_parallel",
          "--sequence_parallel",
          "--eval_every", "1000000", "--save_every", "1000000",
          "--log_every", "1000000"])
    assert (out / "ckpt").is_dir()
    assert sp._mesh() is None   # nothing leaked out of the run


def test_cli_sequence_parallel_requires_tensor_parallel(tmp_path):
    import pandas as pd
    import pytest

    from multimodalsimilar_tpu.cli import main

    df = pd.DataFrame({"spu_name": ["商品 一", "商品 二"] * 8,
                       "labels": [0, 1] * 8})
    data = str(tmp_path / "d.csv")
    df.to_csv(data, index=False)
    with pytest.raises(ValueError, match="tensor_parallel"):
        main(["train", "nlp", "--data", data,
              "--output", str(tmp_path / "out"), "--batch_size", "16",
              "--epochs", "1", "--max_length", "12",
              "--model_parallel", "2", "--sequence_parallel"])
