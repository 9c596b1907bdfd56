"""Very wide ArcFace heads: where one chip hits the wall (round-4 #7).

PERF.md round 3 hand-waved "plain XLA until C~100k+"; the reference's
largest head is 10,205 classes (nlp_classifier_train_daodian_v2.py:80)
with x10+ headroom plausible in production. This benchmark decides the
question with data:

  probe    — AOT compile-probe the real Trainer step (roberta-base,
             dual AdamW) at C in {10205, 50k, 100k, 250k, 500k, 1M}:
             XLA's own temp/args accounting per point, single chip, until
             compile fails. (TPU relay: compile-only, nothing executes.)
  mp       — same points lowered over the virtual 8-device mesh with
             --model_parallel-style class sharding (run under
             JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8):
             per-chip bytes shrink ~8x on the head/moments — the relief
             placement's measured compile-level fact.
  time     — execute the biggest single-chip-safe C with and without
             --fused_loss (the tiled ArcFace+CE streaming path) and
             report ms/step. (TPU, one process at a time.)

Run:  python benchmarks/wide_head_probe.py probe|mp|time [C ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CLASSES = [10205, 50_000, 100_000, 250_000, 500_000, 1_000_000]
B, S = 128, 48          # the bucketed production operating point


def _trainer(classes, model_parallel=False, fused_loss=False):
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    import jax
    mp = jax.device_count() if model_parallel else 1
    mesh = create_mesh(model=mp)
    cfg = BertConfig.roberta_wwm_ext()
    model = NlpTextClassifier(cfg, num_labels=classes)
    trainer = Trainer(
        text_arcface_task(model, fused_loss=fused_loss),
        dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2,
                         weight_decay=0.01),
        mesh, TrainerConfig(log_every=10**9,
                            model_parallel_heads=model_parallel))
    return trainer, cfg, mesh


def _lower(classes, model_parallel=False, fused_loss=False):
    import jax
    from multimodalsimilar_tpu.train.trainer import TrainState
    trainer, cfg, mesh = _trainer(classes, model_parallel, fused_loss)
    sd = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    batch_sds = {
        "input_ids": jax.ShapeDtypeStruct((B, S), np.int32, sharding=sd),
        "attention_mask": jax.ShapeDtypeStruct((B, S), np.int32,
                                               sharding=sd),
        "token_type_ids": jax.ShapeDtypeStruct((B, S), np.int32,
                                               sharding=sd),
        "labels": jax.ShapeDtypeStruct((B,), np.int32, sharding=sd)}
    rng_sd = jax.eval_shape(lambda: jax.random.key(0))
    variables = jax.eval_shape(trainer.task.init, rng_sd, batch_sds)
    params = variables["params"]
    state = TrainState(
        step=jax.ShapeDtypeStruct((), np.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.eval_shape(trainer.tx.init, params),
        margin=jax.ShapeDtypeStruct((), np.float32))
    shardings = trainer.state_shardings(state)
    state_sds = jax.tree_util.tree_map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        state, shardings)
    rng_in = jax.ShapeDtypeStruct(rng_sd.shape, rng_sd.dtype, sharding=sd)
    return trainer._train_step.lower(state_sds, batch_sds, rng_in)


def probe(classes_list, model_parallel=False, fused_loss=False):
    import jax
    for c in classes_list:
        cc = c
        if model_parallel and c % jax.device_count():
            cc = -(-c // jax.device_count()) * jax.device_count()
        try:
            comp = _lower(cc, model_parallel, fused_loss).compile()
        except Exception as e:
            print(json.dumps({
                "mode": "probe", "classes": cc, "mp": model_parallel,
                "fused_loss": fused_loss,
                "compile_failed": type(e).__name__,
                "detail": str(e).split("\n")[0][:160]}), flush=True)
            continue
        m = comp.memory_analysis()
        print(json.dumps({
            "mode": "probe", "classes": cc, "mp": model_parallel,
            "fused_loss": fused_loss,
            "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
            "args_gb": round(m.argument_size_in_bytes / 2**30, 2),
            "total_gb": round((m.temp_size_in_bytes
                               + m.argument_size_in_bytes) / 2**30, 2),
        }), flush=True)


def time_points(classes_list, fused_variants=(False, True), iters=6):
    import jax
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    rng = np.random.default_rng(0)
    for c in classes_list:
        for fused in fused_variants:
            trainer, cfg, mesh = _trainer(c, fused_loss=fused)
            batch = shard_batch(mesh, {
                "input_ids": rng.integers(0, cfg.vocab_size,
                                          (B, S)).astype(np.int32),
                "attention_mask": np.ones((B, S), np.int32),
                "token_type_ids": np.zeros((B, S), np.int32),
                "labels": rng.integers(0, c, B).astype(np.int32)})
            try:
                state = trainer.init_state_from_device_batch(batch)
                key = jax.random.key(0)
                for _ in range(2):
                    state, m = trainer._train_step(state, batch, key)
                np.asarray(m["loss"])
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, m = trainer._train_step(state, batch, key)
                np.asarray(m["loss"])
                dt = (time.perf_counter() - t0) / iters
            except Exception as e:
                print(json.dumps({
                    "mode": "time", "classes": c, "fused_loss": fused,
                    "failed": type(e).__name__,
                    "detail": str(e).split("\n")[0][:160]}), flush=True)
                continue
            print(json.dumps({
                "mode": "time", "classes": c, "fused_loss": fused,
                "step_ms": round(dt * 1e3, 1),
                "examples_per_sec": round(B / dt, 1)}), flush=True)
            del trainer, state


if __name__ == "__main__":
    args = sys.argv[1:]
    if "cpu" in args:     # virtual-mesh runs (the sitecustomize pre-reads
        import jax        # JAX_PLATFORMS, so the env var alone is too late)
        jax.config.update("jax_platforms", "cpu")
        args = [a for a in args if a != "cpu"]
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    mode = args[0] if args else "probe"
    cs = [int(a) for a in args[1:] if a.isdigit()] or CLASSES
    if mode == "probe":
        probe(cs)
    elif mode == "mp":
        probe(cs, model_parallel=True)
    elif mode == "time":
        time_points(cs)
    else:
        raise SystemExit(f"unknown mode {mode}")
