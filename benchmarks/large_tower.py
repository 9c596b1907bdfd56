"""The reference's HEADLINE backbone, measured on the chip (round-4 #1).

`readme.md:20-23` names hfl/chinese-roberta-wwm-ext-large (24 x 1024,
~325M params) as the default text backbone, but every measured number in
PERF/BENCH through round 3 is roberta-base or smaller. This benchmark
produces the missing rows, base vs large in ONE session (the only honest
comparison on the drifting shared pool — CLAUDE.md):

  python benchmarks/large_tower.py probe    # AOT compile-only: per-point
                                            # XLA memory analysis (safe to
                                            # run before any execution)
  python benchmarks/large_tower.py serve    # predict_emb sweep @ seq 80,
                                            # interleaved base/large
  python benchmarks/large_tower.py train    # train-step points, remat
                                            # on/off (+ 'bf16' for the
                                            # bf16-grads variant)

Outputs one JSON line per measurement. Measurement discipline: init under
jit, params passed as arguments (never closure-captured), a device->host
readback as the only timing barrier, warmup of the SAME call first, pool
probes bracketing the session (serving_roofline.pool_probe/bw_probe).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.serving_roofline import bw_probe, pool_probe  # noqa: E402

HBM_BPS = 819e9
PEAK_BF16 = 197e12
CLASSES = 10205            # nlp_classifier_train_daodian_v2.py:80
SERVE_SEQ = 80             # goodssku_emb_bert_di.py:56 tokenize max_len
SERVE_BATCHES = [64, 128, 256, 512]
# params: base 102M tower, large 325M tower (embeddings included)
TOWER_PARAMS = {"base": 102e6, "large": 325e6}


def _bert_cfg(preset, remat=False, **remat_kw):
    from multimodalsimilar_tpu.models.bert import BertConfig
    make = {"base": BertConfig.roberta_wwm_ext,
            "large": BertConfig.roberta_wwm_ext_large}[preset]
    return make(remat=remat, **remat_kw)


# The remat LADDER (round-5 #1): named memory/recompute points between
# no-remat (cannot compile the flagship b256 s128 on one 16 GB chip) and
# full per-layer remat (~20% step-time cost at the large tower).
LADDER = {
    "none":  dict(remat=False),
    "skip3": dict(remat=True, remat_skip=3),   # 2/3 of layers remat
    "skip2": dict(remat=True, remat_skip=2),   # 1/2 of layers remat
    "dots":  dict(remat=True, remat_policy="dots"),
    "full":  dict(remat=True),
}


def _serve_fn(preset):
    """(jitted_fn, variables, cfg) for the margin-free predict_emb path in
    the measured serving config (DTypePolicy.inference)."""
    import jax
    import jax.numpy as jnp
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    cfg = _bert_cfg(preset)
    model = NlpTextClassifier(cfg, num_labels=CLASSES,
                              policy=DTypePolicy.inference())

    def init(ids):
        return model.init({"params": jax.random.key(0)}, ids,
                          label=jnp.zeros(ids.shape[0], jnp.int32))

    ids0 = jnp.zeros((8, SERVE_SEQ), jnp.int32)
    variables = jax.jit(init)(ids0)

    def predict(vars_, ids, mask):
        return model.apply(vars_, ids, attention_mask=mask,
                           method=model.predict_emb)

    return jax.jit(predict), variables, cfg


def serve_sweep(batches=SERVE_BATCHES, repeats=5):
    import jax
    print(json.dumps({"pool_probe_tflops": pool_probe(),
                      "bw_probe_gbps": bw_probe()}), flush=True)
    rng = np.random.default_rng(0)
    towers = {p: _serve_fn(p) for p in ("base", "large")}
    for b in batches:
        ids = rng.integers(100, 21000, (b, SERVE_SEQ)).astype(np.int32)
        mask = np.ones((b, SERVE_SEQ), np.int32)
        ids_d = jax.device_put(ids)
        mask_d = jax.device_put(mask)
        # interleaved best-of: pool drift swamps single pairs (CLAUDE.md)
        best = {p: float("inf") for p in towers}
        cost_ms = {}
        for p, (fn, vars_, _) in towers.items():
            np.asarray(fn(vars_, ids_d, mask_d))     # compile + warm
            c = fn.lower(vars_, ids_d, mask_d).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            cost_ms[p] = float(ca.get("bytes accessed", 0.0)) / HBM_BPS * 1e3
        for _ in range(repeats):
            for p, (fn, vars_, _) in towers.items():
                t0 = time.perf_counter()
                np.asarray(fn(vars_, ids_d, mask_d))
                best[p] = min(best[p], time.perf_counter() - t0)
        for p in towers:
            dt = best[p]
            print(json.dumps({
                "mode": "serve", "preset": p, "batch": b, "seq": SERVE_SEQ,
                "ms_per_batch": round(dt * 1e3, 1),
                "emb_per_sec": round(b / dt, 1),
                "hbm_roofline_ms": round(cost_ms[p], 1),
                "roofline_share_pct": round(100 * cost_ms[p] / (dt * 1e3),
                                            1),
            }), flush=True)
    print(json.dumps({"pool_probe_tflops_end": pool_probe()}), flush=True)


def _trainer_for(preset, remat, bf16_grads=False, **remat_kw):
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    cfg = _bert_cfg(preset, remat=remat, **remat_kw)
    model = NlpTextClassifier(cfg, num_labels=CLASSES)
    mesh = create_mesh()
    trainer = Trainer(
        text_arcface_task(model),
        dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2, weight_decay=0.01),
        mesh, TrainerConfig(log_every=10**9, bf16_grad_allreduce=bf16_grads))
    return trainer, cfg, mesh


def _batch_for(mesh, cfg, b, s, rng):
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    return shard_batch(mesh, {
        "input_ids": rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32),
        "attention_mask": np.ones((b, s), np.int32),
        "token_type_ids": np.zeros((b, s), np.int32),
        "labels": rng.integers(0, CLASSES, b).astype(np.int32)})


def _lower_train(preset, remat, b, s, bf16_grads=False, **remat_kw):
    """AOT-lower the real Trainer step at abstract shapes (no execution,
    no param materialization — multichip_projection.py's pattern)."""
    import jax
    from multimodalsimilar_tpu.train.trainer import TrainState
    trainer, cfg, mesh = _trainer_for(preset, remat, bf16_grads, **remat_kw)
    task = trainer.task
    sd = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    batch_sds = {
        "input_ids": jax.ShapeDtypeStruct((b, s), np.int32, sharding=sd),
        "attention_mask": jax.ShapeDtypeStruct((b, s), np.int32,
                                               sharding=sd),
        "token_type_ids": jax.ShapeDtypeStruct((b, s), np.int32,
                                               sharding=sd),
        "labels": jax.ShapeDtypeStruct((b,), np.int32, sharding=sd)}
    rng_sd = jax.eval_shape(lambda: jax.random.key(0))
    variables = jax.eval_shape(task.init, rng_sd, batch_sds)
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


def probe(points, preset="large", bf16_grads=False):
    """Compile-only memory probe: XLA's own accounting per candidate
    point. temp+args+outputs vs the ~16 GB v5e HBM (the shared-pool
    worker crashed at an 8.7 GB temp point in round 3 — stay well under)."""
    for point in points:
        b, s = (int(x) for x in point.split(":"))
        for remat in (False, True):
            try:
                c = _lower_train(preset, remat, b, s, bf16_grads).compile()
            except Exception as e:
                # keep probing: one OOM point must not kill the sweep
                print(json.dumps({
                    "mode": "probe", "preset": preset, "batch": b,
                    "seq": s, "remat": remat, "bf16_grads": bf16_grads,
                    "compile_failed": f"{type(e).__name__}",
                    "detail": str(e).split("\n")[0][:200]}), flush=True)
                continue
            m = c.memory_analysis()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            print(json.dumps({
                "mode": "probe", "preset": preset, "batch": b, "seq": s,
                "remat": remat, "bf16_grads": bf16_grads,
                "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
                "args_gb": round(m.argument_size_in_bytes / 2**30, 2),
                "out_gb": round(m.output_size_in_bytes / 2**30, 2),
                "total_gb": round((m.temp_size_in_bytes
                                   + m.argument_size_in_bytes) / 2**30, 2),
                "hlo_tflops_per_step": round(float(ca.get("flops", 0.0))
                                             / 1e12, 2),
            }), flush=True)


def train_sweep(points, preset="large", remat_variants=(False, True),
                bf16_grads=False, iters=6):
    import jax
    print(json.dumps({"pool_probe_tflops": pool_probe()}), flush=True)
    rng = np.random.default_rng(0)
    n_params = TOWER_PARAMS[preset]
    for remat in remat_variants:
        trainer, cfg, mesh = _trainer_for(preset, remat, bf16_grads)
        state = None
        for point in points:
            b, s = (int(x) for x in point.split(":"))
            batch = _batch_for(mesh, cfg, b, s, rng)
            if state is None:
                state = trainer.init_state_from_device_batch(batch)
            key = jax.random.key(0)
            for _ in range(2):                         # compile + warm
                state, m = trainer._train_step(state, batch, key)
            np.asarray(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = trainer._train_step(state, batch, key)
            np.asarray(m["loss"])                      # honest barrier
            dt = (time.perf_counter() - t0) / iters
            tokens = b * s
            hidden = 1024 if preset == "large" else 768
            flops = 6 * n_params * tokens + 6 * b * hidden * CLASSES
            print(json.dumps({
                "mode": "train", "preset": preset, "batch": b, "seq": s,
                "remat": remat, "bf16_grads": bf16_grads,
                "step_ms": round(dt * 1e3, 1),
                "examples_per_sec": round(b / dt, 1),
                "mfu_pct_nominal": round(100 * flops / dt / PEAK_BF16, 1),
            }), flush=True)
        del trainer, state
    print(json.dumps({"pool_probe_tflops_end": pool_probe()}), flush=True)


def ladder(points=("128:128", "256:128"), preset="large", iters=4):
    """The remat LADDER measured end-to-end: per rung, XLA's own memory
    accounting (compile probe) and — where it compiles — the executed
    step time. One session, interleaved-per-point, pool probes at both
    ends (CLAUDE.md discipline)."""
    import jax
    print(json.dumps({"pool_probe_tflops": pool_probe()}), flush=True)
    rng = np.random.default_rng(0)
    n_params = TOWER_PARAMS[preset]
    hidden = 1024 if preset == "large" else 768
    for point in points:
        b, s = (int(x) for x in point.split(":"))
        for rung, kw in LADDER.items():
            row = {"mode": "ladder", "preset": preset, "batch": b,
                   "seq": s, "rung": rung}
            try:
                c = _lower_train(preset, **kw, b=b, s=s).compile()
                m = c.memory_analysis()
                row.update(
                    temp_gb=round(m.temp_size_in_bytes / 2**30, 2),
                    args_gb=round(m.argument_size_in_bytes / 2**30, 2),
                    total_gb=round((m.temp_size_in_bytes
                                    + m.argument_size_in_bytes) / 2**30, 2))
            except Exception as e:
                row.update(compile_failed=type(e).__name__,
                           detail=str(e).split("\n")[0][:160])
                print(json.dumps(row), flush=True)
                continue
            try:
                trainer, cfg, mesh = _trainer_for(preset, **kw)
                batch = _batch_for(mesh, cfg, b, s, rng)
                state = trainer.init_state_from_device_batch(batch)
                key = jax.random.key(0)
                for _ in range(2):                     # compile + warm
                    state, met = trainer._train_step(state, batch, key)
                np.asarray(met["loss"])
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, met = trainer._train_step(state, batch, key)
                np.asarray(met["loss"])                # honest barrier
                dt = (time.perf_counter() - t0) / iters
                flops = 6 * n_params * b * s + 6 * b * hidden * CLASSES
                row.update(step_ms=round(dt * 1e3, 1),
                           examples_per_sec=round(b / dt, 1),
                           mfu_pct_nominal=round(
                               100 * flops / dt / PEAK_BF16, 1))
                del trainer, state, batch
            except Exception as e:
                row.update(run_failed=type(e).__name__,
                           detail=str(e).split("\n")[0][:160])
            print(json.dumps(row), flush=True)
    print(json.dumps({"pool_probe_tflops_end": pool_probe()}), flush=True)


if __name__ == "__main__":
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    args = sys.argv[1:]
    mode = args[0] if args else "probe"
    pts = [a for a in args[1:] if ":" in a]
    bf16 = "bf16" in args
    if mode == "probe":
        probe(pts or ["64:128", "128:128", "256:128", "256:48"],
              bf16_grads=bf16)
    elif mode == "serve":
        serve_sweep()
    elif mode == "train":
        if "rematonly" in args:
            variants = (True,)
        elif "noremat" in args:
            variants = (False,)
        else:
            variants = (False, True)
        train_sweep(pts or ["128:128", "256:128", "256:48"],
                    remat_variants=variants, bf16_grads=bf16)
    elif mode == "ladder":
        ladder(pts or ("128:128", "256:128"))
    else:
        raise SystemExit(f"unknown mode {mode}")
