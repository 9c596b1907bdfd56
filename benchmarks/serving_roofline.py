"""Decompose the serving-tower roofline gap: on-chip time vs relay floor.

Round 2 measured the serving towers at 39-46% of their memory roofline
while the train step hits 76% (PERF.md), without separating the harness's
per-program relay dispatch floor (~10-20 ms) from true on-chip time. This
benchmark separates them (judge item #2):

* t_single — the standard measurement: one program execution bounded by a
  device->host readback (pays one dispatch round-trip per batch).
* t_chain(K) — ONE jitted program that runs the tower K times via
  lax.scan with an iteration-dependent input perturbation (defeats
  loop-invariant hoisting), readback-bounded. Per-iteration time
  amortizes the dispatch over K -> ~pure on-chip time.
* dispatch floor = t_single - t_chain/K;
  on-chip roofline share = roofline_ms / (t_chain/K), with roofline from
  the compiled program's own cost model (bytes / 819 GB/s HBM).

Run on the TPU (single chip):  python benchmarks/serving_roofline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HBM_BPS = 819e9
PEAK_BF16 = 197e12
REPEATS = 5
K = 8


def _times(fn, repeats=REPEATS):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts


def pool_probe():
    """Current pool throughput (the shared chip drifts 2-100+ TFLOP/s —
    CLAUDE.md): one bf16 4096^3 matmul, readback-bounded."""
    import jax
    import jax.numpy as jnp
    a = jnp.full((4096, 4096), 0.01, jnp.bfloat16)
    # 32 chained matmuls in ONE program + scalar readback: a single bare
    # matmul would be bounded by the relay dispatch floor (~15 ms vs
    # ~1.4 ms of compute) and a full-result readback by relay bandwidth —
    # either way measuring the harness, not the chip

    def chain(a):
        def body(c, _):
            return (c @ a) * jnp.bfloat16(0.5), None
        out, _ = jax.lax.scan(body, a, None, length=32)
        return out.astype(jnp.float32).sum()

    f = jax.jit(chain)
    np.asarray(f(a))
    ts = _times(lambda: np.asarray(f(a)), 3)
    flops = 32 * 2 * 4096 ** 3
    return round(flops / min(ts) / 1e12, 1)


def bw_probe():
    """Achievable HBM bandwidth on the pool right now: 16 chained
    elementwise passes over a 1 GB f32 array in one program (2 bytes moved
    per element-pass: read + write)."""
    import jax
    import jax.numpy as jnp
    a = jnp.ones((256, 1024, 1024), jnp.float32)

    def chain(a):
        def body(c, _):
            return c * jnp.float32(1.0000001) + jnp.float32(1e-7), None
        out, _ = jax.lax.scan(body, a, None, length=16)
        return out[0, 0, 0]

    f = jax.jit(chain)
    np.asarray(f(a))
    ts = _times(lambda: np.asarray(f(a)), 3)
    return round(2 * a.size * 4 * 16 / min(ts) / 1e9, 1)


def _roofline(compiled):
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bts = float(cost.get("bytes accessed", 0.0))
    return {
        "tflop": round(flops / 1e12, 3),
        "gb": round(bts / 1e9, 2),
        "mem_roofline_ms": round(1e3 * bts / HBM_BPS, 2),
        "compute_roofline_ms": round(1e3 * flops / PEAK_BF16, 2),
    }


def text_tower():
    import jax
    import jax.numpy as jnp
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    B, S = 256, 80
    cfg = BertConfig.roberta_wwm_ext()
    model = NlpTextClassifier(cfg, num_labels=2,
                              policy=DTypePolicy.inference())
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size - 2,
                                   size=(B, S)).astype(np.int32))
    mask = jnp.ones((B, S), jnp.int32)
    variables = jax.jit(lambda i, m: model.init(
        {"params": jax.random.key(0)}, i, m,
        label=jnp.zeros(i.shape[0], jnp.int32)))(ids, mask)

    single = jax.jit(lambda v, i, m: model.apply(
        v, i, m, method=model.predict_emb))

    def chain(v, i, m):
        def body(c, t):
            # iteration-dependent ids: the tower cannot be hoisted out
            e = model.apply(v, (i + t) % (cfg.vocab_size - 1) + 1, m,
                            method=model.predict_emb)
            return c + e.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return out

    chained = jax.jit(chain)
    return ("text_b256_s80", single, chained,
            (variables, ids, mask))


def image_tower():
    import jax
    import jax.numpy as jnp
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.fold_bn import fold_cv_classifier
    from multimodalsimilar_tpu.models.vision import (
        CvImageClassifier, device_normalize)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    B, R = 128, 380
    cfg = EfficientNetConfig.b4()
    model = CvImageClassifier(cfg, num_labels=2, fc_dim=512,
                              policy=DTypePolicy.inference())
    x0 = jnp.zeros((1, R, R, 3))
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(1, jnp.int32)))(x0)
    folded_cfg, variables = fold_cv_classifier(
        jax.device_get(variables), cfg)
    # fold returns HOST numpy arrays — without device_put every call
    # re-uploads 76 MB of params through the relay (~1.7 s/call measured,
    # masquerading as a dispatch floor)
    variables = jax.device_put(variables)
    model = CvImageClassifier(folded_cfg, num_labels=2, fc_dim=512,
                              policy=DTypePolicy.inference())
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 256, size=(B, R, R, 3))
                         .astype(np.uint8))

    single = jax.jit(lambda v, im: model.apply(
        v, device_normalize(im), method=model.predict_emb))

    def chain(v, im):
        def body(c, t):
            e = model.apply(v, device_normalize(im + t.astype(jnp.uint8)),
                            method=model.predict_emb)
            return c + e.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return out

    chained = jax.jit(chain)
    return ("b4_b128_380", single, chained, (variables, images))


def measure(name, single, chained, args):
    import jax
    lowered = single.lower(*args)
    compiled = lowered.compile()
    roof = _roofline(compiled)
    # the AOT-compiled object is callable — executing it avoids a SECOND
    # minutes-scale remote compile of the identical program through the
    # relay (AOT results are not installed in the jit call cache)
    single = compiled
    np.asarray(single(*args))                      # warm single
    np.asarray(chained(*args))                     # warm chain (compile)
    # INTERLEAVED single/chain rounds: the shared pool drifts minute to
    # minute (CLAUDE.md), so a sequential protocol attributes drift to
    # the dispatch floor; best-of over interleaved rounds is robust
    singles, chains = [], []
    for _ in range(REPEATS):
        singles += _times(lambda: np.asarray(single(*args)), 1)
        chains += _times(lambda: np.asarray(chained(*args)), 1)
    t_single = min(singles)
    per_iter = min(chains) / K
    floor = t_single - per_iter
    return {
        "workload": name, **roof,
        "t_single_ms": round(t_single * 1e3, 2),
        "t_single_median_ms": round(float(np.median(singles)) * 1e3, 2),
        "t_chain_per_iter_ms": round(per_iter * 1e3, 2),
        "dispatch_floor_ms": round(floor * 1e3, 2),
        "onchip_pct_of_mem_roofline": round(
            100 * roof["mem_roofline_ms"] / (per_iter * 1e3), 1),
        "single_pct_of_mem_roofline": round(
            100 * roof["mem_roofline_ms"] / (t_single * 1e3), 1),
        "k": K,
    }


def main():
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()   # persistent cache: reruns skip the compiles
    print(json.dumps({"pool_probe_tflops": pool_probe(),
                      "pool_probe_hbm_gbps": bw_probe()}), flush=True)
    for build in (text_tower, image_tower):
        name, single, chained, args = build()
        print(json.dumps(measure(name, single, chained, args)), flush=True)
    print(json.dumps({"pool_probe_tflops_end": pool_probe()}), flush=True)


if __name__ == "__main__":
    main()
