"""XLA compiler-option sweep on the B4 serving tower (judge item #2 tail).

Round 3's roofline decomposition left B4+neck at ~79% of the pool's
ACHIEVABLE HBM rate on-chip, attributing the last ~21% to XLA fusion
granularity on the depthwise/SE/BN chains (PERF.md). Pallas re-fusion
measured slower through remote Mosaic, so the remaining lever this
harness can reach is the compiler itself: per-compile XLA TPU options
(`Lowered.compile(compiler_options=...)`).

Protocol: lower the K-chained B4 program ONCE (trace is local), compile
it per option set (remote), then time all configs ROUND-ROBIN with
best-of (the shared pool drifts minute-to-minute — sequential timing
attributes drift to whichever config ran in the bad window), bracketed
by the HBM probe from serving_roofline. Unknown/rejected options are
recorded, not fatal. Run on the TPU:
python benchmarks/b4_flag_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OPTIONS = {
    "baseline": {},
    # scoped vmem caps how much VMEM a fusion may claim; raising it lets
    # the fusion emitter build deeper elementwise chains (v5e has 128 MiB)
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    # the latency-hiding scheduler reorders for async overlap; on a
    # single-chip elementwise-bound program it can inflate live ranges
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
}


def main():
    import jax
    from benchmarks.serving_roofline import K, bw_probe, image_tower

    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    name, single, chained, args = image_tower()
    lowered = chained.lower(*args)

    print(json.dumps({"hbm_probe_gbps_start": bw_probe()}), flush=True)

    compiled = {}
    rejected = {}
    for cfg, opts in OPTIONS.items():
        t0 = time.perf_counter()
        try:
            compiled[cfg] = lowered.compile(compiler_options=opts)
        except Exception as e:  # unknown flag names raise at compile time
            rejected[cfg] = f"{type(e).__name__}: {e}"[:200]
            continue
        print(json.dumps({"compiled": cfg,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    mem = {}
    for cfg, ex in compiled.items():
        try:
            m = ex.memory_analysis()
            mem[cfg] = {"temp_mb": round(m.temp_size_in_bytes / 1e6, 1),
                        "peak_mb": round(
                            (m.temp_size_in_bytes + m.argument_size_in_bytes
                             + m.output_size_in_bytes) / 1e6, 1)}
        except Exception:
            pass

    # warm each once (first execution can pay relay setup)
    for ex in compiled.values():
        np.asarray(ex(*args))

    best = {cfg: np.inf for cfg in compiled}
    for _ in range(4):                       # round-robin, best-of
        for cfg, ex in compiled.items():
            t0 = time.perf_counter()
            np.asarray(ex(*args))
            best[cfg] = min(best[cfg], time.perf_counter() - t0)

    res = {"workload": name, "k_chain": K,
           **{f"{cfg}_per_iter_ms": round(1e3 * t / K, 2)
              for cfg, t in best.items()},
           "memory": mem}
    if rejected:
        res["rejected"] = rejected
    res["hbm_probe_gbps_end"] = bw_probe()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
