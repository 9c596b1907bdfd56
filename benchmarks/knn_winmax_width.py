"""Sweep the window-max prefilter width (_WINMAX_W) on the production path.

The exact warehouse k-NN is dominated by the per-block window-max top_k
(benchmarks/knn_split.py). _WINMAX_W trades that sort's input size
([Q, block/W]) against candidate width (bk*W columns through the gather
and the stable merge): doubling W halves the sort input but doubles the
merge concat. W=8 shipped on the first measurement; this sweeps W over
{4, 8, 16, 32} at the warehouse shape on the REAL production body
(`_knn_search` with the module constant patched + jit caches cleared, so
every W re-traces — the jit cache does not key on module globals).

Exactness is W-independent (the prefilter keeps every true top-k element
for any W: if x is among a block's top-bk values, fewer than bk windows
have max > x, and tie-windows selected instead contain equal values at
lower indices — exactly FAISS's tie preference; pinned per-W against the
W=8 reference below). Run: python benchmarks/knn_winmax_width.py [n] [q]
[block] [k]

Measured (262k x 32k, k=100, v5e, leading/trailing W=8 brackets stable):
block 8192:  W4 3.98 < W8 4.52/4.72 < W16 7.43 < W32 10.17
block 16384: W8 3.03/3.10 < W4 3.29 < W16 3.97 < W32 6.24
block 32768: W8 2.45/2.55 < W16 2.59 ~ W4 2.62 < W32 3.77
-> production auto-picks W per block (knn._winmax_w): 4 for <= 8192
(the 1M memory-budgeted operating point, ~1.13x), 8 above. Setting
knn._WINMAX_W (as this sweep does) overrides the rule.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=262_144, q=32_768, block=8_192, k=100, d=768):
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # see CLAUDE.md
    import jax.numpy as jnp
    import multimodalsimilar_tpu.retrieval.knn as knn

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    c_dev = jnp.asarray(corpus)
    q_dev = jnp.asarray(corpus[:q])
    true_n = jnp.asarray(n, jnp.int32)

    def timed(fn, iters=3):
        out = fn()
        ref = tuple(np.asarray(o) for o in out)    # compile + warm
        best = np.inf
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0]), np.asarray(out[1])  # readback barrier
            best = min(best, time.perf_counter() - t0)
        return best, ref

    w0 = knn._WINMAX_W
    res = {"n": n, "q": q, "block": block, "k": k}
    ref_idx = None
    try:
        for w in (8, 4, 16, 32, 8):   # leading+trailing 8 brackets drift
            knn._WINMAX_W = w
            jax.clear_caches()        # module-global not in the jit key
            bk = min(k, block)
            eligible = (block % w == 0 and bk <= block // w
                        and bk * w + k < block)
            t, (vals, idx) = timed(lambda: knn._knn_search(
                c_dev, q_dev, true_n, k, "ip", block))
            key = f"w{w}_s" if f"w{w}_s" not in res else f"w{w}_again_s"
            res[key] = round(t, 3)
            res[f"w{w}_winmax"] = eligible
            if ref_idx is None:
                ref_idx = idx
            else:
                res[f"w{w}_index_match_pct"] = round(
                    100.0 * float((ref_idx == idx).mean()), 3)
    finally:
        knn._WINMAX_W = w0
    res["platform"] = jax.devices()[0].platform
    print(json.dumps(res))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
