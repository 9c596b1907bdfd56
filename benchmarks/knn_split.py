"""Decompose the blockwise k-NN step: matmul vs top_k vs merge, f32 vs bf16.

The 100k x 100k self-search ran ~38x above its pure-bandwidth roofline
(PERF.md retrieval table) — this measures WHERE the time goes, on device,
with the same lax.scan structure as retrieval/knn._scan_topk so the
comparison is apples-to-apples. Result (262k x 32k, k=128, block 16384):
matmul 0.115 s vs per-block lax.top_k 7.3 s vs lexsort merges 3.6 s —
XLA's sort-based top_k was 98% of search time. That finding drove the
window-max prefilter + stable top_k merge now in production ("full" below
measures it; 11.06 s -> 3.35 s at this shape). Variants:

  matmul   — scores only, folded into a running max (no top_k at all)
  topk     — scores + per-block lax.top_k, no cross-block merge
  full     — the production _knn_search
  bf16     — production search with the score matmul fed bf16 inputs
             (f32 accumulation via preferred_element_type) and the
             [Q, block] score matrix kept bf16 through top_k; candidate
             indices are then exact-rescored in f32 at the end
  approxNN — the production path with approx_recall=0.NN (the opt-in
             approx_max_k mode, knn.py) + measured end-to-end set recall

Timing via device->host readback (the only honest barrier through the
relay — CLAUDE.md). Run: python benchmarks/knn_split.py [n] [q] [block]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=262_144, q=65_536, block=16_384, k=128, d=768):
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize pre-reads JAX_PLATFORMS (axon); the env var alone
        # doesn't stick — same guard as retrieval_e2e.py (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from multimodalsimilar_tpu.retrieval.knn import (
        _knn_search, _merge_topk)

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:q]
    c_dev = jnp.asarray(corpus)
    q_dev = jnp.asarray(queries)
    n_blocks = n // block

    def timed(fn, *args, iters=2):
        out = fn(*args)
        jax.tree.map(np.asarray, out)          # compile + warm
        best = np.inf
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree.map(np.asarray, out)      # readback barrier
            best = min(best, time.perf_counter() - t0)
        return best

    # -- matmul only: same scan, scores folded into a running row-max
    @jax.jit
    def matmul_only(c, qq):
        blocks = c.reshape(n_blocks, block, d)

        def body(carry, blk):
            s = jnp.dot(qq, blk.T, preferred_element_type=jnp.float32)
            return jnp.maximum(carry, s.max(-1)), None

        out, _ = jax.lax.scan(body, jnp.full((qq.shape[0],), -np.inf,
                                             jnp.float32), blocks)
        return out

    # -- matmul + per-block top_k, merge replaced by a max-fold (isolates
    # top_k cost from the lexsort merge)
    @jax.jit
    def topk_no_merge(c, qq):
        blocks = c.reshape(n_blocks, block, d)

        def body(carry, blk):
            s = jnp.dot(qq, blk.T, preferred_element_type=jnp.float32)
            bv, bi = jax.lax.top_k(s, k)
            return (jnp.maximum(carry[0], bv), carry[1] + bi.sum()), None

        init = (jnp.full((qq.shape[0], k), -np.inf, jnp.float32),
                jnp.zeros((), jnp.int32))
        out, _ = jax.lax.scan(body, init, blocks)
        return out

    # -- bf16 scores end-to-end + exact f32 rescore of the candidates
    @jax.jit
    def bf16_rescore(c, qq):
        cb = c.astype(jnp.bfloat16)
        qb = qq.astype(jnp.bfloat16)
        blocks = cb.reshape(n_blocks, block, d)
        kk = 2 * k  # candidate margin for bf16 score ties

        def body(carry, inp):
            b, blk = inp
            # bf16 inputs, f32 MXU accumulation (the documented
            # variant), then bf16 candidate scores
            s = jnp.dot(qb, blk.T,
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            bv, bi = jax.lax.top_k(s, kk)
            return _merge_topk(carry[0], carry[1],
                               bv.astype(jnp.float32), bi + b * block,
                               kk), None

        init = (jnp.full((qq.shape[0], kk), -np.inf, jnp.float32),
                jnp.zeros((qq.shape[0], kk), jnp.int32))
        (cv, ci), _ = jax.lax.scan(
            body, init, (jnp.arange(n_blocks), blocks))
        # exact rescore, chunked over queries: a one-shot [Q, kk, d] gather
        # would be ~50 GB at Q=65536
        ch = 2048

        def rescore(inp):
            qi, cii = inp                         # [ch, d], [ch, kk]
            cand = c[cii]                         # [ch, kk, d] f32
            return jnp.einsum("qd,qkd->qk", qi, cand,
                              preferred_element_type=jnp.float32)

        pad = (-qq.shape[0]) % ch          # CLI q need not divide ch
        qq_p = jnp.concatenate(
            [qq, jnp.zeros((pad, d), qq.dtype)]) if pad else qq
        ci_p = jnp.concatenate(
            [ci, jnp.zeros((pad, kk), ci.dtype)]) if pad else ci
        exact = jax.lax.map(
            rescore, (qq_p.reshape(-1, ch, d),
                      ci_p.reshape(-1, ch, kk))
        ).reshape(qq_p.shape[0], kk)[: qq.shape[0]]
        order = jnp.lexsort((ci, -exact), axis=-1)[:, :k]
        return (jnp.take_along_axis(exact, order, -1),
                jnp.take_along_axis(ci, order, -1))

    # -- approx_max_k (TPU PartialReduce custom op) per block, exact at
    # recall_target=1.0, same scan + merge structure as production
    @jax.jit
    def approx_scan(c, qq):
        blocks = c.reshape(n_blocks, block, d)

        def body(carry, inp):
            b, blk = inp
            s = jnp.dot(qq, blk.T, preferred_element_type=jnp.float32)
            bv, bi = jax.lax.approx_max_k(s, k, recall_target=1.0)
            return _merge_topk(carry[0], carry[1], bv, bi + b * block,
                               k), None

        init = (jnp.full((qq.shape[0], k), -np.inf, jnp.float32),
                jnp.zeros((qq.shape[0], k), jnp.int32))
        out, _ = jax.lax.scan(body, init,
                              (jnp.arange(n_blocks), blocks))
        return out

    # -- no scan at all: one [Q, N] pass with approx_max_k over the full
    # row (only viable when [Q, N] fits HBM; shows the scan's overhead)
    @jax.jit
    def approx_flat(c, qq):
        s = jnp.dot(qq, c.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, k, recall_target=1.0)

    # -- production winmax body, but the WINDOW top_k (the larger of the
    # two remaining sorts: [Q, block/8] -> bk+1) runs through
    # lax.approx_max_k (TPU PartialReduce custom op). Selection-exact at
    # recall_target=1.0; window ids are re-sorted ascending after, so the
    # stable-merge tie-break precondition is preserved and indices should
    # match production bitwise (checked below).
    from multimodalsimilar_tpu.retrieval.knn import _stable_merge, _winmax_w
    _WINMAX_W = _winmax_w(block)   # the width production would pick here

    @jax.jit
    def winmax_approx(c, qq):
        # EXACTLY the production winmax body (knn.py _scan_topk, post
        # axis-1-gather restore) with only the window top_k swapped for
        # approx_max_k — an earlier version used the flat last-axis
        # gather production reverted (2.7x slower at this shape) and
        # k+1 windows, conflating three changes in one timing
        blocks = c.reshape(n_blocks, block, d)
        gw = block // _WINMAX_W
        bk = min(k, block)

        def body(carry, inp):
            vals, idx = carry
            b, blk = inp
            s = jnp.dot(qq, blk.T, preferred_element_type=jnp.float32)
            xw = s.reshape(s.shape[0], gw, _WINMAX_W)
            wmax = xw.max(-1)
            _, wi = jax.lax.approx_max_k(wmax, bk, recall_target=1.0)
            wi = jax.lax.sort(wi, dimension=-1)
            cand = jnp.take_along_axis(xw, wi[:, :, None], 1)
            ci = (wi[:, :, None] * _WINMAX_W
                  + jax.lax.iota(jnp.int32, _WINMAX_W)[None, None, :]
                  + b * block)
            return _stable_merge(
                vals, idx, cand.reshape(cand.shape[0], bk * _WINMAX_W),
                ci.reshape(ci.shape[0], bk * _WINMAX_W), k), None

        init = (jnp.full((qq.shape[0], k), -np.inf, jnp.float32),
                jnp.zeros((qq.shape[0], k), jnp.int32))
        out, _ = jax.lax.scan(body, init,
                              (jnp.arange(n_blocks), blocks))
        return out

    # -- production winmax EXTRACTION only: merge replaced by a max-fold.
    # full_s - extract_only_s isolates what the per-block stable-merge
    # top_k costs — the input to deciding whether amortizing merges over
    # M blocks (merge_every_m below) can pay.
    @jax.jit
    def winmax_extract_only(c, qq):
        blocks = c.reshape(n_blocks, block, d)
        gw = block // _WINMAX_W
        bk = min(k, block)

        def body(carry, inp):
            b, blk = inp
            s = jnp.dot(qq, blk.T, preferred_element_type=jnp.float32)
            xw = s.reshape(s.shape[0], gw, _WINMAX_W)
            wmax = xw.max(-1)
            _, wi = jax.lax.top_k(wmax, bk)
            wi = jax.lax.sort(wi, dimension=-1)
            cand = jnp.take_along_axis(xw, wi[:, :, None], 1)
            ci = (wi[:, :, None] * _WINMAX_W
                  + jax.lax.iota(jnp.int32, _WINMAX_W)[None, None, :]
                  + b * block)
            return (jnp.maximum(carry[0],
                                cand.reshape(cand.shape[0], -1)[:, :k]),
                    carry[1] + ci.reshape(ci.shape[0], -1)[:, :k]), None

        init = (jnp.full((qq.shape[0], k), -np.inf, jnp.float32),
                jnp.zeros((qq.shape[0], k), jnp.int32))
        out, _ = jax.lax.scan(body, init,
                              (jnp.arange(n_blocks), blocks))
        return out

    # -- production winmax body, merging every M blocks instead of every
    # block: per-block candidates land in a [Q, M*bk*W] buffer
    # (dynamic_update_slice — bandwidth, not sort), one stable top_k per
    # M blocks. Exactness: the carry keeps (value desc, idx asc); buffer
    # slots fill in ascending block order with within-block ascending
    # window ids, so the concat stays tie-stable and the stable top_k
    # reproduces FAISS tie-break (same precondition as production,
    # knn.py:_stable_merge). Leftover buffered blocks merge once after
    # the scan.
    def make_merge_every_m(M):
        @jax.jit
        def merge_every_m(c, qq):
            blocks = c.reshape(n_blocks, block, d)
            gw = block // _WINMAX_W
            bk = min(k, block)
            cw = bk * _WINMAX_W

            def body(carry, inp):
                vals, idx, buf_v, buf_i = carry
                b, blk = inp
                s = jnp.dot(qq, blk.T,
                            preferred_element_type=jnp.float32)
                xw = s.reshape(s.shape[0], gw, _WINMAX_W)
                wmax = xw.max(-1)
                _, wi = jax.lax.top_k(wmax, bk)
                wi = jax.lax.sort(wi, dimension=-1)
                cand = jnp.take_along_axis(xw, wi[:, :, None], 1)
                ci = (wi[:, :, None] * _WINMAX_W
                      + jax.lax.iota(jnp.int32, _WINMAX_W)[None, None, :]
                      + b * block)
                slot = (b % M) * cw
                buf_v = jax.lax.dynamic_update_slice(
                    buf_v, cand.reshape(-1, cw), (0, slot))
                buf_i = jax.lax.dynamic_update_slice(
                    buf_i, ci.reshape(-1, cw), (0, slot))

                def do_merge(a):
                    v, i, bv, bi = a
                    nv, ni = _stable_merge(v, i, bv, bi, k)
                    return (nv, ni, jnp.full_like(bv, -jnp.inf),
                            jnp.full_like(bi, n))

                vals, idx, buf_v, buf_i = jax.lax.cond(
                    (b % M) == M - 1, do_merge, lambda a: a,
                    (vals, idx, buf_v, buf_i))
                return (vals, idx, buf_v, buf_i), None

            init = (jnp.full((qq.shape[0], k), -np.inf, jnp.float32),
                    jnp.zeros((qq.shape[0], k), jnp.int32),
                    jnp.full((qq.shape[0], M * cw), -jnp.inf,
                             jnp.float32),
                    jnp.full((qq.shape[0], M * cw), n, jnp.int32))
            (vals, idx, buf_v, buf_i), _ = jax.lax.scan(
                body, init, (jnp.arange(n_blocks), blocks))
            if n_blocks % M:
                vals, idx = _stable_merge(vals, idx, buf_v, buf_i, k)
            return vals, idx
        return merge_every_m

    res = {"n": n, "q": q, "block": block, "k": k}
    res["matmul_s"] = round(timed(matmul_only, c_dev, q_dev), 3)
    res["topk_s"] = round(timed(topk_no_merge, c_dev, q_dev), 3)
    full = lambda c, qq: _knn_search(c, qq, jnp.asarray(n, jnp.int32),
                                     k, "ip", block)
    res["full_s"] = round(timed(full, c_dev, q_dev), 3)

    # -- production path with approx_recall (knn.py approx_max_k branch):
    # times the opt-in approximate mode and measures its REAL end-to-end
    # recall vs the exact search (per-block recall_target composes across
    # the cross-block merge; the honest number is measured, not the target)
    for r in (0.99, 0.95, 0.9):
        apx = lambda c, qq, _r=r: _knn_search(
            c, qq, jnp.asarray(n, jnp.int32), k, "ip", block,
            approx_recall=_r)
        res[f"approx{int(r * 100)}_s"] = round(timed(apx, c_dev, q_dev), 3)
        if r == 0.95:
            apx_i = np.asarray(apx(c_dev, q_dev)[1])
    res["winmax_approx_s"] = round(timed(winmax_approx, c_dev, q_dev), 3)
    # ONE reference execution reused by every match check below (each
    # full() run is seconds of duplicate work on the contended chip)
    fv, fi = full(c_dev, q_dev)
    fi_ref = np.asarray(fi)
    # measured set recall of the approx_recall=0.95 production path (row
    # subsample: set ops on all Q rows are minutes on this host)
    rows = range(0, q, max(1, q // 512))
    res["approx95_recall_pct"] = round(100.0 * float(np.mean(
        [len(np.intersect1d(fi_ref[i], apx_i[i])) / k for i in rows])), 3)
    wv, wi_ = winmax_approx(c_dev, q_dev)
    res["winmax_approx_index_match_pct"] = round(
        100.0 * float((fi_ref == np.asarray(wi_)).mean()), 3)
    res["approx_scan_s"] = round(timed(approx_scan, c_dev, q_dev), 3)
    if q * n * 4 <= 6e9:
        res["approx_flat_s"] = round(timed(approx_flat, c_dev, q_dev), 3)
    res["bf16_rescore_s"] = round(timed(bf16_rescore, c_dev, q_dev), 3)

    res["winmax_extract_only_s"] = round(
        timed(winmax_extract_only, c_dev, q_dev), 3)
    for M in (2, 4, 8):
        fn = make_merge_every_m(M)
        res[f"merge_every_{M}_s"] = round(timed(fn, c_dev, q_dev), 3)
        if M == 4:
            mv, mi = fn(c_dev, q_dev)
            res["merge_every_4_index_match_pct"] = round(
                100.0 * float((fi_ref == np.asarray(mi)).mean()), 3)

    # exactness of the approx_max_k path vs the production search
    av, ai = approx_scan(c_dev, q_dev)
    res["approx_index_match_pct"] = round(
        100.0 * float((fi_ref == np.asarray(ai)).mean()), 3)

    # exactness of the bf16 path vs the production search
    bv, bi = bf16_rescore(c_dev, q_dev)
    fi_h, bi_h = fi_ref, np.asarray(bi)
    res["bf16_index_match_pct"] = round(
        100.0 * float((fi_h == bi_h).mean()), 3)
    res["bf16_set_match_pct"] = round(100.0 * float(np.mean([
        len(np.intersect1d(fi_h[i], bi_h[i])) / k
        for i in range(0, q, max(1, q // 512))])), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
