"""Pallas streaming top-k similarity kernel.

The retrieval hot path (retrieval/knn.py) computes Q @ Xᵀ and keeps the
top-k per query. The lax.scan implementation materializes a [B, BLOCK] score
tile in HBM per step; this kernel keeps everything in VMEM:

* grid = (query tiles, corpus blocks); Pallas auto-pipelines the corpus
  blocks HBM->VMEM (double-buffered DMA) while the MXU computes the current
  tile's scores,
* a persistent VMEM scratch holds the running (vals, ids) top-k per query
  tile, merged against each block's scores by iterative max-extraction —
  ties resolve to the lowest corpus index (FAISS convention) via the
  min-index trick (no gather/sort primitives needed),
* outputs are written once, on each query tile's last corpus block.

k is static and small (the reference uses k = 13 / 26 / 100+1); the merge
costs k reductions over [TILE_B, k + BLOCK] — noise next to the matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
_BIG_I32 = 2**31 - 1  # python int: jax-array consts get captured by the kernel


def _merge_extract(vals, ids, k):
    """Top-k of (vals [B, M], ids [B, M]) by k max-extractions.

    Returns ([B, k], [B, k]); ties pick the smallest id.
    """
    out_v = []
    out_i = []
    cur = vals
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)               # [B, 1]
        is_m = cur == m
        sel_id = jnp.min(jnp.where(is_m, ids, _BIG_I32), axis=1,
                         keepdims=True)                        # [B, 1]
        # mask exactly the selected entry (same id could legitimately not
        # repeat: ids are unique positions)
        cur = jnp.where(ids == sel_id, _NEG_INF, cur)
        out_v.append(m)
        out_i.append(sel_id)
    return (jnp.concatenate(out_v, axis=1),
            jnp.concatenate(out_i, axis=1))


def _topk_kernel(q_ref, x_ref, vals_ref, idx_ref, run_v, run_i, *,
                 k: int, block_rows: int, n_true: int, metric: str):
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, _BIG_I32)

    q = q_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [TB, BLOCK]
    if metric == "l2":
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        xn = jnp.sum(x * x, axis=1)
        scores = -(qn - 2.0 * scores + xn[None, :])
    col = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
           + j * block_rows)
    scores = jnp.where(col < n_true, scores, _NEG_INF)

    vals = jnp.concatenate([run_v[:], scores], axis=1)
    ids = jnp.concatenate([run_i[:], col], axis=1)
    new_v, new_i = _merge_extract(vals, ids, k)
    run_v[:] = new_v
    run_i[:] = new_i

    @pl.when(j == n_blocks - 1)
    def _():
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "block_rows", "tile_b",
                                    "interpret", "true_n"))
def pallas_topk(corpus: jnp.ndarray, queries: jnp.ndarray, k: int,
                metric: str = "ip", block_rows: int = 512,
                tile_b: int = 128, interpret: bool = None,
                true_n: int = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k scores/indices with FAISS ordering (see knn_search).

    ``true_n``: number of REAL corpus rows when ``corpus`` arrives already
    zero-padded (the SimilarityEngine caches a block-padded corpus on
    device); pad rows beyond it are masked to -inf so they can never
    displace real neighbors (an ip pad row scores 0.0, beating any
    negative-cosine real neighbor otherwise).

    ``interpret=None`` auto-selects: compiled Mosaic on TPU-like backends
    ('tpu', or this harness's relay platform 'axon' — matching on
    != 'tpu' silently interpreted there), the interpreter everywhere
    else (CPU tests; a GPU backend can't lower Mosaic at all)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, d = corpus.shape
    if true_n is None:
        true_n = n
    elif not 0 < true_n <= n:
        raise ValueError(f"true_n={true_n} out of range for corpus of {n}")
    b = queries.shape[0]
    k = min(k, true_n)

    pad_n = (-n) % block_rows
    if pad_n:
        corpus = jnp.concatenate(
            [corpus, jnp.zeros((pad_n, d), corpus.dtype)], axis=0)
    pad_b = (-b) % tile_b
    if pad_b:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad_b, d), queries.dtype)], axis=0)

    grid = (queries.shape[0] // tile_b, corpus.shape[0] // block_rows)
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, block_rows=block_rows,
                          n_true=true_n, metric=metric),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((queries.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((queries.shape[0], k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, k), jnp.float32),
            pltpu.VMEM((tile_b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * queries.shape[0] * corpus.shape[0] * d,
            bytes_accessed=4 * (queries.shape[0] * d
                                + corpus.shape[0] * d),
            transcendentals=0),
        interpret=interpret,
    )(queries, corpus)
    if metric == "l2":
        vals = -vals
    return vals[:b], idx[:b]
