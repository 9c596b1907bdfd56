"""SimilarityEngine: embeddings + metadata -> filtered neighbor maps.

The device side (normalize, exact k-NN) runs as one jitted program — single
chip via the blockwise scan or corpus-sharded over the mesh — and only the
[Q, k] candidate lists come back to the host for the business-rule pass,
mirroring (but batching) the reference's per-job FAISS usage:

  nlp:      normalize_L2 + IndexFlat(d, INNER_PRODUCT), k=13, th=0.9
            (nlp_infer.py:143-163)
  fastText: same index, k<=100, th=-0.6, same-lv1 filter
            (daodian_infer.py:224-246)
  cv:       k=26, th=0.15, same-lv2 filter (daodian_infer.py:294-315)
  fused:    IndexFlatL2(2560) unnormalized, k=13, no threshold
            (multimodal_infer.py:140-159)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from multimodalsimilar_tpu.parallel.mesh import DATA_AXIS
from multimodalsimilar_tpu.retrieval.filters import (
    FilterRules, filter_neighbors, merge_neighbor_maps)
from multimodalsimilar_tpu.retrieval.knn import (
    knn_search, pad_corpus, sharded_knn_search)


def _normalize_rows(q, xp):
    """L2-normalize rows with the engine's epsilon, through either numpy
    or jax.numpy (``xp``). ONE definition on purpose: search(),
    search_device() and fused_search_fn()'s jitted body all normalize
    external queries — inlined copies drifted once and an epsilon or
    dtype fix must hit every path."""
    norms = xp.linalg.norm(q, axis=1, keepdims=True)
    return q / xp.maximum(norms, 1e-12)


class SimilarityEngine:
    def __init__(self, embeddings: np.ndarray, keys: Sequence,
                 categories: Optional[Sequence] = None,
                 dts: Optional[Sequence] = None,
                 metric: str = "ip", normalize: bool = True,
                 mesh=None, backend: str = "xla",
                 approx_recall: Optional[float] = None):
        """``normalize=True`` reproduces faiss.normalize_L2 before indexing
        (cosine similarity); the fused-L2 job passes normalize=False,
        metric='l2'.

        ``backend`` selects the k-NN kernel: 'xla' (default, the blockwise
        lax.scan) or 'pallas' (ops/topk.py streaming-VMEM kernel — exact
        same results, but measured ~5x SLOWER through this harness's
        remote Mosaic path and 5-7 min/compile; opt-in for direct-attach
        TPUs where Mosaic overheads don't apply). 'pallas' is single-chip
        only (no sharded path).

        ``approx_recall`` (0 < r <= 1) opts into APPROXIMATE search via
        the TPU ``approx_max_k`` PartialReduce op (knn_search docstring) —
        the reference's FAISS IndexFlat is exact, so this is a deliberate
        recall/throughput trade the operator must choose. xla backend,
        single-chip only.
        """
        if backend not in ("xla", "pallas"):
            raise ValueError(f"backend must be 'xla' or 'pallas', "
                             f"got {backend!r}")
        if backend == "pallas" and mesh is not None \
                and mesh.shape.get(DATA_AXIS, 1) > 1:
            raise ValueError("backend='pallas' has no corpus-sharded path; "
                             "drop the mesh or use backend='xla'")
        if approx_recall is not None:
            if not (0.0 < approx_recall <= 1.0):
                raise ValueError(f"approx_recall must be in (0, 1], "
                                 f"got {approx_recall!r}")
            if backend != "xla":
                raise ValueError("approx_recall requires backend='xla'")
            if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
                raise ValueError("approx_recall has no corpus-sharded "
                                 "path; drop the mesh")
        self.approx_recall = approx_recall
        self.backend = backend
        emb = np.asarray(embeddings, np.float32)
        self.keys = list(keys)
        self.categories = categories
        self.dts = dts
        self.metric = metric
        self.mesh = mesh
        self.n = emb.shape[0]
        self._normalized = normalize
        if normalize:
            # host numpy, not a device round-trip: through the relay two
            # dispatches + a full-corpus download per engine cost more than
            # the normalize itself (the daodian loop builds one engine per
            # area)
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.maximum(norms, 1e-12)
        self._emb = emb
        self._corpus_dev = None       # cached device corpus (+ true_n)
        self._key_pos = None          # lazy key -> row map for update()
        self._buf = None              # capacity buffer once update() appends

    # -- corpus upsert ------------------------------------------------------

    def update(self, embeddings: np.ndarray, keys: Sequence,
               categories: Optional[Sequence] = None,
               dts: Optional[Sequence] = None) -> Tuple[int, int]:
        """Upsert corpus rows by key; returns (replaced, appended).

        The online analogue of the incremental ``_di`` jobs' skip-existing
        appends (goodssku_emb_bert_di.py:126-129) — new keys append, known
        keys get their row replaced (a re-embed). Embeddings get the same
        normalization the corpus did.

        Device cost is bounded by the DELTA, not the corpus: the cached
        single-chip device corpus is patched in place with one scatter of
        the new rows (appends land in the block-padding tail; when the
        tail is full the device array grows by device-side pad blocks —
        no re-upload of the existing [N, D] corpus through the relay).
        Sharded and pallas backends invalidate the cache instead (their
        layouts re-pad globally); the next search re-uploads.

        Metadata columns must stay aligned: engines built with categories
        (or dts) require them for every update, and engines built without
        reject them — a silently missing category would exempt those rows
        from the same-category rule with no sign anything is wrong.
        """
        emb = np.asarray(embeddings, np.float32)
        keys = [str(k) for k in keys]
        if emb.ndim != 2 or emb.shape[0] != len(keys):
            raise ValueError(f"embeddings {emb.shape} vs {len(keys)} keys")
        if self._emb.ndim == 2 and self._emb.shape[1] != emb.shape[1]:
            raise ValueError(f"dim mismatch: corpus d={self._emb.shape[1]}, "
                             f"update d={emb.shape[1]}")
        for name, have, got in (("categories", self.categories, categories),
                                ("dts", self.dts, dts)):
            if (have is None) != (got is None):
                raise ValueError(
                    f"engine was built {'with' if have is not None else 'without'} "
                    f"{name} — update must {'supply' if have is not None else 'omit'} them")
            if got is not None and len(got) != len(keys):
                raise ValueError(f"{name} length {len(got)} != {len(keys)}")
        if len(keys) != len(set(keys)):
            raise ValueError("duplicate keys within one update batch — "
                             "last-wins would be silent; dedup first")
        if self._normalized:
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.maximum(norms, 1e-12)

        if self._key_pos is None:   # first update: take ownership of the
            # host mirror (init may alias the caller's array when
            # normalize=False) and make metadata mutable
            self._buf = np.array(self._emb, np.float32, copy=True)
            self._emb = self._buf[:self.n]
            self.keys = list(self.keys)
            if self.categories is not None:
                self.categories = list(self.categories)
            if self.dts is not None:
                self.dts = list(self.dts)
            self._key_pos = {k: i for i, k in enumerate(self.keys)}
        rep_rows, rep_src, app_src = [], [], []
        for j, k in enumerate(keys):
            pos = self._key_pos.get(k)
            if pos is None:
                app_src.append(j)
            else:
                rep_rows.append(pos)
                rep_src.append(j)

        # host mirror first (the device cache is derived from it)
        if rep_rows:
            self._emb[np.asarray(rep_rows)] = emb[np.asarray(rep_src)]
            if categories is not None:
                for pos, j in zip(rep_rows, rep_src):
                    self.categories[pos] = categories[j]
            if dts is not None:
                for pos, j in zip(rep_rows, rep_src):
                    self.dts[pos] = dts[j]
        if app_src:
            new = emb[np.asarray(app_src)]
            need = self.n + len(new)
            if need > len(self._buf):   # amortized doubling: frequent small
                # deltas must not pay an O(corpus) copy each (the quadratic
                # append trap ParquetTableSink had)
                cap = max(2 * len(self._buf), need)
                buf = np.empty((cap, emb.shape[1]), np.float32)
                buf[:self.n] = self._emb
                self._buf = buf
            self._buf[self.n:need] = new
            self._emb = self._buf[:need]
            for j in app_src:
                self._key_pos[keys[j]] = len(self.keys)
                self.keys.append(keys[j])
                if categories is not None:
                    self.categories.append(categories[j])
                if dts is not None:
                    self.dts.append(dts[j])
            self.n = need

        self._patch_corpus_dev(rep_rows, emb[np.asarray(rep_src)]
                               if rep_src else None,
                               emb[np.asarray(app_src)]
                               if app_src else None)
        return len(rep_rows), len(app_src)

    def _patch_corpus_dev(self, rep_rows, rep_emb, app_emb):
        """Apply an upsert delta to the cached device corpus in place."""
        if self._corpus_dev is None:
            return
        sharded = self.mesh is not None and self.mesh.shape[DATA_AXIS] > 1
        if sharded or self.backend == "pallas":
            # sharded corpora are padded to the device grid and pallas
            # reads its own block layout — rebuild lazily on next search
            self._corpus_dev = None
            return
        import jax.numpy as jnp
        corpus_dev, true_n, block = self._corpus_dev
        if app_emb is not None:
            new_n = true_n + len(app_emb)
            if new_n > corpus_dev.shape[0]:
                want = new_n + (-new_n % block)   # next block multiple
                fill = jnp.zeros((want - corpus_dev.shape[0],
                                  corpus_dev.shape[1]), corpus_dev.dtype)
                if self.metric == "l2":    # pad rows must never win
                    fill = fill + 1e18
                corpus_dev = jnp.concatenate([corpus_dev, fill], axis=0)
            corpus_dev = jax.lax.dynamic_update_slice(
                corpus_dev, jnp.asarray(app_emb, corpus_dev.dtype),
                (true_n, 0))
            true_n = new_n
        if rep_rows:
            corpus_dev = corpus_dev.at[jnp.asarray(rep_rows)].set(
                jnp.asarray(rep_emb, corpus_dev.dtype))
        self._corpus_dev = (corpus_dev, true_n, block)

    # -- device search ----------------------------------------------------

    # queries are processed in chunks of this many rows: bounds the device
    # [Q_chunk, block] score matrix for arbitrarily large query sets (the
    # bulk export jobs sweep the whole warehouse) without touching results.
    # 32768 (not 65536): 65536-row chunks at block 16384 compile to
    # 8.7 GB on the 1M x 768 corpus and CRASHED the shared-pool TPU worker
    # twice at runtime; 32768-row chunks (~6.8 GB with the winmax body's
    # flat gather) swept the same corpus cleanly. Probe:
    # benchmarks/knn_memory_probe.py.
    QUERY_CHUNK = 32_768

    def search(self, k: int, queries: Optional[np.ndarray] = None):
        """(scores, indices) for queries (default: self-search over the
        corpus, the reference's pattern). FAISS conventions preserved;
        external queries get the same normalization as the corpus."""
        if queries is None:
            q = self._emb
        elif isinstance(queries, jax.Array) and not isinstance(
                queries, np.ndarray):
            # device-resident queries (the serving hot path chains the
            # tower's output straight in): normalize ON DEVICE so the
            # whole request is one dispatch chain with a single readback
            # at the end — np.asarray here would add a sync round-trip
            import jax.numpy as jnp
            q = queries.astype(jnp.float32)
            if self._normalized:
                q = _normalize_rows(q, jnp)
        else:
            q = np.asarray(queries, np.float32)
            if self._normalized:
                q = _normalize_rows(q, np)
        sharded = self.mesh is not None and self.mesh.shape[DATA_AXIS] > 1
        k_eff = min(k, self.n)
        if len(q) == 0 or self.n == 0:
            return (np.zeros((len(q), k_eff), np.float32),
                    np.zeros((len(q), k_eff), np.int32))
        corpus_dev, true_n, block = self._ensure_corpus_dev(sharded)
        chunk_rows = self._chunk_rows(k_eff)
        # results land in preallocated host arrays: accumulating per-chunk
        # parts + one np.concatenate doubled peak host memory of the
        # [Q, k] results (1.6 GB transient at 1M x k=100)
        out_v = out_i = None
        # MMS_KNN_CHUNK_LOG=1: per-chunk wall times to stderr (readback-
        # bounded, so honest through the relay). The shared pool's rate
        # drifts minute-to-minute; on a 25-min warehouse sweep this is the
        # only way to tell "slow pool window" from "slow program".
        chunk_log = bool(os.environ.get("MMS_KNN_CHUNK_LOG"))
        n_chunks = (len(q) + chunk_rows - 1) // chunk_rows
        for s in range(0, len(q), chunk_rows):
            if chunk_log:
                t_chunk = time.perf_counter()
            chunk = jax.numpy.asarray(q[s: s + chunk_rows])
            v, i = self._dispatch_chunk(chunk, k, sharded)
            v, i = np.asarray(v), np.asarray(i)
            if chunk_log:
                print(f"[knn chunk {s // chunk_rows + 1}/{n_chunks}] "
                      f"{len(v)} queries in "
                      f"{time.perf_counter() - t_chunk:.2f}s",
                      file=sys.stderr, flush=True)
            if out_v is None:
                out_v = np.empty((len(q), v.shape[1]), v.dtype)
                out_i = np.empty((len(q), i.shape[1]), i.dtype)
            out_v[s: s + len(v)] = v
            out_i[s: s + len(i)] = i
        return out_v, out_i

    def _chunk_rows(self, k_eff: int) -> int:
        """Per-call query-chunk rows: the fixed QUERY_CHUNK is the k<=100
        warehouse operating point, but the running top-k carry is O(q*k)
        — the daodian v1 text side searches with k = len(area), where a
        32768 chunk's carry alone busts the HBM budget
        (knn.plan_query_chunk). Shared by search() and search_device()."""
        from multimodalsimilar_tpu.retrieval.knn import plan_query_chunk
        return min(self.QUERY_CHUNK,
                   plan_query_chunk(self.n, self._emb.shape[1], k_eff))

    def _ensure_corpus_dev(self, sharded: bool):
        """(corpus_dev, true_n, block) — corpus uploaded ONCE per engine,
        not per search call: repeated searches (self-search + external
        queries, windowed sweeps) were re-transferring the full [N, D]
        corpus through the relay each time."""
        if self._corpus_dev is None:
            if sharded:
                from multimodalsimilar_tpu.retrieval.knn import _next_pow2
                n_dev = self.mesh.shape[DATA_AXIS]
                # bucket the padded length so similarly-sized per-area
                # corpora reuse one compiled sharded program
                corpus, true_n = pad_corpus(
                    self._emb, n_dev, self.metric,
                    target_rows=_next_pow2(self.n, lo=512))
                self._corpus_dev = (jax.numpy.asarray(corpus), true_n, None)
            else:
                # pre-pad ON HOST to the block multiple knn_search would pad
                # to anyway: the eager per-call device pad concatenate
                # transiently held corpus twice in HBM (3 GB extra per chunk
                # at 1M x 768 — the warehouse run's OOM margin). Sizing
                # comes from knn.plan_search (the ONE cost model) for FULL
                # chunks regardless of this call's query count — the block
                # is cached with the corpus, and a small first search must
                # not pin an oversized block for a later warehouse sweep
                from multimodalsimilar_tpu.retrieval.knn import plan_search
                block, _ = plan_search(self.n, self._emb.shape[1],
                                       self.QUERY_CHUNK)
                corpus, true_n = pad_corpus(self._emb, block, self.metric)
                self._corpus_dev = (jax.numpy.asarray(corpus), true_n, block)
        return self._corpus_dev

    def _dispatch_chunk(self, chunk, k: int, sharded: bool):
        """Dispatch ONE query chunk on the cached device corpus; returns
        DEVICE arrays (no readback)."""
        corpus_dev, true_n, block = self._corpus_dev
        if sharded:
            return sharded_knn_search(self.mesh, corpus_dev, chunk, k,
                                      self.metric, true_n=true_n)
        if self.backend == "pallas":
            from multimodalsimilar_tpu.ops.topk import pallas_topk
            # true_n: the cached corpus is block-padded with zero rows;
            # without the mask an ip pad row scores 0.0 and displaces
            # real negative-cosine neighbors (returning out-of-range
            # indices to boot)
            return pallas_topk(corpus_dev, chunk, min(k, self.n),
                               self.metric, true_n=true_n)
        return knn_search(corpus_dev, chunk, k, self.metric,
                          block_rows=block, true_n=true_n,
                          approx_recall=self.approx_recall)

    def fused_search_fn(self, tower_fn, k: int):
        """ONE jitted program for the serving hot path: tower ->
        normalize -> exact k-NN over the cached corpus. Returns
        ``fused(variables, *tower_args) -> (scores_dev, idx_dev) | None``,
        or None when unsupported (sharded mesh / pallas / approx).

        Why: the unfused chain is 5-6 relay program dispatches per
        micro-batch (tower, astype, norm, divide, k-NN) and each pays the
        ~15 ms pipelined relay floor — the measured per-batch cost bound
        at serving saturation (benchmarks/serving_load.py). One program =
        one dispatch + one readback.

        The corpus and ``variables`` flow as ARGUMENTS (closure-captured
        arrays bake into the serialized HLO — relay HTTP 413, CLAUDE.md);
        ``true_n`` is traced, so in-tail /update appends reuse the
        compiled program. The returned callable re-reads the engine's
        cached corpus each call and returns None when the corpus buffer
        outgrew its build-time shape or the effective k changed — the
        caller falls back to the unfused path (and may rebuild)."""
        import functools

        import jax.numpy as jnp

        from multimodalsimilar_tpu.retrieval.knn import (_knn_search,
                                                         _next_pow2)
        sharded = self.mesh is not None and self.mesh.shape[DATA_AXIS] > 1
        if sharded or self.backend == "pallas" \
                or self.approx_recall is not None or self.n == 0:
            return None
        corpus0, _, block = self._ensure_corpus_dev(False)
        built_shape = corpus0.shape
        k_eff = min(k, self.n)
        k_run = min(_next_pow2(k_eff, lo=16), built_shape[0])
        metric, normalized = self.metric, self._normalized

        @functools.partial(jax.jit,
                           static_argnames=())   # ints/str close over fine
        def run(variables, corpus, true_n, *tower_args):
            emb = tower_fn(variables, *tower_args)
            q = emb.astype(jnp.float32)
            if normalized:
                q = _normalize_rows(q, jnp)
            v, i = _knn_search(corpus, q, true_n, k_run, metric, block)
            return v[:, :k_eff], i[:, :k_eff]

        def fused(variables, *tower_args):
            corpus_dev, true_n, blk = self._ensure_corpus_dev(False)
            if corpus_dev.shape != built_shape or blk != block \
                    or min(k, self.n) != k_eff:
                return None   # corpus grew past its tail / k changed
            return run(variables, corpus_dev,
                       jnp.asarray(true_n, jnp.int32), *tower_args)

        return fused

    def search_device(self, k: int, queries):
        """Single-chunk search returning DEVICE (scores, indices) — no
        readback. The serving worker dispatches a micro-batch's whole
        chain (tower -> normalize -> k-NN) through here and overlaps the
        final readback with collecting the NEXT micro-batch (depth-1
        pipeline, pipelines/serving.py). ``queries`` may be a device
        array (the fused path) or host numpy."""
        import jax.numpy as jnp
        if isinstance(queries, jax.Array) and not isinstance(
                queries, np.ndarray):
            q = queries.astype(jnp.float32)
        else:
            q = jnp.asarray(np.asarray(queries, np.float32))
        if self._normalized:
            q = _normalize_rows(q, jnp)
        k_eff = min(k, self.n)
        if q.shape[0] == 0 or self.n == 0:
            return (np.zeros((q.shape[0], k_eff), np.float32),
                    np.zeros((q.shape[0], k_eff), np.int32))
        sharded = self.mesh is not None and self.mesh.shape[DATA_AXIS] > 1
        self._ensure_corpus_dev(sharded)
        chunk_rows = self._chunk_rows(k_eff)
        if q.shape[0] > chunk_rows:
            raise ValueError(f"search_device is single-chunk: "
                             f"{q.shape[0]} queries > chunk {chunk_rows} "
                             "— use search()")
        return self._dispatch_chunk(q, k, sharded)

    # -- full jobs ---------------------------------------------------------

    def similar_map(self, k: int, rules: FilterRules
                    ) -> Dict[object, List[object]]:
        if (rules.same_category and self.categories is not None
                and self.n > 0 and k >= self.n
                and self.backend == "xla" and self.approx_recall is None
                and (self.mesh is None
                     or self.mesh.shape.get(DATA_AXIS, 1) == 1)):
            return self._grouped_self_similar_map(rules)
        scores, idx = self.search(k)
        return filter_neighbors(scores, idx, self.keys, self.categories,
                                rules, dts=self.dts)

    def _grouped_self_similar_map(self, rules: FilterRules
                                  ) -> Dict[object, List[object]]:
        """FULL-ranking self-search (k >= n) under a same-category rule,
        evaluated per category GROUP — the daodian text arm's operating
        point (k = len(area), daodian_infer.py:230-246).

        Every rule is within-row and the category rule keeps only the
        query's own group, so the global ranking restricted to a group
        IS the group's own ranking (top_k ties break by index, and
        group-relative index order is monotone in global order): the
        result equals the full [n, n] search + filter, row by row, while
        the top-k work drops from O(n^2 * k) to sum over groups of
        O(n_c^2 * n_c) — measured 12.8 s -> well under a second per
        5k-row area (PERF.md "Daodian daemon"). Duplicate-key queries
        keep last-global-row-wins via the positional stitch."""
        import pandas as pd

        from multimodalsimilar_tpu.retrieval.knn import plan_query_chunk
        codes, _ = pd.factorize(np.asarray(self.categories, dtype=object))
        dts = np.asarray(self.dts, dtype=object) \
            if self.dts is not None else None
        sub_rules = dataclasses.replace(rules, same_category=False)
        per_row: List[List[object]] = [[] for _ in range(self.n)]
        keys_arr = np.asarray(self.keys, dtype=object)
        for code in np.unique(codes):
            rows = np.nonzero(codes == code)[0]
            if code < 0:
                continue    # NaN categories never match anything
            sub = self._emb[rows]
            n_c = len(rows)
            sub_dev = jax.numpy.asarray(sub)
            chunk = min(self.QUERY_CHUNK,
                        plan_query_chunk(n_c, sub.shape[1], n_c))
            lists: List[List[object]] = []
            for s in range(0, n_c, chunk):
                v, i = knn_search(sub_dev,
                                  jax.numpy.asarray(sub[s: s + chunk]),
                                  n_c, self.metric)
                lists.extend(filter_neighbors(
                    np.asarray(v), np.asarray(i), keys_arr[rows],
                    categories=None, rules=sub_rules,
                    query_rows=np.arange(s, s + len(v)),
                    dts=dts[rows] if dts is not None else None,
                    return_lists=True))
            for r, lst in zip(rows, lists):
                per_row[r] = lst
        # dict assembly in global row order: duplicate query keys keep
        # the full path's last-row-wins
        return {keys_arr[r]: per_row[r] for r in range(self.n)}

    @staticmethod
    def merge(primary: Dict, secondary: Dict, cap: Optional[int] = None):
        return merge_neighbor_maps(primary, secondary, cap)
