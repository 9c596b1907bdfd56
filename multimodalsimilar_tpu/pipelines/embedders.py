"""Batched embedders — the fix for the reference's per-row inference.

Every reference pipeline embeds one row at a time (nlp_infer.py:127-140,
daodian_infer.py:256-285, goodssku_emb_bert_di.py:73-91 — "batch size 1" is
the single biggest perf sin per SURVEY.md §6). Here each embedder jits one
fixed-[B, ...] program, streams the workload through it in full batches (last
batch padded, never re-traced), and overlaps host prep with device compute.

* TextEmbedder    — tokenizer + any model with predict_emb (NlpTextClassifier
  / NlpMultilabelClassifier / SiamesePairModel share the signature)
* ImageEmbedder   — decode/resize/normalize + CvImageClassifier.predict_emb,
  with the reference's per-SKU embedding disk cache (emb.txt,
  daodian_infer.py:259-285) and multi-image averaging — implemented
  *correctly* (the reference re-reads image 0 for every extra image,
  daodian_infer.py:270-272; known bug, not reproduced)
* MultimodalEmbedder — fused tower predict_emb
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsimilar_tpu.data import images as I
from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
from multimodalsimilar_tpu.utils.buckets import bucket_ladder


def _pad_rows(arrs: Dict[str, np.ndarray], batch: int) -> Dict[str, np.ndarray]:
    n = next(iter(arrs.values())).shape[0]
    if n == batch:
        return arrs
    return {k: np.concatenate(
        [v, np.repeat(v[-1:], batch - n, axis=0)]) for k, v in arrs.items()}


def _stream(batches, run, depth: int = 3) -> np.ndarray:
    """Pipelined embed loop: keep ``depth`` batches in flight.

    ``batches`` yields ``(args_tuple, n_valid)``. Later batches are
    dispatched BEFORE earlier results are read back, so the device computes
    while the host tokenizes/decodes/reads back — a bare per-batch
    ``np.asarray`` serializes dispatch->compute->readback and halves
    throughput (measured on the text tower at batch 256: 3,186 emb/s
    serialized, 6,557 at depth 1, 6,802 at depth 3, flat beyond).
    Device memory is bounded at depth+1 in-flight input batches.
    """
    from collections import deque
    out: List[np.ndarray] = []
    pending = deque()

    def drain(dev, n0):
        # read back the FULL padded batch and slice on HOST: an on-device
        # dev[:n0] is an eager program compiled once per distinct n0 —
        # ~2 s first-sight relay compiles that land as p99 spikes in
        # serving and as stalls on a job's ragged tail batch. The pad
        # rows' extra transfer is a few hundred KB, noise next to the
        # per-readback relay round-trip.
        out.append(np.asarray(dev, np.float32)[:n0])

    for args, n in batches:
        pending.append((run(*args), n))
        if len(pending) > depth:
            drain(*pending.popleft())
    while pending:
        drain(*pending.popleft())
    return np.concatenate(out) if out else np.zeros((0, 0), np.float32)


class TextEmbedder:
    """``length_buckets`` (e.g. ``(24, 48)``) turns on length-bucketed
    serving: rows are sorted by true token length within a window, batched,
    and each batch is trimmed to the smallest bucket that fits its longest
    row (``max_length`` is always the final bucket). Every reference export
    job pads every title to the full max_length (goodssku_emb_bert_di.py:56
    tokenizes with padding='max_length'), burning FLOPs on pad tokens;
    short-title batches here run a proportionally cheaper program. One
    compiled program per bucket, all shapes static. Embeddings are
    padding-invariant (masked attention + masked pooling), so outputs match
    the unbucketed path; original row order is restored exactly.
    """

    def __init__(self, model, variables, tokenizer: TextTokenizer,
                 max_length: int = 128, batch_size: int = 256,
                 length_buckets: Optional[Sequence[int]] = None):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self.length_buckets = bucket_ladder(length_buckets, max_length)

        # variables flow as arguments — closure-captured params are baked
        # into the serialized HLO as constants (huge executables, remote
        # compile-size failures for large towers).
        def tower(v, input_ids, attention_mask, token_type_ids):
            return model.apply(v, input_ids, attention_mask,
                               token_type_ids, method=model.predict_emb)

        run = jax.jit(tower)
        self.tower_fn = tower   # uncompiled: composable into fused programs
        # device_put ONCE: host-resident param trees (fold_cv_classifier
        # returns host numpy; some restores too) would otherwise re-upload
        # per CALL — 76 MB of B4 weights ≈ 1.6 s/batch through the relay,
        # measured as a flat ~2 s/request collapse of the whole image
        # serving path (benchmarks/serving_cv_microprobe.py, round 4).
        # No-op for already-on-device trees.
        self._variables = jax.device_put(variables)
        self._run = lambda *a: run(self._variables, *a)

    def embed_device(self, texts: Sequence[str], pad_to: int = None):
        """One micro-batch -> a padded [pad_to, D] jax.Array STILL ON
        DEVICE (no readback, no slice — rows past len(texts) are
        pad-token outputs the caller must discard). The serving hot path
        chains this straight into the k-NN program, so a request pays ONE
        device round-trip (the final scores readback) instead of two —
        through the relay each sync costs ~50-60 ms (PERF.md "Serving
        roofline decomposition" #3). Returning un-sliced keeps the device
        chain SHAPE-STABLE: an eager dev[:n] here would compile once per
        distinct micro-batch size (measured as 2 s p95/p99 spikes under
        load, benchmarks/serving_load.py); the caller slices to its pow2
        bucket instead.

        ``pad_to`` (default batch_size) lets the serving worker run the
        tower at its micro-batch's POW2 BUCKET instead of the full
        batch_size: one program per bucket (warm-up compiles the ladder),
        and device cost scales with actual load — always padding to
        batch_size made a half-full batch cost a full one, which turned
        the depth-1 pipelined readback into a regression (measured,
        benchmarks/serving_load.py). len(texts) <= pad_to <= batch_size."""
        pad = self.batch_size if pad_to is None else pad_to
        if not len(texts) <= pad <= self.batch_size:
            raise ValueError(f"need len(texts) <= pad_to <= batch_size, "
                             f"got {len(texts)} / {pad} / "
                             f"{self.batch_size}")
        toks = _pad_rows(self.tokenizer(list(texts), self.max_length), pad)
        return self._run(jnp.asarray(toks["input_ids"]),
                         jnp.asarray(toks["attention_mask"]),
                         jnp.asarray(toks["token_type_ids"]))

    def fused_similar_fn(self, engine, k: int):
        """``(texts, pad_to) -> (scores_dev, idx_dev) | None``: the
        serving hot path as ONE device program — tokenize on host, then
        tower + normalize + exact k-NN fused (engine.fused_search_fn).
        None when the engine can't fuse (sharded / pallas / approx).
        The call returns None when the engine's corpus outgrew the
        compiled shape — the caller falls back to the unfused path."""
        run = engine.fused_search_fn(self.tower_fn, k)
        if run is None:
            return None

        def fused(texts, pad_to):
            if not len(texts) <= pad_to <= self.batch_size:
                raise ValueError(
                    f"need len(texts) <= pad_to <= batch_size, got "
                    f"{len(texts)} / {pad_to} / {self.batch_size}")
            toks = _pad_rows(self.tokenizer(list(texts), self.max_length),
                             pad_to)
            return run(self._variables,
                       jnp.asarray(toks["input_ids"]),
                       jnp.asarray(toks["attention_mask"]),
                       jnp.asarray(toks["token_type_ids"]))

        return fused

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if self.length_buckets and len(texts) > self.batch_size:
            return self._call_bucketed(texts)
        B = self.batch_size

        def batches():
            for s in range(0, len(texts), B):
                chunk = list(texts[s: s + B])
                toks = _pad_rows(self.tokenizer(chunk, self.max_length), B)
                yield (jnp.asarray(toks["input_ids"]),
                       jnp.asarray(toks["attention_mask"]),
                       jnp.asarray(toks["token_type_ids"])), len(chunk)

        return _stream(batches(), self._run)

    def _call_bucketed(self, texts: Sequence[str]) -> np.ndarray:
        B = self.batch_size
        W = 64 * B                     # sort window: 64 batches at a time
        order_ix: List[np.ndarray] = []

        def batches():
            for w0 in range(0, len(texts), W):
                chunk = list(texts[w0: w0 + W])
                toks = self.tokenizer(chunk, self.max_length)
                lens = toks["attention_mask"].sum(axis=1)
                order = np.argsort(lens, kind="stable")
                for s in range(0, len(order), B):
                    sel = order[s: s + B]
                    need = int(lens[sel].max())
                    bucket = next(b for b in self.length_buckets
                                  if b >= need)
                    sub = _pad_rows({k: v[sel][:, :bucket]
                                     for k, v in toks.items()}, B)
                    order_ix.append(np.asarray(w0 + sel))
                    yield (jnp.asarray(sub["input_ids"]),
                           jnp.asarray(sub["attention_mask"]),
                           jnp.asarray(sub["token_type_ids"])), len(sel)

        embs = _stream(batches(), self._run)
        if not len(embs):
            return embs
        out = np.empty_like(embs)
        out[np.concatenate(order_ix)] = embs
        return out


class ImageEmbedder:
    """Batched image embedding with optional per-key disk cache and
    multi-image mean.

    ``paths_for_key(key) -> [path, ...]`` lists candidate images (the
    reference reads {sku}/0.jpg..7.jpg, daodian_infer.py:266-281); their
    embeddings are averaged. Default cache layout matches the reference:
    one ``emb.txt`` (np.savetxt) next to the images. Passing ``cache``
    (an ``embcache.EmbeddingCache``) uses the packed store instead —
    ≥10x faster reads at warehouse key counts — and when BOTH are given,
    a cache miss falls back to the legacy emb.txt and backfills the
    packed store (organic migration; no recompute, no extra command).
    """

    def __init__(self, model, variables, image_size: int = 512,
                 batch_size: int = 64,
                 cache_path_for_key: Optional[Callable[[str], str]] = None,
                 cache=None, emb_dim: Optional[int] = None):
        # expected embedding dim for validating legacy emb.txt reads; when
        # absent it is taken from the packed cache (if any) or learned
        # from the first computed embedding
        self.emb_dim = emb_dim or (cache.dim if cache is not None else None)
        self.image_size = image_size
        self.batch_size = batch_size
        self.cache_path_for_key = cache_path_for_key
        self.cache = cache

        from multimodalsimilar_tpu.models.vision import device_normalize

        def tower(v, images):
            return model.apply(v, device_normalize(images),
                               method=model.predict_emb)

        run = jax.jit(tower)
        self.tower_fn = tower   # uncompiled: composable into fused programs
        # device_put ONCE: host-resident param trees (fold_cv_classifier
        # returns host numpy; some restores too) would otherwise re-upload
        # per CALL — 76 MB of B4 weights ≈ 1.6 s/batch through the relay,
        # measured as a flat ~2 s/request collapse of the whole image
        # serving path (benchmarks/serving_cv_microprobe.py, round 4).
        # No-op for already-on-device trees.
        self._variables = jax.device_put(variables)
        self._run = lambda *a: run(self._variables, *a)

    def _pad_image_batch(self, images, pad: int) -> np.ndarray:
        """[pad, S, S, 3] host batch: the images, zero-padded to ``pad``
        rows (shared by embed_device and the fused path — keep them
        identical)."""
        if not 1 <= len(images) <= pad <= self.batch_size:
            raise ValueError(f"need 1 <= len(images) <= pad_to <= "
                             f"batch_size, got {len(images)} / {pad} / "
                             f"{self.batch_size}")
        first = np.asarray(images[0])
        batch = np.zeros((pad,) + first.shape, first.dtype)
        for i, im in enumerate(images):
            batch[i] = im
        return batch

    def embed_device(self, images: Sequence[np.ndarray],
                     pad_to: int = None):
        """One micro-batch of decoded uint8 [S, S, 3] images -> a padded
        [pad_to, D] jax.Array STILL ON DEVICE — the image-tower twin of
        TextEmbedder.embed_device (same shape-stability and pad_to-bucket
        contract; rows past len(images) embed zero images and must be
        discarded by the caller). uint8 ships to the device and
        normalization runs on-chip (PERF.md 'Relay H2D')."""
        pad = self.batch_size if pad_to is None else pad_to
        return self._run(jnp.asarray(self._pad_image_batch(images, pad)))

    def fused_similar_fn(self, engine, k: int):
        """``(images, pad_to) -> (scores_dev, idx_dev) | None``: the
        image-serving hot path as ONE device program — decode/resize on
        the handler thread (ImageQueryParser), then tower + normalize +
        exact k-NN fused (engine.fused_search_fn). Same contract as
        TextEmbedder.fused_similar_fn: None when the engine can't fuse;
        the returned callable yields None when the corpus outgrew the
        compiled shape (caller falls back / rebuilds)."""
        run = engine.fused_search_fn(self.tower_fn, k)
        if run is None:
            return None

        def fused(images, pad_to):
            batch = self._pad_image_batch(images, pad_to)
            return run(self._variables, jnp.asarray(batch))

        return fused

    def embed_batch(self, images: np.ndarray) -> np.ndarray:
        B = self.batch_size

        def batches():
            for s in range(0, len(images), B):
                chunk = images[s: s + B]
                n = len(chunk)
                # pad partial chunks to the pow2 BUCKET, not the full
                # batch_size: padding ships real bytes through the relay
                # uint8 H2D path — a 1-image ad-hoc daodian query padded
                # to 64@512px shipped 50 MB and measured 2.1 s/query
                # (round-5 daodian_daemon_bench cv). Pow2 buckets keep
                # the compiled-program count log2(B) (the fastText /
                # serving-ladder discipline) while transfer scales with
                # actual load.
                pad = 1
                while pad < n:
                    pad *= 2
                pad = min(pad, B)
                if n < pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad - n, axis=0)])
                yield (jnp.asarray(chunk),), n

        return _stream(batches(), self._run)

    def embed_paths(self, paths: Sequence[str]) -> Dict[str, np.ndarray]:
        """Embed single images; failed decodes are skipped (absent keys)."""
        loaded, keys = [], []
        for p in paths:
            img = I.load_eval(p, self.image_size, normalize_host=False)
            if img is not None:
                loaded.append(img)
                keys.append(p)
        if not loaded:
            return {}
        embs = self.embed_batch(np.stack(loaded))
        return dict(zip(keys, embs))

    def embed_keys(self, keys: Sequence[str],
                   paths_for_key: Callable[[str], Sequence[str]]
                   ) -> Dict[str, np.ndarray]:
        """Multi-image mean embedding per key, with emb.txt caching."""
        from concurrent.futures import ThreadPoolExecutor
        result: Dict[str, np.ndarray] = {}
        to_decode: List[str] = []      # keys needing compute
        migrate: Dict[str, np.ndarray] = {}   # legacy emb.txt -> cache
        for key in keys:
            if self.cache is not None:
                hit = self.cache.get(key)
                if hit is not None:
                    result[key] = hit
                    continue
            txt = (self.cache_path_for_key(key)
                   if self.cache_path_for_key else None)
            if txt and os.path.exists(txt):
                # a malformed or wrong-dim emb.txt (older run, different
                # --fc_dim, truncated write) must not kill the job —
                # recompute the key instead, like import_emb_txt skips it
                emb = None
                try:
                    emb = np.loadtxt(txt).astype(np.float32).reshape(-1)
                except (ValueError, OSError):
                    pass
                if emb is not None and (self.emb_dim is None
                                        or emb.shape == (self.emb_dim,)):
                    result[key] = emb
                    if self.cache is not None:   # migrate legacy emb.txt
                        migrate[key] = emb
                else:
                    to_decode.append(key)
            else:
                to_decode.append(key)
        if migrate:
            # ONE flock/append cycle for the whole batch — per-key put()
            # re-pays the open+LOCK_EX+fstat+close round the packed cache
            # exists to batch away
            self.cache.put_many(migrate)

        def load_key(key):
            loaded = []
            for p in paths_for_key(key):
                if not os.path.exists(p):
                    break  # sequentially-numbered images END at the first
                    # gap (daodian_infer.py:269-280 stops at the first
                    # unreadable {j}.jpg; a folder without 0.jpg yields
                    # nothing and the key is skipped, like the reference's
                    # per-row exception path)
                img = I.load_eval(p, self.image_size, normalize_host=False)
                if img is not None:
                    loaded.append(img)
            return key, loaded

        # Decode streams INTO the pipelined embed loop: the threadpool keeps
        # decoding the next keys while the device embeds the current batch
        # (decode-everything-then-embed serializes two multi-second phases
        # at warehouse scale).
        pending: List[str] = []
        owners: List[str] = []
        B = self.batch_size

        def batches(decoded):
            buf: List[np.ndarray] = []
            for key, loaded in decoded:
                if not loaded:
                    continue
                pending.append(key)
                for img in loaded:
                    buf.append(img)
                    owners.append(key)
                    if len(buf) == B:
                        yield (jnp.asarray(np.stack(buf)),), B
                        buf = []
            if buf:
                n = len(buf)
                pad = np.repeat(buf[-1][None], B - n, axis=0)
                yield (jnp.asarray(
                    np.concatenate([np.stack(buf), pad])),), n

        from multimodalsimilar_tpu.data.datasets import _bounded_map
        with ThreadPoolExecutor(max_workers=8) as pool:
            # bounded window: Executor.map submits every key up front, so
            # when decode outpaces the device the finished futures buffer
            # up to 8 decoded images per key for the WHOLE catalog
            embs = _stream(batches(_bounded_map(pool, load_key, to_decode,
                                                window=32)),
                           self._run)
        if len(embs):
            sums: Dict[str, np.ndarray] = {}
            counts: Dict[str, int] = {}
            for key, e in zip(owners, embs):
                sums[key] = sums.get(key, 0.0) + e
                counts[key] = counts.get(key, 0) + 1
            fresh: Dict[str, np.ndarray] = {}
            for key in pending:
                emb = (sums[key] / counts[key]).astype(np.float32)
                if self.emb_dim is None:
                    self.emb_dim = int(emb.shape[-1])
                result[key] = emb
                if self.cache is not None:
                    fresh[key] = emb.reshape(-1)
                elif self.cache_path_for_key:
                    txt = self.cache_path_for_key(key)
                    os.makedirs(os.path.dirname(txt), exist_ok=True)
                    np.savetxt(txt, emb)
            if fresh:
                self.cache.put_many(fresh)   # one flock cycle per batch
        return result


class MultimodalEmbedder:
    def __init__(self, model, variables, tokenizer: TextTokenizer,
                 max_length: int = 128, image_size: int = 380,
                 batch_size: int = 48):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.image_size = image_size
        self.batch_size = batch_size

        from multimodalsimilar_tpu.models.vision import device_normalize

        def tower(v, images, input_ids, attention_mask, token_type_ids):
            return model.apply(v, device_normalize(images), input_ids,
                               attention_mask, token_type_ids,
                               method=model.predict_emb)

        run = jax.jit(tower)
        self.tower_fn = tower   # uncompiled: composable into fused programs
        # device_put ONCE: host-resident param trees (fold_cv_classifier
        # returns host numpy; some restores too) would otherwise re-upload
        # per CALL — 76 MB of B4 weights ≈ 1.6 s/batch through the relay,
        # measured as a flat ~2 s/request collapse of the whole image
        # serving path (benchmarks/serving_cv_microprobe.py, round 4).
        # No-op for already-on-device trees.
        self._variables = jax.device_put(variables)
        self._run = lambda *a: run(self._variables, *a)

    def _pad_pair_batch(self, pairs, pad: int):
        """(images, input_ids, attention_mask, token_type_ids) jnp args
        for a [pad]-row batch from (text, uint8 image) pairs."""
        if not 1 <= len(pairs) <= pad <= self.batch_size:
            raise ValueError(f"need 1 <= len(pairs) <= pad_to <= "
                             f"batch_size, got {len(pairs)} / {pad} / "
                             f"{self.batch_size}")
        texts = [t for t, _ in pairs]
        toks = _pad_rows(self.tokenizer(texts, self.max_length), pad)
        first = np.asarray(pairs[0][1])
        images = np.zeros((pad,) + first.shape, first.dtype)
        for i, (_, im) in enumerate(pairs):
            images[i] = im
        return (jnp.asarray(images), jnp.asarray(toks["input_ids"]),
                jnp.asarray(toks["attention_mask"]),
                jnp.asarray(toks["token_type_ids"]))

    def embed_device(self, pairs: Sequence, pad_to: int = None):
        """One micro-batch of (text, uint8 image) pairs -> a padded
        [pad_to, 2560] jax.Array still on device — same shape-stability /
        bucket contract as TextEmbedder.embed_device (rows past
        len(pairs) are padding the caller discards)."""
        pad = self.batch_size if pad_to is None else pad_to
        return self._run(*self._pad_pair_batch(list(pairs), pad))

    def fused_similar_fn(self, engine, k: int):
        """``(pairs, pad_to) -> (scores_dev, idx_dev) | None``: the
        multimodal serving hot path as ONE device program — both towers,
        the norm-concat fusion, and the (un-normalized L2,
        multimodal_infer.py:140-145) k-NN fused. Same contract as
        TextEmbedder.fused_similar_fn."""
        run = engine.fused_search_fn(self.tower_fn, k)
        if run is None:
            return None

        def fused(pairs, pad_to):
            args = self._pad_pair_batch(list(pairs), pad_to)
            return run(self._variables, *args)

        return fused

    def __call__(self, images: np.ndarray, texts: Sequence[str]
                 ) -> np.ndarray:
        B = self.batch_size

        def batches():
            for s in range(0, len(texts), B):
                chunk_t = list(texts[s: s + B])
                toks = self.tokenizer(chunk_t, self.max_length)
                arrs = _pad_rows({**toks, "images": images[s: s + B]}, B)
                yield (jnp.asarray(arrs["images"]),
                       jnp.asarray(arrs["input_ids"]),
                       jnp.asarray(arrs["attention_mask"]),
                       jnp.asarray(arrs["token_type_ids"])), len(chunk_t)

        return _stream(batches(), self._run)
