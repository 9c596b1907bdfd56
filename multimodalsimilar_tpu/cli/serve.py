"""`cli serve` — the online similarity daemon (micro-batched HTTP over a
warm in-process engine; pipelines/serving.py holds the service/server).
Includes the --emb_table corpus warm-start machinery shared by all four
towers."""

from __future__ import annotations

import json
import os
import sys

from multimodalsimilar_tpu.cli.common import (_emb_cache, _knn_backend_mesh,
                                              _load_fasttext)
from multimodalsimilar_tpu.cli.embedders import (
    _build_text_embedder, _embed_fn_from_embedder, _fused_embeddings,
    _load_cv_tower, _multimodal_embedder)


def _serve_warm_payload(args):
    """The one warm query for args.tower — used by the pre-traffic warm-up
    ladder AND the background fused-path rebuild (service._warm_payload),
    so the two can never drift on payload shape."""
    if args.tower in ("cv", "multimodal"):
        import numpy as np
        warm = np.zeros((args.image_size, args.image_size, 3), np.uint8)
        return warm if args.tower == "cv" else ("warmup", warm)
    return "warmup"

def _build_serve_service(args):
    """(SimilarityService, corpus_rows) for ``cli serve`` — factored out of
    cmd_serve so tests can build the hot service without the blocking
    serve_forever loop."""
    import time as _time

    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.serving import SimilarityService
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    df = read_table(args.data)
    if not len(df):
        raise SystemExit("--data table is empty — nothing to serve")
    need_cols = {"bert": [args.text_col, args.key_col],
                 "multimodal": [args.text_col, args.key_col],
                 "cv": [args.key_col],
                 "fasttext": [args.key_col]}[args.tower]
    for col in need_cols:
        if col not in df.columns:
            raise SystemExit(f"column {col!r} not in {args.data} "
                             f"(has: {list(df.columns)})")
    cats = None
    if args.category_col:
        if args.category_col not in df.columns:
            raise SystemExit(f"--category_col {args.category_col!r} not in "
                             f"{args.data} (has: {list(df.columns)})")
        cats = df[args.category_col].tolist()
    backend, mesh, approx = _knn_backend_mesh(args)
    t0 = _time.perf_counter()
    metric, normalize = "ip", True
    dev_embedder = None   # the tower embedder the fused device path wires
    if args.tower == "cv":
        (embed_queries, parser, keys, emb, cats,
         dev_embedder) = _serve_cv_corpus(args, df, cats)
    elif args.tower == "multimodal":
        (embed_queries, parser, keys, emb, cats,
         dev_embedder) = _serve_multimodal_corpus(args, df, cats)
        # the fused job searches UN-normalized squared L2
        # (multimodal_infer.py:140-145 IndexFlatL2) — scores ascend, and
        # a request's score_th means "max distance"
        metric, normalize = "l2", False
    elif args.tower == "fasttext":
        embed_queries, parser, keys, emb, cats = \
            _serve_fasttext_corpus(args, df, cats)
    else:
        parser = None    # SimilarityService defaults to TextQueryParser
        embedder = _build_text_embedder(args, df=df)
        dev_embedder = embedder
        embed_queries = _embed_fn_from_embedder(embedder)
        keys = df[args.key_col].astype(str).tolist()
        texts = df[args.text_col].astype(str).tolist()

        def embed_bulk(tt):
            # corpus pass at a BULK batch, not the serving micro-batch:
            # 100k rows at batch 64 is ~1600 relay programs (measured
            # 100 s startup); one extra compile at a bulk shape cuts
            # that ~5x
            bulk = max(args.batch_size, 512)
            if len(tt) >= 4 * bulk and bulk != embedder.batch_size:
                serve_bs = embedder.batch_size
                embedder.batch_size = bulk
                try:
                    return embed_queries(tt)
                finally:
                    embedder.batch_size = serve_bs
            return embed_queries(tt)

        emb = _corpus_with_emb_table(args, keys, texts, embed_bulk)
    print(f"corpus embedded: {len(keys)} rows in "
          f"{_time.perf_counter() - t0:.1f}s", file=sys.stderr)
    engine = SimilarityEngine(emb, keys,
                              categories=cats, metric=metric,
                              normalize=normalize,
                              mesh=mesh, backend=backend,
                              approx_recall=approx)
    warm_payload = _serve_warm_payload(args)
    embed_device = fused = fused_factory = None
    if dev_embedder is not None and args.max_batch <= args.batch_size:
        # best path (bert / cv / multimodal towers): the WHOLE request —
        # tower(s) [+ norm-concat fusion for multimodal] -> normalize ->
        # exact k-NN (un-normalized L2 for multimodal,
        # multimodal_infer.py:140-145) — as ONE jitted program per pow2
        # bucket. The unfused chain's 5-6 per-batch program dispatches
        # each pay the ~15 ms relay floor (PERF.md "Online serving under
        # load"). embed_device is the fallback chain when the engine
        # can't fuse or the corpus outgrows the fused shape; the factory
        # lets the service REBUILD the fused path at the grown shape
        # after an overflowing /update instead of staying downgraded
        # forever. fasttext stays host-side (its sentence vectors are a
        # table mean — no device work to fuse).
        fused = dev_embedder.fused_similar_fn(engine, args.k)
        embed_device = dev_embedder.embed_device
        fused_factory = lambda: dev_embedder.fused_similar_fn(engine, args.k)  # noqa: E731
    service = SimilarityService(embed_queries, engine, k=args.k,
                                score_th=_serve_score_th(args),
                                max_batch=args.max_batch,
                                max_wait_ms=args.max_wait_ms,
                                query_parser=parser,
                                embed_queries_device=embed_device,
                                fused_similar=fused,
                                fused_factory=fused_factory,
                                warm_payload=warm_payload)
    return service, len(keys)

# Per-tower default thresholds = the reference jobs' own operating points:
# bert 0.9 (nlp_infer.py:152,163), cv 0.15 / fasttext -0.6
# (daodian_infer.py:79-82), multimodal None (multimodal_infer.py:147-159
# applies no threshold to its L2 top-13).
_SERVE_SCORE_TH = {"bert": 0.9, "cv": 0.15, "fasttext": -0.6,
                   "multimodal": None}


def _serve_score_th(args):
    if args.score_th is None:   # flag unset -> the tower's reference point
        return _SERVE_SCORE_TH[args.tower]
    return args.score_th

def _emb_table_key_col(args, columns):
    if args.key_col in columns:
        return args.key_col
    # the embed jobs key by goods_sku while serve defaults to spu_sn;
    # a table with exactly one plausible key column is unambiguous
    cands = [c for c in columns if c not in (args.emb_col, "dt")]
    if len(cands) != 1:
        raise SystemExit(
            f"--emb_table {args.emb_table} has no {args.key_col!r} "
            f"column and several candidates ({cands}) — rename or "
            "pass --key_col matching the table")
    print(f"serve: --emb_table keyed by {cands[0]!r} "
          f"(no {args.key_col!r} column)", file=sys.stderr)
    return cands[0]

def _emb_table_cache_load(cache_dir, args):
    """(keys, emb) from the restart cache, or None on any mismatch.
    Validated against the SOURCE table's (mtime, size): a nightly rewrite
    invalidates the cache, so the batch layout stays the authority."""
    import json as _json

    import numpy as np
    meta_p = os.path.join(cache_dir, "meta.json")
    if not os.path.exists(meta_p):
        return None
    try:
        with open(meta_p) as f:
            meta = _json.load(f)
        st = os.stat(args.emb_table)
        if (meta.get("source") != os.path.abspath(args.emb_table)
                or meta.get("mtime") != st.st_mtime
                or meta.get("size") != st.st_size
                or meta.get("emb_col") != args.emb_col
                # key_col participates: a restart with a different
                # --key_col must re-resolve against the table, not serve
                # keys cached from the previously-selected column
                or meta.get("key_col") != args.key_col):
            return None
        emb = np.load(os.path.join(cache_dir, "emb.npy"), mmap_mode="r")
        keys = np.load(os.path.join(cache_dir, "keys.npy"),
                       allow_pickle=False)
        if emb.shape[0] != len(keys) or emb.shape != tuple(meta["shape"]):
            return None
    except (OSError, ValueError, KeyError):
        return None
    print(f"serve: --emb_table loaded from restart cache {cache_dir}",
          file=sys.stderr)
    return keys.astype(object), emb

def _emb_table_cache_store(cache_dir, keys, emb, args):
    import json as _json

    import numpy as np
    os.makedirs(cache_dir, exist_ok=True)
    st = os.stat(args.emb_table)
    # data first, meta last, all atomic renames: a crashed writer leaves
    # either the old cache or no meta (= miss), never a torn read
    for name, arr in (("emb.npy", np.asarray(emb, np.float32)),
                      ("keys.npy", np.asarray(keys, str))):
        tmp = os.path.join(cache_dir, "tmp_" + name)  # keeps .npy suffix
        np.save(tmp, arr)                             # (np.save appends
        os.replace(tmp, os.path.join(cache_dir, name))  # it otherwise)
    meta = {"source": os.path.abspath(args.emb_table),
            "mtime": st.st_mtime, "size": st.st_size,
            "emb_col": args.emb_col, "key_col": args.key_col,
            "shape": list(emb.shape)}
    tmp = os.path.join(cache_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, os.path.join(cache_dir, "meta.json"))
    print(f"serve: --emb_table restart cache written to {cache_dir} "
          "(subsequent starts mmap it in seconds)", file=sys.stderr)

def _load_emb_table(args):
    """(keys [N] str ndarray, emb [N, D] float32) from ``--emb_table`` —
    the nightly embedding jobs' own output layout (key column +
    '[x,y,...]' strings, goodssku_emb_bert_di.py:84-87; the bulk job's
    raw unbracketed 'x,y,...' parses too). A parquet whose embedding
    column holds float LISTS loads via pyarrow as one flat zero-copy
    reshape — per-row python objects (pandas conversion + np.stack over
    1M rows) were minutes of host time at warehouse counts. Parquet
    DECODE itself is ~15 MB/s on this 1-core host (~3 min at 1M x 768,
    measured, compression-independent) — ``--emb_table_cache DIR`` keeps
    an mtime-validated npy mirror so daemon RESTARTS mmap the matrix in
    seconds instead."""
    import numpy as np
    import pandas as pd

    path = args.emb_table
    cache_dir = getattr(args, "emb_table_cache", None)
    if cache_dir:
        if not os.path.exists(path):
            raise SystemExit(
                f"--emb_table_cache needs a local --emb_table file to "
                f"validate against (mtime/size); {path} is not one — "
                "drop the cache flag for warehouse-direct sources")
        hit = _emb_table_cache_load(cache_dir, args)
        if hit is not None:
            return hit
    keys = emb = None
    if str(path).endswith((".parquet", ".pq")) and os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        tbl = pq.read_table(path)
        if args.emb_col not in tbl.column_names:
            raise SystemExit(f"--emb_col {args.emb_col!r} not in "
                             f"{path} (has: {tbl.column_names})")
        key_col = _emb_table_key_col(args, tbl.column_names)
        keys = pd.Series(tbl.column(key_col).to_pandas()).astype(str)
        col = tbl.column(args.emb_col).combine_chunks()
        if pa.types.is_fixed_size_list(col.type):
            flat = col.flatten().to_numpy(zero_copy_only=False)
            emb = np.asarray(flat, np.float32).reshape(
                len(col), col.type.list_size)
        elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            widths = np.diff(col.offsets.to_numpy())
            if len(widths) and (widths != widths[0]).any():
                raise SystemExit(f"--emb_table {path}: ragged "
                                 f"{args.emb_col!r} column")
            flat = col.flatten().to_numpy(zero_copy_only=False)
            emb = np.asarray(flat, np.float32).reshape(len(col), -1)
        else:
            keys = None   # string-serialized — the pandas path parses it
    if keys is None:
        from multimodalsimilar_tpu.data.datasets import read_table
        t = read_table(path)
        if args.emb_col not in t.columns:
            raise SystemExit(f"--emb_col {args.emb_col!r} not in "
                             f"{path} (has: {list(t.columns)})")
        key_col = _emb_table_key_col(args, list(t.columns))
        keys = t[key_col].astype(str)
        col = t[args.emb_col]
        first = col.iloc[0] if len(col) else ""
        if isinstance(first, str):
            emb = None
        else:   # array-typed rows that arrived through pandas anyway
            try:
                emb = np.asarray(np.stack(col.to_numpy()), np.float32)
            except ValueError as e:
                raise SystemExit(f"--emb_table {path}: ragged or "
                                 f"non-numeric {args.emb_col!r} "
                                 f"column ({e})")
            if emb.ndim != 2:
                raise SystemExit(f"--emb_table {path}: {args.emb_col!r} "
                                 "rows are not 1-d vectors")
        if emb is None:
            from multimodalsimilar_tpu.pipelines.embed import \
                parse_embeddings
            emb = parse_embeddings(col.astype(str).tolist())
    # a key recurring across appends (shouldn't happen — incremental
    # skips existing keys — but a hand-built table might): last wins
    dup = keys.duplicated(keep="last").to_numpy()
    if dup.any():
        emb = emb[~dup]
        keys = keys[~dup]
    keys = keys.to_numpy()
    if cache_dir:
        _emb_table_cache_store(cache_dir, keys, emb, args)
    return keys, emb

def _corpus_with_emb_table(args, keys, texts, embed_bulk):
    """Corpus embeddings, preferring ``--emb_table`` precomputed rows.

    The daemon re-embedding 100k corpus rows at startup costs ~40 s of
    chip time that the nightly incremental jobs already spent; loading
    their table is seconds of host parse instead. Keys missing from the
    table (intraday additions) embed fresh through the tower; a
    dimension mismatch between table and tower fails fast (queries embed
    through the TOWER at request time, so a stale table from a different
    model would otherwise serve garbage scores indistinguishable from
    real ones)."""
    import numpy as np
    import pandas as pd
    if not args.emb_table:
        return embed_bulk(texts)
    pre_keys, pre_emb = _load_emb_table(args)
    # vectorized key->row mapping: per-key python dict lookups over a
    # warehouse-scale corpus were minutes of host time (CLAUDE.md: one
    # slow CPU)
    pos = pd.Index(pre_keys).get_indexer(pd.Index(np.asarray(keys,
                                                             object)))
    hit_mask = pos >= 0
    n_miss = int((~hit_mask).sum())
    if not hit_mask.any():
        raise SystemExit(
            f"--emb_table {args.emb_table}: no overlap with the corpus "
            f"keys — wrong table or wrong --key_col?")
    if n_miss:
        miss = np.nonzero(~hit_mask)[0]
        fresh = np.asarray(embed_bulk([texts[i] for i in miss]),
                           np.float32)
    else:
        # no missing rows to reveal the tower's dim — probe one so a
        # stale table still fails fast here
        fresh = np.asarray(embed_bulk([texts[0]]), np.float32)
    if fresh.shape[1] != pre_emb.shape[1]:
        raise SystemExit(
            f"--emb_table dim {pre_emb.shape[1]} != tower dim "
            f"{fresh.shape[1]} — the table was built by a different "
            "model; rebuild it or drop --emb_table")
    if n_miss == 0 and len(pre_keys) == len(keys) \
            and (pos == np.arange(len(keys))).all():
        # table already row-aligned with the corpus (the common case: it
        # was written by a sweep over the same catalog) — skip the
        # full-size fancy gather (3 GB of host copy at 1M x 768)
        emb = np.ascontiguousarray(pre_emb, np.float32)
    else:
        emb = np.empty((len(keys), pre_emb.shape[1]), np.float32)
        emb[hit_mask] = pre_emb[pos[hit_mask]]
        if n_miss:
            emb[~hit_mask] = fresh
    print(f"serve: corpus {int(hit_mask.sum())} rows from --emb_table, "
          f"{n_miss} embedded fresh", file=sys.stderr)
    return emb

def _corpus_rows_from_table(args, keys, embed_missing, dim_hint=None):
    """(emb [L, D], live row indices) — the image-side towers' analogue
    of _corpus_with_emb_table (cv / multimodal, whose embed step can FAIL
    per key). Corpus keys found in the nightly job's table take its
    vectors — they need NO image on disk; the rest embed fresh through
    ``embed_missing(miss_keys) -> {key: vec}``, and keys it cannot embed
    (no readable image) drop exactly like the no-table path.
    ``dim_hint`` (the tower's known output dim, when available) fails a
    stale table fast even with zero misses."""
    import numpy as np
    import pandas as pd

    pre_keys, pre_emb = _load_emb_table(args)

    def _dim_check(got_dim, what):
        if got_dim != pre_emb.shape[1]:
            raise SystemExit(
                f"--emb_table dim {pre_emb.shape[1]} != {what} "
                f"{got_dim} — the table was built by a different model; "
                "rebuild it or drop --emb_table")

    if dim_hint is not None:
        _dim_check(dim_hint, "tower dim")
    pos = pd.Index(pre_keys).get_indexer(pd.Index(np.asarray(keys,
                                                             object)))
    hit = pos >= 0
    if not hit.any():
        raise SystemExit(
            f"--emb_table {args.emb_table}: no overlap with the corpus "
            f"keys — wrong table or wrong --key_col?")
    miss = [keys[i] for i in np.nonzero(~hit)[0]]
    fresh = embed_missing(miss) if miss else {}
    if fresh:
        _dim_check(int(next(iter(fresh.values())).shape[-1]), "tower dim")
    live, rows = [], []
    for i, k in enumerate(keys):
        if hit[i]:
            live.append(i)
            rows.append(pre_emb[pos[i]])
        elif k in fresh:
            live.append(i)
            rows.append(np.asarray(fresh[k], np.float32).reshape(-1))
    dropped = len(keys) - len(live)
    print(f"serve: corpus {int(hit.sum())} rows from --emb_table, "
          f"{len(live) - int(hit.sum())} embedded fresh"
          + (f", {dropped} dropped (no table row or readable image)"
             if dropped else ""), file=sys.stderr)
    return np.stack(rows).astype(np.float32), live

def _serve_cv_corpus(args, df, cats):
    """(embed_queries, parser, keys, emb, cats) for ``serve --tower cv``:
    the corpus is embedded from the reference's image layout
    ({img_root}/{key}/0..7.jpg mean, emb.txt/packed cache respected —
    daodian_infer.py:259-285); queries arrive as decoded uint8 images from
    ImageQueryParser and run ImageEmbedder's batched program."""
    import numpy as np

    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.pipelines.serving import ImageQueryParser

    model, variables = _load_cv_tower(args, args.checkpoint,
                                      args.num_labels)
    embedder = ImageEmbedder(
        model, variables, image_size=args.image_size,
        batch_size=args.batch_size,
        cache_path_for_key=lambda k: os.path.join(args.img_root, str(k),
                                                  "emb.txt"),
        cache=_emb_cache(args), emb_dim=args.fc_dim)
    keys_all = df[args.key_col].astype(str).tolist()

    def paths_for_key(k):
        return [os.path.join(args.img_root, str(k), f"{j}.jpg")
                for j in range(8)]

    if args.emb_table:
        # warm-start from the nightly cv job's own table
        # (goodssku_emb_cv_di layout): hit keys need NO image on disk
        emb, live = _corpus_rows_from_table(
            args, keys_all,
            lambda mk: embedder.embed_keys(list(mk), paths_for_key),
            dim_hint=embedder.emb_dim)
    else:
        emb_map = embedder.embed_keys(keys_all, paths_for_key)
        # keys without a single readable image drop out of the corpus —
        # and the category list must stay row-aligned with the survivors
        live = [i for i, k in enumerate(keys_all) if k in emb_map]
        if not live:
            raise SystemExit(f"no readable images under {args.img_root} "
                             "for any corpus row — check "
                             "--img_root/--key_col")
        if len(live) < len(keys_all):
            print(f"serve: {len(keys_all) - len(live)} of {len(keys_all)} "
                  f"corpus keys have no readable image and were dropped",
                  file=sys.stderr)
        emb = np.stack([emb_map[keys_all[i]] for i in live])
    keys = [keys_all[i] for i in live]
    if cats is not None:
        cats = [cats[i] for i in live]

    def embed_queries(images):
        return embedder.embed_batch(np.stack(list(images)))

    return (embed_queries, ImageQueryParser(args.image_size), keys, emb,
            cats, embedder)

def _serve_multimodal_corpus(args, df, cats):
    """(embed_queries, parser, keys, emb, cats) for ``serve --tower
    multimodal``: corpus rows are (text_col, {img_root}/{key}.jpg) pairs
    fused through the checkpointed 2560-d tower (the multimodal_infer.py
    input layout); queries arrive as (text, image) pairs from
    MultimodalQueryParser and run the same batched fused program."""
    import numpy as np

    from multimodalsimilar_tpu.pipelines.serving import MultimodalQueryParser

    if not args.checkpoint:
        raise SystemExit("serve --tower multimodal requires --checkpoint "
                         "(a trained fused model — cli train multimodal)")
    embedder = _multimodal_embedder(args, df)
    keys_all = df[args.key_col].astype(str).tolist()
    if args.emb_table:
        # warm-start from the nightly fused-embedding table: hit keys
        # need NO image on disk; the rest run the fused tower pass
        def embed_missing(mk):
            want = set(mk)
            sub = df[[k in want for k in keys_all]].reset_index(drop=True)
            semb, skeep = _fused_embeddings(args, sub, embedder=embedder)
            skeys = sub[args.key_col].astype(str).tolist()
            return {skeys[j]: semb[i] for i, j in enumerate(skeep)}

        emb, keep = _corpus_rows_from_table(args, keys_all, embed_missing)
    else:
        emb, keep = _fused_embeddings(args, df, embedder=embedder)
        if len(keep) < len(keys_all):
            print(f"serve: {len(keys_all) - len(keep)} of {len(keys_all)} "
                  f"corpus keys have no readable image and were dropped",
                  file=sys.stderr)
    keys = [keys_all[i] for i in keep]
    if cats is not None:
        cats = [cats[i] for i in keep]

    def embed_queries(pairs):
        pairs = list(pairs)
        return embedder(np.stack([img for _, img in pairs]),
                        [text for text, _ in pairs])

    return (embed_queries, MultimodalQueryParser(args.image_size), keys,
            emb, cats, embedder)

def _serve_fasttext_corpus(args, df, cats):
    """(embed_queries, parser, keys, emb, cats) for ``serve --tower
    fasttext``: the daodian text side online — fastText sentence vectors
    (d=100), L2-normalized IP search (daodian_infer.py:204-247). Corpus
    titles come from text_col, or gen_title when the column is absent
    (the batch job's own fallback, cli similar daodian)."""
    ft = _load_fasttext(args)
    if args.text_col in df.columns:
        texts = df[args.text_col].astype(str).tolist()
    else:
        from multimodalsimilar_tpu.data.text import gen_title
        try:
            texts = df.apply(gen_title, axis=1).tolist()
        except (KeyError, AttributeError):
            raise SystemExit(
                f"column {args.text_col!r} not in {args.data} and the "
                "gen_title fallback needs the daodian columns "
                "(first/second_level_category_name, spu_name, title) — "
                "pass --text_col")
        print(f"serve: {args.text_col!r} not in table — corpus titles "
              "built with gen_title (the daodian batch job's layout)",
              file=sys.stderr)
    keys = df[args.key_col].astype(str).tolist()

    def embed_queries(qtexts):
        return ft.get_sentence_vector(list(qtexts))

    emb = _corpus_with_emb_table(args, keys, texts, embed_queries)
    return embed_queries, None, keys, emb, cats

def _warm_serve_service(service, args):
    """Compile every program a request can hit BEFORE accepting traffic:
    the tower at its micro-batch shape plus one end-to-end similar (the
    first request must not pay minutes of relay compiles), then the k-NN
    program for every pow2 query-count bucket up to --max_batch — an
    unwarmed bucket otherwise compiles on the first burst of that size,
    landing ~2 s p99 spikes at each new concurrency level (measured,
    benchmarks/serving_load.py). Runs before traffic, so driving the
    engine from this thread doesn't race the device worker."""
    import numpy as np
    wp = service._warm_payload   # _serve_warm_payload(args), via _build
    service.similar(wp, k=1)
    # the exact bucket set _bucket_size quantizes to, INCLUDING bucket 1
    # (the c=1 operating point) — this is also the ladder the background
    # fused-path rebuild warms, so the two can't drift
    ladder = service._bucket_ladder()
    if service._fused_similar is not None \
            or service._embed_queries_device is not None:
        # drive the REAL device path per bucket: the fused program (and
        # the fallback chain's eager slice/normalize ops) compile
        # per-shape — warming the engine alone left them as ~2 s
        # first-sight spikes under load (serving_load.py)
        for m in ladder:
            service._run_batch([{"op": "similar", "query": wp}] * m)
        if service._fused_similar is not None \
                and service._embed_queries_device is not None:
            # With a fused path the per-bucket loop above never traces the
            # FALLBACK tower programs. They are corpus-independent, and a
            # corpus-overflowing /update downgrades requests to the
            # unfused chain until the background rebuild lands — without
            # this, every bucket's first live request in that window
            # would pay a fresh relay tower compile (the fallback's k-NN
            # side necessarily recompiles at the grown corpus shape; the
            # tower needn't).
            if service._dev_accepts_pad:
                for m in ladder:
                    service._embed_queries_device([wp], pad_to=m)
            else:
                service._embed_queries_device([wp])
        # mixed/update batches run the HOST path: its tower shape and
        # per-bucket k-NN programs must not compile on the first update
        service.embed([wp])
        d = service.engine._emb.shape[1]
        for m in ladder:
            service.engine.search(service.k,
                                  queries=np.zeros((m, d), np.float32))
    else:
        d = service.engine._emb.shape[1]
        for m in ladder:
            service.engine.search(service.k,
                                  queries=np.zeros((m, d), np.float32))

def _build_daodian_service(args):
    """DaodianService for ``serve --tower daodian``: BOTH production arms
    hot (fastText sentence vectors + the CV tower's cached embeddings) so
    one request returns the nightly job's merged per-key answer online
    (daodian_infer.py:361-392)."""
    from multimodalsimilar_tpu.cli.similar import _sku_to_spusn
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.data.text import gen_title
    from multimodalsimilar_tpu.pipelines.daodian_serving import DaodianService

    df = read_table(args.data)
    if not len(df):
        raise SystemExit("--data table is empty — nothing to serve")
    if "title" not in df.columns:
        df["title"] = df.apply(gen_title, axis=1)
    ft = _load_fasttext(args)

    def embed_titles(titles):
        return ft.get_sentence_vector(list(titles))

    embed_query_image = embed_query_images = None
    if args.cv_checkpoint:
        import numpy as np

        from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
        model, variables = _load_cv_tower(args, args.cv_checkpoint,
                                          args.cv_num_labels)
        emb = ImageEmbedder(
            model, variables, image_size=args.image_size,
            cache_path_for_key=lambda k: os.path.join(
                args.img_root, str(k), "emb.txt"),
            cache=_emb_cache(args), emb_dim=args.fc_dim)

        def embed_skus(area_df):
            return _sku_to_spusn(area_df, emb, args)

        def embed_query_image(image):
            return emb.embed_batch(np.asarray(image)[None])[0]

        def embed_query_images(images):
            # micro-batched ad-hoc path: one tower call per coalesced
            # batch (uniform shapes — the HTTP parser resizes)
            return emb.embed_batch(np.stack([np.asarray(im)
                                             for im in images]))
    else:
        # same explicit-degrade discipline as `similar daodian`
        if not args.text_only:
            raise SystemExit(
                "serve --tower daodian: no --cv_checkpoint given. The "
                "production job merges CV and text neighbors; pass "
                "--text_only to deliberately serve the fastText side "
                "alone.")
        print("serve daodian: --text_only — CV arm disabled",
              file=sys.stderr)

        def embed_skus(area_df):
            return {}

    backend, _, approx = _knn_backend_mesh(args)
    # per-area engines are small — always single-chip (mesh-less), like
    # the batch job's per-area loop
    return DaodianService(
        df, embed_titles, embed_skus, embed_query_image=embed_query_image,
        embed_query_images=embed_query_images,
        area_col=args.area_col, key_col=args.key_col,
        nlp_score_th=args.nlp_score_th, cv_score_th=args.cv_score_th,
        ann_cnt_nlp=args.ann_cnt_nlp, ann_cnt_cv=args.ann_cnt_cv,
        backend=backend, approx_recall=approx,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)


def _serve_daodian(args):
    import time as _time

    from multimodalsimilar_tpu.pipelines.daodian_serving import (
        make_daodian_server)
    t0 = _time.perf_counter()
    service = _build_daodian_service(args)
    service.warm()
    service.warm_query_buckets(args.image_size)
    print(f"daodian indexes warm: {service.n} rows, "
          f"{len(service.areas)} areas in "
          f"{_time.perf_counter() - t0:.1f}s", file=sys.stderr)
    httpd = make_daodian_server(service, args.host, args.port,
                                image_size=args.image_size)
    host, port = httpd.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "corpus": service.n,
                      "areas": len(service.areas)}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        service.close()


def cmd_serve(args):
    """Online similarity daemon — the capability the reference's
    precomputed Redis KV can't give (a query NOT in last night's batch).
    Micro-batched HTTP serving; see pipelines/serving.py."""
    from multimodalsimilar_tpu.pipelines.serving import make_server
    if args.tower == "daodian":
        # refuse, don't silently ignore (advisor finding): the merged
        # tower has per-arm thresholds/depths, so the generic single-value
        # knobs have no meaning here
        if args.score_th is not None:
            raise SystemExit(
                "serve --tower daodian: --score_th is not read by the "
                "merged tower (it has TWO thresholds) — use "
                "--nlp_score_th / --cv_score_th")
        if args.k != 13:
            raise SystemExit(
                "serve --tower daodian: --k is not read by the merged "
                "tower (it has TWO retrieval depths) — use "
                "--ann_cnt_nlp / --ann_cnt_cv")
        return _serve_daodian(args)
    service, n = _build_serve_service(args)
    _warm_serve_service(service, args)
    httpd = make_server(service, args.host, args.port)
    host, port = httpd.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}", "corpus": n,
                      "k": service.k}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        service.close()
