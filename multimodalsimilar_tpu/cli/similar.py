"""`cli similar {nlp,multimodal,daodian}` — the batch retrieval jobs
(nlp_infer / multimodal_infer / daodian_infer*, SURVEY.md §2.4)."""

from __future__ import annotations

import json
import os
import sys

from multimodalsimilar_tpu.cli.common import (_emb_cache, _knn_backend_mesh,
                                              _kv_sink, _load_fasttext)
from multimodalsimilar_tpu.cli.embedders import (_build_embed_fn_texts,
                                                 _fused_embeddings,
                                                 _load_cv_tower)


def cmd_similar_nlp(args):
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.similar import nlp_similar_job
    df = read_table(args.data)
    if args.dt:
        # the reference pulls rows WHERE dt=--dt in SQL (nlp_infer.py:112);
        # with a pre-extracted table the equivalent is a dt-column filter.
        # Compare digit-normalized ('2026-08-16' == '20260816' == int dt)
        # like daodian_similar_job's norm_dt — verbatim comparison would
        # silently select nothing across formats.
        if "dt" not in df.columns:
            raise SystemExit("--dt given but the input table has no 'dt' "
                             "column to select on (the reference applies "
                             "dt in its SQL pull) — drop the flag or add "
                             "the column")

        def norm(v):
            return "".join(ch for ch in str(v) if ch.isdigit())

        df = df[df["dt"].map(norm) == norm(args.dt)].reset_index(drop=True)
        if not len(df):
            raise SystemExit(f"--dt {args.dt}: no rows match in the input "
                             f"table")
    sink = _kv_sink(args)
    embed_fn = _build_embed_fn_texts(args, df=df)
    backend, mesh, approx = _knn_backend_mesh(args)
    n = nlp_similar_job(df, embed_fn, sink, text_col=args.text_col,
                        key_col=args.key_col, k=args.k,
                        score_th=args.score_th,
                        ttl_seconds=args.exp_seconds,
                        backend=backend, mesh=mesh, approx_recall=approx)
    print(json.dumps({"written": n}))

def cmd_similar_multimodal(args):
    """multimodal_infer capability: fused embeddings, un-normalized L2
    top-k, dj_similar:{spu_sn} writes. With --checkpoint the fused
    embeddings are computed in-process (the reference's pattern); without
    it, a precomputed --embedding_col is read from the table."""
    import numpy as np
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.embed import parse_embedding
    from multimodalsimilar_tpu.pipelines.similar import multimodal_similar_job
    df = read_table(args.data)
    if args.checkpoint:
        emb, keep = _fused_embeddings(args, df)
        df = df.iloc[keep].reset_index(drop=True)
    elif args.embedding_col in df.columns:
        # bulk_export's outer merge leaves NaN (parquet) or '' (Hive,
        # spark.py fillna) where a key misses the fused tower — skip those
        # rows with a count instead of crashing the whole job on
        # parse_embedding
        col = df[args.embedding_col]
        ok = col.notna() & (col.astype(str).str.strip("[] ").str.len() > 0)
        if (~ok).any():
            print(f"similar multimodal: skipping {int((~ok).sum())} rows "
                  f"with empty {args.embedding_col!r}", file=sys.stderr)
            df = df[ok].reset_index(drop=True)
            if not len(df):
                raise SystemExit(
                    f"no rows with a non-empty {args.embedding_col!r}")
        emb = np.stack([parse_embedding(s) for s in df[args.embedding_col]])
    else:
        raise SystemExit(
            f"--embedding_col {args.embedding_col!r} not in table — pass "
            "--checkpoint (+ --img_root) to compute fused embeddings "
            "in-process like the reference job, or point at a table with "
            "precomputed fused embeddings")
    sink = _kv_sink(args)
    backend, mesh, approx = _knn_backend_mesh(args)
    n = multimodal_similar_job(df, emb, sink, key_col=args.key_col,
                               k=args.k, ttl_seconds=args.exp_seconds,
                               backend=backend, mesh=mesh,
                               approx_recall=approx)
    print(json.dumps({"written": n}))

def cmd_similar_daodian(args):
    """daodian_infer capability: per-area fastText + CV merge, KV write."""
    import numpy as np
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.data.text import gen_title
    from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job

    df = read_table(args.data)
    if "title" not in df.columns:
        df["title"] = df.apply(gen_title, axis=1)
    ft = _load_fasttext(args)

    def embed_titles(titles):
        return ft.get_sentence_vector(list(titles))

    if args.cv_checkpoint:
        from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
        model, variables = _load_cv_tower(args, args.cv_checkpoint,
                                          args.cv_num_labels)
        emb = ImageEmbedder(
            model, variables,
            image_size=args.image_size,
            cache_path_for_key=lambda k: os.path.join(
                args.img_root, str(k), "emb.txt"),
            cache=_emb_cache(args), emb_dim=args.fc_dim)

        def embed_skus(area_df):
            return _sku_to_spusn(area_df, emb, args)
    else:
        # The reference job always has a CV side (daodian_infer.py:367);
        # degrading to text-only must be an explicit operator choice.
        if not args.text_only:
            raise SystemExit(
                "similar daodian: no --cv_checkpoint given. The reference "
                "job merges CV and text neighbors; pass --text_only to "
                "deliberately run the fastText side alone.")
        print("similar daodian: --text_only — CV side disabled",
              file=sys.stderr)

        def embed_skus(area_df):
            return {}

    sink = _kv_sink(args)
    if (args.date_keyed or args.dt_col) and not args.dt:
        raise SystemExit(
            "similar daodian: --date_keyed/--dt_col are v2 semantics and "
            "need the target date; pass --dt YYYY-MM-DD.")
    date_key = args.dt.replace("-", "") if (args.dt and args.date_keyed) \
        else None
    backend, mesh, approx = _knn_backend_mesh(args)
    merged = daodian_similar_job(
        df, embed_titles, embed_skus, sink, ttl_seconds=args.exp_seconds,
        date_key=date_key, dt_col=args.dt_col, target_dt=args.dt,
        recent_days=args.recent_days, backend=backend, mesh=mesh,
        approx_recall=approx)
    print(json.dumps({"skus": len(merged)}))

def _sku_to_spusn(area_df, emb, args):
    """Embed by goods_sku (image folders) but key the result by spu_sn.

    Several spu_sns may share one goods_sku (same product listed twice) —
    every spu_sn gets its sku's embedding, like the reference's per-row
    loop (daodian_infer.py:256-288), not just the last one."""
    skus = area_df[args.sku_col].astype(str).tolist()
    spusns = area_df[args.key_col].tolist()
    by_sku = emb.embed_keys(
        sorted(set(skus)),
        lambda kk: [os.path.join(args.img_root, kk, f"{j}.jpg")
                    for j in range(8)])
    return {sp: by_sku[sk] for sk, sp in zip(skus, spusns) if sk in by_sku}
