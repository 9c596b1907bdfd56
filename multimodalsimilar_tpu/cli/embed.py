"""`cli embed {incremental,bulk}` — the goodssku_emb* export jobs
(SURVEY.md §2.4: skip-existing daily increments, multi-tower bulk)."""

from __future__ import annotations

import json

from multimodalsimilar_tpu.cli.common import _load_fasttext, _make_table_sink
from multimodalsimilar_tpu.cli.embedders import (_build_cv_embed_fn,
                                                 _build_embed_fn)


def cmd_embed_incremental(args):
    """goodssku_emb_*_di capability: skip-existing daily export.

    --kind text (bert/fasttext-style titles) or cv (multi-image mean with
    emb.txt caching, goodssku_emb_cv_di semantics)."""
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.embed import incremental_export
    df = read_table(args.data)
    sink = _make_table_sink(args.table, key_col=args.key_col)
    kind = getattr(args, "kind", "text")
    if kind == "cv":
        # goodssku_emb_cv_di.py is a FULL REBUILD despite the _di name: it
        # re-reads every cached emb.txt for today's catalog and overwrites
        # the table, so refreshed embeddings replace stale rows and
        # departed SKUs drop out (:83-119)
        from multimodalsimilar_tpu.pipelines.embed import rebuild_export
        embed_fn = _build_cv_embed_fn(args)
        n = rebuild_export(df, embed_fn, sink, key_col=args.key_col,
                           dt=args.dt)
        print(json.dumps({"written": n, "table": args.table,
                          "mode": "rebuild"}))
        return
    elif kind == "fasttext":
        ft = _load_fasttext(args)

        def embed_fn(sub):
            em = ft.get_sentence_vector(
                sub[args.text_col].astype(str).tolist())
            return dict(zip(sub[args.key_col].astype(str), em))
    else:
        embed_fn = _build_embed_fn(args, df=df)
    n = incremental_export(df, embed_fn, sink, key_col=args.key_col,
                           dt=args.dt)
    print(json.dumps({"written": n, "table": args.table}))

def cmd_embed_bulk(args):
    """goodssku_emb.py capability: one table with a column per tower
    (fastText + BERT + CV), outer-merged over the key."""
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.embed import bulk_export
    df = read_table(args.data)
    sink = _make_table_sink(args.table, key_col=args.key_col)
    embedders = {}
    kinds = [k.strip() for k in args.kinds.split(",")]
    if "bert" in kinds:
        embedders["bert"] = _build_embed_fn(args, df=df)
    if "fasttext" in kinds:
        ft = _load_fasttext(args)

        def ft_fn(sub):
            em = ft.get_sentence_vector(sub[args.text_col].astype(str)
                                        .tolist())
            return dict(zip(sub[args.key_col].astype(str), em))

        embedders["fasttext"] = ft_fn
    if "cv" in kinds:
        embedders["cv"] = _build_cv_embed_fn(args)
    merged = bulk_export(df, embedders, sink, key_col=args.key_col)
    print(json.dumps({"rows": len(merged), "towers": list(embedders),
                      "table": args.table}))
