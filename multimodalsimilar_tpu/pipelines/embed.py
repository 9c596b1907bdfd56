"""Bulk and incremental embedding export jobs.

* ``bulk_export``        <- goodssku_emb.py:145-202 — embed every key with
  one or more embedders, outer-merge into one table, overwrite the warehouse.
* ``incremental_export`` <- goodssku_emb_{bert,fasttext,cv}_di.py — daily
  delta: skip keys already in the table (goodssku_emb_bert_di.py:126-129),
  embed the rest in batches, L2-normalize, serialize as '[x,y,...]' strings
  (:85-87), append via the sink's overwrite-tmp semantics.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd

from multimodalsimilar_tpu.pipelines.sinks import TableSink


def format_embedding(vec: np.ndarray, normalize: bool = True) -> str:
    """'[x,y,...]' string (goodssku_emb_bert_di.py:84-87)."""
    v = np.asarray(vec, np.float32)
    if normalize:
        n = float(np.linalg.norm(v))
        if n > 0:
            v = v / n
    return "[" + ",".join(str(float(x)) for x in v) + "]"


def parse_embedding(s: str) -> np.ndarray:
    return np.asarray([float(x) for x in s.strip("[]").split(",")],
                      np.float32)


def incremental_export(
    df: pd.DataFrame,
    embed_fn: Callable[[pd.DataFrame], Dict[str, np.ndarray]],
    sink: TableSink,
    key_col: str = "goods_sku",
    emb_col: str = "embedding",
    dt: Optional[str] = None,
    normalize: bool = True,
    buffer_rows: int = 1000,
) -> int:
    """Embed only keys missing from the sink; returns #rows written.

    ``embed_fn(sub_df) -> {key: vector}`` lets text/cv/fasttext jobs plug in
    their embedder; buffered appends mirror the reference's chunks of 1000.
    """
    existing = sink.existing_keys(key_col)
    todo = df[~df[key_col].astype(str).isin(existing)]
    written = 0
    for s in range(0, len(todo), buffer_rows):
        chunk = todo.iloc[s: s + buffer_rows]
        embs = embed_fn(chunk)
        rows = []
        for key, vec in embs.items():
            row = {key_col: str(key),
                   emb_col: format_embedding(vec, normalize)}
            if dt is not None:
                row["dt"] = dt
            rows.append(row)
        if rows:
            sink.append(pd.DataFrame(rows))
            written += len(rows)
    return written


def bulk_export(
    df: pd.DataFrame,
    embedders: Dict[str, Callable[[pd.DataFrame], Dict[str, np.ndarray]]],
    sink: TableSink,
    key_col: str = "goods_sku",
    normalize: bool = True,
) -> pd.DataFrame:
    """Run several embedders over all keys and outer-merge columns
    (goodssku_emb.py builds fasttext/bert/cv columns then outer-merges
    :183-195). Overwrites the sink with the merged table."""
    merged: Optional[pd.DataFrame] = None
    for name, embed_fn in embedders.items():
        embs = embed_fn(df)
        part = pd.DataFrame(
            {key_col: [str(k) for k in embs],
             f"{name}_emb": [format_embedding(v, normalize)
                             for v in embs.values()]})
        merged = part if merged is None else merged.merge(
            part, on=key_col, how="outer")
    if merged is None:
        merged = pd.DataFrame(columns=[key_col])
    sink.overwrite(merged)
    return merged
