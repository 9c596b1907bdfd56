"""Similar-SKU serving jobs — batched TPU retrieval + KV writes.

Reproduces the three reference serving pipelines (SURVEY.md §2.4) on top of
the SimilarityEngine:

* ``nlp_similar_job``        <- nlp_infer.py:105-172 — text embeddings,
  normalize+IP, k=13, th=0.9, no category filter; write
  ``dj_similar:{spu_sn}`` = comma-joined neighbor spu_sns, TTL (default 7d).
* ``multimodal_similar_job`` <- multimodal_infer.py:103-159 — fused 2560-d
  embeddings, **un-normalized L2** search, top-13, no threshold.
* ``daodian_similar_job``    <- daodian_infer.py:329-392 (+ the _v2 variants)
  — per-area: fastText text side (th=-0.6, same-lv1, cap 100) + CV image
  side (k=26, th=0.15, same-lv2), merged cv-first; keys either
  ``{spu_sn}`` (v1) or ``{yyyymmdd}:{spu_sn}`` (v2 date-keyed, TTL 1.5d);
  the v2 "recent days" history window keeps only neighbors whose dt equals
  the target date.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
from multimodalsimilar_tpu.retrieval.filters import FilterRules
from multimodalsimilar_tpu.pipelines.sinks import KVSink

WEEK = 7 * 24 * 3600
DAY_AND_HALF = int(1.5 * 24 * 3600)


def norm_dt(v) -> str:
    """'2026-08-16', '20260816', or date objects all compare equal — the
    reference mixes raw SQL dt values with compacted key dates
    (daodian_infer_v2_recent_days.py:242 vs :342); comparing them verbatim
    would silently filter every neighbor out."""
    return "".join(ch for ch in str(v) if ch.isdigit())


@dataclasses.dataclass
class DaodianAreaIndex:
    """One area's hot retrieval state — built identically by the batch job
    (daodian_similar_job) and the online daemon (pipelines/daodian_serving),
    so the two can never drift on engines, depths, or filter rules."""
    area: pd.DataFrame                      # the area's rows, reset index
    text_engine: SimilarityEngine           # fastText sentence vectors
    k_text: int
    text_rules: FilterRules
    cv_rows: pd.DataFrame                   # rows with a CV embedding
    cv_engine: Optional[SimilarityEngine]   # None when no row has one
    k_cv: int
    cv_rules: Optional[FilterRules]


def build_area_index(
    area: pd.DataFrame,
    embed_titles: Callable[[Sequence[str]], np.ndarray],
    sku_embs: Dict[str, np.ndarray],
    key_col: str = "spu_sn",
    title_col: str = "title",
    lv1_col: str = "first_level_category_id",
    lv2_col: str = "second_level_category_id",
    nlp_score_th: float = -0.6,
    cv_score_th: float = 0.15,
    ann_cnt_nlp: int = 100,
    ann_cnt_cv: int = 26,
    dt_col: Optional[str] = None,
    require_dt: Optional[str] = None,       # already norm_dt'd
    recent_days: int = 7,
    mesh=None,
    backend: str = "xla",
    approx_recall: Optional[float] = None,
) -> DaodianAreaIndex:
    """Both arms' engines + the reference variant's retrieval depths/rules
    for ONE area (daodian_infer.py:361-375; see daodian_similar_job's
    docstring for the v1/v2 depth semantics)."""
    windowed = bool(require_dt and dt_col)
    text_emb = embed_titles(area[title_col].astype(str).tolist())
    rules_kw = dict(require_dt=require_dt) if windowed else {}
    if windowed:
        k_text = max(1, min(len(area), len(area) // recent_days))
    else:
        k_text = len(area)
    text_engine = SimilarityEngine(
        text_emb, area[key_col].tolist(), area[lv1_col].tolist(),
        dts=([norm_dt(v) for v in area[dt_col]] if dt_col else None),
        metric="ip", normalize=True, mesh=mesh, backend=backend,
        approx_recall=approx_recall)
    # +1: the reference appends, then breaks once len > ann_cnt
    text_rules = FilterRules(score_threshold=nlp_score_th,
                             same_category=True,
                             max_neighbors=ann_cnt_nlp + 1, **rules_kw)
    have = [k in sku_embs for k in area[key_col]]
    cv_rows = area[have].reset_index(drop=True)
    cv_engine = cv_rules = None
    k_cv = 0
    if len(cv_rows):
        if windowed:
            k_cv = max(1, min(len(cv_rows), len(cv_rows) // recent_days))
            cv_cap = ann_cnt_cv + 1
        else:
            k_cv = min(ann_cnt_cv, len(cv_rows))
            cv_cap = None        # v1 CV loop never breaks
        cv_emb = np.stack([sku_embs[k] for k in cv_rows[key_col]])
        cv_engine = SimilarityEngine(
            cv_emb, cv_rows[key_col].tolist(), cv_rows[lv2_col].tolist(),
            dts=([norm_dt(v) for v in cv_rows[dt_col]]
                 if dt_col else None),
            metric="ip", normalize=True, mesh=mesh, backend=backend,
            approx_recall=approx_recall)
        cv_rules = FilterRules(score_threshold=cv_score_th,
                               same_category=True, max_neighbors=cv_cap,
                               **rules_kw)
    return DaodianAreaIndex(area=area, text_engine=text_engine,
                            k_text=k_text, text_rules=text_rules,
                            cv_rows=cv_rows, cv_engine=cv_engine,
                            k_cv=k_cv, cv_rules=cv_rules)


def area_merged_map(index: DaodianAreaIndex) -> Dict[str, List[str]]:
    """The area's production answer: cv-first-then-text merged neighbor
    map (daodian_infer.py:368-375)."""
    nlp_map = index.text_engine.similar_map(index.k_text, index.text_rules)
    cv_map = (index.cv_engine.similar_map(index.k_cv, index.cv_rules)
              if index.cv_engine is not None else {})
    return SimilarityEngine.merge(cv_map, nlp_map)


def write_neighbor_map(sink: KVSink, neighbor_map: Dict[str, List[str]],
                       ttl_seconds: int, key_fn: Callable[[str], str]
                       ) -> int:
    """CSV-string values, empty lists skipped (nlp_infer.py:159-171).
    Keys/neighbors are stringified — integer spu_sn columns (pandas reads
    numeric ids as int64) must serialize like the reference's str keys."""
    items = {key_fn(str(k)): ",".join(str(x) for x in v)
             for k, v in neighbor_map.items() if v}
    sink.set_many(items, ttl_seconds)
    return len(items)


def nlp_similar_job(df: pd.DataFrame, embed_texts, sink: KVSink,
                    text_col: str = "spu_name", key_col: str = "spu_sn",
                    k: int = 13, score_th: float = 0.9,
                    ttl_seconds: int = WEEK, mesh=None,
                    backend: str = "xla",
                    approx_recall: Optional[float] = None) -> int:
    """Divergence kept ON PURPOSE: the reference loop (nlp_infer.py:161-163)
    has no self/dedup check beyond skipping rank 0, so with duplicate
    spu_sn rows it can write a key as its own neighbor; we always drop
    same-key neighbors and dedup (see retrieval/filters.py docstring)."""
    emb = embed_texts(df[text_col].astype(str).tolist())
    engine = SimilarityEngine(emb, df[key_col].tolist(), metric="ip",
                              normalize=True, mesh=mesh, backend=backend,
                              approx_recall=approx_recall)
    nmap = engine.similar_map(k, FilterRules(score_threshold=score_th,
                                             same_category=False))
    return write_neighbor_map(sink, nmap, ttl_seconds,
                              lambda s: f"dj_similar:{s}")


def multimodal_similar_job(df: pd.DataFrame, embeddings: np.ndarray,
                           sink: KVSink, key_col: str = "spu_sn",
                           k: int = 13, ttl_seconds: int = WEEK,
                           mesh=None, backend: str = "xla",
                           approx_recall: Optional[float] = None) -> int:
    """L2 metric on raw (un-normalized) fused embeddings, no threshold
    (multimodal_infer.py:140-159)."""
    engine = SimilarityEngine(embeddings, df[key_col].tolist(),
                              metric="l2", normalize=False, mesh=mesh,
                              backend=backend,
                              approx_recall=approx_recall)
    nmap = engine.similar_map(k, FilterRules(same_category=False))
    return write_neighbor_map(sink, nmap, ttl_seconds,
                              lambda s: f"dj_similar:{s}")


def daodian_similar_job(
    df: pd.DataFrame,
    embed_titles: Callable[[Sequence[str]], np.ndarray],   # fastText side
    embed_skus: Callable[[pd.DataFrame], Dict[str, np.ndarray]],  # CV side
    sink: KVSink,
    area_col: str = "area_id",
    key_col: str = "spu_sn",
    title_col: str = "title",
    lv1_col: str = "first_level_category_id",
    lv2_col: str = "second_level_category_id",
    nlp_score_th: float = -0.6,       # daodian_infer.py:79-82
    cv_score_th: float = 0.15,
    ann_cnt_nlp: int = 100,
    ann_cnt_cv: int = 26,
    ttl_seconds: Optional[int] = None,   # default: WEEK for v1 keys,
                                         # DAY_AND_HALF when date-keyed
                                         # (daodian_infer_v2_*.py:342)
    date_key: Optional[str] = None,   # 'yyyymmdd' -> v2 date-keyed writes
    dt_col: Optional[str] = None,     # with a target date: v2 history filter
    target_dt: Optional[str] = None,  # dt value neighbors must carry (raw
                                      # --dt, e.g. '2026-08-16'; the KV key
                                      # uses the compacted date_key instead —
                                      # daodian_infer_v2_recent_days.py:242
                                      # vs :342). Defaults to date_key.
    recent_days: int = 7,             # v2 window (daodian_infer_v2_recent_days)
    mesh=None,
    backend: str = "xla",
    approx_recall: Optional[float] = None,
) -> Dict[str, List[str]]:
    """Per-area fastText + CV retrieval, cv-first merge, KV write.

    Retrieval depths and caps follow the reference variant selected by the
    date arguments:

    * v1 / v2_today (no ``dt_col``): text searches the whole area
      (k=len(arr), daodian_infer.py:230), CV searches ann_cnt_cv=26
      (daodian_infer.py:302); the CV filter loop has no break, the text
      loop breaks only after exceeding ann_cnt_nlp (daodian_infer.py:244-246)
      so its true cap is ann_cnt_nlp+1.
    * v2_recent_days (``dt_col`` set): BOTH sides search
      k = len(arr)//recent_days (daodian_infer_v2_recent_days.py:235,310) —
      the corpus holds ``recent_days`` days of history and only neighbors
      whose dt equals ``date_key`` survive; both loops break after exceeding
      their ann_cnt (:248-250, :323-325), so caps are ann_cnt+1.

    Returns the merged neighbor map (all areas) for inspection/testing.
    """
    merged_all: Dict[str, List[str]] = {}
    key_fn = ((lambda s: f"{date_key}:{s}") if date_key
              else (lambda s: s))
    if ttl_seconds is None:
        ttl_seconds = DAY_AND_HALF if date_key else WEEK
    require_dt = target_dt if target_dt is not None else date_key
    windowed = bool(require_dt and dt_col)
    require_dt = norm_dt(require_dt) if windowed else require_dt
    for area_id in df[area_col].unique():
        area = df[df[area_col] == area_id].reset_index(drop=True)
        index = build_area_index(
            area, embed_titles, embed_skus(area), key_col=key_col,
            title_col=title_col, lv1_col=lv1_col, lv2_col=lv2_col,
            nlp_score_th=nlp_score_th, cv_score_th=cv_score_th,
            ann_cnt_nlp=ann_cnt_nlp, ann_cnt_cv=ann_cnt_cv,
            dt_col=dt_col, require_dt=require_dt if windowed else None,
            recent_days=recent_days, mesh=mesh, backend=backend,
            approx_recall=approx_recall)
        merged = area_merged_map(index)
        merged_all.update(merged)
        write_neighbor_map(sink, merged, ttl_seconds, key_fn)
    return merged_all
