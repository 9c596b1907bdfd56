"""Business-rule neighbor filtering (vectorized numpy).

The reference post-processes FAISS results with per-row Python loops
(daodian_infer.py:233-246, :305-315; nlp_infer.py:161-169). Same semantics
here, applied to the (scores, indices) matrices the k-NN engine returns:

  * drop self (the query row itself, and any neighbor with the same key),
  * score threshold (``score > th`` — strict, like the reference),
  * same-category constraint (lv1 for text, lv2 for CV),
  * dedup while preserving rank order,
  * cap at ``max_neighbors``,
  * optional date-window rule: neighbor kept only if its ``dt`` equals the
    query's target date (daodian_infer_v2_recent_days.py:242-251).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class FilterRules:
    score_threshold: Optional[float] = None   # keep score > threshold
    same_category: bool = True
    max_neighbors: Optional[int] = None
    require_dt: Optional[str] = None          # keep neighbors with this dt


def filter_neighbors(
    scores: np.ndarray,            # [Q, k] (IP: higher better)
    indices: np.ndarray,           # [Q, k] corpus row ids
    keys: Sequence,                # corpus row -> external key (spu_sn)
    categories: Optional[Sequence] = None,
    rules: FilterRules = FilterRules(),
    query_rows: Optional[np.ndarray] = None,   # corpus row of each query
    dts: Optional[Sequence] = None,
) -> Dict[object, List[object]]:
    """Return {query_key: [neighbor_keys ranked]} under the rules.

    ``query_rows`` defaults to arange (self-search, the reference's usage).
    """
    keys = np.asarray(keys, dtype=object)
    cats = np.asarray(categories) if categories is not None else None
    dt_arr = np.asarray(dts, dtype=object) if dts is not None else None
    q = scores.shape[0]
    if query_rows is None:
        query_rows = np.arange(q)
    out: Dict[object, List[object]] = {}
    n = len(keys)
    for qi in range(q):
        row = query_rows[qi]
        me = keys[row]
        picked: List[object] = []
        seen = {me}
        for sc, ci in zip(scores[qi], indices[qi]):
            if ci < 0 or ci >= n or ci == row:
                continue
            if rules.score_threshold is not None and not (
                    sc > rules.score_threshold):
                continue
            if rules.same_category and cats is not None and \
                    cats[ci] != cats[row]:
                continue
            if rules.require_dt is not None and dt_arr is not None and \
                    dt_arr[ci] != rules.require_dt:
                continue
            key = keys[ci]
            if key in seen:
                continue
            seen.add(key)
            picked.append(key)
            if rules.max_neighbors is not None and \
                    len(picked) >= rules.max_neighbors:
                break
        out[me] = picked
    return out


def merge_neighbor_maps(primary: Dict, secondary: Dict,
                        cap: Optional[int] = None) -> Dict:
    """cv-first-then-nlp merge (daodian_infer.py:368-375): primary's
    neighbors first, then secondary's not already present."""
    out = {}
    for key in set(primary) | set(secondary):
        merged = list(primary.get(key, []))
        have = set(merged)
        for k2 in secondary.get(key, []):
            if k2 not in have:
                merged.append(k2)
                have.add(k2)
        out[key] = merged[:cap] if cap else merged
    return out
