"""Sampling strategies: class-balanced weights, weighted sampling, pair
sampling for the Siamese model.

* ``class_balance_weights`` <- get_class_weights
  (nlp_classifier_train_daodian_v2.py:58-72): per-row weight = 1 / freq(label)
  — the inverse-frequency weights fed to WeightedRandomSampler (:96-97).
* ``WeightedSampler`` — replacement sampling by those weights (epoch-sized).
* ``PairSampler`` <- NlpSTDataset (nlp_st_datasets.py:13-100): coin-flip
  positive/negative pair construction over the tag/lv2/lv1 hierarchy. The
  reference's ``sample(random_state=42)`` makes every lookup return the *same*
  row each epoch (a latent bug per SURVEY.md §7) — here sampling uses a real
  RNG. Bucket indices are precomputed once (the reference re-scans the whole
  DataFrame per item per epoch).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd


def class_balance_weights(labels: np.ndarray) -> np.ndarray:
    """weight[i] = 1 / count(labels == labels[i]) (inverse frequency)."""
    labels = np.asarray(labels)
    _, inverse, counts = np.unique(labels, return_inverse=True,
                                   return_counts=True)
    return (1.0 / counts)[inverse]


class WeightedSampler:
    """Sample indices with replacement, P(i) proportional to weights[i] (the
    torch WeightedRandomSampler contract)."""

    def __init__(self, weights: np.ndarray, num_samples: Optional[int] = None,
                 seed: int = 0):
        self.p = np.asarray(weights, np.float64)
        self.p = self.p / self.p.sum()
        self.num_samples = num_samples or len(self.p)
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        yield from self.rng.choice(len(self.p), size=self.num_samples,
                                   replace=True, p=self.p)

    def __len__(self) -> int:
        return self.num_samples


class PairSampler:
    """Online positive/negative pair construction for Siamese training.

    Thresholds follow nlp_st_datasets.py:17-19 — tag 0.7 / lv2 0.2 / lv1 0.1.
    For an anchor row:
      P(positive) = 0.5; positive drawn from same-lv1 (r<0.1), same-lv2
      (r<0.2, or tag missing), else same-tag bucket; negative drawn from
      same-lv2-diff-tag (r<0.1), same-lv1-diff-lv2 (r<0.2), else diff-lv1.
      Any failed lookup falls back to a (self, self, positive) pair
      (nlp_st_datasets.py:89-91).
    """

    def __init__(self, df: pd.DataFrame, seed: int = 0,
                 tag_th: float = 0.7, lv2_th: float = 0.2, lv1_th: float = 0.1):
        self.df = df.reset_index(drop=True)
        self.rng = np.random.default_rng(seed)
        self.tag_th, self.lv2_th, self.lv1_th = tag_th, lv2_th, lv1_th
        self._by_tag = self._index(self.df, "tag_id")
        self._by_lv2 = self._index(self.df, "lv2_category_id")
        self._by_lv1 = self._index(self.df, "lv1_category_id")
        self._titles = self.df["title"].astype(str).values
        self._tag_vals = self.df["tag_id"].values
        self._lv2_vals = self.df["lv2_category_id"].values
        self._lv1_vals = self.df["lv1_category_id"].values
        # the reference excludes rows sharing the anchor's sku_sn_name from
        # every POSITIVE bucket (nlp_st_datasets.py:40,46,52); without the
        # column, excluding the anchor row itself is the closest reading
        self._sku = (self.df["sku_sn_name"].values
                     if "sku_sn_name" in self.df.columns else None)

    @staticmethod
    def _index(df: pd.DataFrame, col: str) -> Dict:
        return {k: np.asarray(v) for k, v in
                df.groupby(col).indices.items()}

    def _not_anchor_sku(self, cands: Optional[np.ndarray], idx: int
                        ) -> Optional[np.ndarray]:
        """Positive-branch exclusion: drop rows sharing the anchor's
        sku_sn_name (or the anchor row itself when the column is absent)."""
        if cands is None or len(cands) == 0:
            return None
        if self._sku is not None:
            out = cands[self._sku[cands] != self._sku[idx]]
        else:
            out = cands[cands != idx]
        return out if len(out) else None

    def _not_query_title(self, cands: Optional[np.ndarray], query: str
                         ) -> Optional[np.ndarray]:
        """Negative-branch exclusion: the reference filters
        title != query (nlp_st_datasets.py:66,75,83) — a duplicate of the
        anchor's own title must never be labeled dissimilar."""
        if cands is None or len(cands) == 0:
            return None
        out = cands[self._titles[cands] != str(query)]
        return out if len(out) else None

    @staticmethod
    def _pick(cands: Optional[np.ndarray], rng: np.random.Generator
              ) -> Optional[int]:
        if cands is None or len(cands) == 0:
            return None
        return int(rng.choice(cands))

    def sample_pair(self, idx: int,
                    rng: Optional[np.random.Generator] = None
                    ) -> Tuple[str, str, int]:
        """Return (query_title, pair_title, label) for anchor row idx.

        ``rng`` overrides the sampler's own stream — PairTextSource passes
        a per-(seed, epoch) generator so a periodic eval pass draws the
        SAME fixed pair set every time (otherwise eval metrics fluctuate
        from pair resampling, not model change), while train epochs still
        resample like the reference's per-epoch DataLoader draws."""
        rng = rng if rng is not None else self.rng
        row = self.df.iloc[idx]
        query = row["title"]
        tag, lv2, lv1 = row["tag_id"], row["lv2_category_id"], \
            row["lv1_category_id"]
        title = None
        if rng.uniform() > 0.5:                # positive
            r = rng.uniform()
            if r < self.lv1_th:
                j = self._pick(self._not_anchor_sku(self._by_lv1.get(lv1),
                                                    idx), rng)
            elif r < self.lv2_th or tag == -1:
                j = self._pick(self._not_anchor_sku(self._by_lv2.get(lv2),
                                                    idx), rng)
            elif r < self.tag_th:
                # same-tag branch requires a bucket of >2 non-anchor rows
                # (nlp_st_datasets.py:53)
                cands = self._not_anchor_sku(self._by_tag.get(tag), idx)
                j = self._pick(cands, rng) if cands is not None \
                    and len(cands) > 2 else None
            else:
                j = None
            label = 1
            if j is not None:
                title = self.df.iloc[j]["title"]
        else:                                   # negative
            r = rng.uniform()
            j = None
            if r < self.lv1_th and tag != -1:
                cands = self._by_lv2.get(lv2)
                if cands is not None:
                    cands = cands[self._tag_vals[cands] != tag]
                    j = self._pick(self._not_query_title(cands, query), rng)
            elif r < self.lv2_th:
                cands = self._by_lv1.get(lv1)
                if cands is not None:
                    cands = cands[self._lv2_vals[cands] != lv2]
                    j = self._pick(self._not_query_title(cands, query), rng)
            elif r < self.tag_th:
                # diff-lv1, uniform over the complement of one lv1 bucket.
                # Rejection sampling: the complement is nearly the whole
                # frame, so ~1 expected draw — the old arange+mask scan was
                # O(N) per draw (days per epoch at 1M rows on this host).
                # Same distribution: uniform over the valid set.
                n = len(self.df)
                qs = str(query)
                for _ in range(32):
                    cand = int(rng.integers(n))
                    if (self._lv1_vals[cand] != lv1
                            and self._titles[cand] != qs):
                        j = cand
                        break
                else:
                    # pathological (one lv1 bucket ~ the whole frame):
                    # exact complement scan, correctness over speed
                    cands = np.flatnonzero(self._lv1_vals != lv1)
                    j = self._pick(self._not_query_title(cands, query), rng)
            label = 0
            if j is not None:
                title = self.df.iloc[j]["title"]
        if title is None:
            title, label = query, 1            # fallback self-pair positive
        return query, title, label
