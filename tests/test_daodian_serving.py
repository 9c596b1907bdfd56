"""serve --tower daodian: the merged production answer, online.

Pins the VERDICT round-3 gap (#4 'no online merged daodian answer'):
one request returns what the nightly batch job would have published for
that key (daodian_infer.py:361-392) — equality is asserted against
daodian_similar_job itself on the same corpus, arms and thresholds.
"""

import base64
import json
import pickle
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.pipelines.daodian_serving import (
    DaodianService, make_daodian_server)
from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job
from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink


def _embed_titles_factory(dim=16, seed=7):
    """Deterministic per-title vectors (a stand-in fastText table: same
    title -> same vector, similar titles share tokens -> correlated)."""
    rng = np.random.default_rng(seed)
    vocab = {}

    def vec_for(tok):
        if tok not in vocab:
            vocab[tok] = rng.standard_normal(dim).astype(np.float32)
        return vocab[tok]

    def embed(titles):
        out = []
        for t in titles:
            toks = str(t).split() or ["_"]
            out.append(np.mean([vec_for(x) for x in toks], axis=0))
        return np.stack(out)

    return embed


def _corpus():
    # two areas; area 1 has a same-title pair per lv1 category, area 2 is
    # a small mixed set; skus 10/11 share CV-similar embeddings
    return pd.DataFrame({
        "area_id": [1, 1, 1, 1, 2, 2, 2],
        "spu_sn": ["a1", "a2", "b1", "b2", "c1", "c2", "c3"],
        "sku": ["10", "11", "12", "13", "20", "21", "22"],
        "title": ["苹果 水果", "苹果 鲜果", "牛奶 乳品", "牛奶 盒装",
                  "可乐 饮料", "汽水 饮料", "果汁 饮料"],
        "first_level_category_id": [5, 5, 6, 6, 7, 7, 7],
        "second_level_category_id": [51, 51, 61, 61, 71, 71, 72]})


def _sku_embs_factory(dim=8, seed=3):
    rng = np.random.default_rng(seed)
    base = {}

    def embed_skus(area_df):
        out = {}
        for sp, sku in zip(area_df["spu_sn"], area_df["sku"]):
            if sku == "13":        # one sku with no readable image
                continue
            if sku not in base:
                # skus 10/11 near-identical (the similar pair)
                if sku == "11":
                    base[sku] = base.setdefault(
                        "10", rng.standard_normal(dim).astype(np.float32)
                    ) + 0.01 * rng.standard_normal(dim).astype(np.float32)
                else:
                    base[sku] = rng.standard_normal(dim).astype(np.float32)
            out[str(sp)] = base[sku]
        return out

    return embed_skus


def test_daodian_service_matches_batch_job():
    """The service's per-key answer IS the nightly job's published list —
    same corpus, same arms, byte-equal neighbor sequences."""
    df = _corpus()
    embed_titles = _embed_titles_factory()
    embed_skus = _sku_embs_factory()
    sink = InMemoryKVSink()
    expected = daodian_similar_job(df, embed_titles, embed_skus, sink)

    svc = DaodianService(df, embed_titles, embed_skus)
    svc.warm()
    for key in df["spu_sn"]:
        got = svc.similar_key(key)
        assert got["neighbors"] == [str(x) for x in expected.get(key, [])]
    # and the published KV value matches the service answer too
    for k, (v, _exp) in sink.data.items():
        assert v == ",".join(svc.similar_key(k)["neighbors"])


def test_daodian_service_unknown_key_and_area():
    svc = DaodianService(_corpus(), _embed_titles_factory(),
                         _sku_embs_factory())
    with pytest.raises(KeyError):
        svc.similar_key("nope")
    with pytest.raises(KeyError):
        svc.similar_query("苹果 水果", 5, 51, area_id="99")


def test_daodian_service_adhoc_query_rules():
    """Unseen queries follow the job's rules: same-lv1 for the text arm,
    threshold, dedup — a matching title in the right category ranks its
    corpus row first; the wrong lv1 returns nothing."""
    svc = DaodianService(_corpus(), _embed_titles_factory(),
                         _sku_embs_factory())
    hit = svc.similar_query("苹果 水果", lv1=5, lv2=51, area_id="1")
    keys = [n["key"] for n in hit["neighbors"]]
    assert keys and keys[0] == "a1"          # identical title wins
    assert "b1" not in keys                   # other lv1 filtered
    miss = svc.similar_query("苹果 水果", lv1=6, lv2=61, area_id="1")
    assert [n["key"] for n in miss["neighbors"]] \
        == [k for k in [n["key"] for n in miss["neighbors"]]
            if k in ("b1", "b2")]             # only lv1=6 rows may appear


def test_daodian_service_update_invalidates_area():
    """An online upsert changes the NEXT answer: a new row duplicating
    a1's title joins its neighbor list; the other area is untouched."""
    df = _corpus()
    embed_titles = _embed_titles_factory()
    embed_skus = _sku_embs_factory()
    svc = DaodianService(df, embed_titles, embed_skus)
    before_a1 = svc.similar_key("a1")["neighbors"]
    before_c1 = svc.similar_key("c1")["neighbors"]
    out = svc.update([{
        "spu_sn": "a9", "area_id": "1", "sku": "19",
        "title": "苹果 水果",
        "first_level_category_id": 5, "second_level_category_id": 51}])
    assert out["areas_invalidated"] == ["1"]
    after_a1 = svc.similar_key("a1")["neighbors"]
    assert "a9" in after_a1 and "a9" not in before_a1
    assert svc.similar_key("c1")["neighbors"] == before_c1
    # the upserted key answers with the production shape too
    assert "a1" in svc.similar_key("a9")["neighbors"]
    # equality with a batch job over the UPDATED corpus still holds
    df2 = pd.concat([df, pd.DataFrame([{
        "area_id": 1, "spu_sn": "a9", "sku": "19", "title": "苹果 水果",
        "first_level_category_id": 5, "second_level_category_id": 51}])],
        ignore_index=True)
    expected = daodian_similar_job(df2, embed_titles, embed_skus,
                                   InMemoryKVSink())
    for key in df2["spu_sn"]:
        assert svc.similar_key(key)["neighbors"] == \
            [str(x) for x in expected.get(key, [])]


def test_daodian_service_replaces_known_key():
    """Updating an existing key replaces its row (re-embed), not appends."""
    svc = DaodianService(_corpus(), _embed_titles_factory(),
                         _sku_embs_factory())
    n0 = svc.n
    svc.update([{"spu_sn": "a1", "area_id": "1", "sku": "10",
                 "title": "牛奶 乳品",
                 "first_level_category_id": 6,
                 "second_level_category_id": 61}])
    assert svc.n == n0
    keys = svc.similar_key("a1")["neighbors"]
    assert "b1" in keys or "b2" in keys       # moved category: dairy now


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_daodian_http_end_to_end(tmp_path):
    """Full HTTP drive with a REAL trained fastText arm and a real (random
    init) CV tower over decoded images: /healthz, per-key merged answer
    equal to the batch job, ad-hoc image_b64 query, /update, 400s."""
    import cv2

    from multimodalsimilar_tpu.models.fasttext import train_supervised
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.cli.embedders import _load_cv_tower

    df = _corpus()
    ft = train_supervised(df["title"].tolist() * 5,
                          list(df["first_level_category_id"]) * 5,
                          dim=8, epochs=2, bucket=500)

    def embed_titles(titles):
        return ft.get_sentence_vector(list(titles))

    # real image files: {img_root}/{sku}/0.jpg solid colors
    img_root = tmp_path / "imgs"
    colors = {"10": (250, 10, 10), "11": (245, 15, 12),
              "12": (10, 250, 10), "20": (10, 10, 250),
              "21": (12, 14, 245), "22": (128, 128, 128)}
    for sku, c in colors.items():
        d = img_root / sku
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "0.jpg"),
                    np.full((40, 40, 3), c[::-1], np.uint8))

    import argparse
    args = argparse.Namespace(backbone="tiny", fc_dim=16, image_size=32,
                              emb_cache=None, img_root=str(img_root),
                              sku_col="sku", key_col="spu_sn")
    model, variables = _load_cv_tower(args, None, 4)
    emb = ImageEmbedder(model, variables, image_size=32,
                        cache_path_for_key=lambda k: str(
                            img_root / str(k) / "emb.txt"),
                        emb_dim=16)

    def embed_skus(area_df):
        from multimodalsimilar_tpu.cli.similar import _sku_to_spusn
        return _sku_to_spusn(area_df, emb, args)

    def embed_query_image(image):
        return emb.embed_batch(np.asarray(image)[None])[0]

    svc = DaodianService(df, embed_titles, embed_skus,
                         embed_query_image=embed_query_image)
    svc.warm()
    expected = daodian_similar_job(df, embed_titles, embed_skus,
                                   InMemoryKVSink())
    httpd = make_daodian_server(svc, port=0, image_size=32)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["corpus"] == len(df)
        base = f"http://127.0.0.1:{port}"
        # per-key merged answers == the nightly job, over HTTP
        for key in df["spu_sn"]:
            st, got = _post(f"{base}/similar", {"key": key})
            assert st == 200
            assert got["neighbors"] == \
                [str(x) for x in expected.get(key, [])], key
        # ad-hoc image+text query: sku 10's own image must surface its
        # CV-similar pair (sku 11 / spu a2) via the image arm
        img = cv2.imread(str(img_root / "10" / "0.jpg"))
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        st, got = _post(f"{base}/similar", {
            "title": "苹果 水果", "lv1": 5, "lv2": 51, "area_id": "1",
            "image_b64": base64.b64encode(buf.tobytes()).decode()})
        assert st == 200
        keys = [n["key"] for n in got["neighbors"]]
        assert "a1" in keys and "a2" in keys
        assert got["cv_neighbors"] >= 1
        # /update over HTTP
        st, got = _post(f"{base}/update", {"items": [{
            "spu_sn": "z1", "area_id": "2", "sku": "22",
            "title": "果汁 饮料", "first_level_category_id": 7,
            "second_level_category_id": 72}]})
        assert st == 200 and got["corpus"] == len(df) + 1
        st, got = _post(f"{base}/similar", {"key": "z1"})
        assert st == 200 and "c3" in got["neighbors"]
        # 400s: bad ad-hoc fields, bad update shape; 404: unknown key
        st, _ = _post(f"{base}/similar", {"title": "x"})
        assert st == 400
        st, _ = _post(f"{base}/update", {"items": "nope"})
        assert st == 400
        st, _ = _post(f"{base}/similar", {"key": "missing-key"})
        assert st == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_cli_serve_daodian_build(tmp_path):
    """The CLI construction path: parser defaults + --text_only build a
    warm service from a csv + pickled fastText model (the config-matrix
    style drive, without the blocking serve loop)."""
    from multimodalsimilar_tpu.cli import build_parser
    from multimodalsimilar_tpu.cli.serve import _build_daodian_service
    from multimodalsimilar_tpu.models.fasttext import train_supervised

    df = _corpus()
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    ft = train_supervised(df["title"].tolist() * 5,
                          list(df["first_level_category_id"]) * 5,
                          dim=8, epochs=2, bucket=500)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    args = build_parser().parse_args(
        ["serve", "--tower", "daodian", "--data", data,
         "--fasttext_model", ft_path, "--text_only"])
    svc = _build_daodian_service(args)
    svc.warm()
    assert svc.n == len(df)
    got = svc.similar_key("a1")
    expected = daodian_similar_job(
        df, lambda tt: ft.get_sentence_vector(list(tt)),
        lambda a: {}, InMemoryKVSink())
    assert got["neighbors"] == [str(x) for x in expected.get("a1", [])]


def test_cli_serve_daodian_requires_cv_or_text_only(tmp_path):
    from multimodalsimilar_tpu.cli import build_parser
    from multimodalsimilar_tpu.cli.serve import _build_daodian_service
    from multimodalsimilar_tpu.models.fasttext import train_supervised

    df = _corpus()
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    ft = train_supervised(df["title"].tolist(), ["x"] * len(df), dim=4,
                          epochs=1, bucket=100)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    args = build_parser().parse_args(
        ["serve", "--tower", "daodian", "--data", data,
         "--fasttext_model", ft_path])
    with pytest.raises(SystemExit, match="cv_checkpoint"):
        _build_daodian_service(args)


def test_daodian_service_numeric_keys_match_batch_job():
    """Review finding (round 4): pandas reads numeric spu_sn as int64 —
    the merged maps' keys and the request's str key must still match (the
    original code returned empty neighbors for EVERY key on an int-keyed
    corpus)."""
    df = _corpus()
    df["spu_sn"] = [101, 102, 201, 202, 301, 302, 303]   # int64 keys
    df["sku"] = df["sku"].astype(int)
    embed_titles = _embed_titles_factory()
    embed_skus = _sku_embs_factory()
    expected = daodian_similar_job(df, embed_titles, embed_skus,
                                   InMemoryKVSink())
    svc = DaodianService(df, embed_titles, embed_skus)
    svc.warm()
    hits = 0
    for key in df["spu_sn"]:
        got = svc.similar_key(key)            # int request key strs fine
        assert got["neighbors"] == [str(x) for x in expected.get(key, [])]
        hits += bool(got["neighbors"])
    assert hits > 0                            # non-vacuous


def test_daodian_service_multi_area_listings():
    """The upsert unit is the (area, key) ROW: a spu may list in several
    areas (the batch job's per-area pull does). Upserting a1 into area 2
    ADDS a listing there; area 1's row is untouched; each area answers
    with ITS listing and area_id disambiguates (self-review round 2: the
    one-area-per-key map 404'd multi-area keys with an explicit
    area_id)."""
    df = _corpus()
    embed_titles = _embed_titles_factory()
    embed_skus = _sku_embs_factory()
    svc = DaodianService(df, embed_titles, embed_skus)
    n0 = svc.n
    out = svc.update([{
        "spu_sn": "a1", "area_id": "2", "sku": "10",
        "title": "可乐 饮料",
        "first_level_category_id": 7, "second_level_category_id": 71}])
    assert svc.n == n0 + 1                  # second LISTING, not a move
    assert out["areas_invalidated"] == ["2"]
    in_area2 = svc.similar_key("a1", area_id="2")
    assert in_area2["area_id"] == "2" and "c1" in in_area2["neighbors"]
    in_area1 = svc.similar_key("a1", area_id="1")
    assert in_area1["area_id"] == "1" and in_area1["neighbors"] == ["a2"]
    # no area given: first sorted area (the old per-area scan order)
    assert svc.similar_key("a1")["area_id"] == "1"
    # equality with the batch job over the two-listing corpus
    df2 = pd.concat([df, pd.DataFrame([{
        "area_id": 2, "spu_sn": "a1", "sku": "10", "title": "可乐 饮料",
        "first_level_category_id": 7, "second_level_category_id": 71}])],
        ignore_index=True)
    daodian_similar_job(df2, embed_titles, embed_skus, InMemoryKVSink())
    # (the job keys its map per spu_sn so the two listings collapse
    # there; the service keeps them per area — the richer answer)


def test_daodian_service_same_key_two_areas_one_batch():
    """Self-review round 2: one batch carrying the same key for two
    areas must land one listing in EACH (per-(area, key) semantics), not
    duplicate within an area."""
    svc = DaodianService(_corpus(), _embed_titles_factory(),
                         _sku_embs_factory())
    n0 = svc.n
    svc.update([
        {"spu_sn": "z1", "area_id": "1", "sku": "19", "title": "苹果 水果",
         "first_level_category_id": 5, "second_level_category_id": 51},
        {"spu_sn": "z1", "area_id": "2", "sku": "19", "title": "可乐 饮料",
         "first_level_category_id": 7, "second_level_category_id": 71},
        # duplicate (area, key): last wins
        {"spu_sn": "z1", "area_id": "1", "sku": "19", "title": "苹果 鲜果",
         "first_level_category_id": 5, "second_level_category_id": 51},
    ])
    assert svc.n == n0 + 2
    a1 = svc._areas["1"]
    assert (a1["spu_sn"] == "z1").sum() == 1
    assert a1.loc[a1["spu_sn"] == "z1", "title"].iloc[0] == "苹果 鲜果"
    assert svc.similar_key("z1", area_id="2")["area_id"] == "2"


def test_daodian_rebuild_does_not_block_other_areas():
    """Round 4 (measured 26.7 s post-update first hit): area builds run
    OUTSIDE the state lock — while area 1 rebuilds (slow embed), readers
    of area 2 answer from their warm cache immediately."""
    import time

    gate = threading.Event()
    started = threading.Event()
    base_embed = _embed_titles_factory()
    slow_areas = {"on": False}

    def slow_embed(titles):
        if slow_areas["on"] and len(titles) > 1:   # area-corpus embeds
            started.set()               # rebuild reached its embed
            gate.wait(timeout=30)
        return base_embed(titles)

    svc = DaodianService(_corpus(), slow_embed, _sku_embs_factory())
    svc.warm()                          # fast: gate off
    slow_areas["on"] = True
    svc.update([{"spu_sn": "a9", "area_id": "1", "sku": "19",
                 "title": "苹果 水果", "first_level_category_id": 5,
                 "second_level_category_id": 51}], rebuild=False)

    results = {}

    def hit_area1():
        results["a1"] = svc.similar_key("a1")

    t = threading.Thread(target=hit_area1)
    t.start()
    # sync on the rebuild actually reaching its embed (a sleep here
    # flaked on the one-slow-CPU host — review finding)
    assert started.wait(timeout=30), "area-1 rebuild never started"
    t0 = time.perf_counter()
    got = svc.similar_key("c1")         # area 2: warm cache, must not wait
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"area-2 read stalled {dt:.1f}s behind area-1 rebuild"
    assert got["neighbors"]
    assert "a1" not in results          # area-1 rebuild still gated
    gate.set()
    t.join(timeout=30)
    assert "a9" in results["a1"]["neighbors"]     # rebuild landed


def test_daodian_cold_areas_build_concurrently():
    """Round 4 review: builds are serialized PER AREA — while area 1's
    build is blocked inside its embed, a cold area 2 builds to
    completion (a single global build lock stalled it)."""
    import time

    gate = threading.Event()
    started = threading.Event()
    base_embed = _embed_titles_factory()
    embed_lock = threading.Lock()       # factories aren't thread-safe

    def slow_embed(titles):
        with embed_lock:
            out = base_embed(titles)
        if any("苹果" in str(t) for t in titles):   # area 1 only
            started.set()
            gate.wait(timeout=30)
        return out

    base_skus = _sku_embs_factory()

    def embed_skus(area_df):
        with embed_lock:
            return base_skus(area_df)

    svc = DaodianService(_corpus(), slow_embed, embed_skus)
    results = {}

    def hit_area1():
        results["a1"] = svc.similar_key("a1")   # cold: builds area 1

    t = threading.Thread(target=hit_area1)
    t.start()
    assert started.wait(timeout=30), "area-1 build never started"
    t0 = time.perf_counter()
    got = svc.similar_key("c1")         # cold area 2: builds NOW
    dt = time.perf_counter() - t0
    assert "a1" not in results          # area-1 build still gated
    assert got["neighbors"]
    assert dt < 10, f"cold area-2 build waited {dt:.1f}s on area 1's"
    gate.set()
    t.join(timeout=30)
    assert results["a1"]["neighbors"]


def test_daodian_adhoc_query_builds_engines_only():
    """Round 4 review: an ad-hoc query builds only the area's engines —
    the merged map (the whole-area self-search, the dominant build
    cost) is deferred until a per-key lookup needs it, and that lookup
    reuses the cached engines instead of re-embedding."""
    calls = {"skus": 0}
    base_skus = _sku_embs_factory()

    def counting_skus(area_df):
        calls["skus"] += 1
        return base_skus(area_df)

    svc = DaodianService(_corpus(), _embed_titles_factory(),
                         counting_skus)
    out = svc.similar_query("苹果 水果", 5, 51, "1")
    assert out["neighbors"]
    assert svc._merged == {}            # no merged map was computed
    assert calls["skus"] == 1
    # the per-key path completes the merged map WITHOUT a re-embed
    got = svc.similar_key("a1")
    assert got["neighbors"]
    assert "1" in svc._merged
    assert calls["skus"] == 1


def test_daodian_update_rebuild_failure_reports_and_commits():
    """Round 4 review: the upsert commits BEFORE the rebuild — a failing
    area rebuild is reported per area (not a raised error for an
    already-applied update), the other invalidated areas still
    pre-warm, and the failed area heals on its next read."""
    embed_titles = _embed_titles_factory()
    broken = {"on": False}

    def flaky_embed(titles):
        if broken["on"] and any("苹果" in str(t) for t in titles):
            raise RuntimeError("relay died")    # area 1's corpus only
        return embed_titles(titles)

    svc = DaodianService(_corpus(), flaky_embed, _sku_embs_factory())
    svc.warm()
    n0 = svc.n
    broken["on"] = True
    out = svc.update([
        {"spu_sn": "a9", "area_id": "1", "sku": "19",
         "title": "苹果 水果", "first_level_category_id": 5,
         "second_level_category_id": 51},
        {"spu_sn": "c9", "area_id": "2", "sku": "29",
         "title": "果汁 饮料", "first_level_category_id": 7,
         "second_level_category_id": 72}])
    assert out["updated"] == 2 and svc.n == n0 + 2   # committed
    assert sorted(out["areas_invalidated"]) == ["1", "2"]
    assert list(out["rebuild_errors"]) == ["1"]
    assert "relay died" in out["rebuild_errors"]["1"]
    assert "2" in svc._merged           # area 2 still pre-warmed
    assert "1" not in svc._index        # area 1 stays invalidated...
    broken["on"] = False
    assert "a9" in svc.similar_key("a1")["neighbors"]   # ...and heals


def test_daodian_http_rebuild_flag_must_be_bool():
    """bool("false") is True — a JSON string for 'rebuild' must 400, not
    silently run the blocking rebuild (round 4 review)."""
    svc = DaodianService(_corpus(), _embed_titles_factory(),
                         _sku_embs_factory())
    httpd = make_daodian_server(svc, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        item = {"spu_sn": "a9", "area_id": "1", "sku": "19",
                "title": "苹果 水果", "first_level_category_id": 5,
                "second_level_category_id": 51}
        code, body = _post(f"http://127.0.0.1:{port}/update",
                           {"items": [item], "rebuild": "false"})
        assert code == 400 and "rebuild" in body["error"]
        code, body = _post(f"http://127.0.0.1:{port}/update",
                           {"items": [item], "rebuild": False})
        assert code == 200 and body["updated"] == 1
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_daodian_adhoc_float64_category_matches(tmp_path):
    """Advisor finding (round 4, medium): a NaN hole upcasts the lv1/lv2
    column to float64, so str(cats[i]) was '5.0' while a JSON request
    sending 5 or '5' compared as '5' — every candidate silently failed
    the same-category rule. Canonical comparison must match 5, '5', 5.0
    and '5.0'; NaN (either side) never matches — including a literal
    'nan' request string (filters.py's batch rule)."""
    df = _corpus()
    # poke a NaN hole -> float64 category columns ('5' becomes 5.0; the
    # exact dtype a csv/parquet read of a holey column produces)
    df.loc[len(df)] = ["1", "z1", "99", "新品 无类目", np.nan, np.nan]
    for c in ("first_level_category_id", "second_level_category_id"):
        df[c] = df[c].astype(np.float64)
    assert df["first_level_category_id"].dtype == np.float64
    svc = DaodianService(df, _embed_titles_factory(), _sku_embs_factory())
    for lv1 in (5, "5", 5.0, "5.0"):
        hit = svc.similar_query("苹果 水果", lv1=lv1, lv2=51, area_id="1")
        keys = [n["key"] for n in hit["neighbors"]]
        assert keys and keys[0] == "a1", (lv1, keys)
    # NaN never matches: the NaN-category corpus row is unreachable even
    # by sending NaN-ish values
    for lv1 in (float("nan"), "nan", None):
        hit = svc.similar_query("新品 无类目", lv1=lv1, lv2=71,
                                area_id="1")
        assert [n["key"] for n in hit["neighbors"]] == []


def test_daodian_mixed_type_area_column_groups_once():
    """Advisor finding (round 4, low): int 5 and '5' in a mixed object
    area column stringify identically — they must land in ONE served
    group, not silently overwrite each other."""
    df = _corpus()
    # area 1 rows split between int 1 and str '1' (object column)
    df["area_id"] = [1, "1", 1, "1", 2, 2, 2]
    svc = DaodianService(df, _embed_titles_factory(), _sku_embs_factory())
    assert svc.n == len(df)
    assert svc.areas == ["1", "2"]
    svc.warm()
    # the a1/a2 similar pair was split across the two raw spellings —
    # only a single merged group can pair them
    assert "a2" in svc.similar_key("a1")["neighbors"]


def test_cli_serve_daodian_refuses_generic_knobs(tmp_path):
    """Advisor finding (round 4, low): serve --tower daodian silently
    ignored --score_th/--k. They must refuse loudly, and the dedicated
    per-arm knobs must reach the service."""
    from multimodalsimilar_tpu.cli import build_parser
    from multimodalsimilar_tpu.cli.serve import (_build_daodian_service,
                                                 cmd_serve)
    from multimodalsimilar_tpu.models.fasttext import train_supervised

    df = _corpus()
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    ft = train_supervised(df["title"].tolist(), ["x"] * len(df), dim=4,
                          epochs=1, bucket=100)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    base = ["serve", "--tower", "daodian", "--data", data,
            "--fasttext_model", ft_path, "--text_only"]
    parser = build_parser()
    with pytest.raises(SystemExit, match="nlp_score_th"):
        cmd_serve(parser.parse_args(base + ["--score_th", "0.5"]))
    with pytest.raises(SystemExit, match="ann_cnt_nlp"):
        cmd_serve(parser.parse_args(base + ["--k", "20"]))
    # the dedicated knobs reach the service
    args = parser.parse_args(base + ["--nlp_score_th", "-0.2",
                                     "--ann_cnt_nlp", "7",
                                     "--cv_score_th", "0.3",
                                     "--ann_cnt_cv", "5"])
    svc = _build_daodian_service(args)
    assert svc._params["nlp_score_th"] == -0.2
    assert svc._params["ann_cnt_nlp"] == 7
    assert svc._params["cv_score_th"] == 0.3
    assert svc._params["ann_cnt_cv"] == 5


def test_daodian_adhoc_queries_microbatch():
    """Round-4 VERDICT weak #2: ad-hoc queries embedded batch-1 per
    request, each paying the sync device round-trip serialized. They now
    coalesce through MicroBatcher: 4 concurrent queries become one embed
    call (and every caller still gets ITS OWN correct answer)."""
    calls = []
    inner = _embed_titles_factory()
    record = threading.Event()

    def embed(titles):
        if record.is_set():
            calls.append(len(titles))
        return inner(titles)

    svc = DaodianService(_corpus(), embed, _sku_embs_factory(),
                         max_batch=4, max_wait_ms=300.0)
    svc.warm()                       # engines hot: only ad-hoc embeds left
    record.set()
    queries = [("苹果 水果", 5, 51, "a1"), ("苹果 鲜果", 5, 51, "a2"),
               ("牛奶 乳品", 6, 61, "b1"), ("牛奶 盒装", 6, 61, "b2")]
    results = [None] * len(queries)

    def q(i):
        t, lv1, lv2, _ = queries[i]
        results[i] = svc.similar_query(t, lv1=lv1, lv2=lv2, area_id="1")

    ts = [threading.Thread(target=q, args=(i,)) for i in range(len(queries))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    svc.close()
    for (title, _, _, want), r in zip(queries, results):
        keys = [n["key"] for n in r["neighbors"]]
        assert keys and keys[0] == want, (title, keys)
    assert sum(calls) == len(queries)
    assert max(calls) > 1            # requests actually coalesced


def test_daodian_warm_query_buckets():
    """warm_query_buckets pre-runs the ad-hoc embed paths at every pow2
    micro-batch size (round-5 bench finding: the first live request at
    each coalesced size paid a fresh tower compile mid-traffic)."""
    text_sizes, img_sizes = [], []
    inner = _embed_titles_factory()

    def embed_titles(tt):
        text_sizes.append(len(tt))
        return inner(tt)

    def embed_images(imgs):
        img_sizes.append(len(imgs))
        return np.zeros((len(imgs), 8), np.float32)

    svc = DaodianService(_corpus(), embed_titles, _sku_embs_factory(),
                         embed_query_images=embed_images, max_batch=8)
    svc.warm_query_buckets(image_size=16)
    assert text_sizes == [1, 2, 4, 8]
    assert img_sizes == [1, 2, 4, 8]
    svc.close()
    # no CV arm: only text buckets, and no crash
    svc2 = DaodianService(_corpus(), inner, _sku_embs_factory(),
                          max_batch=4)
    svc2.warm_query_buckets(image_size=16)
    svc2.close()


def test_http_handlers_disable_nagle():
    """Round 5: small keep-alive responses sat in Nagle/delayed-ACK
    interplay — a FLAT ~44 ms p50 on pure dict-lookup requests at every
    concurrency (misdiagnosed in round 4 as a client-side floor).
    TCP_NODELAY on both daemon handlers: p50 0.3 ms, c=1 qps 125x."""
    from multimodalsimilar_tpu.pipelines.daodian_serving import \
        _DaodianHandler
    from multimodalsimilar_tpu.pipelines.serving import _Handler
    assert _DaodianHandler.disable_nagle_algorithm
    assert _Handler.disable_nagle_algorithm
