"""Online serving daemon: MicroBatcher, SimilarityService, HTTP surface.

The reference serves retrieval as precomputed Redis KV only
(nlp_infer.py:154-172) — `cli serve` is the online-query capability on
top of the same engine/filter semantics. These tests run the real CLI
builder (parser -> _build_serve_service) on the CPU backend and drive the
real HTTP server over localhost.
"""

import json
import os
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.pipelines.serving import (
    MicroBatcher, SimilarityService, make_server)


# ---------------------------------------------------------------- batcher

def test_microbatcher_coalesces_concurrent_submissions():
    calls = []

    def run_batch(items):
        calls.append(len(items))
        time.sleep(0.01)              # let the queue fill behind us
        return [x * 2 for x in items]

    b = MicroBatcher(run_batch, max_batch=64, max_wait_ms=200.0)
    try:
        results = [None] * 16
        threads = [threading.Thread(target=lambda i=i: results.__setitem__(
            i, b.submit(i))) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == [i * 2 for i in range(16)]
        # 16 concurrent submissions must not take 16 device calls; the
        # first call may race ahead with few items, the rest coalesce
        assert sum(calls) == 16
        assert len(calls) < 16
        assert b.stats["max_batch_seen"] > 1
    finally:
        b.close()


def test_microbatcher_respects_max_batch():
    seen = []

    def run_batch(items):
        seen.append(len(items))
        return items

    b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=50.0)
    try:
        threads = [threading.Thread(target=b.submit, args=(i,))
                   for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert max(seen) <= 4 and sum(seen) == 10
    finally:
        b.close()


def test_microbatcher_propagates_errors_and_keeps_serving():
    def run_batch(items):
        if any(x == "boom" for x in items):
            raise ValueError("boom")
        return items

    b = MicroBatcher(run_batch, max_batch=1, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="boom"):
            b.submit("boom")
        assert b.submit("ok") == "ok"   # the worker survived the failure
    finally:
        b.close()


def test_microbatcher_close_rejects_new_work():
    b = MicroBatcher(lambda items: items, max_batch=2, max_wait_ms=1.0)
    assert b.submit(1) == 1
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(2)


def test_microbatcher_submit_vs_close_race_never_strands_a_future():
    """Review finding: a submitter that passed the closed-check while
    close() ran could enqueue onto a dead queue and block forever on an
    unresolved Future. The lock serializes check+enqueue against close:
    every submit either raises RuntimeError or resolves."""
    for _ in range(20):                     # hammer the window
        b = MicroBatcher(lambda items: items, max_batch=8, max_wait_ms=0.1)
        outcomes = []

        def submitter():
            try:
                fut = b.submit_nowait(1)
            except RuntimeError:
                outcomes.append("rejected")
                return
            outcomes.append(fut.result(timeout=10))   # must resolve

        threads = [threading.Thread(target=submitter) for _ in range(8)]
        for t in threads:
            t.start()
        b.close()
        for t in threads:
            t.join(timeout=15)
            assert not t.is_alive(), "submitter stranded on a dead queue"
        assert all(o in ("rejected", 1) for o in outcomes)
        assert len(outcomes) == 8


# ------------------------------------------------------- service + filters

def _toy_service(**kw):
    """Service over a hand-built engine: identity 'embedding' of 4-d
    one-hotish vectors so neighbor order is fully controlled."""
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    emb = np.array([[1.0, 0.0, 0.0, 0.0],
                    [0.9, 0.1, 0.0, 0.0],
                    [0.8, 0.0, 0.1, 0.0],
                    [0.0, 1.0, 0.0, 0.0]], np.float32)
    keys = ["a", "b", "c", "d"]
    cats = ["x", "x", "y", "y"]
    # normalize=False: scores are the raw dot products above, so the
    # threshold expectations below read off the matrix directly
    engine = SimilarityEngine(emb, keys, categories=cats, metric="ip",
                              normalize=False)
    table = {"qa": np.array([1.0, 0.0, 0.0, 0.0], np.float32),
             "qd": np.array([0.0, 1.0, 0.0, 0.0], np.float32)}

    def embed_texts(texts):
        return np.stack([table[t] for t in texts])

    svc = SimilarityService(embed_texts, engine,
                            k=kw.pop("k", 4), max_wait_ms=1.0, **kw)
    return svc


def test_service_similar_ranking_threshold_category_exclude():
    svc = _toy_service(score_th=None)
    try:
        got = svc.similar("qa")
        assert [g["key"] for g in got] == ["a", "b", "c", "d"]
        assert got[0]["score"] == pytest.approx(1.0)
        # strict > threshold (reference semantics, nlp_infer.py:163)
        got = svc.similar("qa", score_th=0.85)
        assert [g["key"] for g in got] == ["a", "b"]
        # per-request k caps the answer
        assert [g["key"] for g in svc.similar("qa", k=1)] == ["a"]
        # same-category keeps only category 'x' corpus rows
        got = svc.similar("qa", category="x")
        assert [g["key"] for g in got] == ["a", "b"]
        # exclude_key drops the query's own corpus row
        got = svc.similar("qa", exclude_key="a")
        assert [g["key"] for g in got] == ["b", "c", "d"]
    finally:
        svc.close()


def test_service_category_without_category_data_raises():
    """Review finding: a request-supplied category on a server with no
    category column must fail loudly — silently skipping the filter
    returns cross-category neighbors indistinguishable from a correctly
    filtered answer."""
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    emb = np.eye(3, dtype=np.float32)
    engine = SimilarityEngine(emb, ["a", "b", "c"], metric="ip",
                              normalize=False)
    svc = SimilarityService(lambda ts: emb[: len(ts)], engine, k=3,
                            max_wait_ms=1.0)
    try:
        assert svc.similar("q")          # no category: fine
        with pytest.raises(ValueError, match="category_col"):
            svc.similar("q", category="x")
    finally:
        svc.close()


def test_service_default_threshold_and_embed():
    svc = _toy_service(score_th=0.5)
    try:
        assert [g["key"] for g in svc.similar("qd")] == ["d"]
        # request-side null disables the service default
        assert len(svc.similar("qd", score_th=None)) == 4
        emb = svc.embed(["qa", "qd", "qa"])
        assert emb.shape == (3, 4)
        np.testing.assert_allclose(emb[0], emb[2])
        assert svc.stats["items"] >= 4
    finally:
        svc.close()


# ------------------------------------------------------------ HTTP + CLI

def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def serve_cli(tmp_path_factory):
    """Real CLI path: corpus csv -> _build_serve_service -> HTTP server."""
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser

    tmp = tmp_path_factory.mktemp("serve")
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(32)],
        "spu_name": [f"{'甲乙丙丁'[i % 4] * 3}商品{i}" for i in range(32)],
        "lv1": [str(i % 4) for i in range(32)]})
    data = str(tmp / "corpus.csv")
    df.to_csv(data, index=False)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--category_col", "lv1",
         "--max_length", "8", "--batch_size", "8", "--k", "5",
         "--max_batch", "8",   # <= batch_size: the fused device path wires
         "--score_th", "0.0", "--port", "0", "--max_wait_ms", "2"])
    service, n = _build_serve_service(args)
    assert n == 32
    httpd = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, service, df
    httpd.shutdown()
    httpd.server_close()
    service.close()
    thread.join(timeout=10)


def test_http_healthz(serve_cli):
    base, service, df = serve_cli
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["corpus"] == 32 and h["k"] == 5


def test_http_similar_matches_offline_engine(serve_cli):
    base, service, df = serve_cli
    text = df["spu_name"][7]
    got = _post(base + "/similar", {"text": text,
                                    "exclude_key": "sku7"})["neighbors"]
    assert 1 <= len(got) <= 5
    assert all(g["key"] != "sku7" for g in got)
    # parity with a direct engine query through the same embedder
    emb = service.embed([text])
    scores, idx = service.engine.search(5, queries=emb)
    keys = [service.engine.keys[i] for i in idx[0]]
    expect = [k for k, s in zip(keys, scores[0])
              if s > 0.0 and k != "sku7"]
    # dedup preserving order, as the service does
    seen, expect_dedup = set(), []
    for k in expect:
        if k not in seen:
            seen.add(k)
            expect_dedup.append(k)
    assert [g["key"] for g in got] == expect_dedup


def test_http_similar_category_filter(serve_cli):
    base, service, df = serve_cli
    cat = dict(zip(df["spu_sn"], df["lv1"]))
    # the category rule filters WITHIN the top-k candidates (the batch
    # jobs filter FAISS's k results the same way, daodian_infer.py:237) —
    # so pick a category that is present in the unfiltered answer
    text = df["spu_name"][4]
    plain = _post(base + "/similar",
                  {"text": text, "score_th": None})["neighbors"]
    want = cat[plain[0]["key"]]
    got = _post(base + "/similar",
                {"text": text, "category": want,
                 "score_th": None})["neighbors"]
    assert got and all(cat[g["key"]] == want for g in got)
    assert {g["key"] for g in got} <= {p["key"] for p in plain
                                       if cat[p["key"]] == want}


def test_http_malformed_fields_are_400_not_500(serve_cli):
    """Review finding: int(None)/float('x') on client-supplied fields
    raised inside the handler and came back as 500 server errors — a load
    balancer treats those as backend faults. They are client errors."""
    base, service, df = serve_cli
    text = df["spu_name"][0]
    for payload in ({"text": text, "k": None},
                    {"text": text, "k": "abc"},
                    {"text": text, "score_th": "x"}):
        try:
            _post(base + "/similar", payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400, f"{payload} -> {e.code}"
            assert "error" in json.loads(e.read())
    # the server still answers after the bad requests
    assert _post(base + "/similar", {"text": text})["neighbors"]


def test_http_embed_and_errors(serve_cli):
    base, service, df = serve_cli
    out = _post(base + "/embed", {"texts": ["甲甲甲", "乙乙乙"]})
    emb = np.asarray(out["embeddings"], np.float32)
    assert emb.shape[0] == 2 and emb.shape[1] >= 8
    # malformed requests get 4xx JSON, not a dead server
    for path, payload in [("/similar", {}), ("/embed", {"texts": "x"}),
                          ("/nope", {})]:
        try:
            _post(base + path, payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code in (400, 404)
            assert "error" in json.loads(e.read())
    # and the server still answers
    assert _post(base + "/similar",
                 {"text": df["spu_name"][0]})["neighbors"]


def test_http_concurrent_burst_coalesces(serve_cli):
    base, service, df = serve_cli
    before = service.stats["batches"]
    results = [None] * 12

    def hit(i):
        results[i] = _post(base + "/similar",
                           {"text": df["spu_name"][i % 32],
                            "score_th": None})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r["neighbors"] for r in results)
    # 12 concurrent requests must take fewer than 12 device batches
    assert service.stats["batches"] - before < 12
    assert service.stats["max_batch_seen"] > 1


# --------------------------------------------------- cv tower (image serve)

def _b64_img(img, ext=".png"):
    """base64 of the encoded image bytes; PNG by default so a query built
    from a decoded corpus image is pixel-identical to what the server
    embedded (JPEG would re-lossy-compress)."""
    import base64

    import cv2
    ok, buf = cv2.imencode(ext, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def test_image_query_parser_decodes_resizes_and_rejects():
    from multimodalsimilar_tpu.pipelines.serving import ImageQueryParser

    p = ImageQueryParser(16)
    img = np.full((20, 24, 3), 99, np.uint8)
    out = p.one({"image_b64": _b64_img(img)})
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    # many: list form, order preserved
    outs = p.many({"images_b64": [_b64_img(img), _b64_img(img // 2)]})
    assert len(outs) == 2 and outs[0].mean() > outs[1].mean()
    # malformed inputs -> ValueError with a client-facing message
    for req, msg in [({}, "image_b64"),
                     ({"image_b64": "!!!"}, "bad image_b64"),
                     ({"image_b64": 42}, "base64 string"),
                     ({"image_b64": _b64_img(img)[:-20]}, "image_b64"),
                     ({"image_path": "/nope/missing.jpg"}, "image_path"),
                     ({"images_b64": []}, "non-empty"),
                     ({"images_b64": "x"}, "non-empty")]:
        with pytest.raises(ValueError, match=msg):
            (p.many if "images_b64" in req else p.one)(req)


@pytest.fixture(scope="module")
def serve_cv_cli(tmp_path_factory):
    """Real CLI path for --tower cv: image corpus on disk (the daodian
    {img_root}/{key}/0.jpg layout) -> _build_serve_service -> HTTP."""
    import cv2

    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser

    tmp = tmp_path_factory.mktemp("serve_cv")
    root = tmp / "imgs"
    n = 12
    rng = np.random.default_rng(7)
    imgs = {}
    for i in range(n):
        key = f"sku{i}"
        img = rng.integers(0, 255, size=(24, 24, 3)).astype(np.uint8)
        (root / key).mkdir(parents=True)
        path = str(root / key / "0.jpg")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        # keep what the SERVER decoded (jpeg is lossy): a PNG query built
        # from this is pixel-identical to the embedded corpus image
        imgs[key] = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    # one corpus row with NO readable image: must be dropped, with the
    # category list re-aligned to the survivors
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(n)] + ["ghost"],
        "lv1": [str(i % 3) for i in range(n)] + ["9"]})
    data = str(tmp / "corpus.csv")
    df.to_csv(data, index=False)
    args = build_parser().parse_args(
        ["serve", "--tower", "cv", "--data", data, "--img_root", str(root),
         "--category_col", "lv1", "--backbone", "tiny",
         "--image_size", "16", "--fc_dim", "8", "--batch_size", "8",
         "--k", "5", "--score_th", "0.0", "--max_wait_ms", "2"])
    service, n_served = _build_serve_service(args)
    assert n_served == n            # ghost dropped
    httpd = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, service, imgs
    httpd.shutdown()
    httpd.server_close()
    service.close()
    thread.join(timeout=10)


def test_http_cv_similar_own_image_ranks_first(serve_cv_cli):
    base, service, imgs = serve_cv_cli
    # query with sku3's exact corpus image: deterministic tower, so its
    # own key comes back at cosine ~1.0
    got = _post(base + "/similar",
                {"image_b64": _b64_img(imgs["sku3"]),
                 "score_th": None})["neighbors"]
    assert got[0]["key"] == "sku3"
    assert got[0]["score"] == pytest.approx(1.0, abs=1e-3)
    # exclude_key drops it (the online self-drop)
    got = _post(base + "/similar",
                {"image_b64": _b64_img(imgs["sku3"]), "score_th": None,
                 "exclude_key": "sku3"})["neighbors"]
    assert got and all(g["key"] != "sku3" for g in got)


def test_http_cv_category_filter_and_errors(serve_cv_cli):
    base, service, imgs = serve_cv_cli
    got = _post(base + "/similar",
                {"image_b64": _b64_img(imgs["sku4"]), "score_th": None,
                 "category": "1"})["neighbors"]
    # corpus categories are i%3: only sku1, sku4, sku7, sku10 are "1"
    assert got and {g["key"] for g in got} <= {"sku1", "sku4", "sku7",
                                               "sku10"}
    # text-shaped request against a cv server is a 400, not a 500
    for payload in ({"text": "hello"}, {"image_b64": "!!!"}):
        try:
            _post(base + "/similar", payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    # the server still answers afterwards
    assert _post(base + "/similar",
                 {"image_b64": _b64_img(imgs["sku0"]),
                  "score_th": None})["neighbors"]


def test_http_cv_embed_batch_and_path_queries(serve_cv_cli, tmp_path):
    import cv2

    base, service, imgs = serve_cv_cli
    out = _post(base + "/embed",
                {"images_b64": [_b64_img(imgs["sku0"]),
                                _b64_img(imgs["sku1"])]})
    emb = np.asarray(out["embeddings"], np.float32)
    assert emb.shape == (2, 8)
    assert not np.allclose(emb[0], emb[1])
    # image_path form: server-local file, same answer as its b64 twin
    p = str(tmp_path / "q.png")     # lossless: pixel-equal to the corpus
    cv2.imwrite(p, cv2.cvtColor(imgs["sku0"], cv2.COLOR_RGB2BGR))
    got = _post(base + "/similar",
                {"image_path": p, "score_th": None})["neighbors"]
    assert got[0]["key"] == "sku0"


# ------------------------------------------- multimodal tower (fused serve)

def test_multimodal_query_parser_pairs_and_rejects():
    from multimodalsimilar_tpu.pipelines.serving import MultimodalQueryParser

    p = MultimodalQueryParser(16)
    img = np.full((20, 24, 3), 99, np.uint8)
    b64 = _b64_img(img)
    text, out = p.one({"text": "苹果", "image_b64": b64})
    assert text == "苹果" and out.shape == (16, 16, 3)
    # batch form zips positionally
    pairs = p.many({"texts": ["a", "b"], "images_b64": [b64, b64]})
    assert [t for t, _ in pairs] == ["a", "b"]
    # singular form through many
    assert len(p.many({"text": "a", "image_b64": b64})) == 1
    for req, msg in [({"image_b64": b64}, "text"),
                     ({"text": "a"}, "image_b64"),
                     ({"texts": ["a"], "images_b64": [b64, b64]},
                      "same length"),
                     ({"texts": ["a", "b"]}, "image"),
                     ({"images_b64": [b64]}, "texts")]:
        with pytest.raises(ValueError, match=msg):
            (p.many if ("texts" in req or "images_b64" in req)
             else p.one)(req)


@pytest.fixture(scope="module")
def serve_mm_cli(tmp_path_factory):
    """Real CLI path for --tower multimodal: train a tiny fused model,
    then serve its checkpoint over the {img_root}/{key}.jpg corpus."""
    import cv2

    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           build_parser, main)

    tmp = tmp_path_factory.mktemp("serve_mm")
    root = tmp / "imgs"
    root.mkdir()
    n = 10
    rng = np.random.default_rng(3)
    imgs = {}
    for i in range(n):
        key = f"sku{i}"
        img = rng.integers(0, 255, size=(20, 20, 3)).astype(np.uint8)
        path = str(root / f"{key}.jpg")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        imgs[key] = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(n)] + ["ghost"],
        "spu_name": [f"商品{i}号" for i in range(n)] + ["鬼"],
        "cateid": [i % 2 for i in range(n)] + [0],
        "lv1": [str(i % 2) for i in range(n)] + ["9"]})
    data = str(tmp / "mm.csv")
    df.to_csv(data, index=False)
    out = str(tmp / "out")
    main(["train", "multimodal", "--data", data, "--img_root", str(root),
          "--output", out, "--backbone", "tiny", "--image_size", "16",
          "--fc_dim", "8", "--text_col", "spu_name", "--label_col",
          "cateid", "--batch_size", "8", "--epochs", "1",
          "--max_length", "8", "--eval_every", "1000000",
          "--save_every", "2"])
    args = build_parser().parse_args(
        ["serve", "--tower", "multimodal", "--data", data,
         "--img_root", str(root), "--checkpoint", f"{out}/ckpt",
         "--tokenizer", f"{out}/vocab.txt", "--backbone", "tiny",
         "--bert_preset", "tiny", "--image_size", "16", "--fc_dim", "8",
         "--num_labels", "2", "--max_length", "8", "--batch_size", "8",
         "--category_col", "lv1", "--k", "5", "--max_wait_ms", "2"])
    service, n_served = _build_serve_service(args)
    assert n_served == n                 # ghost (no image) dropped
    assert service.engine.metric == "l2" # multimodal_infer IndexFlatL2
    assert service.score_th is None      # reference applies no threshold
    httpd = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    texts = {f"sku{i}": f"商品{i}号" for i in range(n)}
    yield base, service, imgs, texts, args
    httpd.shutdown()
    httpd.server_close()
    service.close()
    thread.join(timeout=10)


def test_http_multimodal_own_pair_ranks_first(serve_mm_cli):
    base, service, imgs, texts, _ = serve_mm_cli
    got = _post(base + "/similar",
                {"text": texts["sku2"],
                 "image_b64": _b64_img(imgs["sku2"])})["neighbors"]
    # exact corpus pair: squared-L2 distance ~0, ranked first; L2 scores
    # ascend down the list
    assert got[0]["key"] == "sku2"
    assert got[0]["score"] == pytest.approx(0.0, abs=1e-3)
    scores = [g["score"] for g in got]
    assert scores == sorted(scores)
    # score_th on L2 = max distance: th below the 2nd neighbor keeps 1
    tight = _post(base + "/similar",
                  {"text": texts["sku2"], "image_b64": _b64_img(imgs["sku2"]),
                   "score_th": (scores[0] + scores[1]) / 2})["neighbors"]
    assert [g["key"] for g in tight] == ["sku2"]


def test_multimodal_fused_serving_wires_and_matches(serve_mm_cli,
                                                     monkeypatch):
    """A mesh-less (single-chip) multimodal service with max_batch <=
    batch_size rides the fused ONE-program path (both towers + fusion +
    un-normalized L2 k-NN) and returns the host path's results."""
    import copy

    import multimodalsimilar_tpu.cli as cli
    _, host_service, imgs, texts, base_args = serve_mm_cli
    monkeypatch.setattr(cli.serve, "_knn_backend_mesh",
                        lambda a: ("xla", None, None))
    args = copy.deepcopy(base_args)
    args.max_batch = 8        # <= batch_size: wires the fused path
    service, _ = cli._build_serve_service(args)
    try:
        assert service._fused_similar is not None
        assert service._fused_factory is not None
        wp = service._warm_payload
        assert isinstance(wp, tuple) and isinstance(wp[1], np.ndarray)
        cli._warm_serve_service(service, args)
        from multimodalsimilar_tpu.data import images as I
        q = (texts["sku4"], I.resize(imgs["sku4"], args.image_size))
        got = service.similar(q, score_th=None)
        ref = host_service.similar(q, score_th=None)
        assert got and got[0]["key"] == "sku4"
        assert [g["key"] for g in got] == [r["key"] for r in ref]
        np.testing.assert_allclose([g["score"] for g in got],
                                   [r["score"] for r in ref],
                                   rtol=1e-4, atol=1e-5)
    finally:
        service.close()


def test_http_multimodal_embed_batch_and_errors(serve_mm_cli):
    base, service, imgs, texts, _ = serve_mm_cli
    out = _post(base + "/embed",
                {"texts": [texts["sku0"], texts["sku1"]],
                 "images_b64": [_b64_img(imgs["sku0"]),
                                _b64_img(imgs["sku1"])]})
    emb = np.asarray(out["embeddings"], np.float32)
    # fused dim = image fc_dim (8) + text hidden (tiny bert, 64) — the
    # reference's 1792 + 768 = 2560 shape (multimodal_classifier.py:50-57)
    assert emb.shape[0] == 2 and emb.shape[1] == 72
    assert not np.allclose(emb[0], emb[1])
    # category filter rides the same engine path
    got = _post(base + "/similar",
                {"text": texts["sku1"], "image_b64": _b64_img(imgs["sku1"]),
                 "category": "1"})["neighbors"]
    assert got and all(int(g["key"][3:]) % 2 == 1 for g in got)
    # text-only and image-only are 400s, not 500s
    for payload in ({"text": "x"}, {"image_b64": _b64_img(imgs["sku0"])}):
        try:
            _post(base + "/similar", payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400


# ------------------------------------------------- fasttext tower (serve)

@pytest.fixture(scope="module")
def serve_ft_cli(tmp_path_factory):
    """--tower fasttext: the daodian text side online. Tiny corpus with
    two word families so nearest-neighbor structure is deterministic."""
    import pickle

    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    from multimodalsimilar_tpu.models.fasttext import train_supervised

    tmp = tmp_path_factory.mktemp("serve_ft")
    fruit = [f"苹果 香蕉 水果 {i}" for i in range(8)]
    dairy = [f"牛奶 酸奶 乳品 {i}" for i in range(8)]
    titles = fruit + dairy
    labels = [0] * 8 + [1] * 8
    model = train_supervised(titles, labels, dim=16, epochs=20)
    ft_path = str(tmp / "fasttext.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(model, f)
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(16)],
        "title": titles,
        "lv1": [str(l) for l in labels]})
    data = str(tmp / "corpus.csv")
    df.to_csv(data, index=False)
    args = build_parser().parse_args(
        ["serve", "--tower", "fasttext", "--data", data,
         "--fasttext_model", ft_path, "--text_col", "title",
         "--category_col", "lv1", "--k", "8", "--max_wait_ms", "2"])
    service, n_served = _build_serve_service(args)
    assert n_served == 16
    assert service.score_th == -0.6      # daodian_infer.py:79-82 default
    httpd = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, service
    httpd.shutdown()
    httpd.server_close()
    service.close()
    thread.join(timeout=10)


def test_http_fasttext_similar_and_embed(serve_ft_cli):
    base, service = serve_ft_cli
    got = _post(base + "/similar",
                {"text": "苹果 香蕉 水果 0", "score_th": None})["neighbors"]
    assert got[0]["key"] == "sku0"       # its own corpus row, cosine ~1
    assert got[0]["score"] == pytest.approx(1.0, abs=1e-3)
    # an UNSEEN fruit query ranks fruit rows above dairy (the online
    # capability the precomputed-KV reference can't give)
    got = _post(base + "/similar",
                {"text": "水果 苹果", "score_th": None, "k": 4})["neighbors"]
    assert got and all(int(g["key"][3:]) < 8 for g in got)
    # same-lv1 category rule online
    got = _post(base + "/similar",
                {"text": "苹果 水果", "score_th": None,
                 "category": "1"})["neighbors"]
    assert got and all(int(g["key"][3:]) >= 8 for g in got)
    emb = np.asarray(_post(base + "/embed",
                           {"texts": ["苹果", "牛奶"]})["embeddings"])
    assert emb.shape == (2, 16)


def test_serve_score_th_defaults_per_tower():
    """Unset --score_th resolves to each tower's reference operating
    point (nlp_infer.py:152, daodian_infer.py:79-82,
    multimodal_infer.py:147-159); an explicit flag always wins."""
    from multimodalsimilar_tpu.cli import _serve_score_th, build_parser

    for tower, want in [("bert", 0.9), ("cv", 0.15),
                        ("fasttext", -0.6), ("multimodal", None)]:
        args = build_parser().parse_args(
            ["serve", "--tower", tower, "--data", "x"])
        assert _serve_score_th(args) == want, tower
    args = build_parser().parse_args(
        ["serve", "--tower", "cv", "--data", "x", "--score_th", "0.5"])
    assert _serve_score_th(args) == 0.5


# ----------------------------------------------------- online corpus upsert

def _updatable_service(with_cats=False, **kw):
    """Toy service whose 'tower' maps any text deterministically to a 4-d
    unit direction (crc32-seeded), so unseen /update payloads embed
    consistently across calls."""
    import zlib

    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    def embed(texts):
        out = []
        for t in texts:
            rng = np.random.default_rng(zlib.crc32(str(t).encode()))
            v = rng.normal(size=4).astype(np.float32)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

    keys = ["a", "b", "c", "d"]
    engine = SimilarityEngine(
        embed(keys), keys,
        categories=["x", "x", "y", "y"] if with_cats else None,
        metric="ip", normalize=True)
    svc = SimilarityService(embed, engine, k=kw.pop("k", 10),
                            max_wait_ms=1.0, **kw)
    return svc, embed


def test_service_update_upsert_and_dynamic_k():
    svc, embed = _updatable_service(score_th=None)
    try:
        assert svc.k == 4                       # clamped to the corpus
        n = svc.update(["fresh-e"], ["e"])
        assert n == 5 and svc.k == 5            # k grows with the corpus
        got = svc.similar("fresh-e")
        assert got[0]["key"] == "e"             # its own vector ranks first
        assert got[0]["score"] == pytest.approx(1.0, abs=1e-5)
        # replace: key 'a' re-embeds to a new payload
        assert svc.update(["moved-a"], ["a"]) == 5
        assert svc.similar("moved-a")[0]["key"] == "a"
    finally:
        svc.close()


def test_service_update_category_discipline():
    svc, _ = _updatable_service(with_cats=True)
    try:
        with pytest.raises(ValueError, match="category"):
            svc.update(["t"], ["z"])            # has cats: must supply
        assert svc.update(["t"], ["z"], categories=["x"]) == 5
        assert svc.engine.categories[-1] == "x"
        got = svc.similar("t", category="x", score_th=None)
        assert got[0]["key"] == "z"
    finally:
        svc.close()
    svc, _ = _updatable_service(with_cats=False)
    try:
        with pytest.raises(ValueError, match="category"):
            svc.update(["t"], ["z"], categories=["x"])   # no column to fill
    finally:
        svc.close()


def test_service_update_coalesced_with_similar_sees_fresh_corpus():
    """An update and a similar coalesced into ONE micro-batch: the update
    applies first, so the search runs over the fresh corpus (deterministic
    via a direct _run_batch call — the worker path these items take)."""
    svc, embed = _updatable_service(score_th=None)
    try:
        out = svc._run_batch([
            {"op": "update", "query": "newbie", "key": "z",
             "category": None},
            {"op": "similar", "query": "newbie"},
        ])
        scores, idx = out[1]
        assert svc.engine.n == 5
        assert idx[0] == 4                      # the just-upserted row wins
        assert scores[0] == pytest.approx(1.0, abs=1e-5)
    finally:
        svc.close()


def test_service_update_duplicate_key_in_one_batch_last_wins():
    svc, embed = _updatable_service(score_th=None)
    try:
        svc._run_batch([
            {"op": "update", "query": "first", "key": "z", "category": None},
            {"op": "update", "query": "second", "key": "z",
             "category": None},
        ])
        assert svc.engine.n == 5                # one row, not two
        np.testing.assert_allclose(svc.engine._emb[4], embed(["second"])[0],
                                   rtol=1e-6)
    finally:
        svc.close()


def test_http_update_end_to_end():
    svc, embed = _updatable_service(score_th=None)
    httpd = make_server(svc, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        res = _post(base + "/update", {"items": [
            {"key": "e", "text": "fresh-e"},
            {"key": "a", "text": "moved-a"},     # replace
        ]})
        assert res == {"updated": 2, "corpus": 5, "k": 5}
        got = _post(base + "/similar", {"text": "fresh-e"})["neighbors"]
        assert got[0]["key"] == "e"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["corpus"] == 5

        def err(payload):
            try:
                _post(base + "/update", payload)
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())["error"]
            raise AssertionError("expected HTTPError")

        assert err({})[0] == 400                         # no items
        assert err({"items": "x"})[0] == 400             # not a list
        assert err({"items": [{"text": "t"}]})[0] == 400  # missing key
        code, msg = err({"items": [{"key": "k", "text": "t",
                                    "category": "x"}]})
        assert code == 400 and "category" in msg          # catless server
        code, msg = err({"items": [{"key": "k"}]})        # bad query fields
        assert code == 400 and "text" in msg
    finally:
        httpd.shutdown()
        httpd.server_close()
        svc.close()
        t.join(timeout=10)


# --------------------------------------------- fused device path (1 sync)

def test_service_device_path_matches_host_path():
    """embed_queries_device keeps the tower output on device and chains it
    into the k-NN program (one readback per micro-batch). Results must be
    IDENTICAL to the host path — it is a dispatch optimization only."""
    import jax.numpy as jnp

    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    rng = np.random.default_rng(9)
    corpus = rng.normal(size=(50, 8)).astype(np.float32)
    keys = [f"k{i}" for i in range(50)]
    table = {f"q{i}": rng.normal(size=8).astype(np.float32)
             for i in range(6)}

    def embed_host(texts):
        return np.stack([table[t] for t in texts])

    def embed_device(texts):
        return jnp.asarray(embed_host(texts))

    host = SimilarityService(
        embed_host, SimilarityEngine(corpus, keys), k=7, max_wait_ms=1.0)
    dev = SimilarityService(
        embed_host, SimilarityEngine(corpus, keys), k=7, max_wait_ms=1.0,
        embed_queries_device=embed_device)
    try:
        for q in table:
            h, d = host.similar(q, score_th=None), \
                dev.similar(q, score_th=None)
            assert [g["key"] for g in h] == [g["key"] for g in d]
            # device-side vs host-side normalize round differently in the
            # last float32 ulp — ranking identical, scores approx
            np.testing.assert_allclose([g["score"] for g in h],
                                       [g["score"] for g in d], rtol=1e-5)
        # multi-item similar-only batch through the worker body
        out = dev._run_batch([{"op": "similar", "query": "q0"},
                              {"op": "similar", "query": "q1"}])
        ref = host._run_batch([{"op": "similar", "query": "q0"},
                               {"op": "similar", "query": "q1"}])
        for (ds, di), (hs, hi) in zip(out, ref):
            np.testing.assert_array_equal(np.asarray(di), np.asarray(hi))
            np.testing.assert_allclose(np.asarray(ds), np.asarray(hs),
                                       rtol=1e-5)
    finally:
        host.close()
        dev.close()


def test_service_device_path_mixed_batch_falls_back_to_host():
    """A batch containing an update (or embed) needs host vectors — the
    worker must take the host path and still produce correct results."""
    import jax.numpy as jnp
    svc, embed = _updatable_service(score_th=None)
    calls = {"device": 0}

    def embed_device(texts):
        calls["device"] += 1
        return jnp.asarray(embed(texts))

    svc._embed_queries_device = embed_device
    try:
        out = svc._run_batch([
            {"op": "update", "query": "newbie", "key": "z",
             "category": None},
            {"op": "similar", "query": "newbie"},
        ])
        assert calls["device"] == 0          # mixed batch: host path
        scores, idx = out[1]
        assert idx[0] == 4                   # update still applied first
        svc._run_batch([{"op": "similar", "query": "newbie"}])
        assert calls["device"] == 1          # similar-only batch: device
    finally:
        svc.close()


def test_oversized_direct_batch_falls_back_to_host_path():
    """_bucket_size's oversized-direct-call escape (a library/test call
    with n > max_batch, bypassing the batcher) must serve on the HOST
    path: the device paths are only compiled/validated up to batch_size
    (regression — the fused/embed_device size check used to raise out of
    the embedder and fail the whole batch)."""
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    corpus_texts = [f"{'甲乙丙丁'[i % 4]}商品{i}" for i in range(12)]
    emb = _tiny_text_embedder(corpus_texts, batch_size=4)
    eng = SimilarityEngine(emb(corpus_texts),
                           [f"k{i}" for i in range(12)])
    fused = emb.fused_similar_fn(eng, k=3)
    assert fused is not None
    svc = SimilarityService(
        lambda tt: emb(list(tt)), eng, k=3, max_batch=4, max_wait_ms=1.0,
        embed_queries_device=emb.embed_device, fused_similar=fused)
    try:
        items = [{"op": "similar", "query": t} for t in corpus_texts[:5]]
        out = svc._run_batch(items)            # n=5 > max_batch=batch_size
        assert len(out) == 5
        for row, t in enumerate(corpus_texts[:5]):
            scores, idx = out[row]
            assert eng.keys[int(np.asarray(idx)[0])] == f"k{row}"
    finally:
        svc.close()


def test_engine_search_device_queries_match_host():
    import jax.numpy as jnp

    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    rng = np.random.default_rng(2)
    corpus = rng.normal(size=(70, 12)).astype(np.float32)
    q = rng.normal(size=(5, 12)).astype(np.float32)
    for metric, norm in (("ip", True), ("l2", False)):
        eng = SimilarityEngine(corpus, list(range(70)), metric=metric,
                               normalize=norm)
        hs, hi = eng.search(9, queries=q)
        ds, di = eng.search(9, queries=jnp.asarray(q))
        np.testing.assert_array_equal(hi, di)
        np.testing.assert_allclose(hs, ds, rtol=1e-5, atol=1e-6)


def test_text_embedder_embed_device_matches_call():
    from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.pipelines.embedders import TextEmbedder
    import jax
    import jax.numpy as jnp

    texts = ["苹果 香蕉", "牛奶", "可乐 汽水 雪碧"]
    tok = TextTokenizer.from_corpus(texts)
    cfg = BertConfig.tiny()
    model = NlpTextClassifier(cfg, num_labels=3)
    ids = jnp.asarray(tok(["x"], 8)["input_ids"])
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(ids)
    emb = TextEmbedder(model, variables, tok, max_length=8, batch_size=4)
    dev = emb.embed_device(texts)
    # full padded batch (shape-stable chain); caller discards pad rows
    assert isinstance(dev, jax.Array) and dev.shape[0] == 4
    np.testing.assert_allclose(np.asarray(dev)[:3], emb(texts),
                               rtol=1e-5, atol=1e-6)
    # bucketed tower program: pads to pad_to, same values
    dev2 = emb.embed_device(texts[:2], pad_to=2)
    assert dev2.shape[0] == 2
    np.testing.assert_allclose(np.asarray(dev2), emb(texts[:2]),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="pad_to"):
        emb.embed_device(["a"] * 5)
    with pytest.raises(ValueError, match="pad_to"):
        emb.embed_device(texts[:3], pad_to=2)   # pad below len(texts)


def test_cli_serve_wires_device_path_for_bert(serve_cli):
    base, service, df = serve_cli
    assert service._embed_queries_device is not None


# ------------------------------------------- query-count bucketing (compiles)

def test_run_batch_pads_query_count_to_pow2_bucket():
    """The k-NN program compiles per query count; the worker must pad
    micro-batches to the warmed pow2 ladder (capped at max_batch) or a
    load of odd-sized batches compiles on nearly every batch (measured
    collapse: qps 15, p50 3.9 s at c=64 — benchmarks/serving_load.py)."""
    svc, embed = _updatable_service(score_th=None, max_batch=8)
    seen = []
    true_search = svc.engine.search

    def spy(k, queries=None):
        seen.append(np.asarray(queries).shape[0])
        return true_search(k, queries=queries)

    svc.engine.search = spy
    try:
        for n, bucket in [(1, 1), (2, 2), (3, 4), (5, 8), (7, 8), (8, 8)]:
            out = svc._run_batch([{"op": "similar", "query": f"q{i}"}
                                  for i in range(n)])
            assert seen[-1] == bucket, (n, seen[-1])
            # padded results are sliced off and per-row answers match an
            # unpadded single-query search exactly
            assert len(out) == n
            for i in range(n):
                s1, i1 = true_search(svc.k, queries=embed([f"q{i}"]))
                np.testing.assert_array_equal(np.asarray(out[i][1]), i1[0])
                np.testing.assert_allclose(np.asarray(out[i][0]), s1[0],
                                           rtol=1e-6)
    finally:
        svc.engine.search = true_search
        svc.close()


def test_run_batch_device_path_slices_padded_tower_output_to_bucket():
    """The device path receives the tower's FULL [batch_size, D] output
    and must slice to the pow2 bucket (one shape per bucket — an eager
    [:n] slice would compile per micro-batch size), discarding pad rows'
    results."""
    import jax.numpy as jnp
    svc, embed = _updatable_service(score_th=None, max_batch=8)

    def embed_device(texts):
        full = np.zeros((8, 4), np.float32)     # tower batch_size = 8
        full[: len(texts)] = embed(texts)
        return jnp.asarray(full)

    svc._embed_queries_device = embed_device
    seen = []
    true_search_dev = svc.engine.search_device
    svc.engine.search_device = lambda k, queries: (
        seen.append(np.asarray(queries).shape[0]) or
        true_search_dev(k, queries))
    try:
        out = svc._run_batch([{"op": "similar", "query": f"q{i}"}
                              for i in range(3)])
        assert seen[-1] == 4                    # bucket, not 3 and not 8
        assert len(out) == 3
        for i in range(3):
            s1, i1 = svc.engine.search(svc.k, queries=embed([f"q{i}"]))
            np.testing.assert_array_equal(np.asarray(out[i][1]), i1[0])
            np.testing.assert_allclose(np.asarray(out[i][0]), s1[0],
                                       rtol=1e-5)
    finally:
        svc.engine.search_device = true_search_dev
        svc.close()


def test_service_device_path_passes_bucket_pad_to():
    """A tower whose embed_device accepts pad_to runs AT the bucket —
    the worker must request exactly the bucket, and results must match
    single-query searches."""
    import jax.numpy as jnp
    svc, embed = _updatable_service(score_th=None, max_batch=8)
    pads = []

    def embed_device(texts, pad_to=None):
        pads.append(pad_to)
        full = np.zeros((pad_to, 4), np.float32)
        full[: len(texts)] = embed(texts)
        return jnp.asarray(full)

    svc._embed_queries_device = embed_device
    svc._dev_accepts_pad = True   # injected post-init; the constructor
    # inspects the real wiring path (SimilarityService(embed_queries_device=))
    try:
        out = svc._run_batch([{"op": "similar", "query": f"q{i}"}
                              for i in range(3)])
        assert pads[-1] == 4                    # the pow2 bucket, not 8
        for i in range(3):
            s1, i1 = svc.engine.search(svc.k, queries=embed([f"q{i}"]))
            np.testing.assert_array_equal(np.asarray(out[i][1]), i1[0])
            np.testing.assert_allclose(np.asarray(out[i][0]), s1[0],
                                       rtol=1e-5)
    finally:
        svc.close()


def test_service_constructor_detects_pad_to_support():
    import jax.numpy as jnp

    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    corpus = np.eye(4, dtype=np.float32)

    def with_pad(texts, pad_to=None):
        return jnp.zeros((pad_to or 4, 4), np.float32)

    def without_pad(texts):
        return jnp.zeros((len(texts), 4), np.float32)

    s1 = SimilarityService(lambda t: np.zeros((len(t), 4), np.float32),
                           SimilarityEngine(corpus, list("abcd")),
                           embed_queries_device=with_pad, max_wait_ms=1)
    s2 = SimilarityService(lambda t: np.zeros((len(t), 4), np.float32),
                           SimilarityEngine(corpus, list("abcd")),
                           embed_queries_device=without_pad,
                           max_wait_ms=1)
    try:
        assert s1._dev_accepts_pad and not s2._dev_accepts_pad
    finally:
        s1.close()
        s2.close()


def test_run_batch_bucket_cap_is_max_batch_not_pow2():
    svc, _ = _updatable_service(score_th=None, max_batch=6)
    seen = []
    true_search = svc.engine.search
    svc.engine.search = lambda k, queries=None: (
        seen.append(np.asarray(queries).shape[0]) or
        true_search(k, queries=queries))
    try:
        svc._run_batch([{"op": "similar", "query": f"q{i}"}
                        for i in range(5)])
        assert seen[-1] == 6                    # capped, not padded to 8
    finally:
        svc.engine.search = true_search
        svc.close()


# --------------------------------------- fused one-program serving path

def _tiny_text_embedder(texts, batch_size=4):
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.pipelines.embedders import TextEmbedder
    tok = TextTokenizer.from_corpus(texts)
    model = NlpTextClassifier(BertConfig.tiny(), num_labels=3)
    ids = jnp.asarray(tok(["x"], 8)["input_ids"])
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(ids)
    return TextEmbedder(model, variables, tok, max_length=8,
                        batch_size=batch_size)


def test_fused_similar_matches_unfused():
    """The fused ONE-program path (tower+normalize+k-NN) must return
    exactly what embed -> engine.search does."""
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    corpus_texts = [f"{'甲乙丙丁'[i % 4]}商品{i}" for i in range(20)]
    emb = _tiny_text_embedder(corpus_texts)
    vecs = emb(corpus_texts)
    for metric, norm in (("ip", True), ("l2", False)):
        eng = SimilarityEngine(vecs, [f"k{i}" for i in range(20)],
                               metric=metric, normalize=norm)
        fused = emb.fused_similar_fn(eng, k=5)
        assert fused is not None
        queries = corpus_texts[3:6]
        want_s, want_i = eng.search(5, queries=emb(queries))
        out = fused(queries, 4)
        assert out is not None
        dv, di = np.asarray(out[0]), np.asarray(out[1])
        np.testing.assert_array_equal(di[:3], want_i)
        np.testing.assert_allclose(dv[:3], want_s, rtol=1e-5, atol=1e-6)


def test_fused_search_fn_unsupported_engines_return_none():
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    corpus = np.eye(8, dtype=np.float32)
    tower = lambda v, x: x  # noqa: E731
    eng = SimilarityEngine(corpus, list(range(8)), approx_recall=0.95)
    assert eng.fused_search_fn(tower, 3) is None
    eng2 = SimilarityEngine(corpus, list(range(8)), backend="pallas")
    assert eng2.fused_search_fn(tower, 3) is None


def test_fused_falls_back_when_k_or_corpus_changes():
    """An /update that changes the effective k (or outgrows the corpus
    buffer) must make fused() return None — and the service must still
    answer correctly via the fallback path."""
    import jax.numpy as jnp
    svc, embed = _updatable_service(score_th=None, max_batch=8)
    fused_calls = {"live": 0, "bailed": 0}
    real_fused = svc.engine.fused_search_fn(
        lambda v, q: q, svc._k_req)   # tower = identity over host vecs
    assert real_fused is not None

    def fused_similar(texts, pad_to):
        vec = np.zeros((pad_to, 4), np.float32)
        vec[: len(texts)] = embed(texts)
        out = real_fused(None, jnp.asarray(vec))
        fused_calls["live" if out is not None else "bailed"] += 1
        return out

    svc._fused_similar = fused_similar
    try:
        got = svc.similar("q0", score_th=None)
        assert fused_calls["live"] == 1 and got
        # corpus 4 -> 5 changes k_eff (k_req=10): fused must bail and the
        # host fallback must serve the fresh corpus
        svc.update(["fresh-e"], ["e"])
        got = svc.similar("fresh-e", score_th=None)
        assert fused_calls["bailed"] >= 1
        assert got[0]["key"] == "e"
    finally:
        svc.close()


def test_cli_serve_cv_wires_fused_path(tmp_path, monkeypatch):
    """--tower cv gets the same fused one-program serving as bert on a
    single chip: decode on the handler thread, tower + normalize + k-NN
    as ONE device program, warm-up driving image payloads through every
    path, and the rebuild factory wired."""
    import cv2

    import multimodalsimilar_tpu.cli as cli
    monkeypatch.setattr(cli.serve, "_knn_backend_mesh",
                        lambda a: ("xla", None, None))
    root = tmp_path / "imgs"
    rng = np.random.default_rng(7)
    imgs = {}
    for i in range(8):
        key = f"sku{i}"
        img = rng.integers(0, 255, size=(24, 24, 3)).astype(np.uint8)
        (root / key).mkdir(parents=True)
        path = str(root / key / "0.jpg")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        imgs[key] = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    df = pd.DataFrame({"spu_sn": list(imgs)})
    data = str(tmp_path / "corpus.csv")
    df.to_csv(data, index=False)
    args = cli.build_parser().parse_args(
        ["serve", "--tower", "cv", "--data", data, "--img_root", str(root),
         "--backbone", "tiny", "--image_size", "16", "--fc_dim", "8",
         "--batch_size", "8", "--max_batch", "8", "--k", "3",
         "--score_th", "0.0", "--max_wait_ms", "2"])
    service, _ = cli._build_serve_service(args)
    try:
        assert service._fused_similar is not None
        assert service._fused_factory is not None
        assert isinstance(service._warm_payload, np.ndarray)
        cli._warm_serve_service(service, args)   # image payloads end-to-end
        from multimodalsimilar_tpu.data import images as I
        q = I.resize(imgs["sku3"], args.image_size)
        got = service.similar(q, score_th=None)
        assert got and got[0]["key"] == "sku3"
    finally:
        service.close()


def test_image_embedder_fused_matches_unfused():
    """ImageEmbedder's fused one-program path must return exactly what
    embed_batch -> engine.search does."""
    import jax

    from multimodalsimilar_tpu.models.vision import (CvImageClassifier,
                                                     backbone_config)
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    model = CvImageClassifier(backbone_config("tiny"), num_labels=3,
                              fc_dim=8)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(6, 16, 16, 3)).astype(np.uint8)
    import jax.numpy as jnp
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(jnp.asarray(
            imgs.astype(np.float32)))
    emb = ImageEmbedder(model, variables, image_size=16, batch_size=4)
    corpus = emb.embed_batch(imgs)
    engine = SimilarityEngine(corpus, [f"k{i}" for i in range(6)],
                              metric="ip", normalize=True)
    fused = emb.fused_similar_fn(engine, k=3)
    assert fused is not None
    queries = [imgs[2], imgs[5], imgs[0]]
    dv, di = fused(queries, 4)
    v_ref, i_ref = engine.search(3, queries=emb.embed_batch(
        np.stack(queries)))
    np.testing.assert_allclose(np.asarray(dv)[:3], v_ref, rtol=1e-4,
                               atol=1e-5)
    assert np.array_equal(np.asarray(di)[:3], i_ref)
    # embed_device parity at the bucket
    dev = np.asarray(emb.embed_device(queries, pad_to=4))[:3]
    np.testing.assert_allclose(dev, emb.embed_batch(np.stack(queries)),
                               rtol=1e-4, atol=1e-5)


def test_fused_rebuilds_after_corpus_growth():
    """An /update that invalidates the fused program must not downgrade
    the service forever: the background rebuild (fused_factory) compiles
    a fresh fused fn at the grown shape, warms every bucket, and swaps it
    in — while the fallback chain keeps answering correctly meanwhile."""
    import time as _time

    import jax.numpy as jnp

    svc, embed = _updatable_service(score_th=None, max_batch=8)
    calls = {"factory": 0, "live": 0}

    def make_fused():
        real = svc.engine.fused_search_fn(lambda v, q: q, svc._k_req)
        if real is None:
            return None

        def fused(texts, pad_to):
            vec = np.zeros((pad_to, 4), np.float32)
            vec[: len(texts)] = embed(texts)
            out = real(None, jnp.asarray(vec))
            if out is not None:
                calls["live"] += 1
            return out

        return fused

    def factory():
        calls["factory"] += 1
        return make_fused()

    stale = make_fused()
    svc._fused_similar = stale
    svc._fused_factory = factory
    try:
        assert svc.similar("q0", score_th=None)
        svc.update(["fresh-e"], ["e"])          # 4 -> 5 rows: k_eff moves
        # this request bails off the stale fused fn (which stays in place
        # as the probe), serves via fallback, and schedules the rebuild
        got = svc.similar("fresh-e", score_th=None)
        assert got[0]["key"] == "e"
        deadline = _time.monotonic() + 30
        while svc._fused_similar is stale and _time.monotonic() < deadline:
            _time.sleep(0.02)
        assert calls["factory"] >= 1
        assert svc._fused_similar is not stale, "rebuild never swapped in"
        before = calls["live"]
        got = svc.similar("fresh-e", score_th=None)
        assert got[0]["key"] == "e"
        assert calls["live"] > before, "request did not ride the rebuilt " \
                                       "fused path"
    finally:
        svc.close()


def test_cli_serve_update_overflow_refuses(tmp_path, monkeypatch):
    """End-to-end through the real CLI service: a corpus-overflowing
    /update downgrades to the unfused chain, then the background rebuild
    restores the fused path at the grown shape and requests ride it."""
    import time as _time

    import multimodalsimilar_tpu.cli as cli
    from multimodalsimilar_tpu.retrieval import knn
    monkeypatch.setattr(cli.serve, "_knn_backend_mesh",
                        lambda a: ("xla", None, None))
    # plan_search pads the cached corpus to a BLOCK multiple (thousands of
    # rows even for a tiny corpus) and the traced true_n absorbs appends
    # within the pad — shrink the block so a 64-row update really
    # overflows the compiled shape
    monkeypatch.setattr(knn, "plan_search",
                        lambda n, d, q: (8, n + (-n) % 8))
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(8)],
        "spu_name": [f"{'甲乙'[i % 2] * 2}商品{i}" for i in range(8)]})
    data = str(tmp_path / "corpus.csv")
    df.to_csv(data, index=False)
    args = cli.build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "4", "--k", "3", "--max_wait_ms", "2"])
    service, _ = cli._build_serve_service(args)
    try:
        stale = service._fused_similar
        assert stale is not None
        assert service._fused_factory is not None
        # 64 appended rows overflow the 8-row block padding
        service.update([f"新品{i}" for i in range(64)],
                       [f"new{i}" for i in range(64)])
        got = service.similar("新品7", score_th=None)   # fallback serves
        assert got and got[0]["key"] == "new7"
        deadline = _time.monotonic() + 120
        while service._fused_similar is stale \
                and _time.monotonic() < deadline:
            _time.sleep(0.05)
        assert service._fused_similar is not stale, "rebuild never finished"
        got = service.similar("新品3", score_th=None)
        assert got and got[0]["key"] == "new3"
    finally:
        service.close()


def test_cli_serve_wires_fused_path(tmp_path, monkeypatch):
    """On a single chip (production TPU serving) the engine is mesh-less
    and the bert tower must wire the fused one-program path. (The test
    env's 8-device CPU mesh makes the engine sharded, which correctly
    disables fusion — so pin the mesh-less case explicitly.)"""
    import multimodalsimilar_tpu.cli as cli
    monkeypatch.setattr(cli.serve, "_knn_backend_mesh",
                        lambda a: ("xla", None, None))
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(8)],
        "spu_name": [f"{'甲乙'[i % 2] * 2}商品{i}" for i in range(8)]})
    data = str(tmp_path / "corpus.csv")
    df.to_csv(data, index=False)
    args = cli.build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--k", "3", "--max_wait_ms", "2"])
    service, n = cli._build_serve_service(args)
    try:
        assert service._fused_similar is not None
        got = service.similar(df["spu_name"][2], score_th=None)
        assert got and got[0]["key"] == "sku2"
    finally:
        service.close()


# ------------------------------------- depth-1 pipelined readback (worker)

def test_microbatcher_pipelines_deferred_readback():
    """A DeferredBatch's finish() must run AFTER the next batch is
    dispatched (the readback round-trip overlaps the next batch's device
    work), and every future must still resolve with its own result."""
    from multimodalsimilar_tpu.pipelines.serving import (DeferredBatch,
                                                         MicroBatcher)
    events = []

    def run_batch(items):
        tag = items[0]
        events.append(("dispatch", tag))

        def finish():
            events.append(("finish", tag))
            return [f"r-{tag}"]

        return DeferredBatch(finish)

    mb = MicroBatcher(run_batch, max_batch=1, max_wait_ms=200)
    try:
        futs = [mb.submit_nowait(i) for i in range(3)]
        assert [f.result(timeout=10) for f in futs] == ["r-0", "r-1", "r-2"]
        assert events.index(("dispatch", 1)) < events.index(("finish", 0))
        assert events.index(("dispatch", 2)) < events.index(("finish", 1))
    finally:
        mb.close()


def test_microbatcher_partial_deferred_empty_queue_resolves_now():
    """A PARTIAL batch whose dispatch leaves the queue empty must resolve
    immediately: its own clients are blocked on the futures, so deferring
    the readback can't overlap anything — holding it pending added a full
    max_wait queue-poll stall to EVERY low-concurrency request (measured
    +max_wait p50 at c=1)."""
    import time as _time

    from multimodalsimilar_tpu.pipelines.serving import (DeferredBatch,
                                                         MicroBatcher)
    times = {}

    def run_batch(items):
        times["dispatch"] = _time.monotonic()

        def finish():
            times["finish"] = _time.monotonic()
            return ["r"] * len(items)

        return DeferredBatch(finish)

    # max_batch 8 > 1 submitted item -> the batch is partial
    mb = MicroBatcher(run_batch, max_batch=8, max_wait_ms=500)
    try:
        assert mb.submit("x") == "r"
        # without the empty-queue check the finish only runs after the
        # worker's next queue poll times out (the full 500 ms)
        assert times["finish"] - times["dispatch"] < 0.25
    finally:
        mb.close()


def test_microbatcher_full_deferred_empty_queue_resolves_now():
    """A FULL batch whose dispatch leaves the queue empty must also
    resolve immediately: at c == max_batch every client is inside the
    batch, so the queue is ALWAYS empty at this point and holding the
    readback pending added a max_wait queue-poll stall to every single
    batch (review finding on the depth-1 pipeline gating)."""
    import time as _time

    from multimodalsimilar_tpu.pipelines.serving import (DeferredBatch,
                                                         MicroBatcher)
    times = {}

    def run_batch(items):
        times["dispatch"] = _time.monotonic()

        def finish():
            times["finish"] = _time.monotonic()
            return ["r"] * len(items)

        return DeferredBatch(finish)

    # max_batch 1 == 1 submitted item -> the batch is FULL
    mb = MicroBatcher(run_batch, max_batch=1, max_wait_ms=500)
    try:
        assert mb.submit("x") == "r"
        assert times["finish"] - times["dispatch"] < 0.25
    finally:
        mb.close()


def test_microbatcher_deferred_finish_exception_propagates():
    from multimodalsimilar_tpu.pipelines.serving import (DeferredBatch,
                                                         MicroBatcher)

    def run_batch(items):
        if items[0] == "bad":
            return DeferredBatch(lambda: (_ for _ in ()).throw(
                RuntimeError("readback died")))
        return [f"ok-{items[0]}"]

    mb = MicroBatcher(run_batch, max_batch=1, max_wait_ms=5)
    try:
        with pytest.raises(RuntimeError, match="readback died"):
            mb.submit("bad")
        assert mb.submit("fine") == "ok-fine"   # worker survives
    finally:
        mb.close()


def test_microbatcher_close_finishes_pending_deferred():
    from multimodalsimilar_tpu.pipelines.serving import (DeferredBatch,
                                                         MicroBatcher)
    mb = MicroBatcher(lambda items: DeferredBatch(lambda: ["done"]),
                      max_batch=1, max_wait_ms=5000)
    fut = mb.submit_nowait("x")
    mb.close()   # must finish the in-flight deferred, not strand it
    assert fut.result(timeout=1) == "done"


def test_engine_search_device_matches_search():
    import jax.numpy as jnp

    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    rng = np.random.default_rng(11)
    corpus = rng.normal(size=(80, 6)).astype(np.float32)
    q = rng.normal(size=(5, 6)).astype(np.float32)
    for metric, norm in (("ip", True), ("l2", False)):
        eng = SimilarityEngine(corpus, list(range(80)), metric=metric,
                               normalize=norm)
        hs, hi = eng.search(9, queries=q)
        for dev_q in (q, jnp.asarray(q)):      # host and device queries
            dv, di = eng.search_device(9, dev_q)
            np.testing.assert_array_equal(hi, np.asarray(di))
            np.testing.assert_allclose(hs, np.asarray(dv), rtol=1e-5,
                                       atol=1e-6)


def test_service_pipelined_load_matches_serial_results(serve_cli):
    """Hammer the fused service from many threads (more clients than
    max_batch so the depth-1 pipeline engages) and check every answer
    equals the synchronous one."""
    base, service, df = serve_cli
    texts = [df["spu_name"][i] for i in range(16)]
    want = {t: [g["key"] for g in service.similar(t, score_th=None)]
            for t in texts}
    errs = []

    def worker(t):
        try:
            for _ in range(8):
                got = [g["key"] for g in service.similar(t, score_th=None)]
                assert got == want[t]
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs


# --------------------------------------------- --emb_table warm-start

def _emb_table_setup(tmp_path, rows=16, dim=None, key_col="spu_sn",
                     cover=None):
    """(corpus_csv, emb_table_parquet, df): a tiny corpus + a precomputed
    embedding table in the nightly jobs' layout, built from the ACTUAL
    tower a fresh `serve` run with these flags would use (tiny preset,
    vocab from the corpus — deterministic given the seed-0 init)."""
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           build_parser)
    from multimodalsimilar_tpu.pipelines.embed import format_embedding
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(rows)],
        "spu_name": [f"{'甲乙丙丁'[i % 4] * 3}商品{i}" for i in range(rows)]})
    data = str(tmp_path / "corpus.csv")
    df.to_csv(data, index=False)
    # embed the full corpus once through a plain service (no emb_table)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8",
         "--batch_size", "8", "--max_batch", "8", "--k", "5"])
    svc, _ = _build_serve_service(args)
    try:
        emb = svc.engine._emb[:rows]  # pre-padding corpus rows
        emb = np.asarray(emb, np.float32)
    finally:
        svc.close()
    cover = range(rows) if cover is None else cover
    table = pd.DataFrame({
        key_col: [f"sku{i}" for i in cover],
        "embedding": [format_embedding(emb[i]) for i in cover],
        "dt": "2026-08-19"})
    path = str(tmp_path / "warehouse.parquet")
    table.to_parquet(path)
    return data, path, df, emb


def test_serve_emb_table_skips_reembedding(tmp_path):
    """Full coverage: startup must not run a corpus tower pass (only the
    dim probe), and the served corpus must equal the table's vectors."""
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8",
         "--batch_size", "8", "--max_batch", "8", "--k", "5",
         "--emb_table", table])
    svc, n = _build_serve_service(args)
    try:
        assert n == 16
        got = np.asarray(svc.engine._emb[:16], np.float32)
        # table round-trips through decimal strings; engine re-normalizes
        want = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # end-to-end: same answers as a fresh-embedded service
        out = svc.similar(df["spu_name"][3], score_th=None)
        assert out[0]["key"] == "sku3"
    finally:
        svc.close()


def test_serve_emb_table_embeds_missing_keys_fresh(tmp_path, capsys):
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path, cover=range(12))
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8",
         "--batch_size", "8", "--max_batch", "8", "--k", "5",
         "--emb_table", table])
    svc, n = _build_serve_service(args)
    try:
        assert n == 16
        want = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        got = np.asarray(svc.engine._emb[:16], np.float32)
        # rows 12..15 embedded fresh through the SAME tower -> same values
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        svc.close()


def test_serve_emb_table_guards(tmp_path):
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path)

    # dim mismatch (table from a different model) fails fast
    import pandas as pd_
    t = pd_.read_parquet(table)
    t["embedding"] = t["embedding"].str.replace(r"\]$", ",0.5]", regex=True)
    bad = str(tmp_path / "bad.parquet")
    t.to_parquet(bad)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--emb_table", bad])
    with pytest.raises(SystemExit, match="dim"):
        _build_serve_service(args)

    # zero key overlap fails fast
    t2 = pd_.read_parquet(table)
    t2["spu_sn"] = "other_" + t2["spu_sn"]
    other = str(tmp_path / "other.parquet")
    t2.to_parquet(other)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--emb_table", other])
    with pytest.raises(SystemExit, match="overlap"):
        _build_serve_service(args)

def test_serve_cv_emb_table_warm_start(tmp_path):
    """--emb_table for the cv tower (the nightly goodssku_emb_cv_di table
    layout): covered keys serve from the table and need NO image on disk;
    missing keys embed fresh from their images; a dim mismatch with the
    tower fails fast BEFORE any tower pass."""
    import cv2

    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    from multimodalsimilar_tpu.pipelines.embed import format_embedding
    root = tmp_path / "imgs"
    rng = np.random.default_rng(3)
    n = 8
    # images only for sku0..sku5 — sku6/sku7 will live from the table alone
    for i in range(6):
        key = f"sku{i}"
        (root / key).mkdir(parents=True)
        img = rng.integers(0, 255, size=(24, 24, 3)).astype(np.uint8)
        cv2.imwrite(str(root / key / "0.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    df = pd.DataFrame({"spu_sn": [f"sku{i}" for i in range(n)]})
    data = str(tmp_path / "corpus.csv")
    df.to_csv(data, index=False)
    flags = ["serve", "--tower", "cv", "--data", data, "--img_root",
             str(root), "--backbone", "tiny", "--image_size", "16",
             "--fc_dim", "8", "--batch_size", "8", "--k", "3",
             "--score_th", "0.0", "--max_wait_ms", "2"]
    # harvest the true tower vectors once (no table)
    args = build_parser().parse_args(flags)
    svc, n0 = _build_serve_service(args)
    try:
        assert n0 == 6                       # sku6/7: no image, dropped
        vecs = {k: np.asarray(v, np.float32)
                for k, v in zip(svc.engine.keys, svc.engine._emb[:n0])}
    finally:
        svc.close()
    extra = rng.normal(size=(2, 8)).astype(np.float32)
    vecs["sku6"], vecs["sku7"] = extra[0], extra[1]
    # table covers sku2..sku7 (incl. the two imageless keys)
    tbl = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(2, 8)],
        "embedding": [format_embedding(vecs[f"sku{i}"])
                      for i in range(2, 8)]})
    table = str(tmp_path / "cv_emb.parquet")
    tbl.to_parquet(table)
    args = build_parser().parse_args(flags + ["--emb_table", table])
    svc, n1 = _build_serve_service(args)
    try:
        assert n1 == 8                       # 6 hits + sku0/1 fresh
        got = {k: np.asarray(v, np.float32)
               for k, v in zip(svc.engine.keys, svc.engine._emb[:n1])}
        for i in range(8):
            want = vecs[f"sku{i}"]
            want = want / np.linalg.norm(want)   # ip engine normalizes
            np.testing.assert_allclose(got[f"sku{i}"], want, atol=1e-4)
    finally:
        svc.close()
    # dim mismatch (9-wide table vs fc_dim 8) fails fast via the
    # embedder's known emb_dim — before any image embeds
    bad = tbl.copy()
    bad["embedding"] = bad["embedding"].str.replace(r"\]$", ",0.5]",
                                                    regex=True)
    badp = str(tmp_path / "bad_cv.parquet")
    bad.to_parquet(badp)
    args = build_parser().parse_args(flags + ["--emb_table", badp])
    with pytest.raises(SystemExit, match="dim"):
        _build_serve_service(args)


def test_serve_multimodal_emb_table_warm_start(serve_mm_cli, tmp_path):
    """--emb_table for the fused 2560-d tower: covered keys (even one
    with NO image on disk — 'ghost') serve straight from the table,
    missing keys run the fused tower pass, and the stored vectors stay
    UN-normalized (multimodal_infer's IndexFlatL2 semantics)."""
    import copy

    import multimodalsimilar_tpu.cli as cli
    from multimodalsimilar_tpu.pipelines.embed import format_embedding
    _, host_service, imgs, texts, base_args = serve_mm_cli
    eng = host_service.engine
    n = len(eng.keys)
    vecs = {k: np.asarray(eng._emb[i], np.float32)
            for i, k in enumerate(eng.keys)}
    rows = list(eng.keys)[:6] + ["ghost"]    # ghost has no image on disk
    vecs["ghost"] = np.random.default_rng(0).normal(
        size=vecs[rows[0]].shape).astype(np.float32)
    tbl = pd.DataFrame({
        "spu_sn": rows,
        "embedding": [format_embedding(vecs[k], normalize=False)
                      for k in rows]})
    table = str(tmp_path / "mm_emb.parquet")
    tbl.to_parquet(table)
    args = copy.deepcopy(base_args)
    args.emb_table = table
    svc, n_served = cli._build_serve_service(args)
    try:
        assert n_served == n + 1             # ghost lives from the table
        got = {k: np.asarray(v, np.float32)
               for k, v in zip(svc.engine.keys, svc.engine._emb[:n_served])}
        for k in list(eng.keys) + ["ghost"]:
            np.testing.assert_allclose(got[k], vecs[k], atol=1e-4,
                                       rtol=1e-4)
    finally:
        svc.close()


def test_serve_emb_table_array_typed_column(tmp_path):
    """A parquet whose embedding column holds float LISTS (the
    framework-native layout — ~20x faster to load than strings at
    warehouse counts) must serve identically to the string layout."""
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path)
    t = pd.read_parquet(table)
    t["embedding"] = [np.asarray(v, np.float32) for v in
                      (emb / np.linalg.norm(emb, axis=1, keepdims=True))]
    arr_table = str(tmp_path / "arr.parquet")
    t.to_parquet(arr_table)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--k", "5", "--emb_table", arr_table])
    svc, n = _build_serve_service(args)
    try:
        assert n == 16
        want = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(svc.engine._emb[:16], np.float32), want, atol=1e-6)
    finally:
        svc.close()


def test_serve_emb_table_restart_cache(tmp_path, monkeypatch):
    """--emb_table_cache: first start parses and mirrors to npy; a
    restart loads the mirror WITHOUT touching the parser; a table
    rewrite (mtime change) invalidates the mirror."""
    import multimodalsimilar_tpu.pipelines.embed as embed_mod
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path)
    cache = str(tmp_path / "restart_cache")
    argv = ["serve", "--data", data, "--max_length", "8",
            "--batch_size", "8", "--max_batch", "8", "--k", "5",
            "--emb_table", table, "--emb_table_cache", cache]

    svc, n = _build_serve_service(build_parser().parse_args(argv))
    svc.close()
    assert os.path.exists(os.path.join(cache, "meta.json"))

    # restart: the string parser must NOT run (cache hit)
    def boom(*a, **kw):
        raise AssertionError("parse_embeddings ran despite a valid cache")
    monkeypatch.setattr(embed_mod, "parse_embeddings", boom)
    svc2, n2 = _build_serve_service(build_parser().parse_args(argv))
    try:
        assert n2 == 16
        want = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(svc2.engine._emb[:16], np.float32), want,
            atol=1e-5)
    finally:
        svc2.close()
    monkeypatch.undo()

    # a rewritten table invalidates the mirror (content changes too:
    # drop a row -> the reparse result must win over the stale mirror)
    t = pd.read_parquet(table)
    t.iloc[:12].to_parquet(table)
    os.utime(table, (1, 1))   # force a distinct mtime
    svc3, n3 = _build_serve_service(build_parser().parse_args(argv))
    try:
        assert n3 == 16   # 12 from table + 4 embedded fresh
    finally:
        svc3.close()
    import json as _json
    with open(os.path.join(cache, "meta.json")) as f:
        assert _json.load(f)["shape"][0] == 12   # mirror was rewritten


def test_serve_emb_table_cache_key_col_mismatch_misses(tmp_path):
    """A restart with a different --key_col must MISS the npy mirror and
    re-resolve against the table — hitting would silently serve keys
    from the previously-selected column (wrong-key corpus joins)."""
    from multimodalsimilar_tpu import cli
    data, table, df, emb = _emb_table_setup(tmp_path)
    cache = str(tmp_path / "c")
    argv = ["serve", "--data", data, "--emb_table", table,
            "--emb_table_cache", cache]
    args = cli.build_parser().parse_args(argv)
    keys = np.asarray([f"sku{i}" for i in range(len(emb))], dtype=object)
    cli._emb_table_cache_store(cache, keys, emb, args)
    assert cli._emb_table_cache_load(cache, args) is not None
    other = cli.build_parser().parse_args(argv + ["--key_col", "goods_sku"])
    assert cli._emb_table_cache_load(cache, other) is None


def test_serve_emb_table_cache_requires_local_file(tmp_path):
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--emb_table", "hive://db.emb",
         "--emb_table_cache", str(tmp_path / "c")])
    with pytest.raises(SystemExit, match="local"):
        _build_serve_service(args)


def test_serve_emb_table_alternate_key_column(tmp_path):
    """The nightly jobs key by goods_sku; a table whose single non-emb
    column differs from --key_col is used with a notice."""
    from multimodalsimilar_tpu.cli import _build_serve_service, build_parser
    data, table, df, emb = _emb_table_setup(tmp_path, key_col="goods_sku")
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--k", "5", "--emb_table", table])
    svc, n = _build_serve_service(args)
    try:
        assert n == 16
        want = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(svc.engine._emb[:16], np.float32), want, atol=1e-5)
    finally:
        svc.close()


def test_http_chunked_body_is_411_and_closes(serve_cli):
    """A chunked POST (no Content-Length) would leave its body unread on
    the kept-alive socket and desync later requests — the server must
    refuse it and close the connection."""
    import http.client
    base, service, df = serve_cli
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        # headers first, body never sent: the server must 411 without
        # waiting for (or misreading) chunked body bytes. (Sending the
        # body too can EPIPE mid-send when the server rejects early —
        # also correct behavior, but not deterministic to assert on.)
        conn.putrequest("POST", "/similar")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 411
        assert b"Content-Length" in body
        assert resp.will_close
    finally:
        conn.close()


def test_http_keepalive_two_requests_one_connection(serve_cli):
    import http.client
    base, service, df = serve_cli
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        for text in (df["spu_name"][0], df["spu_name"][1]):
            conn.request("POST", "/similar",
                         body=json.dumps({"text": text}),
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = json.loads(resp.read())
            assert resp.status == 200 and data["neighbors"]
            assert not resp.will_close     # kept alive between requests
    finally:
        conn.close()


def test_parse_embeddings_chunked_path_matches():
    """>50k rows crosses the chunked-join boundary (one giant join would
    be a multi-GB transient at warehouse scale)."""
    from multimodalsimilar_tpu.pipelines.embed import (format_embedding,
                                                       parse_embeddings)
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50_003, 2)).astype(np.float32)
    strings = [format_embedding(v, normalize=False) for v in vecs]
    out = parse_embeddings(strings)
    assert out.shape == (50_003, 2)
    np.testing.assert_allclose(out, vecs, rtol=1e-6)


def test_parse_embeddings_bulk_matches_per_row():
    from multimodalsimilar_tpu.pipelines.embed import (format_embedding,
                                                       parse_embedding,
                                                       parse_embeddings)
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 7)).astype(np.float32)
    strings = [format_embedding(v, normalize=False) for v in vecs]
    # plus the bulk job's raw unbracketed layout
    strings += [format_embedding(v, normalize=False, brackets=False)
                for v in vecs[:5]]
    out = parse_embeddings(strings)
    assert out.shape == (45, 7)
    for s, row in zip(strings, out):
        np.testing.assert_allclose(row, parse_embedding(s), rtol=1e-6)
    assert parse_embeddings([]).shape == (0, 0)


def test_warm_serve_service_compiles_fallback_tower(tmp_path, monkeypatch):
    """With a fused path wired, warm-up must ALSO drive the fallback
    embed_device tower programs per bucket: a corpus-overflowing /update
    permanently downgrades requests to the unfused chain, and an
    unwarmed bucket would then pay a fresh relay tower compile under
    live traffic (the k-NN side necessarily recompiles at the grown
    corpus shape; the tower needn't). Mesh-less like production single-
    chip serving — the test env's 8-device mesh would disable fusion."""
    import multimodalsimilar_tpu.cli as cli
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           _warm_serve_service,
                                           build_parser)
    monkeypatch.setattr(cli.serve, "_knn_backend_mesh",
                        lambda a: ("xla", None, None))
    df = pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(8)],
        "spu_name": [f"商品{i}" for i in range(8)]})
    data = str(tmp_path / "c.csv")
    df.to_csv(data, index=False)
    args = build_parser().parse_args(
        ["serve", "--data", data, "--max_length", "8", "--batch_size", "8",
         "--max_batch", "8", "--k", "3", "--max_wait_ms", "2"])
    service, _ = _build_serve_service(args)
    try:
        assert service._fused_similar is not None
        pads = []
        orig = service._embed_queries_device

        def counting(texts, pad_to=None):
            pads.append(pad_to)
            return orig(texts, pad_to=pad_to)

        service._embed_queries_device = counting
        _warm_serve_service(service, args)
        # the fused arm handles the similar ladder, so every fallback
        # tower shape — INCLUDING bucket 1, the c=1 operating point —
        # must come from the explicit fallback warm loop
        assert sorted(p for p in pads if p is not None) == [1, 2, 4, 8]
    finally:
        service.close()


def test_warm_serve_service_ladder_matches_buckets(serve_cli):
    """Every bucket _search_bucketed can produce must be pre-compiled by
    the warm-up (an unwarmed bucket is a ~2-3 s relay compile spike)."""
    base, service, df = serve_cli
    # serve_cli runs with --max_batch 8: ladder is 2, 4, 8 (+ n=1 via the
    # warmup similar). Exercise every micro-batch size end-to-end.
    for n in range(1, 9):
        out = service._run_batch([{"op": "similar", "query": "苹果"}
                                  for _ in range(n)])
        assert len(out) == n


def test_image_embed_batch_buckets_partial_chunks():
    """embed_batch pads partial chunks to the pow2 BUCKET, not the full
    batch_size: padding ships real uint8 bytes through the relay, so a
    1-image ad-hoc query padded to 64@512px shipped 50 MB and measured
    2.1 s/query (round-5 daodian cv bench). Results must be identical
    across entry sizes."""
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.vision import (CvImageClassifier,
                                                     backbone_config)
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder

    model = CvImageClassifier(backbone_config("tiny"), num_labels=3,
                              fc_dim=8)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(11, 16, 16, 3)).astype(np.uint8)
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(jnp.asarray(
            imgs.astype(np.float32)))
    emb = ImageEmbedder(model, variables, image_size=16, batch_size=8)
    shapes = []
    inner = emb._run

    def spy(chunk):
        shapes.append(int(chunk.shape[0]))
        return inner(chunk)

    emb._run = spy
    full = emb.embed_batch(imgs)           # 11 = 8 + 3 -> pads [8, 4]
    assert shapes == [8, 4]
    shapes.clear()
    one = emb.embed_batch(imgs[:1])        # 1 -> bucket 1, NOT 8
    assert shapes == [1]
    shapes.clear()
    five = emb.embed_batch(imgs[:5])       # 5 -> bucket 8
    assert shapes == [8]
    np.testing.assert_allclose(one[0], full[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(five, full[:5], rtol=1e-5, atol=1e-6)
