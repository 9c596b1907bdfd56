"""Pipelines: sinks, batched embedders, export jobs, similar jobs, ops."""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
from multimodalsimilar_tpu.models.vision import CvImageClassifier
from multimodalsimilar_tpu.pipelines.download import copy_kv, download_images
from multimodalsimilar_tpu.pipelines.embed import (
    bulk_export, format_embedding, incremental_export, parse_embedding)
from multimodalsimilar_tpu.pipelines.embedders import (
    ImageEmbedder, TextEmbedder)
from multimodalsimilar_tpu.pipelines.similar import (
    daodian_similar_job, nlp_similar_job)
from multimodalsimilar_tpu.pipelines.sinks import (
    InMemoryKVSink, InMemoryTableSink, ParquetTableSink)
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()


def test_kv_sink_ttl():
    kv = InMemoryKVSink()
    kv.set_many({"a": "1"}, ttl_seconds=100)
    kv.set_many({"b": "2"})
    assert kv.get("a") == "1" and kv.get("b") == "2"
    assert 0 < kv.ttl("a") <= 100 and kv.ttl("b") is None


def test_parquet_table_sink(tmp_path):
    sink = ParquetTableSink(str(tmp_path / "t.parquet"))
    sink.append(pd.DataFrame({"goods_sku": ["1", "2"], "embedding": ["a", "b"]}))
    assert sink.existing_keys("goods_sku") == {"1", "2"}
    sink.append(pd.DataFrame({"goods_sku": ["3"], "embedding": ["c"]}))
    assert len(sink.read()) == 3
    sink.overwrite(pd.DataFrame({"goods_sku": ["9"], "embedding": ["z"]}))
    assert sink.existing_keys("goods_sku") == {"9"}


def test_embedding_string_round_trip():
    v = np.array([3.0, 4.0], np.float32)
    s = format_embedding(v)  # normalized
    np.testing.assert_allclose(parse_embedding(s), [0.6, 0.8], rtol=1e-6)


@pytest.fixture(scope="module")
def text_embedder_parts():
    df_texts = [f"商品{i}" for i in range(10)] + ["苹果", "牛奶"]
    tok = TextTokenizer.from_corpus(df_texts)
    model = NlpTextClassifier(BertConfig.tiny(), num_labels=3, policy=FP32)
    ids = tok(["x"], 8)
    variables = model.init({"params": jax.random.key(0)},
                           jax.numpy.asarray(ids["input_ids"]),
                           label=jax.numpy.zeros(1, jax.numpy.int32))
    return model, variables, tok


@pytest.fixture(scope="module")
def text_embedder(text_embedder_parts):
    model, variables, tok = text_embedder_parts
    return TextEmbedder(model, variables, tok, max_length=8, batch_size=4)


def test_text_embedder_batches_consistent(text_embedder):
    texts = [f"商品{i}" for i in range(7)]  # not a multiple of batch 4
    emb = text_embedder(texts)
    assert emb.shape == (7, BertConfig.tiny().hidden_size)
    # same text -> same embedding regardless of batch position
    single = text_embedder([texts[5]])
    np.testing.assert_allclose(emb[5], single[0], rtol=1e-5, atol=1e-6)


def test_text_embedder_length_buckets_match_unbucketed(text_embedder,
                                                       text_embedder_parts):
    """Length-bucketed serving must return the same embeddings in the same
    row order as the plain path (padding-invariant model + un-sort)."""
    model, variables, tok = text_embedder_parts
    rng = np.random.default_rng(0)
    # mixed lengths, shuffled so sorting actually reorders rows
    texts = ["商品" * int(n) for n in rng.integers(1, 4, size=23)]
    want = text_embedder(texts)
    bucketed = TextEmbedder(model, variables, tok, max_length=8,
                            batch_size=4, length_buckets=(3, 5))
    got = bucketed(texts)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_incremental_export_skips_existing(text_embedder):
    sink = InMemoryTableSink()
    df = pd.DataFrame({"goods_sku": ["1", "2", "3"],
                       "spu_name": ["商品1", "商品2", "商品3"]})

    def embed_fn(sub):
        em = text_embedder(sub["spu_name"].tolist())
        return dict(zip(sub["goods_sku"], em))

    n1 = incremental_export(df, embed_fn, sink, dt="2026-08-16")
    assert n1 == 3
    # second run: nothing new
    assert incremental_export(df, embed_fn, sink) == 0
    df2 = pd.concat([df, pd.DataFrame({"goods_sku": ["4"],
                                       "spu_name": ["商品4"]})])
    assert incremental_export(df2, embed_fn, sink) == 1
    table = sink.read()
    assert set(table["goods_sku"]) == {"1", "2", "3", "4"}
    # values are normalized '[...]' strings
    v = parse_embedding(table["embedding"].iloc[0])
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)


def test_incremental_export_periodic_flush_is_crash_resumable(
        text_embedder):
    """flush_rows (advisor finding): a crash mid-backfill must not lose
    the already-embedded rows — they flush periodically, and the retry's
    existing_keys pre-filter skips them."""
    sink = InMemoryTableSink()
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(6)],
                       "spu_name": [f"商品{i}" for i in range(6)]})
    calls = {"n": 0}

    def embed_fn(sub):
        calls["n"] += 1
        if calls["n"] == 3:               # crash on the 3rd chunk
            raise RuntimeError("boom")
        em = text_embedder(sub["spu_name"].tolist())
        return dict(zip(sub["goods_sku"], em))

    with pytest.raises(RuntimeError):
        incremental_export(df, embed_fn, sink, buffer_rows=2,
                           flush_rows=2)
    flushed = set(sink.read()["goods_sku"])
    assert flushed == {"0", "1", "2", "3"}    # first 2 chunks survived
    # retry embeds ONLY the missing rows (no duplicate work, no dupes)
    calls["n"] = 10
    assert incremental_export(df, embed_fn, sink, buffer_rows=2,
                              flush_rows=2) == 2
    table = sink.read()
    assert sorted(table["goods_sku"]) == [str(i) for i in range(6)]
    assert len(table) == 6


def test_bulk_export_outer_merge(text_embedder):
    sink = InMemoryTableSink()
    df = pd.DataFrame({"goods_sku": ["1", "2"],
                       "spu_name": ["商品1", "商品2"]})

    def t_fn(sub):
        return dict(zip(sub["goods_sku"],
                        text_embedder(sub["spu_name"].tolist())))

    def partial_fn(sub):  # embedder that only covers sku 1
        sub = sub[sub["goods_sku"] == "1"]
        return dict(zip(sub["goods_sku"],
                        text_embedder(sub["spu_name"].tolist())))

    merged = bulk_export(df, {"bert": t_fn, "cv": partial_fn}, sink)
    assert set(merged.columns) == {"goods_sku", "bert_emb", "cv_emb"}
    assert merged["cv_emb"].isna().sum() == 1  # outer merge keeps sku 2


def test_nlp_similar_job(text_embedder):
    kv = InMemoryKVSink()
    df = pd.DataFrame({
        "spu_sn": [f"s{i}" for i in range(6)],
        "spu_name": ["苹果", "苹果", "苹果", "牛奶", "牛奶", "牛奶"]})
    # random-init towers map different titles to high-cosine embeddings, so
    # the threshold is set to isolate exact-duplicate titles (cosine == 1)
    written = nlp_similar_job(df, text_embedder, kv, k=6, score_th=0.99999)
    assert written == 6
    # identical titles are mutual neighbors with cosine 1
    val = kv.get("dj_similar:s0")
    assert set(val.split(",")) == {"s1", "s2"}


def _write_img(path, color):
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.full((20, 20, 3), color, np.uint8)
    cv2.imwrite(path, img)


def test_image_embedder_cache_and_multi_image(tmp_path):
    model = CvImageClassifier(EfficientNetConfig.tiny(), num_labels=3,
                              fc_dim=8, policy=FP32)
    x = jax.numpy.zeros((1, 16, 16, 3))
    variables = model.init({"params": jax.random.key(0)}, x,
                           label=jax.numpy.zeros(1, jax.numpy.int32))
    root = str(tmp_path)
    _write_img(f"{root}/100/0.jpg", 200)
    _write_img(f"{root}/100/1.jpg", 50)   # second image differs
    _write_img(f"{root}/200/0.jpg", 90)

    emb = ImageEmbedder(model, variables, image_size=16, batch_size=4,
                        cache_path_for_key=lambda k: f"{root}/{k}/emb.txt")

    def paths(key):
        return [f"{root}/{key}/{i}.jpg" for i in range(8)]

    out = emb.embed_keys(["100", "200", "404"], paths)
    assert set(out) == {"100", "200"}           # missing sku skipped
    assert os.path.exists(f"{root}/100/emb.txt")  # cache written
    # multi-image mean: equals mean of the two single-image embeddings
    singles = emb.embed_paths([f"{root}/100/0.jpg", f"{root}/100/1.jpg"])
    want = np.mean(list(singles.values()), axis=0)
    np.testing.assert_allclose(out["100"], want, rtol=1e-4, atol=1e-5)
    # cache hit path: second call must load from emb.txt (delete images)
    os.remove(f"{root}/100/0.jpg")
    os.remove(f"{root}/100/1.jpg")
    again = emb.embed_keys(["100"], paths)
    np.testing.assert_allclose(again["100"], out["100"], rtol=1e-4)


def test_daodian_similar_job(tmp_path, text_embedder):
    kv = InMemoryKVSink()
    # 2 areas x 4 skus; identical titles within category
    df = pd.DataFrame({
        "area_id": [1, 1, 1, 1, 2, 2],
        "spu_sn": ["a1", "a2", "a3", "a4", "b1", "b2"],
        "sku": ["1", "2", "3", "4", "5", "6"],
        "title": ["苹果", "苹果", "牛奶", "牛奶", "苹果", "苹果"],
        "first_level_category_id": [10, 10, 20, 20, 10, 10],
        "second_level_category_id": [11, 11, 21, 21, 11, 11]})

    def embed_skus(area_df):
        # deterministic fake CV embeddings: same lv2 -> same vector
        rng = {}
        out = {}
        for _, r in area_df.iterrows():
            v = np.zeros(4, np.float32)
            v[r["second_level_category_id"] % 4] = 1.0
            out[r["spu_sn"]] = v
        return out

    merged = daodian_similar_job(df, text_embedder, embed_skus, kv,
                                 nlp_score_th=0.5, cv_score_th=0.5)
    # a1's neighbors: a2 (same lv1+lv2, identical title & cv vector)
    assert "a2" in merged["a1"]
    assert "b1" not in merged["a1"]  # other area never mixes
    assert kv.get("a1") is not None


def test_daodian_v2_ttl_and_dt_format(text_embedder):
    """Review fixes: date-keyed writes default to the reference's 1.5-day
    TTL (daodian_infer_v2_*.py:342), and raw 'yyyy-mm-dd' dt values match a
    compacted 'yyyymmdd' date_key (the reference mixes both formats)."""
    kv = InMemoryKVSink()
    df = pd.DataFrame({
        "area_id": [1] * 4,
        "spu_sn": ["a1", "a2", "a3", "a4"],
        "title": ["苹果", "苹果", "苹果", "苹果"],
        "first_level_category_id": [10] * 4,
        "second_level_category_id": [11] * 4,
        "dt": ["2026-08-16", "2026-08-16", "2026-08-15", "2026-08-15"]})
    merged = daodian_similar_job(
        df, text_embedder, lambda a: {}, kv,
        nlp_score_th=0.5, date_key="20260816", dt_col="dt",
        recent_days=2, ttl_seconds=None)
    # only same-day neighbors survive the window despite the dash format
    assert merged["a1"] == ["a2"]
    assert "a3" not in merged["a1"]
    assert 0 < kv.ttl("20260816:a1") <= int(1.5 * 24 * 3600)


def test_rebuild_export_refreshes_and_drops():
    """goodssku_emb_cv_di.py semantics: full overwrite — re-embedded keys
    refresh, keys absent from today's catalog drop out."""
    from multimodalsimilar_tpu.pipelines.embed import (
        parse_embedding, rebuild_export)
    sink = InMemoryTableSink()
    df1 = pd.DataFrame({"goods_sku": ["1", "2"]})
    vecs = {"1": np.array([1.0, 0.0]), "2": np.array([0.0, 1.0])}
    embed = lambda sub: {k: vecs[k] for k in sub["goods_sku"]}  # noqa: E731
    rebuild_export(df1, embed, sink, dt="2026-08-16")
    assert sink.existing_keys("goods_sku") == {"1", "2"}
    # day 2: sku 2 departed, sku 1 re-embedded with a NEW vector
    vecs = {"1": np.array([0.6, 0.8])}
    rebuild_export(pd.DataFrame({"goods_sku": ["1"]}), embed, sink,
                   dt="2026-08-17")
    table = sink.read()
    assert sink.existing_keys("goods_sku") == {"1"}   # 2 dropped
    np.testing.assert_allclose(
        parse_embedding(table.embedding.iloc[0]), [0.6, 0.8], rtol=1e-6)


def test_bulk_export_reference_raw_format(text_embedder):
    """The bulk job writes RAW values: unnormalized, ','-joined, no
    brackets (goodssku_emb.py:92-93,114-115,131-133); only the _di
    incremental variants normalize and bracket."""
    from multimodalsimilar_tpu.pipelines.embed import bulk_export
    sink = InMemoryTableSink()
    df = pd.DataFrame({"goods_sku": ["1"], "spu_name": ["商品1"]})

    def embed_fn(sub):
        return {"1": np.array([3.0, 4.0], np.float32)}

    out = bulk_export(df, {"cv": embed_fn}, sink)
    s = out["cv_emb"].iloc[0]
    assert not s.startswith("[")                  # no brackets
    np.testing.assert_allclose([float(x) for x in s.split(",")],
                               [3.0, 4.0])       # unnormalized


def test_multi_image_stops_at_first_gap(tmp_path, text_embedder):
    """Sequentially-numbered image sets END at the first missing file
    (daodian_infer.py:269-280); images after a gap are not averaged in,
    and a folder without 0.jpg yields no embedding at all."""
    import cv2

    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.vision import CvImageClassifier
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    ecfg = EfficientNetConfig(stages=((1, 8, 1, 1, 3),), stem_channels=8,
                              head_channels=16, drop_path_rate=0.0)
    model = CvImageClassifier(ecfg, num_labels=2, fc_dim=4,
                              policy=DTypePolicy.full_precision())
    import jax
    import jax.numpy as jnp
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 16, 16, 3)),
                           label=jnp.zeros(1, jnp.int32))
    emb = ImageEmbedder(model, variables, image_size=16, batch_size=2)
    root = str(tmp_path)
    for key, present in (("k", [0, 1, 3]), ("nolead", [1, 2])):
        os.makedirs(f"{root}/{key}")
        for j in present:
            cv2.imwrite(f"{root}/{key}/{j}.jpg",
                        np.full((16, 16, 3), 40 * (j + 1), np.uint8))

    def paths(kk):
        return [f"{root}/{kk}/{j}.jpg" for j in range(8)]

    out = emb.embed_keys(["k", "nolead"], paths)
    assert "nolead" not in out                    # no 0.jpg -> skipped
    # 'k' averaged images 0,1 only (3.jpg is after the gap): equal to
    # embedding the same two images directly
    direct = emb.embed_paths([f"{root}/k/0.jpg", f"{root}/k/1.jpg"])
    want = np.mean([direct[f"{root}/k/0.jpg"], direct[f"{root}/k/1.jpg"]],
                   axis=0)
    np.testing.assert_allclose(out["k"], want, rtol=1e-4, atol=1e-5)


def test_download_and_copy_kv(tmp_path):
    fetched = []

    def fake_fetch(url):
        fetched.append(url)
        return b"JPEGDATA"

    items = [("1", "0", "http://x/1.jpg"), ("2", "0", "http://x/2.jpg")]
    ok, failed = download_images(items, str(tmp_path), fake_fetch, threads=2)
    assert ok == 2 and failed == 0
    # skip-if-exists
    ok2, _ = download_images(items, str(tmp_path), fake_fetch)
    assert ok2 == 0
    src, dst = InMemoryKVSink(), InMemoryKVSink()
    src.set_many({"k1": "v1", "k2": "v2"})
    assert copy_kv(src, dst, ["k1", "k2", "missing"]) == 2
    assert dst.get("k1") == "v1" and dst.ttl("k1") > 0


def test_parquet_sink_appends_are_parts_not_rewrites(tmp_path):
    """append() must not rewrite the whole table per flush (quadratic
    backfill I/O): later appends land as sidecar parts visible to
    read()/existing_keys(), and compact() merges them into the one file
    external consumers read."""
    import os

    from multimodalsimilar_tpu.pipelines.sinks import ParquetTableSink

    path = str(tmp_path / "t.parquet")
    sink = ParquetTableSink(path)
    sink.append(pd.DataFrame({"k": ["a"], "v": ["1"]}))
    main_mtime = os.path.getmtime(path)
    sink.append(pd.DataFrame({"k": ["b"], "v": ["2"]}))
    sink.append(pd.DataFrame({"k": ["c"], "v": ["3"]}))
    assert os.path.getmtime(path) == main_mtime     # main untouched
    assert len(sink._part_files()) == 2
    assert sink.existing_keys("k") == {"a", "b", "c"}
    assert sorted(sink.read()["k"]) == ["a", "b", "c"]
    # a FRESH instance (crash + retry) sees the parts too
    assert ParquetTableSink(path).existing_keys("k") == {"a", "b", "c"}
    sink.compact()
    assert not sink._part_files()
    assert sorted(pd.read_parquet(path)["k"]) == ["a", "b", "c"]
    # overwrite drops parts as well
    sink.append(pd.DataFrame({"k": ["d"], "v": ["4"]}))
    sink.overwrite(pd.DataFrame({"k": ["z"], "v": ["9"]}))
    assert list(pd.read_parquet(path)["k"]) == ["z"]
    assert not sink._part_files()


def test_incremental_export_compacts_on_success(tmp_path):
    from multimodalsimilar_tpu.pipelines.embed import incremental_export
    from multimodalsimilar_tpu.pipelines.sinks import ParquetTableSink

    path = str(tmp_path / "t.parquet")
    sink = ParquetTableSink(path)
    df = pd.DataFrame({"goods_sku": [f"k{i}" for i in range(10)]})

    def embed_fn(sub):
        return {k: np.ones(4, np.float32) for k in sub["goods_sku"]}

    n = incremental_export(df, embed_fn, sink, buffer_rows=3,
                           flush_rows=3, dt="2026-08-18")
    assert n == 10
    assert not sink._part_files()              # compacted
    out = pd.read_parquet(path)
    assert len(out) == 10
    # rerun: everything skipped
    assert incremental_export(df, embed_fn, sink, buffer_rows=3,
                              flush_rows=3) == 0


def test_incremental_export_collapses_in_df_duplicate_keys(tmp_path):
    """existing_keys only guards the SINK's keys: a key recurring within
    the input df (raw extract without the reference's group-by) must
    still export once, not append twice across flushes."""
    from multimodalsimilar_tpu.pipelines.embed import incremental_export
    from multimodalsimilar_tpu.pipelines.sinks import ParquetTableSink

    sink = ParquetTableSink(str(tmp_path / "t.parquet"))
    df = pd.DataFrame({"goods_sku": ["a", "b", "a", "c", "b"]})

    def embed_fn(sub):
        return {k: np.ones(4, np.float32) for k in sub["goods_sku"]}

    n = incremental_export(df, embed_fn, sink, buffer_rows=2, flush_rows=2)
    assert n == 3
    out = sink.read()
    assert sorted(out["goods_sku"]) == ["a", "b", "c"]
