"""Prefetcher contract + the v2 date-window retrieval semantics."""

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.data.prefetch import prefetch_to_device
from multimodalsimilar_tpu.parallel.mesh import create_mesh
from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job
from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink
from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
from multimodalsimilar_tpu.retrieval.filters import FilterRules


def test_prefetch_preserves_order_and_shards():
    mesh = create_mesh()
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b["x"])[0, 0]) == i
        assert len(b["x"].sharding.device_set) == 8


def test_prefetch_propagates_producer_errors():
    mesh = create_mesh()

    def bad_iter():
        yield {"x": np.zeros((8, 2), np.float32)}
        raise RuntimeError("decode exploded")

    it = prefetch_to_device(bad_iter(), mesh)
    next(it)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(it)


def test_date_window_filtering():
    """daodian_infer_v2_recent_days: index all days, keep neighbors whose
    dt equals the target date only (:242-251)."""
    # identical vectors -> all mutually similar; dts differ
    emb = np.tile(np.array([[1.0, 0.0]], np.float32), (6, 1))
    keys = [f"s{i}" for i in range(6)]
    dts = ["20260815", "20260816", "20260816", "20260815", "20260816",
           "20260814"]
    eng = SimilarityEngine(emb, keys, categories=[1] * 6, dts=dts)
    rules = FilterRules(score_threshold=0.5, same_category=True,
                        require_dt="20260816")
    out = eng.similar_map(k=6, rules=rules)
    # every query only keeps target-date neighbors (s1, s2, s4), minus self
    assert set(out["s0"]) == {"s1", "s2", "s4"}
    assert set(out["s1"]) == {"s2", "s4"}


def test_daodian_date_keyed_writes():
    df = pd.DataFrame({
        "area_id": [1, 1],
        "spu_sn": ["a", "b"],
        "sku": ["1", "2"],
        "title": ["x y", "x y"],
        "first_level_category_id": [5, 5],
        "second_level_category_id": [51, 51],
        "dt": ["20260816", "20260816"]})
    kv = InMemoryKVSink()

    def embed_titles(titles):
        return np.tile(np.array([[1.0, 0.0]], np.float32), (len(titles), 1))

    # recent_days=1: this 2-row corpus is a single day of history, so the
    # v2 depth rule k=len(arr)//recent_days still reaches the one neighbor
    daodian_similar_job(df, embed_titles, lambda a: {}, kv,
                        nlp_score_th=0.5, date_key="20260816", dt_col="dt",
                        recent_days=1, ttl_seconds=int(1.5 * 24 * 3600))
    assert kv.get("20260816:a") == "b"
    assert 0 < kv.ttl("20260816:a") <= 1.5 * 24 * 3600


def test_prefetch_producer_stops_when_consumer_abandons():
    """Abandoning the generator (exception/break in the training loop) must
    release the producer thread instead of leaving it blocked on a full
    queue forever (review finding)."""
    import threading
    import time

    from multimodalsimilar_tpu.data.prefetch import prefetch_to_device
    from multimodalsimilar_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    produced = []

    def batches():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((8, 2), i, np.float32)}

    before = threading.active_count()
    it = prefetch_to_device(batches(), mesh, buffer_size=2)
    next(it)
    it.close()                      # abandon mid-stream
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 100      # producer stopped early
