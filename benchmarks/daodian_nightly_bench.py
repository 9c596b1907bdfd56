"""Full nightly daodian wall-clock at production scale (round-5 VERDICT #8).

The cron job an operator actually schedules: `similar daodian` v2
date-keyed over ~100k rows x 12 areas with BOTH arms — this measures its
end-to-end wall time with a per-phase split (cv embed / text embed /
search+filter / sink), the number a nightly SLA is written against.
Match: /root/reference/daodian_infer.py:329-392 (v2 window semantics
daodian_infer_v2_recent_days.py:235,310).

Production shape: the corpus holds `--recent_days` (7) days of history;
the CV arm is mostly PACKED-CACHE HITS (the nightly job re-reads
yesterday's embeddings; only new skus — default 5% — embed fresh through
the real efficientnet_b4@512 tower). Phases are measured by wrapping the
embed callables and the KV sink; search+filter is the remainder.

Run on the TPU:
  python benchmarks/daodian_nightly_bench.py 100000 12
CPU smoke:
  JAX_PLATFORMS=cpu python benchmarks/daodian_nightly_bench.py 2000 3 tiny
"""

import datetime
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from daodian_daemon_bench import _cv_arm, _cv_corpus_images  # noqa: E402


class _TimedSink:
    def __init__(self, inner):
        self.inner = inner
        self.seconds = 0.0
        self.writes = 0

    def set_many(self, items, ttl_seconds=None):
        t0 = time.perf_counter()
        self.inner.set_many(items, ttl_seconds)
        self.seconds += time.perf_counter() - t0
        self.writes += len(items)

    def get(self, key):
        return self.inner.get(key)


def _timed(fn):
    acc = {"s": 0.0, "calls": 0}

    def wrapped(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        acc["s"] += time.perf_counter() - t0
        acc["calls"] += 1
        return out

    return wrapped, acc


def main(rows=100_000, areas=12, tiny=False, fresh_frac=0.05,
         recent_days=7):
    import pandas as pd

    from multimodalsimilar_tpu.cli import _enable_compile_cache
    from multimodalsimilar_tpu.models.fasttext import train_supervised
    from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job
    from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink
    _enable_compile_cache()

    rng = np.random.default_rng(0)
    words = [f"品{i:03d}" for i in range(800)]
    titles = [" ".join(rng.choice(words, 4)) for _ in range(rows)]
    today = datetime.date(2026, 8, 20)
    dts = [(today - datetime.timedelta(days=int(d))).isoformat()
           for d in rng.integers(0, recent_days, rows)]
    df = pd.DataFrame({
        "area_id": [i % areas for i in range(rows)],
        "spu_sn": [f"s{i}" for i in range(rows)],
        "sku": [str(i) for i in range(rows)],
        "title": titles,
        "dt": dts,
        "first_level_category_id": [i % 12 for i in range(rows)],
        "second_level_category_id": [i % 40 for i in range(rows)]})

    t0 = time.perf_counter()
    ft = train_supervised(titles[:20000], [i % 12 for i in range(
        min(rows, 20000))], dim=100, epochs=2)
    print(json.dumps({"fasttext_train_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

    # CV arm: packed cache pre-populated for 1-fresh_frac of skus (the
    # nightly reality: yesterday's embeddings re-read; new skus embed)
    workdir = tempfile.mkdtemp(prefix="daodian_nightly_")
    fc_dim = 16 if tiny else 512
    fresh = max(int(rows * fresh_frac), 1)
    fresh_skus = [str(i) for i in range(fresh)]
    t0 = time.perf_counter()
    _cv_corpus_images(os.path.join(workdir, "imgs"), fresh_skus,
                      src_px=64 if tiny else 640)
    from multimodalsimilar_tpu.pipelines.embcache import EmbeddingCache
    cache = EmbeddingCache(os.path.join(workdir, "embcache"), dim=fc_dim)
    vecs = rng.standard_normal((rows - fresh, fc_dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cache.put_many({str(i + fresh): vecs[i] for i in range(rows - fresh)})
    cache.close()
    print(json.dumps({"cache_prepopulate_s":
                      round(time.perf_counter() - t0, 1),
                      "cached": rows - fresh, "fresh": fresh}), flush=True)

    cv_kw = (dict(image_size=32, fc_dim=16, backbone="tiny",
                  num_labels=4) if tiny else {})
    embed_skus, _, _, _ = _cv_arm(os.path.join(workdir, "imgs"),
                                  os.path.join(workdir, "embcache"),
                                  **cv_kw)

    def embed_titles(tt):
        return ft.get_sentence_vector(list(tt))

    embed_titles_t, t_text = _timed(embed_titles)
    embed_skus_t, t_cv = _timed(embed_skus)
    sink = _TimedSink(InMemoryKVSink())

    t0 = time.perf_counter()
    merged = daodian_similar_job(
        df, embed_titles_t, embed_skus_t, sink,
        date_key=today.isoformat().replace("-", ""), dt_col="dt",
        target_dt=today.isoformat(), recent_days=recent_days)
    total = time.perf_counter() - t0
    other = total - t_text["s"] - t_cv["s"] - sink.seconds
    print(json.dumps({
        "mode": "nightly_v2_date_keyed", "rows": rows, "areas": areas,
        "recent_days": recent_days, "fresh_cv_skus": fresh,
        "total_s": round(total, 1),
        "cv_embed_s": round(t_cv["s"], 1),
        "text_embed_s": round(t_text["s"], 1),
        "search_filter_s": round(other, 1),
        "sink_s": round(sink.seconds, 1),
        "keys_written": sink.writes,
        "skus_with_neighbors": len(merged),
    }), flush=True)


if __name__ == "__main__":
    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    main(*nums, tiny="tiny" in sys.argv[1:])
