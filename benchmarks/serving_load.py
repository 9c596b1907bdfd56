"""Load-test the online serving daemon (``cli serve``) on the real chip.

The serve path is new this round and PERF.md has no measured numbers for
it. This benchmark drives the PRODUCTION stack — ``_build_serve_service``
(the exact object ``cmd_serve`` runs), roberta-base text tower, 100k-row
corpus embedded at startup, engine search k=13 — with closed-loop
concurrent clients, and reports QPS + latency percentiles per concurrency
level. Concurrency 1 IS the reference's operating point (one synchronous
query at a time, like a consumer GETting precomputed KV would behave if
it had to compute online: nlp_infer.py:127-140 embeds batch-1 per row);
the higher levels show what the MicroBatcher's coalescing buys (requests
arriving within max_wait_ms of each other share one padded device
program: embed -> k-NN).

Also measured: the same closed loop through a real loopback HTTP server
(ThreadingHTTPServer + urllib clients), so the JSON/HTTP host overhead is
quantified separately from the device path — this host has ONE slow CPU
(CLAUDE.md), so it is a real tax worth knowing.

Run on the TPU (single chip, nothing else on it):
    python benchmarks/serving_load.py [corpus_rows]
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from serving_roofline import bw_probe, pool_probe  # noqa: E402

LEVELS = (1, 4, 16, 64)
REQUESTS_PER_LEVEL = 192
MAX_BATCH = 64
MAX_WAIT_MS = 5.0


def _make_corpus(path, rows):
    """Synthetic catalog with realistic title lengths (~21 chars,
    CLAUDE.md 'Seq buckets')."""
    import pandas as pd
    rng = np.random.default_rng(0)
    words = [f"品{i:03d}" for i in range(500)]
    titles = [" ".join(rng.choice(words, 4)) + f" 商品{i}"
              for i in range(rows)]
    pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(rows)],
        "spu_name": titles,
        "lv1": [str(i % 30) for i in range(rows)],
    }).to_csv(path, index=False)
    return titles


def _closed_loop(call, queries, concurrency, n_requests):
    """``concurrency`` threads each issue requests back-to-back until
    ``n_requests`` total have completed; per-request latencies recorded."""
    lat = []
    lock = threading.Lock()
    it = iter(range(n_requests))

    def worker():
        while True:
            with lock:
                try:
                    i = next(it)
                except StopIteration:
                    return
            q = queries[i % len(queries)]
            t0 = time.perf_counter()
            call(q)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.sort(np.asarray(lat))
    return {
        "qps": round(n_requests / wall, 1),
        "p50_ms": round(float(lat[int(0.50 * (len(lat) - 1))]) * 1e3, 1),
        "p95_ms": round(float(lat[int(0.95 * (len(lat) - 1))]) * 1e3, 1),
        "p99_ms": round(float(lat[int(0.99 * (len(lat) - 1))]) * 1e3, 1),
    }


def _level_stats(service, before):
    after = service.stats
    batches = after["batches"] - before["batches"]
    items = after["items"] - before["items"]
    return {"mean_batch": round(items / max(batches, 1), 1)}


def main():
    import tempfile

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           _enable_compile_cache,
                                           build_parser)
    from multimodalsimilar_tpu.pipelines.serving import make_server
    _enable_compile_cache()

    tmp = tempfile.mkdtemp(prefix="serving_load_")
    data = os.path.join(tmp, "catalog.csv")
    titles = _make_corpus(data, rows)
    import jax
    probe = jax.default_backend() != "cpu"  # probes are minutes on CPU
    if probe:
        print(json.dumps({"pool_probe_tflops": pool_probe(),
                          "pool_probe_hbm_gbps": bw_probe()}), flush=True)

    args = build_parser().parse_args(
        ["serve", "--data", data, "--text_col", "spu_name",
         "--category_col", "lv1", "--max_length", "64",
         "--batch_size", str(MAX_BATCH), "--max_batch", str(MAX_BATCH),
         "--max_wait_ms", str(MAX_WAIT_MS), "--k", "13"])
    t0 = time.perf_counter()
    service, n = _build_serve_service(args)
    print(json.dumps({"corpus": n,
                      "startup_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    # UNSEEN queries (the daemon's reason to exist): perturbed corpus titles
    rng = np.random.default_rng(7)
    queries = [titles[i] + " 新款" for i in rng.integers(0, rows, 512)]
    service.similar(queries[0], k=1)           # warm embed + k-NN programs

    for c in LEVELS:
        before = service.stats
        r = _closed_loop(lambda q: service.similar(q), queries, c,
                         REQUESTS_PER_LEVEL)
        r.update(_level_stats(service, before))
        print(json.dumps({"mode": "inproc", "concurrency": c, **r}),
              flush=True)

    # HTTP overhead at one mid level: real server + urllib clients
    import urllib.request
    httpd = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def http_call(q):
        body = json.dumps({"text": q}).encode()
        with urllib.request.urlopen(
                urllib.request.Request(base + "/similar", data=body),
                timeout=120) as resp:
            json.loads(resp.read())

    for c in (16,):
        before = service.stats
        r = _closed_loop(http_call, queries, c, REQUESTS_PER_LEVEL)
        r.update(_level_stats(service, before))
        print(json.dumps({"mode": "http", "concurrency": c, **r}),
              flush=True)

    httpd.shutdown()
    httpd.server_close()
    service.close()
    if probe:
        print(json.dumps({"pool_probe_tflops_end": pool_probe()}),
              flush=True)


if __name__ == "__main__":
    main()
