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

# 128 > max_batch: the depth-1 pipelined readback only engages when
# clients outnumber one batch (otherwise the queue drains empty while
# the batch is in flight)
LEVELS = (1, 4, 16, 64, 128)


def _requests_for(concurrency):
    # percentiles need enough MICRO-BATCHES, not just requests: at c=64 a
    # fixed 192 requests is only ~3 batches, so one relay hiccup owned
    # p95 AND p99 (observed 2.2 s spikes swinging qps 2x run-to-run)
    return max(192, 12 * concurrency)


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


def make_http_client(port, make_body, path="/similar",
                     host="127.0.0.1", timeout=120):
    """Thread-local keep-alive POST client (one persistent HTTP/1.1
    connection per worker thread — ThreadingHTTPServer spawns a thread
    per CONNECTION, so connection-per-request doubles as thread churn
    on this 1-CPU host). ``make_body(q) -> dict`` builds the JSON
    payload. Raises on non-200 (http.client never raises on HTTP
    errors — a 500 counted as a successful latency would hide a broken
    server) and validates the response body parses as JSON."""
    import http.client
    tls = threading.local()

    def call(q):
        conn = getattr(tls, "conn", None)
        if conn is None:
            conn = http.client.HTTPConnection(host, port, timeout=timeout)
            tls.conn = conn
        try:
            conn.request("POST", path, body=json.dumps(make_body(q)),
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = resp.read()
        except Exception:
            tls.conn = None
            conn.close()
            raise
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {data[:200]!r}")
        return json.loads(data)

    return call


def _closed_loop(call, queries, concurrency, n_requests):
    """``concurrency`` threads each issue requests back-to-back until
    ``n_requests`` total have completed; per-request latencies recorded.
    A failed request counts as an error instead of silently killing its
    worker (which would understate both load and latency)."""
    lat, errors = [], []
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
            try:
                call(q)
            except Exception as e:
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                continue
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
    out = {"qps": round(len(lat) / wall, 1)}
    if len(lat):   # all-failed runs must still report, not IndexError
        for name, q in (("p50_ms", 0.50), ("p95_ms", 0.95),
                        ("p99_ms", 0.99)):
            out[name] = round(float(lat[int(q * (len(lat) - 1))]) * 1e3, 1)
    if errors:
        out["errors"] = len(errors)
        out["first_error"] = errors[0]
    return out


def _level_stats(service, before):
    after = service.stats
    batches = after["batches"] - before["batches"]
    items = after["items"] - before["items"]
    return {"mean_batch": round(items / max(batches, 1), 1)}


def _make_emb_table(path, rows, dim=768):
    """Synthetic warehouse embedding table: array-typed parquet (the
    framework-native layout _load_emb_table reads without string
    parsing). Random unit vectors — scores are meaningless but the
    serving-path COST is identical to real embeddings."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(1)
    flat = rng.standard_normal(rows * dim).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
    pq.write_table(pa.table({"spu_sn": [f"sku{i}" for i in range(rows)],
                             "embedding": arr}), path)


def main():
    import tempfile

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    warehouse = "warehouse" in sys.argv[2:]
    # 'large' runs the reference's HEADLINE backbone through the daemon
    # (roberta-wwm-ext-large; round-4 VERDICT #1's online complement)
    preset = "large" if "large" in sys.argv[2:] else "base"
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           _enable_compile_cache,
                                           _warm_serve_service,
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

    argv = ["serve", "--data", data, "--text_col", "spu_name",
            "--category_col", "lv1", "--max_length", "64",
            # the production text tower (nlp_infer.py's roberta-wwm-ext),
            # not the parser's tiny default — fresh weights, same FLOPs
            "--bert_preset", preset,
            "--batch_size", str(MAX_BATCH), "--max_batch", str(MAX_BATCH),
            "--max_wait_ms", str(MAX_WAIT_MS), "--k", "13"]
    if warehouse:
        # warm-start the corpus from a precomputed table instead of a
        # startup tower pass — the warehouse-scale operating mode
        table = os.path.join(tmp, "warehouse.parquet")
        t0 = time.perf_counter()
        _make_emb_table(table, rows)
        print(json.dumps({"emb_table_rows": rows,
                          "emb_table_build_s":
                              round(time.perf_counter() - t0, 1)}),
              flush=True)
        argv += ["--emb_table", table,
                 "--emb_table_cache", os.path.join(tmp, "restart")]
    args = build_parser().parse_args(argv)
    t0 = time.perf_counter()
    service, n = _build_serve_service(args)
    t1 = time.perf_counter()
    # production startup: tower shape + every pow2 k-NN query bucket
    # (unwarmed buckets land ~2 s compile spikes in each level's p99)
    _warm_serve_service(service, args)
    print(json.dumps({"corpus": n, "startup_s": round(t1 - t0, 1),
                      "warm_s": round(time.perf_counter() - t1, 1)}),
          flush=True)
    if warehouse:
        # a daemon RESTART's table load: the first build above parsed the
        # table cold and wrote the npy restart cache
        from multimodalsimilar_tpu.cli import _load_emb_table
        t0 = time.perf_counter()
        k2, e2 = _load_emb_table(args)
        print(json.dumps({"restart_table_load_s":
                          round(time.perf_counter() - t0, 2),
                          "rows": int(e2.shape[0])}), flush=True)
        del k2, e2

    # UNSEEN queries (the daemon's reason to exist): perturbed corpus titles
    rng = np.random.default_rng(7)
    queries = [titles[i] + " 新款" for i in rng.integers(0, rows, 512)]

    for c in (16, 64) if warehouse else LEVELS:
        before = service.stats
        r = _closed_loop(lambda q: service.similar(q), queries, c,
                         _requests_for(c))
        r.update(_level_stats(service, before))
        print(json.dumps({"mode": "inproc", "concurrency": c, **r}),
              flush=True)
    if warehouse:   # the corpus-scale point is made; skip A/B + http
        service.close()
        if probe:
            print(json.dumps({"pool_probe_tflops_end": pool_probe()}),
                  flush=True)
        return

    # path A/B at c=1, INTERLEAVED (pool drift swings whole runs 2x —
    # CLAUDE.md — so the arms must alternate in-process): fused = ONE
    # program per request; chain = tower + eager normalize + k-NN
    # programs, one readback; host = two sync round-trips
    fused_fn = service._fused_similar
    device_fn = service._embed_queries_device
    if device_fn is not None:
        arms = [("fused", fused_fn, device_fn)] if fused_fn else []
        arms += [("chain", None, device_fn), ("host", None, None)]
        ab = {name: [] for name, _, _ in arms}
        for _ in range(4):
            for name, f, d in arms:
                service._fused_similar = f
                service._embed_queries_device = d
                r = _closed_loop(lambda q: service.similar(q), queries,
                                 1, 48)
                ab[name].append(r["p50_ms"])
        service._fused_similar = fused_fn
        service._embed_queries_device = device_fn
        print(json.dumps({"mode": "ab_c1_p50_ms",
                          **{n: min(v) for n, v in ab.items()},
                          **{f"rounds_{n}": v for n, v in ab.items()}}),
              flush=True)

    # HTTP overhead at one mid level: real server + keep-alive clients
    # (one persistent connection per worker — the server speaks HTTP/1.1,
    # and ThreadingHTTPServer spawns a thread per CONNECTION, so
    # connection-per-request doubled as thread churn on this 1-CPU host)
    httpd = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    http_call = make_http_client(port, lambda q: {"text": q})

    for c in (16,):
        before = service.stats
        r = _closed_loop(http_call, queries, c, _requests_for(c))
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
