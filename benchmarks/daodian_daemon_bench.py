"""serve --tower daodian at scale: warm cost + per-key lookup throughput.

The merged daodian daemon (round 4) precomputes each area's merged map
via the batch job's own code path and answers per-key requests from it.
This measures the two costs that matter operationally:

* warm(): per-area embed + both similar_maps (the nightly job's whole
  compute, held hot) — run on the real chip;
* steady-state /similar {"key"} lookups over real HTTP (closed loop) —
  pure host work, the daemon's serving ceiling;
* one /update each way: rebuild=True (the re-index cost inside the
  update call itself — the updater pays, the next hit is warm) and
  rebuild=False (deferred — the next reader's first hit pays it).

Run on the TPU:  python benchmarks/daodian_daemon_bench.py [rows] [areas]
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

from serving_load import _closed_loop, make_http_client  # noqa: E402


def main(rows=20_000, areas=4):
    import pandas as pd

    from multimodalsimilar_tpu.cli import _enable_compile_cache
    from multimodalsimilar_tpu.models.fasttext import train_supervised
    from multimodalsimilar_tpu.pipelines.daodian_serving import (
        DaodianService, make_daodian_server)
    _enable_compile_cache()

    rng = np.random.default_rng(0)
    words = [f"品{i:03d}" for i in range(500)]
    titles = [" ".join(rng.choice(words, 4)) for _ in range(rows)]
    df = pd.DataFrame({
        "area_id": [i % areas for i in range(rows)],
        "spu_sn": [f"s{i}" for i in range(rows)],
        "sku": [str(i) for i in range(rows)],
        "title": titles,
        "first_level_category_id": [i % 12 for i in range(rows)],
        "second_level_category_id": [i % 40 for i in range(rows)]})

    t0 = time.perf_counter()
    ft = train_supervised(titles[: min(rows, 20000)],
                          [i % 12 for i in range(min(rows, 20000))],
                          dim=100, epochs=2)
    print(json.dumps({"fasttext_train_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

    def embed_titles(tt):
        return ft.get_sentence_vector(list(tt))

    svc = DaodianService(df, embed_titles, lambda a: {},   # text arm only
                         area_col="area_id")
    t0 = time.perf_counter()
    svc.warm()
    warm_s = time.perf_counter() - t0
    print(json.dumps({"rows": rows, "areas": areas,
                      "warm_s": round(warm_s, 1)}), flush=True)

    httpd = make_daodian_server(svc, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    keys = [f"s{int(i)}" for i in rng.integers(0, rows, 512)]
    call = make_http_client(port, lambda key: {"key": key})

    for c in (1, 16, 64):
        r = _closed_loop(call, keys, c, max(512, 16 * c))
        print(json.dumps({"mode": "key_lookup", "concurrency": c, **r}),
              flush=True)

    # cost accounting after one upsert: rebuild=True moves the area's
    # whole re-index INTO the update call (updater pays; timed here —
    # the cost did not vanish, it moved), and the next reader hit is
    # then cache-warm
    item = {"spu_sn": "sNEW", "area_id": "0", "sku": "999999",
            "title": titles[0], "first_level_category_id": 0,
            "second_level_category_id": 0}
    t0 = time.perf_counter()
    svc.update([item])
    update_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    svc.similar_key("sNEW")
    print(json.dumps({"update_rebuild_s": round(update_s, 2),
                      "post_update_first_hit_s":
                      round(time.perf_counter() - t0, 2)}), flush=True)
    # rebuild=False defers the re-index to the next reader: that first
    # hit pays the area's whole rebuild
    item["title"] = titles[1]
    t0 = time.perf_counter()
    svc.update([item], rebuild=False)
    update_defer_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    svc.similar_key("sNEW")
    print(json.dumps({"update_deferred_s": round(update_defer_s, 3),
                      "deferred_first_hit_s":
                      round(time.perf_counter() - t0, 2)}), flush=True)
    httpd.shutdown()
    httpd.server_close()


if __name__ == "__main__":
    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    main(*nums)
