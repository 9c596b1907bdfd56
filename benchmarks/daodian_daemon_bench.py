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

Round 5 adds the CV ARM (VERDICT missing #1 — every prior number was the
text arm over an empty CV side): `cv` builds a synthetic JPEG corpus
(one 640px image per sku), the REAL efficientnet_b4@512 tower (random
init — identical cost) and the packed embedding cache, then measures
warm() with real B4 embedding, the cache-hot restart warm, ad-hoc text
and title+image query latency under concurrency (micro-batched embeds),
and /update with a CV re-embed.

Run on the TPU:  python benchmarks/daodian_daemon_bench.py [rows] [areas]
                 python benchmarks/daodian_daemon_bench.py 2000 4 cv
CPU smoke:       JAX_PLATFORMS=cpu python benchmarks/daodian_daemon_bench.py 200 2 cv tiny
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


def _cv_corpus_images(img_root, skus, src_px=640, seed=1):
    """One synthetic JPEG per sku ({img_root}/{sku}/0.jpg): per-sku solid
    color + noise patch at a realistic source size (the downloader stores
    ~640px originals; the embedder resizes to --image_size on host)."""
    import cv2
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    for sku in skus:
        d = os.path.join(img_root, sku)
        os.makedirs(d, exist_ok=True)
        img = np.full((src_px, src_px, 3),
                      rng.integers(0, 255, 3, dtype=np.uint8)[None, None],
                      np.uint8)
        # a noise patch so JPEG sizes are realistic, not 5 KB flats
        img[: src_px // 2, : src_px // 2] = rng.integers(
            0, 255, (src_px // 2, src_px // 2, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(d, "0.jpg"), img)
    print(json.dumps({"image_corpus_s":
                      round(time.perf_counter() - t0, 1),
                      "images": len(skus)}), flush=True)


def _cv_arm(img_root, emb_cache_dir, image_size=512, fc_dim=512,
            backbone="efficientnet_b4", num_labels=4181):
    """The real production CV arm: a random-init B4 tower (weights don't
    change the COST) + the packed embedding cache, wired exactly like
    `serve --tower daodian` (cli/serve.py:_build_daodian_service)."""
    import argparse

    from multimodalsimilar_tpu.cli.embedders import _load_cv_tower
    from multimodalsimilar_tpu.pipelines.embcache import EmbeddingCache
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder

    args = argparse.Namespace(backbone=backbone, fc_dim=fc_dim,
                              image_size=image_size, emb_cache=None,
                              img_root=img_root, sku_col="sku",
                              key_col="spu_sn")
    t0 = time.perf_counter()
    model, variables = _load_cv_tower(args, None, num_labels)
    cache = EmbeddingCache(emb_cache_dir, dim=fc_dim)
    emb = ImageEmbedder(model, variables, image_size=image_size,
                        cache=cache, emb_dim=fc_dim)
    print(json.dumps({"cv_tower_build_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

    def embed_skus(area_df):
        from multimodalsimilar_tpu.cli.similar import _sku_to_spusn
        return _sku_to_spusn(area_df, emb, args)

    def embed_query_image(image):
        return emb.embed_batch(np.asarray(image)[None])[0]

    def embed_query_images(images):
        return emb.embed_batch(np.stack([np.asarray(im)
                                         for im in images]))

    return embed_skus, embed_query_image, embed_query_images, image_size


def _query_jpegs_b64(n=16, src_px=640, seed=99):
    import base64

    import cv2
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = rng.integers(0, 255, (src_px, src_px, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        out.append(base64.b64encode(buf.tobytes()).decode())
    return out


def main(rows=20_000, areas=4, cv=False, workdir=None, tiny=False):
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

    embed_skus = lambda a: {}                          # noqa: E731
    embed_query_image = embed_query_images = None
    image_size = 512
    if cv:
        import tempfile
        workdir = workdir or tempfile.mkdtemp(prefix="daodian_bench_")
        img_root = os.path.join(workdir, "imgs")
        cv_kw = (dict(image_size=32, fc_dim=16, backbone="tiny",
                      num_labels=4) if tiny else {})
        _cv_corpus_images(img_root, df["sku"].tolist(),
                          src_px=64 if tiny else 640)
        (embed_skus, embed_query_image, embed_query_images,
         image_size) = _cv_arm(img_root, os.path.join(workdir, "embcache"),
                               **cv_kw)

    svc = DaodianService(df, embed_titles, embed_skus,
                         embed_query_image=embed_query_image,
                         embed_query_images=embed_query_images,
                         area_col="area_id")
    t0 = time.perf_counter()
    svc.warm()
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    svc.warm_query_buckets(image_size if cv else None)
    print(json.dumps({"rows": rows, "areas": areas, "cv_arm": bool(cv),
                      "warm_s": round(warm_s, 1),
                      "bucket_warm_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

    if cv:
        # warm AGAIN from a fresh service over the now-populated packed
        # cache: the daemon-restart cost an operator actually pays every
        # morning (embeds are cache hits; the per-area self-search and
        # fastText table remain)
        svc2 = DaodianService(df, embed_titles, embed_skus,
                              embed_query_image=embed_query_image,
                              embed_query_images=embed_query_images,
                              area_col="area_id")
        t0 = time.perf_counter()
        svc2.warm()
        print(json.dumps({"warm_cache_hot_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)
        del svc2

    httpd = make_daodian_server(svc, port=0, image_size=image_size)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    keys = [f"s{int(i)}" for i in rng.integers(0, rows, 512)]
    call = make_http_client(port, lambda key: {"key": key})

    for c in (1, 16, 64):
        r = _closed_loop(call, keys, c, max(512, 16 * c))
        print(json.dumps({"mode": "key_lookup", "concurrency": c, **r}),
              flush=True)

    # ad-hoc TEXT queries (micro-batched fastText embed per request batch)
    adhoc_text = [{"title": titles[int(i)],
                   "lv1": int(i) % 12, "lv2": int(i) % 40,
                   "area_id": str(int(i) % areas)}
                  for i in rng.integers(0, rows, 256)]
    call_t = make_http_client(port, lambda q: q)
    for c in (1, 8, 32):
        r = _closed_loop(call_t, adhoc_text, c, max(64, 8 * c))
        print(json.dumps({"mode": "adhoc_text", "concurrency": c, **r}),
              flush=True)

    if cv:
        # ad-hoc TITLE+IMAGE queries: handler decodes/resizes on its own
        # thread, tower runs micro-batched — per-request cost is decode +
        # share of one relay uint8 H2D + B4 batch
        imgs = _query_jpegs_b64()
        adhoc_img = [dict(q, image_b64=imgs[i % len(imgs)])
                     for i, q in enumerate(adhoc_text[:64])]
        for c in (1, 8, 16):
            r = _closed_loop(call_t, adhoc_img, c, max(32, 4 * c))
            print(json.dumps({"mode": "adhoc_title_image",
                              "concurrency": c, **r}), flush=True)

    # cost accounting after one upsert: rebuild=True moves the area's
    # whole re-index INTO the update call (updater pays; timed here —
    # the cost did not vanish, it moved), and the next reader hit is
    # then cache-warm
    item = {"spu_sn": "sNEW", "area_id": "0", "sku": "999999",
            "title": titles[0], "first_level_category_id": 0,
            "second_level_category_id": 0}
    if cv:
        # the upserted sku brings a NEW image: the area re-embed is all
        # cache hits plus exactly one fresh tower call
        _cv_corpus_images(os.path.join(workdir, "imgs"), ["999999"],
                          src_px=64 if tiny else 640)
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
    svc.close()


if __name__ == "__main__":
    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    main(*nums, cv="cv" in sys.argv[1:], tiny="tiny" in sys.argv[1:])
