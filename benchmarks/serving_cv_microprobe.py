"""Decompose the cv-serving per-batch cost (round 4: the load test found
~2 s per micro-batch at EVERY batch size — something fixed per batch, not
per image; this isolates which piece)."""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def t(fn, n=5):
    fn()                       # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3, 1)


def main():
    rows = 20_000
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           _enable_compile_cache,
                                           _warm_serve_service,
                                           build_parser)
    from serving_load_image import _make_emb_table, _make_query_jpegs
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="cv_probe_")
    data = os.path.join(tmp, "catalog.csv")
    pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(rows)],
        "lv2": [str(i % 30) for i in range(rows)],
    }).to_csv(data, index=False)
    table = os.path.join(tmp, "emb.parquet")
    _make_emb_table(table, rows, 512)
    args = build_parser().parse_args(
        ["serve", "--tower", "cv", "--data", data, "--key_col", "spu_sn",
         "--category_col", "lv2", "--img_root", os.path.join(tmp, "x"),
         "--backbone", "efficientnet_b4", "--image_size", "512",
         "--fc_dim", "512", "--batch_size", "16", "--max_batch", "16",
         "--emb_table", table, "--k", "13", "--score_th=-2"])
    service, _ = _build_serve_service(args)
    _warm_serve_service(service, args)
    print(json.dumps({"warm": "done"}), flush=True)

    from multimodalsimilar_tpu.data import images as I
    jpegs = _make_query_jpegs(8)
    img = I.resize(I.decode_image_bytes(jpegs[0]), 512)

    emb = None
    # grab the wired embedder via the service's device path
    fused = service._fused_similar
    dev = service._embed_queries_device

    # 1. raw H2D of the padded uint8 batch (pad 1 and 16)
    for pad in (1, 16):
        batch = np.zeros((pad, 512, 512, 3), np.uint8)
        batch[0] = img

        def ship():
            a = jnp.asarray(batch)
            np.asarray(a[0, 0, 0])     # force materialization + readback
        print(json.dumps({"h2d_pad": pad, "ms": t(ship)}), flush=True)

    # 2. embed_device at pad 1/16 (tower program incl. ship + NO readback,
    #    then with a scalar readback barrier)
    if dev is not None:
        for pad in (1, 16):
            def run():
                out = dev([img], pad_to=pad)
                np.asarray(out[0][:1])
            print(json.dumps({"embed_device_pad": pad, "ms": t(run)}),
                  flush=True)

    # 3. fused one-program request at bucket 1/16
    if fused is not None:
        for pad in (1, 16):
            def run():
                out = fused([img], pad)
                dv, di = out
                np.asarray(dv)
            print(json.dumps({"fused_pad": pad, "ms": t(run)}), flush=True)

    # 4. the service's own batch path (what the load test measured)
    def run_batch():
        service._run_batch([{"op": "similar", "query": img}])
    print(json.dumps({"service_run_batch_1": t(run_batch)}), flush=True)

    def run_batch16():
        service._run_batch([{"op": "similar", "query": img}] * 16)
    print(json.dumps({"service_run_batch_16": t(run_batch16)}), flush=True)

    # 5. host path for reference (embed_batch + engine.search)
    def host_path():
        e = service._embed_queries([img])
        service.engine.search(13, queries=np.asarray(e))
    print(json.dumps({"host_path_1": t(host_path)}), flush=True)
    service.close()


if __name__ == "__main__":
    main()
