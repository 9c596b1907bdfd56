"""Load-test the IMAGE-path serving daemons on the real chip (round-4
VERDICT #3: serve --tower cv|multimodal had only a c=1 interleaved A/B;
their saturation point and binding resource were unmeasured — host JPEG
decode is ~130 img/s on this one-core host and is the expected wall).

Drives the PRODUCTION stack (_build_serve_service, the exact object
cmd_serve runs) at the reference operating points — cv: efficientnet_b4
@ 512, fc_dim 512 (cv_classifier_train_daodian.py); multimodal: b4 @ 380
fused with roberta-base (multimodal_infer.py) — with the corpus
warm-started from a synthetic --emb_table (the production corpus-hit fast
path: no images on disk, no startup tower pass; query-path cost is
identical to real vectors).

Two drives per level:
* inproc-decoded — closed loop over ALREADY-DECODED uint8 queries:
  the pure device/batcher path (what the chip can do).
* http-b64 — real loopback HTTP with base64 JPEG payloads: adds the
  handler-thread decode+resize (the production online path; the delta
  vs inproc is the host decode tax).

Run on the TPU (single chip, nothing else on it):
    python benchmarks/serving_load_image.py cv [corpus_rows]
    python benchmarks/serving_load_image.py multimodal [corpus_rows]
"""

import base64
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from serving_load import (_closed_loop, _level_stats,  # noqa: E402
                          _requests_for, make_http_client)
from serving_roofline import pool_probe  # noqa: E402

LEVELS = (1, 4, 16, 64)
MAX_BATCH = 16        # image towers: batch 16 ≈ the cv train batch scale
SRC_PX = 640          # query JPEGs: product-photo-like source resolution


def _make_query_jpegs(n=64, px=SRC_PX):
    """Distinct JPEG byte strings with photo-like compressibility
    (smooth gradients + blobs — noise JPEGs are pathologically large)."""
    import cv2
    rng = np.random.default_rng(7)
    out = []
    yy, xx = np.mgrid[0:px, 0:px].astype(np.float32) / px
    for i in range(n):
        a, b, c = rng.uniform(0.3, 1.0, 3)
        img = np.stack([
            (a * xx + (1 - a) * yy), (b * (1 - xx)), (c * xx * yy)],
            axis=-1)
        cx, cy = rng.uniform(0.2, 0.8, 2)
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        img += np.exp(-r2 * 40)[..., None] * rng.uniform(0.2, 0.6)
        img8 = np.clip(img * 255, 0, 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img8,
                               [cv2.IMWRITE_JPEG_QUALITY, 85])
        assert ok
        out.append(buf.tobytes())
    return out


def _make_emb_table(path, rows, dim, key_col="spu_sn"):
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(1)
    flat = rng.standard_normal(rows * dim).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
    pq.write_table(pa.table({key_col: [f"sku{i}" for i in range(rows)],
                             "embedding": arr}), path)


def _decode_rate(jpegs, image_size, seconds=4.0):
    """Single-thread host decode+resize throughput (the suspected wall)."""
    from multimodalsimilar_tpu.data import images as I
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        raw = jpegs[n % len(jpegs)]
        img = I.decode_image_bytes(raw)
        I.resize(img, image_size)
        n += 1
    return round(n / (time.perf_counter() - t0), 1)


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps stacks
    tower = sys.argv[1] if len(sys.argv) > 1 else "cv"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    max_batch = int(sys.argv[3]) if len(sys.argv) > 3 else MAX_BATCH
    assert tower in ("cv", "multimodal")
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           _enable_compile_cache,
                                           _warm_serve_service,
                                           build_parser)
    from multimodalsimilar_tpu.pipelines.serving import make_server
    _enable_compile_cache()
    import pandas as pd

    tmp = tempfile.mkdtemp(prefix=f"serving_load_{tower}_")
    image_size = 512 if tower == "cv" else 380
    # multimodal fused dim = fc_dim (cv neck) + 768 (text) at the
    # CLI default fc_dim=512; the reference 2560 uses the raw 1792
    # b4 features instead of a neck
    dim = 512 if tower == "cv" else 1280
    data = os.path.join(tmp, "catalog.csv")
    pd.DataFrame({
        "spu_sn": [f"sku{i}" for i in range(rows)],
        "spu_name": [f"商品 {i}" for i in range(rows)],
        "lv2": [str(i % 30) for i in range(rows)],
    }).to_csv(data, index=False)
    table = os.path.join(tmp, "emb.parquet")
    _make_emb_table(table, rows, dim)

    import jax
    probe = jax.default_backend() != "cpu"
    if probe:
        print(json.dumps({"pool_probe_tflops": pool_probe()}), flush=True)

    argv = ["serve", "--tower", tower, "--data", data,
            "--key_col", "spu_sn", "--category_col", "lv2",
            "--img_root", os.path.join(tmp, "none"),  # all keys hit table
            "--backbone", "efficientnet_b4", "--image_size",
            str(image_size), "--fc_dim", "512",
            "--batch_size", str(max_batch), "--max_batch", str(max_batch),
            "--emb_table", table, "--k", "13"]
    if tower == "cv":
        argv += ["--score_th=-2"]     # random vectors sit under the 0.15
                                      # default; latency is th-independent
                                      # (filtering is host-side) but empty
                                      # answers would hide a broken path
    if tower == "multimodal":
        # the fused tower needs a checkpoint in production; for load we
        # need identical FLOPs, not trained weights — the builder inits
        # fresh when --checkpoint is absent only for cv, so multimodal
        # rides a locally-built random checkpoint
        ckpt = os.path.join(tmp, "ckpt")
        _make_mm_checkpoint(ckpt, image_size)
        argv += ["--checkpoint", ckpt, "--bert_preset", "base",
                 "--tokenizer", _make_vocab(tmp), "--max_length", "64",
                 "--text_col", "spu_name"]
    args = build_parser().parse_args(argv)
    t0 = time.perf_counter()
    service, n = _build_serve_service(args)
    t1 = time.perf_counter()
    _warm_serve_service(service, args)
    print(json.dumps({"tower": tower, "corpus": n,
                      "startup_s": round(t1 - t0, 1),
                      "warm_s": round(time.perf_counter() - t1, 1)}),
          flush=True)

    jpegs = _make_query_jpegs()
    print(json.dumps({"host_decode_img_per_s":
                      _decode_rate(jpegs, image_size),
                      "src_px": SRC_PX}), flush=True)

    # decoded queries for the in-proc drive (device/batcher path only)
    from multimodalsimilar_tpu.data import images as I
    decoded = [I.resize(I.decode_image_bytes(r), image_size)
               for r in jpegs]
    if tower == "multimodal":
        inproc_queries = [(f"商品 查询{i}", im)
                          for i, im in enumerate(decoded)]
    else:
        inproc_queries = decoded
    for c in LEVELS:
        print(json.dumps({"mode": "inproc", "level_start": c}), flush=True)
        before = service.stats
        r = _closed_loop(lambda q: service.similar(q), inproc_queries, c,
                         _requests_for(c))
        r.update(_level_stats(service, before))
        print(json.dumps({"mode": "inproc", "concurrency": c, **r}),
              flush=True)

    # real HTTP with base64 payloads: + handler-thread decode
    httpd = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    b64s = [base64.b64encode(r).decode() for r in jpegs]

    def _body(i):
        payload = {"image_b64": b64s[i % len(b64s)]}
        if tower == "multimodal":
            payload["text"] = f"商品 查询{i}"
        return payload

    http_call = make_http_client(port, _body, timeout=300)

    for c in LEVELS:
        print(json.dumps({"mode": "http_b64", "level_start": c}),
              flush=True)
        before = service.stats
        r = _closed_loop(http_call, list(range(512)), c,
                         _requests_for(c))
        r.update(_level_stats(service, before))
        print(json.dumps({"mode": "http_b64", "concurrency": c, **r}),
              flush=True)

    httpd.shutdown()
    httpd.server_close()
    service.close()
    if probe:
        print(json.dumps({"pool_probe_tflops_end": pool_probe()}),
              flush=True)


def _make_vocab(tmp):
    """Minimal char vocab file for the multimodal tokenizer."""
    path = os.path.join(tmp, "vocab.txt")
    chars = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "商", "品", "查", "询",
             " "] + [str(d) for d in range(10)]
    with open(path, "w") as f:
        f.write("\n".join(chars))
    return path


def _make_mm_checkpoint(path, image_size):
    """Random-init multimodal checkpoint (identical FLOPs to trained)."""
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
    from multimodalsimilar_tpu.models.vision import backbone_config
    from multimodalsimilar_tpu.train.checkpoint import CheckpointManager

    model = MultimodalClassifier(BertConfig.roberta_wwm_ext(),
                                 backbone_config("efficientnet_b4"),
                                 num_labels=2, fc_dim=512)
    ids = jnp.zeros((1, 8), jnp.int32)
    img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)

    def init(ids, img):
        # signature: (images, input_ids, ...) — models/multimodal.py:64
        return model.init({"params": jax.random.key(0)}, img, ids,
                          label=jnp.zeros(1, jnp.int32))

    variables = jax.jit(init)(ids, img)
    CheckpointManager(path).save(
        0, {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}, force=True)


if __name__ == "__main__":
    main()
