"""`cli copy-kv` / `cli download` — the reference's ops utilities
(copy_redis.py, image downloaders; SURVEY.md §2.5)."""

from __future__ import annotations

import json


def cmd_copy_kv(args):
    from multimodalsimilar_tpu.pipelines.download import copy_kv
    from multimodalsimilar_tpu.pipelines.sinks import RedisKVSink
    src = RedisKVSink(args.src_host, args.src_port, args.src_db,
                      args.redis_password)
    dst = RedisKVSink(args.dst_host, args.dst_port, args.dst_db,
                      args.redis_password)
    keys = [k.decode() if isinstance(k, bytes) else k
            for k in src.client.keys(args.pattern)]
    n = copy_kv(src, dst, keys, args.exp_seconds)
    print(json.dumps({"copied": n}))

def cmd_download(args):
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.download import download_images
    df = read_table(args.manifest)
    items = list(zip(df[args.key_col].astype(str),
                     df[args.img_id_col].astype(str), df[args.url_col]))
    ok, failed = download_images(items, args.out_root, threads=args.threads)
    print(json.dumps({"downloaded": ok, "skipped_or_failed": failed}))
