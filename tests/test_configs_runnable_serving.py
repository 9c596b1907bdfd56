"""Every shipped SERVING config runs end-to-end, like the train matrix.

Builds tiny artifacts once (an nlp checkpoint+vocab via `cli train`, a cv
checkpoint, a pickled fastText model, synthetic images), then drives each
similar_*/embed_*.yaml through the real CLI with size/backbone overridden
on the command line (explicit flags beat YAML). In-memory KV sinks are
used (no --redis_host), table sinks write parquet under tmp.
"""

import glob
import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.cli import main

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

SERVING = ["similar_nlp", "similar_daodian_v1",
           "similar_daodian_v2_recent_days", "embed_bulk",
           "embed_incremental_bert", "serve", "serve_cv",
           "serve_fasttext", "serve_multimodal", "serve_daodian"]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory, capsys_disabled=None):
    root = tmp_path_factory.mktemp("serving_cfg")
    n = 24
    labels = np.arange(n) % 3
    markers = "甲乙丙"
    df = pd.DataFrame({
        "spu_sn": [f"s{i}" for i in range(n)],
        "goods_sku": [str(i) for i in range(n)],
        "sku": [str(i) for i in range(n)],
        "spu_name": [markers[k] * 3 + f"商品{i}"
                     for i, k in enumerate(labels)],
        "title": [markers[k] * 3 + f"商品{i}"
                  for i, k in enumerate(labels)],
        "labels": labels,
        "area_id": (np.arange(n) % 2) + 1,
        "first_level_category_id": labels % 2,
        "second_level_category_id": labels,
        "tag_new_id": labels,
        "dt": ["2026-08-16" if i % 2 == 0 else "2026-08-15"
               for i in range(n)],
    })
    data = str(root / "catalog.csv")
    df.to_csv(data, index=False)

    # nlp checkpoint + vocab via the real train path
    out_nlp = str(root / "out_nlp")
    main(["train", "nlp", "--data", data, "--output", out_nlp,
          "--batch_size", "8", "--epochs", "1", "--max_length", "10",
          "--eval_every", "1000000", "--save_every", "3",
          "--log_every", "1000000"])

    # cv checkpoint + images (keyed by goods_sku AND sku: same str(i))
    import cv2
    img_root = str(root / "imgs")
    os.makedirs(img_root)
    for i in range(n):
        # flat {key}.jpg for embed jobs and {key}/{j}.jpg for daodian
        cv2.imwrite(os.path.join(img_root, f"{i}.jpg"),
                    np.full((14, 14, 3), 60 + 5 * int(labels[i]), np.uint8))
        os.makedirs(os.path.join(img_root, str(i)))
        cv2.imwrite(os.path.join(img_root, str(i), "0.jpg"),
                    np.full((14, 14, 3), 60 + 5 * int(labels[i]), np.uint8))
    out_cv = str(root / "out_cv")
    main(["train", "cv", "--data", data, "--img_root", img_root,
          "--output", out_cv, "--backbone", "tiny", "--image_size", "16",
          "--fc_dim", "8", "--label_col", "tag_new_id",
          "--batch_size", "8", "--epochs", "1",
          "--eval_every", "1000000", "--save_every", "3",
          "--log_every", "1000000"])

    # pickled fastText model
    from multimodalsimilar_tpu.models.fasttext import train_supervised
    ft = train_supervised(df["spu_name"].tolist(), labels.tolist(),
                          dim=8, epochs=2)
    ft_path = str(root / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)

    # fused (multimodal) checkpoint over the flat {goods_sku}.jpg layout
    out_mm = str(root / "out_mm")
    main(["train", "multimodal", "--data", data, "--img_root", img_root,
          "--output", out_mm, "--backbone", "tiny", "--image_size", "16",
          "--fc_dim", "8", "--key_col", "goods_sku",
          "--text_col", "spu_name", "--label_col", "labels",
          "--batch_size", "8", "--epochs", "1", "--max_length", "10",
          "--eval_every", "1000000", "--save_every", "3",
          "--log_every", "1000000"])

    return dict(root=root, data=data, img_root=img_root,
                nlp_ckpt=os.path.join(out_nlp, "ckpt"),
                vocab=os.path.join(out_nlp, "vocab.txt"),
                cv_ckpt=os.path.join(out_cv, "ckpt"), ft=ft_path,
                mm_ckpt=os.path.join(out_mm, "ckpt"),
                mm_vocab=os.path.join(out_mm, "vocab.txt"))


def _run(argv, capsys):
    main(argv)
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(out[-1])


def test_similar_nlp_config(artifacts, capsys):
    cfg = os.path.join(CONFIG_DIR, "similar_nlp.yaml")
    res = _run(["similar", "nlp", "--config", cfg,
                "--data", artifacts["data"],
                "--tokenizer", artifacts["vocab"],
                "--checkpoint", artifacts["nlp_ckpt"],
                "--bert_preset", "tiny", "--num_labels", "3",
                "--max_length", "10", "--batch_size", "8",
                "--score_th", "0.5", "--k", "3"], capsys)
    assert res["written"] > 0


@pytest.mark.parametrize("name", ["similar_daodian_v1",
                                  "similar_daodian_v2_recent_days"])
def test_similar_daodian_configs(artifacts, name, capsys):
    cfg = os.path.join(CONFIG_DIR, f"{name}.yaml")
    argv = ["similar", "daodian", "--config", cfg,
            "--data", artifacts["data"],
            "--fasttext_model", artifacts["ft"],
            "--cv_checkpoint", artifacts["cv_ckpt"],
            "--img_root", artifacts["img_root"],
            "--backbone", "tiny", "--image_size", "16", "--fc_dim", "8",
            "--cv_num_labels", "3"]
    if "v2" in name:
        argv += ["--dt", "2026-08-16"]
    res = _run(argv, capsys)
    assert res["skus"] >= 0          # tiny corpora may filter everything


def test_embed_incremental_bert_config(artifacts, capsys, tmp_path):
    cfg = os.path.join(CONFIG_DIR, "embed_incremental_bert.yaml")
    table = str(tmp_path / "w.parquet")
    res = _run(["embed", "incremental", "--config", cfg,
                "--data", artifacts["data"], "--table", table,
                "--tokenizer", artifacts["vocab"],
                "--checkpoint", artifacts["nlp_ckpt"],
                "--bert_preset", "tiny", "--num_labels", "3",
                "--max_length", "10", "--batch_size", "8",
                "--dt", "2026-08-16"], capsys)
    assert res["written"] == 24
    assert os.path.exists(table)


def test_embed_bulk_config(artifacts, capsys, tmp_path):
    cfg = os.path.join(CONFIG_DIR, "embed_bulk.yaml")
    table = str(tmp_path / "bulk.parquet")
    res = _run(["embed", "bulk", "--config", cfg,
                "--data", artifacts["data"], "--table", table,
                "--tokenizer", artifacts["vocab"],
                "--checkpoint", artifacts["nlp_ckpt"],
                "--fasttext_model", artifacts["ft"],
                "--bert_preset", "tiny", "--num_labels", "3",
                "--max_length", "10", "--batch_size", "8",
                "--kinds", "bert,fasttext"], capsys)
    assert res["rows"] if "rows" in res else res
    out = pd.read_parquet(table)
    assert len(out) == 24 and "bert_emb" in out.columns


def _serve_config(cfg_name, overrides, payload, check_args=None,
                  check_service=None):
    """Drive a serve_*.yaml through the real argv machinery (inject +
    parse + apply), then the built service over real HTTP with one
    /similar ``payload`` — everything cmd_serve does except the blocking
    serve_forever loop. Returns (corpus_rows, response_json)."""
    import threading
    import urllib.request

    from multimodalsimilar_tpu.cli import (
        _apply_yaml_config, _build_serve_service, _inject_yaml_argv,
        build_parser)
    from multimodalsimilar_tpu.pipelines.serving import make_server

    cfg = os.path.join(CONFIG_DIR, f"{cfg_name}.yaml")
    argv = ["serve", "--config", cfg] + overrides + ["--port", "0"]
    parser = build_parser()
    argv = _inject_yaml_argv(argv, parser)
    args = parser.parse_args(argv)
    _apply_yaml_config(args, argv)
    if check_args:
        check_args(args)
    service, n = _build_serve_service(args)
    httpd = make_server(service, args.host, 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        if check_service:
            check_service(service)
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        req = urllib.request.Request(
            base + "/similar", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            res = json.loads(r.read())
    finally:
        httpd.shutdown()
        httpd.server_close()
        service.close()
        t.join(timeout=10)
    return n, res


def test_serve_config(artifacts):
    def check_args(args):
        # YAML values that explicit flags did not override took effect
        assert args.category_col == "first_level_category_id"
        assert args.max_wait_ms == 5.0

    n, res = _serve_config(
        "serve",
        ["--data", artifacts["data"], "--tokenizer", artifacts["vocab"],
         "--checkpoint", artifacts["nlp_ckpt"], "--bert_preset", "tiny",
         "--num_labels", "3", "--max_length", "10", "--batch_size", "8",
         "--score_th", "0.0", "--k", "3"],
        {"text": "甲甲甲商品0", "exclude_key": "s0"},
        check_args=check_args)
    assert n == 24 and isinstance(res["neighbors"], list)
    assert all(g["key"] != "s0" for g in res["neighbors"])


def test_serve_cv_config(artifacts):
    def check_args(args):
        assert args.tower == "cv"            # from the YAML
        assert args.score_th == 0.15         # the daodian operating point

    n, res = _serve_config(
        "serve_cv",
        ["--data", artifacts["data"], "--checkpoint", artifacts["cv_ckpt"],
         "--key_col", "goods_sku", "--img_root", artifacts["img_root"],
         "--backbone", "tiny", "--image_size", "16", "--fc_dim", "8",
         "--num_labels", "3", "--batch_size", "8", "--k", "3"],
        # untrained-tiny scores may sit under the YAML th: disable per
        # request (null), like a client widening the search
        {"image_path": os.path.join(artifacts["img_root"], "0", "0.jpg"),
         "score_th": None, "exclude_key": "0"})
    assert n == 24 and isinstance(res["neighbors"], list)
    assert all(g["key"] != "0" for g in res["neighbors"])


def test_serve_fasttext_config(artifacts):
    def check_args(args):
        assert args.tower == "fasttext"
        assert args.text_col == "title"      # YAML column choice applied
        assert args.score_th == -0.6

    n, res = _serve_config(
        "serve_fasttext",
        ["--data", artifacts["data"], "--fasttext_model", artifacts["ft"],
         "--k", "5"],
        # same-category rule online: first_level = (i % 3) % 2
        {"text": "甲甲甲商品0", "category": "0"})
    assert n == 24 and len(res["neighbors"]) > 0
    for g in res["neighbors"]:
        i = int(g["key"][1:])                # keys are s{i}
        assert (i % 3) % 2 == 0              # category rule held


def test_serve_multimodal_config(artifacts):
    def check_service(service):
        # multimodal_infer.py:140-145: un-normalized squared-L2 search,
        # no default threshold
        assert service.engine.metric == "l2"
        assert service.score_th is None

    n, res = _serve_config(
        "serve_multimodal",
        ["--data", artifacts["data"], "--checkpoint", artifacts["mm_ckpt"],
         "--tokenizer", artifacts["mm_vocab"], "--key_col", "goods_sku",
         "--img_root", artifacts["img_root"], "--backbone", "tiny",
         "--bert_preset", "tiny", "--image_size", "16", "--fc_dim", "8",
         "--num_labels", "3", "--max_length", "10", "--batch_size", "8",
         "--k", "3"],
        {"text": "甲甲甲商品0",
         "image_path": os.path.join(artifacts["img_root"], "0.jpg"),
         "exclude_key": "0"},
        check_service=check_service)
    assert n == 24 and isinstance(res["neighbors"], list)
    assert all(g["key"] != "0" for g in res["neighbors"])


def test_serve_daodian_config(artifacts):
    """serve_daodian.yaml over real HTTP: both arms hot, the per-key
    merged answer equals the batch job's on the same corpus."""
    import threading
    import urllib.request

    from multimodalsimilar_tpu.cli import (_apply_yaml_config,
                                           _inject_yaml_argv, build_parser)
    from multimodalsimilar_tpu.cli.serve import _build_daodian_service
    from multimodalsimilar_tpu.pipelines.daodian_serving import (
        make_daodian_server)

    cfg = os.path.join(CONFIG_DIR, "serve_daodian.yaml")
    argv = ["serve", "--config", cfg, "--data", artifacts["data"],
            "--fasttext_model", artifacts["ft"],
            "--cv_checkpoint", artifacts["cv_ckpt"],
            "--img_root", artifacts["img_root"],
            "--backbone", "tiny", "--image_size", "16", "--fc_dim", "8",
            "--cv_num_labels", "3", "--emb_cache", "", "--port", "0"]
    parser = build_parser()
    argv = _inject_yaml_argv(argv, parser)
    args = parser.parse_args(argv)
    _apply_yaml_config(args, argv)
    assert args.tower == "daodian"           # from the YAML
    assert args.area_col == "area_id"
    service = _build_daodian_service(args)
    service.warm()
    # the job's own answer on the same corpus/arms (text arm identical;
    # cv arm shares the ImageEmbedder's emb.txt cache written at build)
    import pickle as _pickle

    from multimodalsimilar_tpu.cli.similar import _sku_to_spusn
    from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job
    from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink
    with open(artifacts["ft"], "rb") as f:
        ft = _pickle.load(f)
    from multimodalsimilar_tpu.cli.embedders import _load_cv_tower
    model, variables = _load_cv_tower(args, artifacts["cv_ckpt"], 3)
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    emb = ImageEmbedder(model, variables, image_size=16,
                        cache_path_for_key=lambda k: os.path.join(
                            artifacts["img_root"], str(k), "emb.txt"),
                        emb_dim=8)
    df = pd.read_csv(artifacts["data"])
    expected = daodian_similar_job(
        df, lambda tt: ft.get_sentence_vector(list(tt)),
        lambda a: _sku_to_spusn(a, emb, args), InMemoryKVSink())
    httpd = make_daodian_server(service, port=0, image_size=16)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        for key in df["spu_sn"].head(6):
            req = urllib.request.Request(
                base + "/similar",
                data=json.dumps({"key": str(key)}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                got = json.loads(r.read())
            assert got["neighbors"] == \
                [str(x) for x in expected.get(str(key), [])], key
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_all_serving_configs_covered():
    shipped = {os.path.splitext(os.path.basename(p))[0]
               for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
               if not os.path.basename(p).startswith("train_")}
    assert shipped == set(SERVING)
