"""CLI end-to-ends for the remaining train recipes (tiny, hermetic)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.cli import main


def test_cli_train_multilabel(tmp_path):
    n = 48
    rng = np.random.default_rng(0)
    lv1 = rng.integers(0, 2, n)
    df = pd.DataFrame({
        "spu_name": [f"{'甲乙'[l]*3}商品{i}" for i, l in enumerate(lv1)],
        "lv1_category_id": lv1,
        "lv2_category_id": lv1 * 2 + rng.integers(0, 2, n),
        "tag_new_id": rng.integers(0, 5, n)})
    data = str(tmp_path / "ml.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "multilabel", "--data", data, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "10",
          "--eval_every", "1000000", "--save_every", "2",
          "--weighted_sampling", "--lv1_weight", "10", "--lv2_weight", "5",
          "--tag_weight", "1"])
    assert os.listdir(os.path.join(out, "ckpt"))


def _write_images(root, df, size=14):
    import cv2
    for _, r in df.iterrows():
        path = os.path.join(root, f"{r['goods_sku']}.jpg")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        img = np.full((size, size, 3), int(r["tag_new_id"]) * 40 + 30,
                      np.uint8)
        cv2.imwrite(path, img)


def test_cli_train_cv(tmp_path):
    n = 24
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(n)],
                       "tag_new_id": [i % 3 for i in range(n)]})
    img_root = str(tmp_path / "imgs")
    _write_images(img_root, df)
    data = str(tmp_path / "cv.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "cv", "--data", data, "--img_root", img_root,
          "--output", out, "--backbone", "tiny",
          "--image_size", "16", "--fc_dim", "8", "--batch_size", "8",
          "--epochs", "2", "--eval_every", "1000000", "--save_every", "2",
          "--log_every", "1",
          "--margin", "0.2", "--margin_delta_per_epoch", "0.04"])
    assert os.listdir(os.path.join(out, "ckpt"))
    # margin curriculum advanced across 2 epochs: visible in metrics log
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    assert any(abs(l.get("train/margin", 0) - 0.24) < 1e-6 for l in lines)


def test_cli_train_cv_adamp_timm_cosine(tmp_path):
    """The cv_classifier_train.py recipe: dual AdamP + timm CosineLRScheduler
    (warmup_t epochs from warmup_lr_init, cosine to lr_min, cooldown)."""
    n = 16
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(n)],
                       "tag_new_id": [i % 2 for i in range(n)]})
    img_root = str(tmp_path / "imgs")
    _write_images(img_root, df)
    data = str(tmp_path / "cv.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "cv", "--data", data, "--img_root", img_root,
          "--output", out, "--backbone", "tiny",
          "--image_size", "16", "--fc_dim", "8", "--batch_size", "8",
          "--epochs", "3", "--cooldown_epochs", "1", "--eval_every",
          "1000000", "--save_every", "100", "--log_every", "1",
          "--optimizer", "adamp", "--scheduler", "timm_cosine",
          "--warmup_epochs", "1", "--warmup_lr_init", "1e-3",
          "--tower_lr", "1e-4", "--head_lr", "1e-4",
          "--weight_decay", "1e-5"])
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)


def test_cli_train_pair(tmp_path):
    n = 40
    rng = np.random.default_rng(1)
    lv1 = rng.integers(0, 2, n)
    df = pd.DataFrame({
        "title": [f"标题{i}字" for i in range(n)],
        "sku_sn_name": [f"s{i}" for i in range(n)],
        "tag_id": lv1 * 10 + rng.integers(0, 2, n),
        "lv2_category_id": lv1 * 5 + rng.integers(0, 2, n),
        "lv1_category_id": lv1})
    data = str(tmp_path / "pairs.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "pair", "--data", data, "--output", out,
          "--batch_size", "8", "--epochs", "1", "--max_length", "8",
          "--eval_every", "1000000", "--save_every", "4"])
    assert os.listdir(os.path.join(out, "ckpt"))


def test_cli_train_multimodal(tmp_path):
    n = 16
    df = pd.DataFrame({"spu_sn": [str(i) for i in range(n)],
                       "spu_name": [f"商品{i}号" for i in range(n)],
                       "cateid": [i % 2 for i in range(n)]})
    img_root = str(tmp_path / "imgs")
    import cv2
    os.makedirs(img_root)
    for i in range(n):
        cv2.imwrite(os.path.join(img_root, f"{i}.jpg"),
                    np.full((14, 14, 3), 80, np.uint8))
    data = str(tmp_path / "mm.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "multimodal", "--data", data, "--img_root", img_root,
          "--output", out, "--backbone", "tiny",
          "--image_size", "16", "--fc_dim", "8", "--text_col", "spu_name",
          "--label_col", "cateid", "--batch_size", "8", "--epochs", "1",
          "--max_length", "8", "--eval_every", "1000000",
          "--save_every", "2"])
    assert os.listdir(os.path.join(out, "ckpt"))
    # train->serve contract (review fix): the derived char vocab persists
    assert os.path.exists(os.path.join(out, "vocab.txt"))
    # in-process fused serving (multimodal_infer.py pattern, review fix):
    # the multimodal pipeline is now runnable end-to-end from the CLI
    import json as _json

    import pytest  # noqa: F401
    capture = []
    import builtins
    orig_print = builtins.print
    builtins.print = lambda *a, **k: capture.append(a[0] if a else "")
    try:
        main(["similar", "multimodal", "--data", data,
              "--checkpoint", os.path.join(out, "ckpt"),
              "--tokenizer", os.path.join(out, "vocab.txt"),
              "--img_root", img_root, "--image_size", "16",
              "--fc_dim", "8", "--backbone", "tiny",
              "--num_labels", "2", "--text_col", "spu_name",
              "--key_col", "spu_sn", "--max_length", "8",
              "--batch_size", "8", "--k", "3"])
    finally:
        builtins.print = orig_print
    written = _json.loads(capture[-1])["written"]
    assert written > 0
