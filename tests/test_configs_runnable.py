"""Every shipped train config RUNS end-to-end, not just key-validates.

test_configs.py checks YAML keys against the CLI flags; this drives each
train_*.yaml through `cli train` on a tiny synthetic dataset carrying the
config's own column names, with size overrides on the command line
(explicit flags beat YAML). Catches value-level breakage — a scheduler
combo that crashes, a sampler column mismatch, a flag whose YAML spelling
stops parsing — that key validation cannot.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from multimodalsimilar_tpu.cli import main

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

TRAIN_MODE = {
    "train_nlp_796": "nlp", "train_nlp_daodian": "nlp",
    "train_nlp_v2": "nlp", "train_nlp_v2_dist": "nlp",
    "train_nlp_large_tp": "nlp", "train_nlp_large_pp": "nlp",
    "train_multilabel_v3": "multilabel",
    "train_cv_daodian": "cv", "train_cv_timm": "cv",
    "train_multimodal": "multimodal", "train_pair": "pair",
    "train_fasttext": "fasttext",
}


def _tiny_frame(cfg, n=24):
    rng = np.random.default_rng(0)
    markers = "甲乙丙丁"
    labels = np.arange(n) % 3
    df = pd.DataFrame({
        "spu_sn": [f"s{i}" for i in range(n)],
        "goods_sku": [str(i) for i in range(n)],
        "sku_sn_name": [f"sn{i}" for i in range(n)],
        "title": [markers[k] * 3 + f"商品{i}" for i, k in enumerate(labels)],
        "tag_id": labels,
    })
    text_col = cfg.get("text_col", "spu_name")
    df[text_col] = df["title"]
    for col in ("label_col", "lv1_col", "lv2_col", "tag_col"):
        if col in cfg:
            df[cfg[col]] = labels
    # pair/fasttext defaults (the fasttext parser defaults to text/label)
    df["labels"] = labels
    df["text"] = df["title"]
    df["label"] = labels
    df["lv1_category_id"] = labels % 2
    df["lv2_category_id"] = labels
    df["tag_new_id"] = labels
    del rng
    return df


@pytest.mark.parametrize("name", sorted(TRAIN_MODE))
def test_train_config_runs(name, tmp_path):
    path = os.path.join(CONFIG_DIR, f"{name}.yaml")
    assert os.path.exists(path), path
    cfg = yaml.safe_load(open(path)) or {}
    mode = TRAIN_MODE[name]
    df = _tiny_frame(cfg)
    data = str(tmp_path / "d.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    argv = ["train", mode, "--config", path, "--data", data,
            "--output", out, "--epochs", "1"]
    if mode != "fasttext":   # the fasttext parser has its own small flag set
        argv += ["--batch_size", "8", "--eval_every", "1000000",
                 "--save_every", "4", "--log_every", "1000000",
                 "--max_length", "10"]
    if mode in ("nlp", "multilabel", "pair", "multimodal"):
        argv += ["--bert_preset", "tiny", "--seq_buckets", "6,8"]
    if mode in ("cv", "multimodal"):
        import cv2
        img_root = str(tmp_path / "imgs")
        os.makedirs(img_root)
        for i in range(len(df)):
            cv2.imwrite(os.path.join(img_root, f"{i}.jpg"),
                        np.full((14, 14, 3), 90, np.uint8))
        key = "goods_sku" if mode == "cv" else "spu_sn"
        if mode == "cv":
            # cv images are keyed by goods_sku (str(i)); multimodal by
            # spu_sn — rewrite those to match the file names
            pass
        else:
            df["spu_sn"] = [str(i) for i in range(len(df))]
            df.to_csv(data, index=False)
        argv += ["--img_root", img_root, "--image_size", "16",
                 "--backbone", "tiny", "--fc_dim", "8",
                 "--key_col", key]
    if mode == "multimodal":
        argv += ["--margin", "0.5"]
    main(argv)
    if mode == "fasttext":
        assert os.path.exists(os.path.join(out, "fasttext.pkl"))
    else:
        assert os.listdir(os.path.join(out, "ckpt"))


def test_all_train_configs_covered():
    """A new shipped train config must be added to this runnable matrix."""
    shipped = {os.path.splitext(os.path.basename(p))[0]
               for p in glob.glob(os.path.join(CONFIG_DIR, "train_*.yaml"))}
    assert shipped == set(TRAIN_MODE)
