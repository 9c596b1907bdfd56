"""Capstone integration: a synthetic daodian day through the full pipeline.

Builds a 3-area catalog with images on disk + hierarchical titles, trains
the fastText tower, embeds images through CvImageClassifier with the emb.txt
cache, runs the production similar job (per-area, cv-first merge, date-keyed
v2 writes), and checks the business invariants end-to-end:

  * neighbors come from the same area and same category hierarchy,
  * same-product variants (identical image color + shared title words) find
    each other,
  * the KV store holds date-keyed CSV values with the v2 TTL.
"""

import os

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
from multimodalsimilar_tpu.models.fasttext import train_supervised
from multimodalsimilar_tpu.models.vision import CvImageClassifier
from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
from multimodalsimilar_tpu.pipelines.similar import daodian_similar_job
from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

CATS = {
    # lv1 -> lv2 -> (title words, image color)
    10: {101: ("苹果 水果 新鲜", 200), 102: ("香蕉 水果 甜", 160)},
    20: {201: ("牛奶 乳品 醇香", 110), 202: ("酸奶 乳品 发酵", 60)},
}


def _build_catalog(root, n_per_lv2=4, areas=(1, 2)):
    import cv2
    rows = []
    i = 0
    for area in areas:
        for lv1, lv2s in CATS.items():
            for lv2, (words, color) in lv2s.items():
                for k in range(n_per_lv2):
                    sku = str(1000 + i)
                    spu = f"s{area}_{lv2}_{k}"
                    os.makedirs(f"{root}/{sku}", exist_ok=True)
                    img = np.full((20, 20, 3), color, np.uint8)
                    # per-item pixel jitter so embeddings aren't identical
                    img[k % 20, k % 20] = 255
                    cv2.imwrite(f"{root}/{sku}/0.jpg", img)
                    rows.append({
                        "area_id": area, "spu_sn": spu, "sku": sku,
                        "title": f"{words} 商品{i}号",
                        "first_level_category_id": lv1,
                        "second_level_category_id": lv2})
                    i += 1
    return pd.DataFrame(rows)


def test_daodian_end_to_end(tmp_path):
    import jax
    root = str(tmp_path / "goodssku_image_2")
    df = _build_catalog(root)

    # text tower: fastText trained on lv2 labels (separable by words)
    ft = train_supervised(df["title"].tolist(),
                          df["second_level_category_id"].tolist(),
                          dim=16, epochs=8, bucket=2000, batch_size=32)

    # image tower: tiny CvImageClassifier, random weights (solid colors
    # separate without training)
    model = CvImageClassifier(EfficientNetConfig.tiny(), num_labels=4,
                              fc_dim=8, policy=DTypePolicy.full_precision())
    import jax.numpy as jnp
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 16, 16, 3)),
                           label=jnp.zeros(1, jnp.int32))
    emb = ImageEmbedder(model, variables, image_size=16, batch_size=8,
                        cache_path_for_key=lambda k: f"{root}/{k}/emb.txt")

    def embed_skus(area_df):
        sku_of = dict(zip(area_df["sku"].astype(str), area_df["spu_sn"]))
        by_sku = emb.embed_keys(
            list(sku_of), lambda s: [f"{root}/{s}/{j}.jpg"
                                     for j in range(8)])
        return {sku_of[s]: v for s, v in by_sku.items()}

    kv = InMemoryKVSink()
    merged = daodian_similar_job(
        df, lambda titles: ft.get_sentence_vector(list(titles)),
        embed_skus, kv, nlp_score_th=0.5, cv_score_th=0.8,
        ttl_seconds=int(1.5 * 24 * 3600), date_key="20260816")

    row_of = {r["spu_sn"]: r for _, r in df.iterrows()}
    checked = 0
    for spu, neighbors in merged.items():
        me = row_of[spu]
        for nb in neighbors:
            other = row_of[nb]
            # area isolation
            assert other["area_id"] == me["area_id"], (spu, nb)
            # category discipline: cv side enforces lv2, text side lv1
            assert other["first_level_category_id"] == \
                me["first_level_category_id"], (spu, nb)
            checked += 1
    assert checked > 20  # the job actually produced neighbor pairs

    # same-lv2 variants find each other (identical color + shared words)
    assert any(n.startswith("s1_101_") for n in merged["s1_101_0"])

    # v2 date-keyed writes with the 1.5d TTL
    val = kv.get("20260816:s1_101_0")
    assert val is not None and "," in val or len(val) > 0
    assert 0 < kv.ttl("20260816:s1_101_0") <= 1.5 * 24 * 3600
    # emb.txt caches written next to the images
    assert os.path.exists(f"{root}/1000/emb.txt")
