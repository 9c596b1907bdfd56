"""CLI: daodian similar job + bulk embed end-to-end (tiny, hermetic)."""

import json
import os
import pickle

import numpy as np
import pandas as pd

from multimodalsimilar_tpu.cli import main
from multimodalsimilar_tpu.models.fasttext import train_supervised


def test_cli_similar_daodian(tmp_path, capsys):
    # train a tiny fasttext model on the titles we'll search
    texts = ["苹果 水果", "苹果 水果", "牛奶 乳品", "牛奶 乳品"]
    ft = train_supervised(texts * 10, ["a", "a", "b", "b"] * 10, dim=8,
                          epochs=3, bucket=500)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)

    df = pd.DataFrame({
        "area_id": [1, 1, 1, 1],
        "spu_sn": ["a1", "a2", "b1", "b2"],
        "sku": ["10", "11", "12", "13"],
        "title": texts,
        "first_level_category_id": [5, 5, 6, 6],
        "second_level_category_id": [51, 51, 61, 61]})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)

    main(["similar", "daodian", "--data", data, "--fasttext_model", ft_path,
          "--dt", "2026-08-16", "--date_keyed", "--text_only"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skus"] == 4


def test_cli_embed_bulk(tmp_path, capsys):
    df = pd.DataFrame({"goods_sku": ["1", "2", "3"],
                       "spu_name": ["商品一", "商品二", "商品三"]})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    table = str(tmp_path / "bulk.parquet")
    main(["embed", "bulk", "--data", data, "--table", table,
          "--max_length", "12", "--batch_size", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 3
    t = pd.read_parquet(table)
    assert set(t.columns) == {"goods_sku", "bert_emb"}


def test_cli_embed_bulk_int8(tmp_path, capsys):
    """embed bulk --int8: the quantized tower runs the same job end-to-end
    and its embeddings stay close to the float tower's (PTQ parity)."""
    import numpy as np
    from multimodalsimilar_tpu.pipelines.embed import parse_embedding
    df = pd.DataFrame({"goods_sku": ["1", "2", "3"],
                       "spu_name": ["商品一", "商品二", "商品三"]})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)

    def run(table, *extra):
        main(["embed", "bulk", "--data", data, "--table", table,
              "--max_length", "12", "--batch_size", "4", *extra])
        capsys.readouterr()
        t = pd.read_parquet(table).set_index("goods_sku")
        return {k: parse_embedding(v)
                for k, v in t["bert_emb"].items()}

    f32 = run(str(tmp_path / "f32.parquet"))
    q8 = run(str(tmp_path / "int8.parquet"), "--int8")
    assert set(q8) == set(f32)
    for k in f32:
        a, b = f32[k], q8[k]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.999, (k, cos)


def test_sku_to_spusn_shared_goods_sku():
    """Two spu_sns sharing one goods_sku BOTH get the sku's embedding
    (review fix: the dict-zip collapse silently dropped all but the last)."""
    import argparse

    from multimodalsimilar_tpu.cli import _sku_to_spusn

    class FakeEmb:
        def embed_keys(self, keys, paths_for_key):
            assert sorted(keys) == ["1", "2"]      # deduped sku list
            return {k: np.full(3, float(k)) for k in keys}

    df = pd.DataFrame({"spu_sn": ["a", "b", "c"],
                       "sku": ["1", "1", "2"]})
    args = argparse.Namespace(sku_col="sku", key_col="spu_sn",
                              img_root="/nonexistent")
    out = _sku_to_spusn(df, FakeEmb(), args)
    assert set(out) == {"a", "b", "c"}
    np.testing.assert_allclose(out["a"], out["b"])   # shared sku 1
    np.testing.assert_allclose(out["c"], np.full(3, 2.0))


def test_cli_similar_daodian_approx_recall(tmp_path, capsys):
    """--approx_recall threads to the engines and (on the CPU backend,
    where approx_max_k is exact) writes the same neighbor map as the
    exact run."""
    texts = ["苹果 水果", "苹果 水果", "牛奶 乳品", "牛奶 乳品"]
    ft = train_supervised(texts * 10, ["a", "a", "b", "b"] * 10, dim=8,
                          epochs=3, bucket=500)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    df = pd.DataFrame({
        "area_id": [1, 1, 1, 1],
        "spu_sn": ["a1", "a2", "b1", "b2"],
        "sku": ["10", "11", "12", "13"],
        "title": texts,
        "first_level_category_id": [5, 5, 6, 6],
        "second_level_category_id": [51, 51, 61, 61]})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    main(["similar", "daodian", "--data", data, "--fasttext_model",
          ft_path, "--text_only", "--approx_recall", "0.9"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skus"] == 4
