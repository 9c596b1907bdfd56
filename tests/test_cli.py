"""CLI smoke tests: train + embed + similar subcommands end-to-end (tiny)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.cli import main


def _train_csv(tmp_path, n=64):
    df = pd.DataFrame({
        "spu_name": [f"{'甲乙丙丁'[i % 4] * 3}商品{i}" for i in range(n)],
        "labels": [i % 4 for i in range(n)]})
    path = str(tmp_path / "train.csv")
    df.to_csv(path, index=False)
    return path


def test_cli_train_nlp(tmp_path, capsys):
    data = _train_csv(tmp_path)
    out = str(tmp_path / "out")
    main(["train", "nlp", "--data", data, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "12",
          "--eval_every", "1000000", "--save_every", "4",
          "--head_lr", "0.01"])
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.listdir(os.path.join(out, "ckpt"))


def test_cli_train_nlp_profile_and_steady_throughput(tmp_path, capsys):
    """--profile writes a TensorBoard-loadable jax.profiler trace of a
    steady-state step window; logged examples_per_sec comes from StepTimer
    (excludes compile steps)."""
    data = _train_csv(tmp_path)
    out = str(tmp_path / "out")
    prof = str(tmp_path / "trace")
    main(["train", "nlp", "--data", data, "--output", out,
          "--batch_size", "8", "--epochs", "2", "--max_length", "12",
          "--eval_every", "1000000", "--save_every", "1000000",
          "--log_every", "8", "--profile", prof])
    found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert any(f.endswith(".xplane.pb") or ".trace" in f for f in found), \
        found
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    assert any("train/examples_per_sec" in l and "train/step_ms_p50" in l
               for l in lines)


def test_cli_train_fasttext(tmp_path, capsys):
    df = pd.DataFrame({
        "text": ["苹果 香蕉"] * 20 + ["可乐 雪碧"] * 20,
        "label": ["fruit"] * 20 + ["drink"] * 20})
    data = str(tmp_path / "ft.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "ftout")
    main(["train", "fasttext", "--data", data, "--eval_data", data,
          "--output", out, "--dim", "8", "--epochs", "4"])
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(captured)
    assert res["n"] == 40 and res["precision"] > 0.9
    assert os.path.exists(os.path.join(out, "fasttext.pkl"))


def test_cli_embed_incremental(tmp_path, capsys):
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(10)],
                       "spu_name": [f"商品{i}" for i in range(10)]})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    table = str(tmp_path / "emb.parquet")
    main(["embed", "incremental", "--data", data, "--table", table,
          "--dt", "2026-08-16", "--max_length", "12", "--batch_size", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["written"] == 10
    # incremental: second run writes nothing
    main(["embed", "incremental", "--data", data, "--table", table,
          "--max_length", "12", "--batch_size", "8"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["written"] == 0


def test_cli_similar_nlp_dry_run(tmp_path, capsys):
    df = pd.DataFrame({"spu_sn": [f"s{i}" for i in range(8)],
                       "spu_name": ["苹果"] * 4 + ["牛奶"] * 4})
    data = str(tmp_path / "skus.csv")
    df.to_csv(data, index=False)
    main(["similar", "nlp", "--data", data, "--max_length", "8",
          "--batch_size", "8", "--k", "8", "--score_th", "0.99999"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["written"] == 8


def test_cli_download(tmp_path, capsys, monkeypatch):
    df = pd.DataFrame({"goods_sku": ["1", "2"], "img_id": ["0", "0"],
                       "url": ["http://x/a.jpg", "http://x/b.jpg"]})
    manifest = str(tmp_path / "m.csv")
    df.to_csv(manifest, index=False)
    import multimodalsimilar_tpu.pipelines.download as dl
    monkeypatch.setattr(dl, "_default_fetch", lambda url: b"IMG")
    main(["download", "--manifest", manifest,
          "--out_root", str(tmp_path / "imgs"), "--threads", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["downloaded"] == 2


def test_vocab_persists_from_train_to_embed(tmp_path, capsys):
    """Train persists {output}/vocab.txt; embed jobs reusing it get the SAME
    token ids — re-deriving from a different corpus would silently garble
    embeddings from the trained checkpoint."""
    df = pd.DataFrame({"spu_name": [f"{'甲乙'[i % 2] * 3}训练{i}"
                                    for i in range(32)],
                       "labels": [i % 2 for i in range(32)]})
    data = str(tmp_path / "train.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "nlp", "--data", data, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "8",
          "--eval_every", "1000000", "--save_every", "2",
          "--log_every", "1000000"])
    vocab_path = os.path.join(out, "vocab.txt")
    assert os.path.exists(vocab_path)
    from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
    tok_train = TextTokenizer.from_vocab_file(vocab_path)
    tok_other = TextTokenizer.from_corpus(["甲甲甲"])
    a = tok_train(["甲甲甲"], 8)["input_ids"]
    b = tok_other(["甲甲甲"], 8)["input_ids"]
    assert not np.array_equal(a, b)  # the mismatch the persistence prevents
    # embed job consumes the persisted vocab + checkpoint
    skus = pd.DataFrame({"goods_sku": ["1"], "spu_name": ["甲甲甲"]})
    sk = str(tmp_path / "skus.csv")
    skus.to_csv(sk, index=False)
    main(["embed", "incremental", "--data", sk,
          "--table", str(tmp_path / "e.parquet"),
          "--tokenizer", vocab_path, "--checkpoint",
          os.path.join(out, "ckpt"), "--num_labels", "2",
          "--max_length", "8", "--batch_size", "4"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["written"] == 1
