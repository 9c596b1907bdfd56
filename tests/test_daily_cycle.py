"""ONE test spanning the production daily cycle (round-4 VERDICT #6).

The reference's cron chain (SURVEY.md §2.4): train once, then nightly
goodssku_emb_*_di incremental exports feed the daodian_infer_v2 similar
jobs and the online KV. Every link exists here and is tested alone; this
file proves the HANDOFFS compose — especially the
`serve --emb_table` consumes `embed incremental` output contract, the
kind of seam that drifts silently:

  train nlp  ->  night-1 `embed incremental` (goodssku layout)
             ->  `similar daodian` v2 date-keyed over the day's corpus
             ->  `serve --emb_table` warm-starts from the night's table
                 (zero fresh tower rows), answers /similar, takes /update
             ->  night-2 `embed incremental` skips every already-exported
                 key and picks up exactly the new ones (the in-memory
                 /update did NOT touch the warehouse — the nightly batch
                 layout stays the authority, serving.py docstring)
             ->  a restarted daemon on the night-2 table serves the new
                 keys without a tower pass.
"""

import json
import pickle
import threading
import urllib.request

import numpy as np
import pandas as pd

from multimodalsimilar_tpu.cli import main


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _catalog(n):
    cats = ["水果 苹果 香蕉", "乳品 牛奶 酸奶", "饮料 可乐 汽水"]
    rng = np.random.default_rng(0)
    return pd.DataFrame([{
        "goods_sku": f"g{i}", "spu_sn": f"s{i}",
        "spu_name": " ".join(rng.choice(cats[i % 3].split(), 2))
        + f" 商品{i}",
        "labels": i % 3,
        "area_id": 1 + (i % 2),
        "first_level_category_id": i % 3,
        "second_level_category_id": 10 + i % 3,
    } for i in range(n)])


def test_daily_cycle(tmp_path, capfd):
    out = str(tmp_path / "out")
    cat1 = _catalog(48)
    data1 = str(tmp_path / "day1.csv")
    cat1.to_csv(data1, index=False)

    # -- once: train the text tower (the serving/vocab contract source)
    main(["train", "nlp", "--data", data1, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "12",
          "--eval_every", "1000000", "--save_every", "3",
          "--log_every", "1000000"])
    capfd.readouterr()
    tok = f"{out}/vocab.txt"
    ckpt = f"{out}/ckpt"

    # -- night 1: incremental export in the goodssku layout
    table = str(tmp_path / "goodssku_embedding_bert.parquet")
    base_embed = ["embed", "incremental", "--table", table,
                  "--tokenizer", tok, "--checkpoint", ckpt,
                  "--num_labels", "3", "--max_length", "12",
                  "--batch_size", "16"]
    main(base_embed + ["--data", data1, "--dt", "2026-08-16"])
    night1 = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert night1["written"] == 48
    t = pd.read_parquet(table)
    assert set(t["goods_sku"]) == set(cat1["goods_sku"])
    assert (t["dt"] == "2026-08-16").all()

    # -- the daodian v2 date-keyed similar job runs over the same day's
    # corpus (its text arm is fastText, trained on the same titles)
    from multimodalsimilar_tpu.models.fasttext import train_supervised
    ft = train_supervised(cat1["spu_name"].tolist(),
                          cat1["labels"].tolist(), dim=8, epochs=2,
                          bucket=500)
    ft_path = str(tmp_path / "ft.pkl")
    with open(ft_path, "wb") as f:
        pickle.dump(ft, f)
    dd = cat1.assign(title=cat1["spu_name"], dt="2026-08-16")
    dd_path = str(tmp_path / "daodian.csv")
    dd.to_csv(dd_path, index=False)
    main(["similar", "daodian", "--data", dd_path, "--fasttext_model",
          ft_path, "--dt", "2026-08-16", "--date_keyed", "--text_only"])
    sim = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert sim["skus"] == 48

    # -- morning: the daemon warm-starts from the night's OWN table —
    # the --emb_table-consumes-embed-output contract under test
    from multimodalsimilar_tpu.cli import (_build_serve_service,
                                           _warm_serve_service,
                                           build_parser)
    from multimodalsimilar_tpu.pipelines.serving import make_server
    args = build_parser().parse_args(
        ["serve", "--data", data1, "--key_col", "goods_sku",
         "--tokenizer", tok, "--checkpoint", ckpt, "--num_labels", "3",
         "--max_length", "12", "--batch_size", "16", "--max_batch", "8",
         "--emb_table", table, "--port", "0"])
    capfd.readouterr()
    service, n = _build_serve_service(args)
    warm_msg = capfd.readouterr().err
    assert "corpus 48 rows from --emb_table, 0 embedded fresh" in warm_msg
    assert n == 48
    _warm_serve_service(service, args)
    httpd = make_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        got = _post(f"http://127.0.0.1:{port}/similar", {"text": "苹果"})
        assert got["neighbors"]
        # serving answers must come from the night's vectors: the corpus
        # row's own key must rank (score ~1) when we query its exact text
        row_text = cat1["spu_name"].iloc[0]
        got = _post(f"http://127.0.0.1:{port}/similar",
                    {"text": row_text, "score_th": None})
        assert got["neighbors"][0]["score"] > 0.99
        # intraday: an online upsert lands in the serving corpus...
        up = _post(f"http://127.0.0.1:{port}/update", {"items": [
            {"key": "gNEW", "text": "苹果 鲜果 新品"}]})
        assert up["corpus"] == 49
        got = _post(f"http://127.0.0.1:{port}/similar",
                    {"text": "苹果 鲜果 新品", "score_th": None})
        assert got["neighbors"][0]["key"] == "gNEW"
    finally:
        httpd.shutdown()
        httpd.server_close()
        service.close()

    # -- night 2: catalog grew by the upserted key + one brand-new one.
    # The warehouse never saw gNEW (the /update was in-memory by design),
    # so the incremental job writes EXACTLY the two new keys.
    cat2 = pd.concat([cat1, pd.DataFrame([
        {"goods_sku": "gNEW", "spu_sn": "sNEW",
         "spu_name": "苹果 鲜果 新品", "labels": 0, "area_id": 1,
         "first_level_category_id": 0, "second_level_category_id": 10},
        {"goods_sku": "gNEW2", "spu_sn": "sNEW2",
         "spu_name": "牛奶 盒装 新品", "labels": 1, "area_id": 2,
         "first_level_category_id": 1, "second_level_category_id": 11},
    ])], ignore_index=True)
    data2 = str(tmp_path / "day2.csv")
    cat2.to_csv(data2, index=False)
    main(base_embed + ["--data", data2, "--dt", "2026-08-17"])
    night2 = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert night2["written"] == 2
    t2 = pd.read_parquet(table)
    assert len(t2) == 50
    assert set(t2.loc[t2["dt"] == "2026-08-17", "goods_sku"]) \
        == {"gNEW", "gNEW2"}

    # -- restart on the night-2 table: all 50 keys serve from it, zero
    # fresh tower rows — the cycle closes
    args2 = build_parser().parse_args(
        ["serve", "--data", data2, "--key_col", "goods_sku",
         "--tokenizer", tok, "--checkpoint", ckpt, "--num_labels", "3",
         "--max_length", "12", "--batch_size", "16", "--max_batch", "8",
         "--emb_table", table, "--port", "0"])
    capfd.readouterr()
    service2, n2 = _build_serve_service(args2)
    try:
        warm2 = capfd.readouterr().err
        assert "corpus 50 rows from --emb_table, 0 embedded fresh" in warm2
        assert n2 == 50
        # the restarted daemon serves the intraday key from the table
        res = service2._run_batch(
            [{"op": "similar", "query": "苹果 鲜果 新品"}])
        scores, idx = res[0]
        keys = np.asarray(service2.engine.keys, dtype=object)
        assert str(keys[int(idx[0])]) == "gNEW"
    finally:
        service2.close()
