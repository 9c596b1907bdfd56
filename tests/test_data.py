"""Data layer: text cleaning parity, tokenizer shapes, samplers, batching."""

import numpy as np
import pandas as pd
import pytest

from multimodalsimilar_tpu.data.datasets import (
    PairTextSource, TextClassificationSource)
from multimodalsimilar_tpu.data.sampling import (
    PairSampler, WeightedSampler, class_balance_weights)
from multimodalsimilar_tpu.data.text import gen_title, preprocess_for_infer
from multimodalsimilar_tpu.data.tokenizer import TextTokenizer, build_char_vocab


def test_preprocess_for_infer_reference_semantics():
    # replace marketing tokens then strip [..] groups (reference order)
    got = preprocess_for_infer([
        "【福利秒杀】苹果[2斤装]新鲜",
        "源本 香蕉【每日福利】",
        "无修改商品",
    ])
    assert got == ["苹果新鲜", " 香蕉", "无修改商品"]


def test_gen_title_reference_semantics():
    item = {
        "product_name": "可乐330ml",
        "first_level_category_name": "饮料1类",
        "second_level_category_name": "碳酸2饮料",
        "product_title": "冰爽  可乐 2022款",
    }
    # digits stripped from categories+title, kept in product name; ws collapsed
    assert gen_title(item) == "饮料类 碳酸饮料 可乐330ml 冰爽 可乐 款"
    item["product_title"] = float("nan")
    assert gen_title(item) == "饮料类 碳酸饮料 可乐330ml"


def test_char_tokenizer_round_trip():
    corpus = ["苹果汁", "香蕉牛奶", "abc"]
    tok = TextTokenizer.from_corpus(corpus)
    out = tok(["苹果", "香蕉x"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    assert out["attention_mask"].sum(1).tolist() == [4, 5]  # CLS+chars+SEP
    # unknown char maps to [UNK]=1
    assert 1 in out["input_ids"][1]


def test_class_balance_weights():
    labels = np.array([0, 0, 0, 1, 2, 2])
    w = class_balance_weights(labels)
    np.testing.assert_allclose(w, [1/3, 1/3, 1/3, 1.0, 1/2, 1/2])


def test_weighted_sampler_distribution():
    w = np.array([0.0, 1.0, 3.0])
    s = WeightedSampler(w, num_samples=20000, seed=0)
    idx = np.fromiter(iter(s), np.int64, 20000)
    assert (idx == 0).sum() == 0
    assert abs((idx == 2).mean() - 0.75) < 0.02


def _pair_df():
    rng = np.random.default_rng(0)
    n = 200
    lv1 = rng.integers(0, 3, n)
    lv2 = lv1 * 10 + rng.integers(0, 3, n)
    tag = lv2 * 10 + rng.integers(0, 3, n)
    return pd.DataFrame({
        "title": [f"t{i}" for i in range(n)],
        "sku_sn_name": [f"s{i}" for i in range(n)],
        "tag_id": tag, "lv2_category_id": lv2, "lv1_category_id": lv1})


def test_pair_sampler_labels_respect_hierarchy():
    df = _pair_df()
    ps = PairSampler(df, seed=1)
    title_to_row = {r["title"]: r for _, r in df.iterrows()}
    pos = neg = 0
    for i in range(150):
        q, t, label = ps.sample_pair(i)
        rq, rt = title_to_row[q], title_to_row[t]
        if label == 0:
            neg += 1
            # negatives never share the finest bucket that was required
            assert not (rq["tag_id"] == rt["tag_id"]
                        and rq["lv2_category_id"] == rt["lv2_category_id"]
                        and q == t)
        else:
            pos += 1
    assert pos > 30 and neg > 30


def test_pair_sampler_reference_exclusions():
    """Review fixes pinned: negatives never carry the anchor's own title
    (nlp_st_datasets.py:66,75,83), positives never come from rows sharing
    the anchor's sku_sn_name (:40,46,52), and the same-tag branch needs a
    bucket of >2 non-anchor rows (:53)."""
    n = 60
    df = pd.DataFrame({
        # duplicate titles across DIFFERENT tags in the same lv2 bucket —
        # the case that used to produce (T, T, 0) pairs
        "title": [f"t{i % 10}" for i in range(n)],
        "sku_sn_name": [f"s{i % 10}" for i in range(n)],
        "tag_id": np.arange(n) % 6,
        "lv2_category_id": np.arange(n) % 3,
        "lv1_category_id": np.arange(n) % 2})
    ps = PairSampler(df, seed=3)
    saw_neg = 0
    for i in range(200):
        q, t, label = ps.sample_pair(i % n)
        if label == 0:
            saw_neg += 1
            assert t != q            # never "this string is unlike itself"
        else:
            # positives: pair row never shares the anchor's sku_sn_name
            # (self-pair fallback q==t is the one exception)
            if t != q:
                anchor_sku = df["sku_sn_name"].iloc[i % n]
                pair_skus = set(
                    df[df["title"] == t]["sku_sn_name"]) - {anchor_sku}
                assert pair_skus, (q, t)
    assert saw_neg > 40

    # same-tag positive branch: a 2-row bucket must fall back to self-pair
    tiny = pd.DataFrame({
        "title": ["a", "b", "c"], "sku_sn_name": ["1", "2", "3"],
        "tag_id": [7, 7, 7], "lv2_category_id": [0, 1, 2],
        "lv1_category_id": [0, 1, 2]})
    ps2 = PairSampler(tiny, seed=0)
    for _ in range(60):
        q, t, label = ps2.sample_pair(0)
        if label == 1:
            # lv1/lv2 buckets are singletons; the tag bucket has only 2
            # non-anchor rows, below the reference's >2 requirement
            assert t == q


def test_brightness_is_additive():
    """albumentations>=0.4 RandomBrightness adds beta*255 (brightness_by_max)
    rather than scaling — on a black image a multiplicative version would be
    a no-op, the reference's additive one lifts every pixel by >=23."""
    from multimodalsimilar_tpu.data.images import augment_resized
    img = np.zeros((16, 16, 3), np.uint8)
    changed = 0
    for seed in range(12):
        out = augment_resized(img.copy(), np.random.default_rng(seed))
        if out.any():
            changed += 1
            assert out.min() >= 22           # uniform additive lift
            assert out.max() == out.min()    # same shift everywhere
    assert changed >= 3                      # p=0.5 across 12 seeds


def test_text_source_static_shapes():
    df = pd.DataFrame({"spu_name": [f"商品{i}号" for i in range(37)],
                       "labels": np.arange(37) % 5})
    tok = TextTokenizer.from_corpus(df["spu_name"])
    src = TextClassificationSource(df, tok, max_length=16)
    batches = list(src.batches(batch_size=8, seed=0))
    assert len(batches) == 4  # drop_remainder
    for b in batches:
        assert b["input_ids"].shape == (8, 16)
        assert b["labels"].shape == (8,)
    # weighted sampling plugs in
    w = class_balance_weights(df["labels"].values)
    bs = list(src.batches(8, sampler=WeightedSampler(w, seed=0)))
    assert len(bs) == 4


def test_text_source_seq_buckets():
    """seq_buckets trims each batch to the smallest covering bucket; the
    trimmed content equals the untrimmed prefix and labels are untouched."""
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"spu_name": ["商" * int(n) for n in
                                    rng.integers(1, 13, size=32)],
                       "labels": np.arange(32) % 5})
    tok = TextTokenizer.from_corpus(df["spu_name"])
    plain = TextClassificationSource(df, tok, max_length=16, clean=False)
    bucketed = TextClassificationSource(df, tok, max_length=16, clean=False,
                                        seq_buckets=(6, 10))
    for a, b in zip(plain.batches(8, seed=0), bucketed.batches(8, seed=0)):
        seq = b["input_ids"].shape[1]
        assert seq in (6, 10, 16)
        need = int(a["attention_mask"].sum(axis=1).max())
        assert seq >= need                      # nothing real trimmed away
        for k in ("input_ids", "attention_mask", "token_type_ids"):
            np.testing.assert_array_equal(b[k], a[k][:, :seq])
        np.testing.assert_array_equal(b["labels"], a["labels"])


def test_bucket_parsing_accepts_all_spellings():
    """YAML configs can deliver an int, a string, or a list — all must
    normalize identically (and bad specs fail loudly, not as iteration
    TypeErrors)."""
    from multimodalsimilar_tpu.utils.buckets import bucket_ladder, parse_buckets
    assert parse_buckets(None) is None
    assert parse_buckets(48) == [48]
    assert parse_buckets("24,32,48") == [24, 32, 48]
    assert parse_buckets([24, 32]) == [24, 32]
    assert bucket_ladder("48,24,200,24", 128) == [24, 48, 128]
    assert bucket_ladder(64, 16) == [16]       # oversized rung -> max only
    with pytest.raises(ValueError, match="bucket spec"):
        parse_buckets("24,abc")
    # scalar int through the source constructor (the YAML case that used
    # to crash with TypeError)
    df = pd.DataFrame({"spu_name": ["商品甲", "商品乙乙乙"], "labels": [0, 1]})
    tok = TextTokenizer.from_corpus(df["spu_name"])
    src = TextClassificationSource(df, tok, max_length=16, seq_buckets=8)
    assert src.seq_buckets == [8, 16]


def test_pair_source_seq_buckets_shared():
    """Pair batches trim BOTH sides to one shared covering bucket."""
    df = _pair_df()
    tok = TextTokenizer.from_corpus(df["title"])
    src = PairTextSource(df, tok, max_length=16, seq_buckets=(6, 10))
    n_batches = 0
    for b in src.batches(8, seed=0):
        n_batches += 1
        sq = b["query_input_ids"].shape[1]
        st = b["title_input_ids"].shape[1]
        assert sq == st and sq in (6, 10, 16)
        need = int(max(b["query_attention_mask"].sum(axis=1).max(),
                       b["title_attention_mask"].sum(axis=1).max()))
        assert sq >= need
    assert n_batches > 1


def test_pair_source_batch_keys():
    df = _pair_df()
    tok = TextTokenizer.from_corpus(df["title"])
    src = PairTextSource(df, tok, max_length=8)
    b = next(src.batches(16))
    assert b["query_input_ids"].shape == (16, 8)
    assert b["title_input_ids"].shape == (16, 8)
    assert set(np.unique(b["labels"])) <= {0, 1}


def test_hf_tokenizer_offline(tmp_path):
    """The production tokenizer path (BertTokenizer from a local vocab dir)
    works fully offline — no hub access."""
    import json as _json
    import os as _os
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "苹", "果", "牛", "奶"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (tmp_path / "tokenizer_config.json").write_text(
        _json.dumps({"tokenizer_class": "BertTokenizer"}))
    _os.environ["TRANSFORMERS_OFFLINE"] = "1"
    tok = TextTokenizer.from_hf(str(tmp_path))
    out = tok(["苹果 牛奶"], max_length=8)
    assert out["input_ids"].shape == (1, 8)
    assert out["input_ids"][0, 0] == 2      # [CLS]
    assert out["attention_mask"][0].sum() == 6  # CLS + 4 chars + SEP


def test_bucket_warning_only_for_unreachable_buckets(recwarn):
    """'48,64,128' with max_length 128 is the natural full-ladder spelling
    (identical to the appended final rung) — it must NOT warn; only
    buckets > max_length (the '480'-for-'48' typo) do."""
    import warnings

    from multimodalsimilar_tpu.utils.buckets import bucket_ladder
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert bucket_ladder("48,64,128", 128) == [48, 64, 128]
    with pytest.warns(UserWarning, match="unreachable"):
        assert bucket_ladder("480,64", 128) == [64, 128]


def test_bounded_map_backpressure_and_early_exit():
    """_bounded_map must cap in-flight work (Executor.map submits the whole
    epoch up front — decoded images then buffer unboundedly ahead of a slow
    consumer) and must not decode the rest of the epoch when the consumer
    abandons the generator early."""
    from concurrent.futures import ThreadPoolExecutor

    from multimodalsimilar_tpu.data.datasets import _bounded_map

    started = []

    def fn(x):
        started.append(x)
        return x

    with ThreadPoolExecutor(max_workers=2) as pool:
        gen = _bounded_map(pool, fn, range(1000), window=8)
        got = [next(gen) for _ in range(10)]
        gen.close()
    assert got == list(range(10))             # submission order
    assert len(started) < 50                  # not the whole epoch
    # full consumption still yields everything, in order
    with ThreadPoolExecutor(max_workers=2) as pool:
        assert list(_bounded_map(pool, fn, range(40), window=4)) \
            == list(range(40))


def test_image_source_all_decode_failures_fail_loud(tmp_path):
    """100% decode failure (wrong --img_root) must raise, not complete the
    epoch silently with zero batches; partial failure warns with a count."""
    from multimodalsimilar_tpu.data.datasets import ImageClassificationSource

    df = pd.DataFrame({"goods_sku": [f"k{i}" for i in range(8)],
                       "tag_new_id": [i % 2 for i in range(8)]})
    src = ImageClassificationSource(df, str(tmp_path / "nope"),
                                    key_col="goods_sku",
                                    label_col="tag_new_id", image_size=8)
    with pytest.raises(RuntimeError, match="img_root"):
        list(src.batches(4, shuffle=False))


def test_pair_source_eval_pairs_fixed_across_calls():
    """Same (seed, epoch) -> same pair set: a periodic eval pass must not
    resample pairs between eval windows (metrics would fluctuate from
    sampling, not the model). Different epochs still resample."""
    df = _pair_df()
    tok = TextTokenizer.from_corpus(df["title"])
    from multimodalsimilar_tpu.data.datasets import PairTextSource
    src = PairTextSource(df, tok, max_length=12)

    def collect(epoch):
        return [(tuple(b["labels"]),
                 b["query_input_ids"].tobytes(),
                 b["title_input_ids"].tobytes())
                for b in src.batches(4, shuffle=False, epoch=epoch,
                                     drop_remainder=False)]

    a, b = collect(0), collect(0)
    assert a == b                              # eval: fixed pairs
    assert collect(1) != a                     # train: resamples per epoch
