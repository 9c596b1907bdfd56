"""Native C++ batch encoders: exact parity with the Python paths + speed."""

import time

import numpy as np
import pytest

from multimodalsimilar_tpu import native
from multimodalsimilar_tpu.data.tokenizer import (
    TextTokenizer, build_char_vocab)
from multimodalsimilar_tpu.models.fasttext import FastTextVocab

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

LINES = ["红 苹果 新鲜 多汁", "青 苹果", "可乐 冰镇 最好喝的", "单词"] * 8


def test_ft_encoder_matches_python():
    v = FastTextVocab.build(LINES, bucket=5000)
    n_ids, n_mask = v.encode_batch(LINES, max_tokens=16)   # native path
    # force the python path by disabling native on a fresh vocab
    v2 = FastTextVocab.build(LINES, bucket=5000)
    object.__setattr__(v2, "_native_failed", True)
    p_ids, p_mask = v2.encode_batch(LINES, max_tokens=16)
    np.testing.assert_array_equal(n_ids, p_ids)
    np.testing.assert_array_equal(n_mask, p_mask)


def test_ft_encoder_truncation_parity():
    v = FastTextVocab.build(LINES, bucket=100)
    v2 = FastTextVocab.build(LINES, bucket=100)
    object.__setattr__(v2, "_native_failed", True)
    for mt in (3, 5, 64):
        a = v.encode_batch(LINES, max_tokens=mt)
        b = v2.encode_batch(LINES, max_tokens=mt)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


def test_char_encoder_matches_python():
    vocab = build_char_vocab(LINES)
    tok_native = TextTokenizer.from_vocab(vocab, use_native=True)
    tok_python = TextTokenizer.from_vocab(vocab, use_native=False)
    texts = LINES + ["未知字符χψω", "x y  z"]
    for ml in (4, 8, 32):
        a = tok_native(texts, max_length=ml)
        b = tok_python(texts, max_length=ml)
        for key in ("input_ids", "attention_mask", "token_type_ids"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_native_is_faster():
    corpus = [" ".join(f"词{i % 97}" for i in range(30))] * 512
    vocab = build_char_vocab(corpus)
    tok_native = TextTokenizer.from_vocab(vocab, use_native=True)
    tok_python = TextTokenizer.from_vocab(vocab, use_native=False)

    def bench(tok):
        t0 = time.perf_counter()
        for _ in range(5):
            tok(corpus, max_length=64)
        return time.perf_counter() - t0

    bench(tok_native)  # warm
    t_native = bench(tok_native)
    t_python = bench(tok_python)
    assert t_native < t_python  # typically 5-20x
