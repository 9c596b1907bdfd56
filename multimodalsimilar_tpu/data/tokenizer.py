"""Tokenization to fixed-shape [B, S] int arrays.

The reference tokenizes with HF ``BertTokenizer('hfl/chinese-roberta-wwm-ext')``
at max_length 128 (train, nlp_classifier_train.py:53) or 80 (incremental
export, goodssku_emb_bert_di.py:56), always padded to max_length — which is
exactly what a TPU wants: one static [B, S] shape per job, no re-JITs.

``TextTokenizer`` wraps a HF tokenizer when a vocab is available on disk
(offline: BertTokenizerFast(vocab_file=...)); for hermetic tests and vocabless
environments ``build_char_vocab`` derives a BERT-style character vocab from a
corpus — for Chinese product titles, per-character tokenization is what the
WordPiece vocab degenerates to anyway for the CJK range (BERT's Chinese models
whitespace-split every CJK char before WordPiece).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

SPECIALS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")


def build_char_vocab(corpus: Iterable[str], out_path: Optional[str] = None,
                     min_count: int = 1) -> List[str]:
    """Character vocab (BERT vocab.txt layout: one token per line)."""
    counts: Dict[str, int] = {}
    for line in corpus:
        for ch in line:
            if not ch.isspace():
                counts[ch] = counts.get(ch, 0) + 1
    toks = list(SPECIALS) + sorted(
        c for c, n in counts.items() if n >= min_count)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write("\n".join(toks) + "\n")
    return toks


class TextTokenizer:
    """BERT-style tokenizer producing numpy {input_ids, attention_mask,
    token_type_ids} with static [B, max_length] shapes.

    Backends:
      * ``from_hf(name_or_path)`` — HF AutoTokenizer/BertTokenizerFast
        (real vocab on disk; used in production).
      * ``from_vocab(tokens)`` — built-in char-level tokenizer (hermetic).
    """

    def __init__(self, encode_fn, vocab_size: int, pad_id: int = 0):
        self._encode = encode_fn
        self.vocab_size = vocab_size
        self.pad_id = pad_id

    # -- constructors --------------------------------------------------

    @classmethod
    def from_hf(cls, name_or_path: str) -> "TextTokenizer":
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(name_or_path)

        def encode(texts: Sequence[str], max_length: int):
            out = tok(list(texts), padding="max_length",
                      max_length=max_length, truncation=True,
                      return_tensors="np", return_token_type_ids=True)
            return {k: np.asarray(v, np.int32) for k, v in out.items()}

        return cls(encode, tok.vocab_size, tok.pad_token_id or 0)

    @classmethod
    def from_vocab(cls, tokens: Sequence[str],
                   use_native: bool = True) -> "TextTokenizer":
        index = {t: i for i, t in enumerate(tokens)}
        pad, unk = index["[PAD]"], index["[UNK]"]
        cls_id, sep = index["[CLS]"], index["[SEP]"]

        if use_native:
            # C++ batch packer (native/fastpack.cpp) — same output, one call
            # per batch instead of a Python loop per character.
            try:
                from multimodalsimilar_tpu.native import NativeCharEncoder
                enc = NativeCharEncoder(list(tokens), pad, unk, cls_id, sep)
                return cls(enc.encode_batch, len(tokens), pad)
            except Exception:
                pass

        def encode(texts: Sequence[str], max_length: int):
            if max_length < 3:      # [CLS] + >=1 char + [SEP]
                raise ValueError(
                    f"max_length must be >= 3, got {max_length}")
            B = len(texts)
            ids = np.full((B, max_length), pad, np.int32)
            mask = np.zeros((B, max_length), np.int32)
            for b, text in enumerate(texts):
                chars = [c for c in text if not c.isspace()]
                chars = chars[: max_length - 2]
                row = ([cls_id] + [index.get(c, unk) for c in chars]
                       + [sep])
                ids[b, : len(row)] = row
                mask[b, : len(row)] = 1
            return {"input_ids": ids, "attention_mask": mask,
                    "token_type_ids": np.zeros_like(ids)}

        return cls(encode, len(tokens), pad)

    @classmethod
    def from_corpus(cls, corpus: Iterable[str],
                    save_vocab_path: Optional[str] = None) -> "TextTokenizer":
        tokens = build_char_vocab(corpus, out_path=save_vocab_path)
        return cls.from_vocab(tokens)

    @classmethod
    def from_vocab_file(cls, path: str) -> "TextTokenizer":
        """Load a vocab.txt written by ``from_corpus(save_vocab_path=...)``
        — the persistence that keeps train-time and serve-time token ids
        identical."""
        with open(path, encoding="utf-8") as f:
            tokens = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return cls.from_vocab(tokens)

    # -- use -----------------------------------------------------------

    def __call__(self, texts: Sequence[str], max_length: int = 128
                 ) -> Dict[str, np.ndarray]:
        return self._encode(texts, max_length)
