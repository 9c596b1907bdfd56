"""fastText-style supervised n-gram bag model, JAX-native.

The reference trains ``fasttext.train_supervised(lr=0.1, dim=100, epoch=5,
word_ngrams=2, loss='softmax')`` (fasttext_train.py:4-6) and serves its
``get_sentence_vector`` as the cheap text tower of the production similar-SKU
job (daodian_infer.py:214,352). This reproduces that capability natively:

* vocabulary = corpus words + hashed word-bigram buckets (fastText's FNV-1a
  hashing and ``h1 * 116049371 + h2`` n-gram combination),
* model = embedding-bag mean over token ids -> linear softmax head,
* ``sentence_vector`` = mean of per-token vectors each L2-normalized
  (fastText's get_sentence_vector semantics),
* training = batched jitted SGD steps with a SPARSE embedding update
  (grads land as a scatter-add of the gathered rows — bit-identical to
  dense SGD, ~100x less memory traffic at fastText's default bucket=2M).
  Measured at the reference config (PERF.md "fastText component"):
  74.5k tokens/s on this host's ONE core (≈ C++ fastText's published
  per-thread rate) and 175k tokens/s through the TPU relay (bounded by
  per-step dispatch, not compute — fastText-style SGD is a host-scale
  workload; the TPU path exists so the component shares the stack, not
  because the chip is the right tool for dim-100 bags).

This is capability parity, not bit parity: fastText's asynchronous hogwild
SGD is nondeterministic, so the contract is matched accuracy on labeled data
and an equivalent embedding geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

EOS = "</s>"


def _fnv1a(s: str) -> int:
    """fastText's FNV-1a: XORs each UTF-8 byte SIGN-EXTENDED to uint32
    (dictionary.cc hash() does ``uint32_t(int8_t(c))``) — bytes >= 0x80,
    i.e. every byte of a Chinese character, get the 0xFFFFFF00 high bits.
    Plain zero-extension diverges from fastText on all non-ASCII words."""
    h = 2166136261
    for b in s.encode("utf-8"):
        if b >= 0x80:
            b |= 0xFFFFFF00
        h = (h ^ b) * 16777619 & 0xFFFFFFFF
    return h


def _bigram_bucket(h1: int, h2: int, bucket: int) -> int:
    """fastText addWordNgrams: the uint32 hashes are stored as int32 and
    sign-extended to uint64 before ``h*116049371 + h2`` (dictionary.cc)."""

    def as_u64(h):                     # uint64(int32(h))
        return h | 0xFFFFFFFF00000000 if h >= 0x80000000 else h

    h = (as_u64(h1) * 116049371 + as_u64(h2)) & 0xFFFFFFFFFFFFFFFF
    return h % bucket


@dataclasses.dataclass
class FastTextVocab:
    words: Dict[str, int]
    bucket: int
    min_count: int = 1

    def __getstate__(self):
        # the native encoder holds ctypes handles — rebuilt lazily on load
        state = dict(self.__dict__)
        state.pop("_native", None)
        state.pop("_native_failed", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)

    @classmethod
    def build(cls, corpus: Iterable[str], bucket: int = 200_000,
              min_count: int = 1) -> "FastTextVocab":
        counts: Dict[str, int] = {}
        for line in corpus:
            for w in line.split():
                counts[w] = counts.get(w, 0) + 1
        counts[EOS] = 10**9
        words = {w: i for i, (w, c) in enumerate(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])))
            if c >= min_count}
        return cls(words, bucket, min_count)

    @property
    def nwords(self) -> int:
        return len(self.words)

    @property
    def size(self) -> int:
        return self.nwords + self.bucket

    def line_ids(self, line: str, word_ngrams: int = 2) -> List[int]:
        """Token ids for a line: known words (+EOS) and hashed bigrams."""
        toks = line.split() + [EOS]
        ids = [self.words[t] for t in toks if t in self.words]
        if word_ngrams >= 2:
            hashes = [_fnv1a(t) for t in toks]
            for i in range(len(toks) - 1):
                h = _bigram_bucket(hashes[i], hashes[i + 1], self.bucket)
                ids.append(self.nwords + h)
        return ids

    def encode_batch(self, lines: Sequence[str], max_tokens: int = 64,
                     word_ngrams: int = 2) -> Tuple[np.ndarray, np.ndarray]:
        """Static [B, max_tokens] id matrix + mask (pad id 0, masked out).

        Uses the native C++ packer (native/fastpack.cpp) when available;
        identical output to the Python path below.
        """
        native = getattr(self, "_native", None)
        if native is None and not getattr(self, "_native_failed", False):
            try:
                from multimodalsimilar_tpu.native import NativeFtEncoder
                native = NativeFtEncoder(self.words, self.bucket,
                                         self.nwords)
                object.__setattr__(self, "_native", native)
            except Exception:
                object.__setattr__(self, "_native_failed", True)
        if native is not None:
            # normalize Unicode whitespace to ASCII spaces first: the C
            # splitter handles ASCII space classes only, while Python
            # str.split() (used at vocab build) splits on all of
            # str.isspace() — full-width U+3000 spaces are common in
            # Chinese product titles
            lines = [" ".join(str(l).split()) for l in lines]
            return native.encode_batch(lines, max_tokens, word_ngrams)
        B = len(lines)
        ids = np.zeros((B, max_tokens), np.int32)
        mask = np.zeros((B, max_tokens), np.float32)
        for b, line in enumerate(lines):
            li = self.line_ids(line, word_ngrams)[:max_tokens]
            ids[b, : len(li)] = li
            mask[b, : len(li)] = 1.0
        return ids, mask


def init_params(rng: jax.Array, vocab_size: int, dim: int,
                num_labels: int) -> Dict:
    """fastText init: input uniform(-1/dim, 1/dim), output zeros."""
    k1, _ = jax.random.split(rng)
    return {
        "input": jax.random.uniform(k1, (vocab_size, dim), jnp.float32,
                                    -1.0 / dim, 1.0 / dim),
        "output": jnp.zeros((num_labels, dim), jnp.float32),
    }


def hidden_mean(params: Dict, ids: jnp.ndarray, mask: jnp.ndarray
                ) -> jnp.ndarray:
    """Embedding-bag mean over valid tokens: [B, dim]."""
    vecs = params["input"][ids]                     # [B, L, D] gather
    total = jnp.sum(vecs * mask[:, :, None], axis=1)
    return total / jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)


def logits_fn(params: Dict, ids: jnp.ndarray, mask: jnp.ndarray
              ) -> jnp.ndarray:
    return hidden_mean(params, ids, mask) @ params["output"].T


# Inference entry points are jitted (ONE program per shape instead of an
# eager op chain) and called on BUCKETED batch shapes (_pad_to_bucket):
# the daodian paths embed per-area corpora whose sizes all differ and
# drift (+1 per online upsert) — per-exact-shape programs meant every
# area size change recompiled (measured 7.4 s vs 0.12 s for the same
# rebuild with warm programs, benchmarks/daodian_daemon_bench.py).
_hidden_mean_jit = jax.jit(hidden_mean)
_logits_jit = jax.jit(logits_fn)


def _pad_to_bucket(ids: np.ndarray, mask: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the batch axis to a pow2 bucket (>=32). Pad rows are all-mask-
    zero: hidden_mean's denominator clamps at 1, so they compute zeros
    and the caller slices them off — results are bit-identical to the
    unpadded call."""
    n = ids.shape[0]
    b = max(32, 1 << (n - 1).bit_length())
    if b == n:
        return ids, mask
    pad = ((0, b - n), (0, 0))
    return np.pad(ids, pad), np.pad(mask, pad)


def sentence_vector(params: Dict, ids: jnp.ndarray, mask: jnp.ndarray
                    ) -> jnp.ndarray:
    """fastText getSentenceVector's UNSUPERVISED branch: average of
    per-token vectors, each divided by its L2 norm. NB the production
    serving path uses a SUPERVISED model, whose getSentenceVector is the
    plain mean of input rows (fasttext.cc model==sup branch) — that is
    ``hidden_mean``, which FastTextClassifier.get_sentence_vector uses."""
    vecs = params["input"][ids]
    norm = jnp.sqrt(jnp.sum(jnp.square(vecs), -1, keepdims=True))
    unit = jnp.where(norm > 0, vecs / jnp.maximum(norm, 1e-12), 0.0)
    total = jnp.sum(unit * mask[:, :, None], axis=1)
    return total / jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)


@dataclasses.dataclass
class FastTextClassifier:
    """Trained supervised model bundle (vocab + params + label list)."""

    vocab: FastTextVocab
    params: Dict
    labels: List
    dim: int
    word_ngrams: int = 2
    max_tokens: int = 64

    def __post_init__(self):
        # device-resident ONCE: a pickled model restores host numpy
        # params, and a host-resident 2M x 100 table re-uploads ~80 MB
        # per jitted call (the fold_cv_classifier trap, CLAUDE.md).
        # No-op when params are already device arrays.
        self.params = jax.device_put(self.params)

    def __setstate__(self, state):
        # pickle bypasses __init__/__post_init__
        self.__dict__.update(state)
        self.params = jax.device_put(self.params)

    def _encode(self, texts: Sequence[str]):
        """Bucket-padded [B', L] ids/mask (B' = pow2 >= len(texts)) —
        the jitted forward compiles once per bucket, not once per exact
        corpus size (see _pad_to_bucket). Callers slice to len(texts)."""
        ids, mask = self.vocab.encode_batch(texts, self.max_tokens,
                                            self.word_ngrams)
        ids, mask = _pad_to_bucket(np.asarray(ids), np.asarray(mask))
        return jnp.asarray(ids), jnp.asarray(mask)

    def predict(self, texts: Sequence[str]) -> np.ndarray:
        if not len(texts):
            return np.zeros((0,), np.int64)
        ids, mask = self._encode(texts)
        logits = np.asarray(_logits_jit(self.params, ids, mask))
        return logits[: len(texts)].argmax(-1)

    def predict_labels(self, texts: Sequence[str]) -> List:
        return [self.labels[i] for i in self.predict(texts)]

    def get_sentence_vector(self, texts: Sequence[str]) -> np.ndarray:
        """Supervised-model getSentenceVector = plain mean of input rows
        (words + bigram buckets), NO per-token normalization — fastText's
        fasttext.cc takes this branch for model==sup, the model the
        serving path loads (daodian_infer.py:214,352). The per-token-unit
        variant is the unsupervised branch (see sentence_vector)."""
        if not len(texts):
            return np.zeros((0, self.dim), np.float32)
        ids, mask = self._encode(texts)
        out = np.asarray(_hidden_mean_jit(self.params, ids, mask))
        return out[: len(texts)]

    def test(self, texts: Sequence[str], labels: Sequence) -> Tuple[int,
                                                                    float,
                                                                    float]:
        """(N, precision@1, recall@1) like fastText's classifier.test
        (fasttext_train.py:8-17)."""
        pred = self.predict_labels(texts)
        correct = sum(p == l for p, l in zip(pred, labels))
        acc = correct / max(len(labels), 1)
        return len(labels), acc, acc


def train_supervised(texts: Sequence[str], labels: Sequence,
                     dim: int = 100, lr: float = 0.1, epochs: int = 5,
                     word_ngrams: int = 2, bucket: int = 200_000,
                     batch_size: int = 256, max_tokens: int = 64,
                     min_count: int = 1, seed: int = 0,
                     chain_steps: int = 1
                     ) -> FastTextClassifier:
    """Supervised training with fastText's linearly-decaying LR.

    ``chain_steps=K`` runs K consecutive SGD steps as ONE jitted
    ``lax.scan`` program over pre-stacked batches (iteration-dependent
    gathers/scatters — nothing hoists): same math in the same order as
    the python loop, but one dispatch per K steps. Built for the TPU
    relay's ~7 ms/program floor, which dominates the ~5 ms on-chip step
    (PERF 'fastText component'); epoch remainders fall back to the
    single-step program."""
    vocab = FastTextVocab.build(texts, bucket, min_count)
    label_list = sorted(set(labels))
    label_idx = {l: i for i, l in enumerate(label_list)}
    y = np.asarray([label_idx[l] for l in labels], np.int32)
    ids, mask = vocab.encode_batch(texts, max_tokens, word_ngrams)

    params = init_params(jax.random.key(seed), vocab.size, dim,
                         len(label_list))
    n = len(texts)
    steps_per_epoch = max(n // batch_size, 1)
    total = epochs * steps_per_epoch
    sched = optax.linear_schedule(lr, 0.0, total)

    # SPARSE update (round 4): grad of the embedding-bag gather wrt the
    # full [vocab, dim] table is a scatter-add of the per-row gradients —
    # materializing it dense made every SGD step read+write the whole
    # table (at fastText's default bucket=2M that is ~1.6 GB of traffic
    # per 256-row batch; measured 778 ms/step on this 1-core host, ~5 ms
    # on the chip). Differentiating wrt the GATHERED rows and
    # scatter-adding them back is bit-identical math for plain SGD
    # (update is linear in the gradient; .at[].add accumulates duplicate
    # ids exactly like the dense scatter) and moves only the batch's
    # ~6 MB. Donated buffers keep the scatter in place on device.
    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(inp, out, step_i, bi, bm, by):
        lr_t = sched(step_i)
        rows = inp[bi]                                    # [B, L, D]

        def loss_fn(rows, out):
            total_v = jnp.sum(rows * bm[:, :, None], axis=1)
            h = total_v / jnp.maximum(bm.sum(axis=1, keepdims=True), 1.0)
            lg = h @ out.T
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, by).mean()

        loss, (g_rows, g_out) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(rows, out)
        inp = inp.at[bi].add(-lr_t * g_rows)
        out = out - lr_t * g_out
        return inp, out, loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def chained(inp, out, step0, bis, bms, bys):
        def body(carry, xs):
            inp, out, i = carry
            bi, bm, by = xs
            lr_t = sched(i)
            rows = inp[bi]

            def loss_fn(rows, out):
                total_v = jnp.sum(rows * bm[:, :, None], axis=1)
                h = total_v / jnp.maximum(
                    bm.sum(axis=1, keepdims=True), 1.0)
                lg = h @ out.T
                return optax.softmax_cross_entropy_with_integer_labels(
                    lg, by).mean()

            loss, (g_rows, g_out) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(rows, out)
            inp = inp.at[bi].add(-lr_t * g_rows)
            out = out - lr_t * g_out
            return (inp, out, i + 1), loss

        (inp, out, _), losses = jax.lax.scan(
            body, (inp, out, step0), (bis, bms, bys))
        return inp, out, losses

    inp, out = params["input"], params["output"]
    rng = np.random.default_rng(seed)
    i = 0
    K = max(int(chain_steps), 1)
    for _ in range(epochs):
        order = rng.permutation(n)
        s = 0
        while s < steps_per_epoch:
            if K > 1 and s + K <= steps_per_epoch:
                sels = [order[(s + j) * batch_size:
                              (s + j + 1) * batch_size]
                        for j in range(K)]
                if all(len(x) == batch_size for x in sels):
                    sel = np.stack(sels)
                    inp, out, _ = chained(
                        inp, out, jnp.asarray(i, jnp.int32),
                        jnp.asarray(ids[sel]), jnp.asarray(mask[sel]),
                        jnp.asarray(y[sel]))
                    i += K
                    s += K
                    continue
            sel = order[s * batch_size:(s + 1) * batch_size]
            s += 1
            if len(sel) == 0:
                continue
            inp, out, _ = step(inp, out, jnp.asarray(i, jnp.int32),
                               jnp.asarray(ids[sel]),
                               jnp.asarray(mask[sel]), jnp.asarray(y[sel]))
            i += 1
    params = {"input": inp, "output": out}
    return FastTextClassifier(vocab, params, label_list, dim, word_ngrams,
                              max_tokens)
