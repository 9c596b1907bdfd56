"""fastText component throughput — substantiating models/fasttext.py's
perf characterization (round-4 VERDICT #4: it carried an unmeasured
"orders of magnitude" docstring claim).

Measures, at the reference's exact config (dim 100, word bigrams, 5
epochs, lr 0.1 — fasttext_train.py:4-6), on a synthetic corpus matching
test.csv's title statistics (mean 21 chars, ~2-5 tokens/title, Chinese
tokens; 664-row sample scaled up):

* train_supervised wall time -> examples/s and tokens/s
  (vocab+hash build reported separately from the SGD loop: the hashing
  is host python either way),
* get_sentence_vector serving throughput (rows/s),
* test() accuracy so the speed numbers come from a model that learns.

Run:  python benchmarks/fasttext_bench.py [n_rows] [cpu|tpu]
Default 50_000 rows on the process default backend. The C++ comparison
baseline is fastText's PUBLISHED characterization (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification"): 1 billion tokens in
<10 min on 20 CPU threads ≈ 1.7M tokens/s, i.e. ~85k tokens/s/thread —
the C++ wheel is not installable in this zero-egress image, so the
comparison is against that published figure, stated as such in PERF.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# token pools shaped like cleaned product titles: category-ish head words
# plus item/marketing tail tokens (see data/text.py gen_title output)
HEADS = ["水果", "乳品", "饮料", "零食", "粮油", "清洁", "日配", "烘焙",
         "肉禽", "水产", "冻品", "家居"]
MIDS = ["苹果", "香蕉", "牛奶", "酸奶", "可乐", "汽水", "薯片", "饼干",
        "大米", "面粉", "洗衣液", "纸巾", "鸡蛋", "豆腐", "面包", "蛋糕",
        "鸡胸", "带鱼", "虾仁", "水饺", "毛巾", "果汁", "坚果", "糖果"]
TAILS = ["500g", "1L", "整箱", "散装", "礼盒", "家庭装", "进口", "新鲜",
         "特价", "组合", "大包装", "迷你", "多口味", "原味", "低脂"]


def synth_corpus(n, seed=0):
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for i in range(n):
        h = rng.integers(len(HEADS))
        m = rng.integers(len(MIDS))
        ntail = 1 + int(rng.integers(3))          # 3-5 tokens/title,
        toks = [HEADS[h], MIDS[m]] + list(         # ~mean 21 chars w/ spaces
            rng.choice(TAILS, ntail, replace=False))
        texts.append(" ".join(toks))
        labels.append(int(h * len(MIDS) + m) % 100)
    return texts, labels


def main(n=50_000, backend=None):
    if backend == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from multimodalsimilar_tpu.models.fasttext import (FastTextVocab,
                                                       train_supervised)
    platform = jax.devices()[0].platform
    texts, labels = synth_corpus(n)
    n_tokens = sum(len(t.split()) + 1 for t in texts)   # + EOS

    # vocab+hash build alone (host python, backend-independent)
    t0 = time.perf_counter()
    FastTextVocab.build(texts, bucket=2_000_000)
    t_vocab = time.perf_counter() - t0

    # bucket=2M: fastText's own default (the reference sets only
    # lr/dim/epoch/word_ngrams, fasttext_train.py:4-6)
    t0 = time.perf_counter()
    model = train_supervised(texts, labels, dim=100, lr=0.1, epochs=5,
                             word_ngrams=2, bucket=2_000_000)
    t_train = time.perf_counter() - t0
    n_test, prec, _ = model.test(texts[:5000], labels[:5000])

    # chain_steps sweep (round-5 VERDICT #5): K SGD steps per jitted
    # lax.scan program — on TPU the ~7 ms relay dispatch floor per
    # program dominated the ~5 ms on-chip step; this measures whether
    # chaining recovers it (CPU: expect ~no change, dispatch is cheap)
    chain_rows = []
    for K in (8, 32):
        t0 = time.perf_counter()
        m_k = train_supervised(texts, labels, dim=100, lr=0.1, epochs=5,
                               word_ngrams=2, bucket=2_000_000,
                               chain_steps=K)
        dt = time.perf_counter() - t0
        chain_rows.append({"chain_steps": K, "train_s": round(dt, 2),
                           "train_tokens_per_s":
                           round(5 * n_tokens / dt)})
        del m_k

    # serving: sentence vectors over the whole corpus (the daodian text
    # arm's nightly workload, daodian_infer.py:214)
    model.get_sentence_vector(texts[:1024])            # warm/compile
    t0 = time.perf_counter()
    vecs = model.get_sentence_vector(texts)
    t_vec = time.perf_counter() - t0
    assert vecs.shape == (n, 100)

    print(json.dumps({
        "backend": platform, "rows": n, "tokens": n_tokens,
        "vocab_build_s": round(t_vocab, 2),
        "train_s": round(t_train, 2),
        "train_rows_per_s": round(5 * n / t_train),     # 5 epochs
        "train_tokens_per_s": round(5 * n_tokens / t_train),
        "train_acc": round(prec, 4),
        "sentence_vec_rows_per_s": round(n / t_vec),
        "chain_sweep": chain_rows,
        "published_cxx_tokens_per_s_20threads": 1_700_000,
    }), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    n = next((int(a) for a in args if a.isdigit()), 50_000)
    backend = next((a for a in args if a in ("cpu", "tpu")), None)
    main(n, backend)
