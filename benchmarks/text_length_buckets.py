"""Length-bucketed text serving benchmark on the REAL title distribution.

The reference's export job tokenizes every title with padding='max_length'
at 80 (goodssku_emb_bert_di.py:56), but its own checked-in sample data
(test.csv) has titles of mean 21 / p99 33 chars — most of every batch is
pad tokens. TextEmbedder(length_buckets=...) sorts rows by true token
length and runs each batch on the smallest bucket program that fits it
(output-identical, tests/test_pipelines.py).

This measures the unbucketed vs bucketed embed loop on titles sampled from
the reference's test.csv (the production length distribution), roberta-base
at seq 80 / batch 256 — the daily export config.

Run on the TPU:  python benchmarks/text_length_buckets.py [n_rows]
Prints its own JSON lines (not part of bench.py's one-line contract).
"""

import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=32768, max_length=80, batch=256, preset="base"):
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.pipelines.embedders import TextEmbedder
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    with open("/root/reference/test.csv", encoding="utf-8") as f:
        titles = [r["spuname"] for r in csv.DictReader(f)]
    rng = np.random.default_rng(0)
    texts = [titles[i] for i in rng.integers(0, len(titles), size=n)]

    tok = TextTokenizer.from_corpus(titles)
    make = {"base": BertConfig.roberta_wwm_ext,
            "large": BertConfig.roberta_wwm_ext_large}[preset]
    cfg = make()
    model = NlpTextClassifier(cfg, num_labels=10205,
                              policy=DTypePolicy.inference())
    sample = tok(["x"], max_length)
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(
            jnp.asarray(sample["input_ids"]))

    def run(tag, buckets):
        emb = TextEmbedder(model, variables, tok, max_length, batch,
                           length_buckets=buckets)
        # guaranteed per-bucket warmup: one full batch of synthetic texts
        # whose token length lands in each rung (sampling the real titles
        # may miss a rare bucket and push its compile into the timed loop)
        for rung in (emb.length_buckets or [max_length]):
            # batch+1 texts: __call__ only takes the bucketed path when
            # len(texts) > batch_size — a plain full batch warmed only the
            # unbucketed seq-80 program and pushed every bucket compile
            # into the timed region
            emb(["商" * max(rung - 2, 1)] * (batch + 1))
        t0 = time.perf_counter()
        out = emb(texts)
        dt = time.perf_counter() - t0
        rate = round(n / dt, 1)
        print(json.dumps({"path": tag, "wall_s": round(dt, 2),
                          "emb_per_s": rate}), flush=True)
        return rate, out

    # interleaved A/B: the shared chip pool drifts minute-to-minute, so a
    # single pair is not trustworthy — compare best-of-2 per path
    plain, want = run("pad-to-80", None)
    bucketed, got = run("buckets-24-32-48", (24, 32, 48))
    plain = max(plain, run("pad-to-80", None)[0])
    bucketed = max(bucketed, run("buckets-24-32-48", (24, 32, 48))[0])
    an = want / np.linalg.norm(want, axis=1, keepdims=True)
    bn = got / np.linalg.norm(got, axis=1, keepdims=True)
    cosd = float(1.0 - (an * bn).sum(1).min())
    print(json.dumps({"speedup_best_of_2": round(bucketed / plain, 2),
                      "max_cosine_distance": cosd}), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    preset = "large" if "large" in args else "base"
    nums = [int(a) for a in args if a.isdigit()]
    main(*nums, preset=preset)
