"""On-chip A/B of the CV serving request: fused one-program vs the
device chain vs host round-trips.

The daodian image side serves 512-d CvClassifier embeddings with k=26
(daodian_infer.py:79-82,294-302); `serve --tower cv` answers the same
query online. This measures what the fused path (tower + on-chip
normalize + exact k-NN as ONE jitted program — ImageEmbedder
.fused_similar_fn) buys over (a) the two-program device chain
(embed_device -> engine.search_device) and (b) the host path
(embed_batch readback -> engine.search), at c=1 — the per-request
latency floor. Interleaved rounds, best-of, like serving_load's
three-arm A/B (pool drift swamps single pairs).

Run on the TPU (single chip, nothing else on it):
    python benchmarks/serving_cv_ab.py [corpus_rows] [rounds]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K = 26                 # daodian_infer.py:79 ann_cnt_cv
DIM = 512              # fc_dim neck (daodian_infer.py:297)
IMG = 380              # B4 recommended serving resolution (PERF.md)
REQUESTS = 12          # per arm per round


def _build(corpus_rows):
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.vision import (CvImageClassifier,
                                                     backbone_config)
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    model = CvImageClassifier(backbone_config("efficientnet_b4"),
                              num_labels=4181, fc_dim=DIM)
    rng = np.random.default_rng(0)
    warm = jnp.asarray(rng.integers(0, 255, size=(1, IMG, IMG, 3)
                                    ).astype(np.uint8))
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x.astype(jnp.float32),
        label=jnp.zeros(x.shape[0], jnp.int32)))(warm)
    embedder = ImageEmbedder(model, variables, image_size=IMG,
                             batch_size=8)
    corpus = rng.normal(size=(corpus_rows, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    engine = SimilarityEngine(corpus, list(range(corpus_rows)),
                              metric="ip", normalize=True)
    return embedder, engine


def main(corpus_rows=10000, rounds=4):
    embedder, engine = _build(corpus_rows)
    rng = np.random.default_rng(1)
    queries = [rng.integers(0, 255, size=(IMG, IMG, 3)).astype(np.uint8)
               for _ in range(REQUESTS)]
    fused = embedder.fused_similar_fn(engine, K)
    assert fused is not None

    def arm_fused(q):
        v, i = fused([q], 1)
        return np.asarray(v)       # honest barrier: device->host readback

    def arm_chain(q):
        emb = embedder.embed_device([q], pad_to=1)
        v, i = engine.search_device(K, emb)
        return np.asarray(v)

    def arm_host(q):
        emb = embedder.embed_batch(np.stack([q]))
        v, i = engine.search(K, queries=emb)
        return v

    arms = {"fused": arm_fused, "chain": arm_chain, "host": arm_host}
    for fn in arms.values():       # compile + first-touch outside timing
        fn(queries[0])

    best = {name: float("inf") for name in arms}
    per_round = {name: [] for name in arms}
    for _ in range(rounds):
        for name, fn in arms.items():   # interleaved: drift hits all arms
            times = []
            for q in queries:
                t0 = time.perf_counter()
                fn(q)
                times.append(time.perf_counter() - t0)
            p50 = float(np.median(times) * 1e3)
            per_round[name].append(round(p50, 1))
            best[name] = min(best[name], p50)
    print(json.dumps({
        "mode": "cv_serving_c1_p50_ms", "corpus": corpus_rows,
        "k": K, "dim": DIM, "image": IMG,
        **{name: round(v, 1) for name, v in best.items()},
        **{f"rounds_{name}": r for name, r in per_round.items()},
    }), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
