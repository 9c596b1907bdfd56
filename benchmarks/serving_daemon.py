"""Online serving daemon throughput: micro-batching vs batch-1 dispatch.

PERF.md "Serving roofline decomposition" finding #3: a synchronous
single-program call through the relay pays a ~50-60 ms round-trip
(readback-bounded), which is the reference's per-row serving pattern
(nlp_infer.py:127-140). `cli serve`'s MicroBatcher coalesces concurrent
requests into one padded device call; this measures what that buys at the
service level (direct service.similar calls from worker threads — the
HTTP stack is excluded on purpose: this host's single slow CPU would
otherwise measure http.server, not the device path).

A/B at each concurrency level: max_batch=1 (every request its own
device call — the no-batching baseline) vs max_batch=64. Same corpus,
same tower (roberta-base seq 80), same engine; interleaved A/B rounds,
best-of, like bench.py.

Run on the TPU: python benchmarks/serving_daemon.py [corpus_rows]
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _build(corpus_rows, batch, seq, preset):
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # see CLAUDE.md
    import jax.numpy as jnp

    from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.pipelines.embedders import TextEmbedder
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    rng = np.random.default_rng(0)
    vocab = [chr(0x4E00 + i) for i in range(256)]
    texts = ["".join(rng.choice(vocab, size=rng.integers(6, 22)))
             for _ in range(corpus_rows)]
    tok = TextTokenizer.from_corpus(texts)

    cfg = getattr(BertConfig, preset)() if preset != "tiny" \
        else BertConfig.tiny()
    model = NlpTextClassifier(cfg, num_labels=3,
                              policy=DTypePolicy.inference())
    sample = jnp.asarray(tok(["x"], seq)["input_ids"])
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(sample)
    embedder = TextEmbedder(model, variables, tok, seq, batch)

    def embed_texts(batch_texts):
        return embedder(list(batch_texts))

    t0 = time.perf_counter()
    emb = embed_texts(texts)
    embed_s = time.perf_counter() - t0
    engine = SimilarityEngine(emb, [str(i) for i in range(corpus_rows)],
                              metric="ip")
    return embed_texts, engine, texts, embed_s


def _drive(service, texts, n_requests, concurrency):
    """n_requests service.similar calls from `concurrency` threads;
    returns (wall_s, p50_ms, p99_ms)."""
    lat = [None] * n_requests
    it = iter(range(n_requests))
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            t0 = time.perf_counter()
            service.similar(texts[i % len(texts)], k=13, score_th=None)
            lat[i] = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    ms = np.asarray(lat) * 1e3
    return wall, float(np.percentile(ms, 50)), float(np.percentile(ms, 99))


def main(corpus_rows=8192, batch=64, seq=80, preset="roberta_wwm_ext"):
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    from multimodalsimilar_tpu.pipelines.serving import SimilarityService
    _enable_compile_cache()
    import jax

    embed_texts, engine, texts, embed_s = _build(corpus_rows, batch, seq,
                                                 preset)
    res = {"corpus": corpus_rows, "batch": batch, "seq": seq,
           "preset": preset, "corpus_embed_s": round(embed_s, 1),
           "platform": jax.devices()[0].platform}

    services = {
        "batch1": SimilarityService(embed_texts, engine, k=13,
                                    max_batch=1, max_wait_ms=0.0),
        "micro": SimilarityService(embed_texts, engine, k=13,
                                   max_batch=64, max_wait_ms=5.0),
    }
    try:
        for svc in services.values():         # warm every program
            svc.similar(texts[0], k=13, score_th=None)

        for conc, n_req in ((1, 24), (8, 96), (32, 256)):
            for _ in range(2):                # interleaved rounds, best-of
                for name, svc in services.items():
                    wall, p50, p99 = _drive(svc, texts, n_req, conc)
                    key = f"c{conc}_{name}"
                    qps = n_req / wall
                    if res.get(f"{key}_qps", 0) < qps:
                        res[f"{key}_qps"] = round(qps, 1)
                        res[f"{key}_p50_ms"] = round(p50, 1)
                        res[f"{key}_p99_ms"] = round(p99, 1)
            b = res.get(f"c{conc}_batch1_qps", 0)
            m = res.get(f"c{conc}_micro_qps", 0)
            res[f"c{conc}_speedup"] = round(m / b, 2) if b else None
        res["micro_max_batch_seen"] = services["micro"].stats[
            "max_batch_seen"]
    finally:
        for svc in services.values():
            svc.close()
    print(json.dumps(res))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 8192,
         *(int(x) for x in a[1:3]),
         *( [a[3]] if len(a) > 3 else [] ))
