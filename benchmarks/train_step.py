"""Train-step microbench: batch x seq x remat sweep on the real Trainer step.

Reproduces the PERF.md training sweeps (round 2) as reusable tooling:
jits Trainer._train_step for the text ArcFace recipe at reference scale
(roberta-base, 10205 classes — nlp_classifier_train_daodian_v2.py:80) and
times each configuration with a forced readback, back-to-back in one
session (the only honest comparison on the shared chip pool — PERF.md top
note).

Run on the TPU:
    python benchmarks/train_step.py                  # default sweep
    python benchmarks/train_step.py 256:48 256:128   # batch:seq points
Add 'remat' as an argument to also measure the rematerialized variant.
Prints one JSON line per configuration (not part of bench.py's contract).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_SWEEP = ["128:128", "256:128", "256:48", "512:128"]


def main(points, with_remat=False, num_labels=10205, iters=8):
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import create_mesh, shard_batch
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    mesh = create_mesh()
    variants = [False, True] if with_remat else [False]
    for remat in variants:
        cfg = BertConfig.roberta_wwm_ext(remat=remat)
        model = NlpTextClassifier(cfg, num_labels=num_labels)
        trainer = Trainer(
            text_arcface_task(model),
            dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2,
                             weight_decay=0.01),
            mesh, TrainerConfig(log_every=10**9))
        state = None
        for point in points:
            B, S = (int(x) for x in point.split(":"))
            batch = shard_batch(mesh, {
                "input_ids": rng.integers(0, cfg.vocab_size,
                                          (B, S)).astype(np.int32),
                "attention_mask": np.ones((B, S), np.int32),
                "token_type_ids": np.zeros((B, S), np.int32),
                "labels": rng.integers(0, num_labels, B).astype(np.int32)})
            if state is None:
                state = trainer.init_state_from_device_batch(batch)
            key = jax.random.key(0)
            for _ in range(2):                         # compile + warm
                state, m = trainer._train_step(state, batch, key)
            np.asarray(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = trainer._train_step(state, batch, key)
            np.asarray(m["loss"])                      # honest barrier
            dt = (time.perf_counter() - t0) / iters
            tokens = B * S
            # 6*N*tokens fwd+bwd approx + head matmuls, vs 197 TFLOP/s bf16
            flops = 6 * 85e6 * tokens + 6 * B * 768 * num_labels
            print(json.dumps({
                "batch": B, "seq": S, "remat": remat,
                "step_ms": round(dt * 1e3, 1),
                "examples_per_sec": round(B / dt, 1),
                "mfu_pct": round(100 * flops / dt / 197e12, 1),
            }), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    with_remat = "remat" in args
    pts = [a for a in args if a != "remat"] or DEFAULT_SWEEP
    main(pts, with_remat)
