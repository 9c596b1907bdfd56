"""Fit-loop overhead: Trainer.fit steady-state step time vs the raw step.

Round 3 replaced fit()'s per-step ``int(state.step)`` readback (a blocking
host<->device round-trip each iteration — ~50-60 ms through this relay)
with a host-mirrored counter plus a depth-1 lagged loss readback, so
dispatch pipelines while ticks stay bounded by real device progress
(trainer.py "depth-1 lagged sync"). PERF.md's train-step rows were measured
BEFORE that fix; this benchmark measures what the production loop costs
now, back-to-back against the bare jitted step in one session (the only
honest comparison on the drifting shared pool — PERF.md top note):

* raw:  trainer._train_step dispatched in a tight loop on ONE resident
        device batch, readback-bounded — pure step time, no input pipeline.
* fit:  the real Trainer.fit over a synthetic pre-tokenized source —
        prefetch thread, per-batch H2D transfer, lagged loss sync, timers,
        cadence checks. Timed at TWO lengths; the slope
        (t_long - t_short) / (steps_long - steps_short) cancels the fixed
        costs a single timed call would smear in (warm-start state copy,
        placement, first-batch sync).

The loop replaces the reference's hand-rolled epoch/step loops
(nlp_classifier_train.py:110-159), whose per-step `.item()` metric reads
impose exactly the sync this fix removed.

Run on the TPU (never alongside another TPU process):
    python benchmarks/fit_loop_overhead.py              # 128:128 (PERF row 1)
    python benchmarks/fit_loop_overhead.py 256:48       # bucketed best point
Prints one JSON line per point (not part of bench.py's contract).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_POINTS = ["128:128"]


class SyntheticTextSource:
    """Pre-tokenized batches with the real source API (datasets.py:176)."""

    def __init__(self, n_batches, batch_size, seq, vocab, num_labels,
                 distinct=8):
        self.n_batches = n_batches
        rng = np.random.default_rng(0)
        self.pool = [{
            "input_ids": rng.integers(
                0, vocab, (batch_size, seq)).astype(np.int32),
            "attention_mask": np.ones((batch_size, seq), np.int32),
            "token_type_ids": np.zeros((batch_size, seq), np.int32),
            "labels": rng.integers(
                0, num_labels, batch_size).astype(np.int32),
        } for _ in range(distinct)]

    def batches(self, batch_size, shuffle=True, seed=0, epoch=0,
                sampler=None, drop_remainder=True):
        for i in range(self.n_batches):
            yield self.pool[i % len(self.pool)]


def main(points, num_labels=10205, raw_iters=12, fit_short=30,
         fit_long=150):
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import create_mesh, shard_batch
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig

    mesh = create_mesh()
    cfg = BertConfig.roberta_wwm_ext()
    for point in points:
        B, S = (int(x) for x in point.split(":"))
        model = NlpTextClassifier(cfg, num_labels=num_labels)
        trainer = Trainer(
            text_arcface_task(model),
            dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2,
                             weight_decay=0.01),
            mesh,
            TrainerConfig(log_every=10**9, eval_every=10**9,
                          save_every=10**9))

        src = SyntheticTextSource(fit_long, B, S, cfg.vocab_size, num_labels)
        device_batch = shard_batch(mesh, src.pool[0])
        state = trainer.init_state_from_device_batch(device_batch)
        key = jax.random.key(0)

        # --- raw step: compile + warm, then a tight dispatch loop --------
        def timed_raw():
            nonlocal state
            t0 = time.perf_counter()
            m = None
            for _ in range(raw_iters):
                state, m = trainer._train_step(state, device_batch, key)
            np.asarray(m["loss"])
            return (time.perf_counter() - t0) / raw_iters * 1e3

        for _ in range(2):
            state, m = trainer._train_step(state, device_batch, key)
        np.asarray(m["loss"])
        raw_before_ms = timed_raw()

        # --- fit at two lengths; slope = steady-state step time ----------
        def timed_fit(n_steps):
            s = SyntheticTextSource(n_steps, B, S, cfg.vocab_size,
                                    num_labels)
            t0 = time.perf_counter()
            out = trainer.fit(s, num_epochs=1, batch_size=B, shuffle=False,
                              initial_state=state)
            np.asarray(out.step)            # honest barrier
            return time.perf_counter() - t0

        # Warmup fit FIRST: the first fit() call pays one-time compiles
        # (the warm-start state-copy program, placement, the final
        # out.step readback path). Without it those costs land entirely
        # in t_short and DEFLATE the slope — a first cut of this
        # benchmark measured fit 35% *faster* than the bare step that
        # way (85.5 vs 132.5 ms; loop-shape probes showed every
        # dispatch pattern really runs ~132 ms/step).
        timed_fit(fit_short)
        t_short = timed_fit(fit_short)
        t_long = timed_fit(fit_long)
        # raw again AFTER the fits: the pool drifts minute-to-minute
        # (CLAUDE.md), so a single before-only raw can make fit look
        # faster/slower than the step it wraps. Compare fit against the
        # bracketing raw closest in time (min = the window's best rate).
        raw_after_ms = timed_raw()
        raw_ms = min(raw_before_ms, raw_after_ms)
        fit_ms = (t_long - t_short) / (fit_long - fit_short) * 1e3
        print(json.dumps({
            "batch": B, "seq": S,
            "raw_step_ms": round(raw_ms, 1),
            "raw_before_ms": round(raw_before_ms, 1),
            "raw_after_ms": round(raw_after_ms, 1),
            "fit_step_ms": round(fit_ms, 1),
            "fit_overhead_pct": round(100 * (fit_ms / raw_ms - 1), 1),
            "fit_examples_per_sec": round(B / (fit_ms / 1e3), 1),
            "fit_s_short": round(t_short, 2),
            "fit_s_long": round(t_long, 2),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_POINTS)
