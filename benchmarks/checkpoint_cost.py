"""Checkpoint save/restore cost (round-5 VERDICT #3).

The reference torch.saves every 1000 steps (nlp_classifier_train.py:158-159);
our Trainer orbax-saves the full TrainState (params + Adam moments +
batch_stats + step + margin). This measures what that costs at real state
sizes, and what --async_save buys:

* sync save wall time (the fit-loop stall without --async_save),
* async save: blocking portion (device->host copy — mandatory, the train
  step donates the buffers) vs background drain (serialization + disk),
* restore wall time (template path, the Trainer's resume),
* the fit-path stall measured ON the real donated-step loop: N train
  steps bare vs N steps with a save after each — the delta per save is
  the honest number (save() must also be SAFE between donated steps,
  which this exercises; a stale-buffer crash would fail loudly).

Run:  python benchmarks/checkpoint_cost.py [tiny|base|large] [async]
      (TPU: one process at a time; CPU smoke: JAX_PLATFORMS=cpu ... tiny)
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _trainer(preset):
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    cfgs = {"tiny": (BertConfig.tiny, 32, dict()),
            "base": (BertConfig.roberta_wwm_ext, 10205, dict()),
            "large": (BertConfig.roberta_wwm_ext_large, 10205,
                      dict(remat=True))}
    make, classes, kw = cfgs[preset]
    model = NlpTextClassifier(make(**kw), num_labels=classes)
    mesh = create_mesh()
    trainer = Trainer(
        text_arcface_task(model),
        dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2),
        mesh, TrainerConfig(log_every=10**9))
    return trainer, make(**kw), mesh, classes


def main(preset="base", measure_async=True, b=32, s=48, iters=4):
    import jax

    from multimodalsimilar_tpu.cli import _enable_compile_cache
    from multimodalsimilar_tpu.train.checkpoint import CheckpointManager
    _enable_compile_cache()   # the pack programs cache across processes
    try:
        from benchmarks.large_tower import _batch_for
    except ImportError:
        from large_tower import _batch_for

    trainer, cfg, mesh, classes = _trainer(preset)
    rng = np.random.default_rng(0)
    batch = _batch_for(mesh, cfg, b, s, rng)
    # _batch_for labels use the large-tower CLASSES constant; re-label
    # for the local head width
    batch = dict(batch, labels=jax.device_put(
        rng.integers(0, classes, b).astype(np.int32)))
    state = trainer.init_state_from_device_batch(batch)
    state_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(state))
    print(json.dumps({"preset": preset,
                      "state_gb": round(state_bytes / 2**30, 2)}),
          flush=True)

    work = tempfile.mkdtemp(prefix="ckpt_cost_")
    try:
        # -- sync save + restore ------------------------------------------
        mgr = CheckpointManager(os.path.join(work, "sync"))
        t0 = time.perf_counter()
        mgr.save(1, state)
        sync_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        restored = mgr.restore(template=state)
        restore_s = time.perf_counter() - t0
        del restored
        print(json.dumps({"sync_save_s": round(sync_s, 2),
                          "restore_s": round(restore_s, 2),
                          "write_mb_per_s":
                          round(state_bytes / 2**20 / sync_s, 1)}),
              flush=True)

        # -- async save: blocking portion vs background drain --------------
        if measure_async:
            amgr = CheckpointManager(os.path.join(work, "async"),
                                     async_save=True)
            t0 = time.perf_counter()
            amgr.save(1, state)
            block_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            amgr.wait()
            drain_s = time.perf_counter() - t0
            print(json.dumps({"async_block_s": round(block_s, 2),
                              "async_drain_s": round(drain_s, 2)}),
                  flush=True)

        # -- fit-path stall on the real donated-step loop ------------------
        key = jax.random.key(0)
        for _ in range(2):                       # compile + warm
            state, m = trainer._train_step(state, batch, key)
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = trainer._train_step(state, batch, key)
        np.asarray(m["loss"])
        bare_s = (time.perf_counter() - t0) / iters

        for mode, async_ in (("sync", False), ("async", True)):
            if async_ and not measure_async:
                continue
            d = os.path.join(work, f"loop_{mode}")
            lmgr = CheckpointManager(d, async_save=async_)
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = trainer._train_step(state, batch, key)
                lmgr.save(i + 10, state)         # save BETWEEN donated steps
            np.asarray(m["loss"])
            with_s = (time.perf_counter() - t0) / iters
            lmgr.wait()
            print(json.dumps({
                "mode": f"fit_stall_{mode}",
                "bare_step_ms": round(bare_s * 1e3, 1),
                "step_plus_save_ms": round(with_s * 1e3, 1),
                "stall_per_save_s": round(with_s - bare_s, 2),
                "pct_of_1000_steps":
                round(100 * (with_s - bare_s) / (1000 * bare_s), 2),
            }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    preset = next((a for a in args if a in ("tiny", "base", "large")),
                  "base")
    main(preset, measure_async=("noasync" not in args))
