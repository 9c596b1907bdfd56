"""Checkpointing via Orbax.

Replaces the reference's whole-module pickles (torch.save(model) every 1000
steps, nlp_classifier_train.py:158-159) and its single proper resume dict
(cv_classifier_train_daodian.py:299-306) with structured orbax checkpoints of
the full TrainState (params, batch_stats, opt_state, step, margin) — so every
job is resumable, and inference loads {params, batch_stats} without unpickling
arbitrary code.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        """``async_save=True`` moves the DISK WRITE off the training
        path: ``save()`` still blocks until the state is copied out of
        the device buffers (required — the train step donates them; orbax
        guarantees exactly this split for async checkpointing), then the
        serialization/write completes in the background. Call ``wait()``
        (the Trainer does, at end of fit and before any restore) to
        ensure the last save is durable."""
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self._last_saved = -1

    def wait(self):
        """Block until any in-flight async save is durable on disk."""
        self._mgr.wait_until_finished()

    def save(self, step: int, state: Any, force: bool = False):
        if step == self._last_saved and not force:
            return
        # force=True MUST rewrite even at the same step: the margin
        # curriculum mutates state AFTER the last periodic save of an epoch
        # (trainer.fit updates margin at epoch end, then force-saves), so
        # skipping the rewrite would resume with a stale margin — the exact
        # bug the forced end-of-run save was added to fix.
        # orbax refuses to save a step that already exists (its force= kwarg
        # only bypasses should_save_fn and still raises on collisions in
        # this version), so the forced end-of-run save must delete first.
        # This is the ONLY collision case left: fresh runs into a populated
        # directory fail fast at fit() start (Trainer raises unless
        # overwrite=True, which calls clear() once, explicitly) — save()
        # itself never infers destructive cleanup of another run's work.
        # serialize with any in-flight async save before touching steps
        self._mgr.wait_until_finished()
        if step in (self._mgr.all_steps() or []):
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self._mgr.wait_until_finished()
        self._last_saved = step

    def clear(self):
        """Delete every stored step — the explicit, opt-in path for
        re-using a populated directory (Trainer ``overwrite=True``)."""
        for s in list(self._mgr.all_steps() or []):
            self._mgr.delete(s)

    def restore(self, step: Optional[int] = None, template: Any = None):
        self._mgr.wait_until_finished()   # an in-flight async save first
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
