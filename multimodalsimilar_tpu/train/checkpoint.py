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


_PACK_CHUNK_BYTES = 256 * 2**20   # bounds the extra device memory
_PACKER = None


def _pack_chunk(leaves):
    """Jitted on demand: bitcast every leaf to a flat uint8 run and
    concatenate — ONE device buffer per chunk, fetched in ONE transfer."""
    import jax
    import jax.numpy as jnp

    def to_bytes(x):
        if x.dtype == jnp.uint8:
            return x.reshape(-1)
        if x.dtype == jnp.bool_:
            return x.astype(jnp.uint8).reshape(-1)
        return jax.lax.bitcast_convert_type(
            x.reshape(-1), jnp.uint8).reshape(-1)

    return jnp.concatenate([to_bytes(x) for x in leaves])


def _snapshot_to_host(state):
    """Bulk device->host snapshot before handing orbax the tree.

    Two relay pathologies measured (round 5, checkpoint_cost.py):
    orbax/tensorstore serializes DEVICE arrays chunk-wise — a 1.23 GB
    roberta-base TrainState ran >11 min without completing — and plain
    per-leaf ``device_get`` pays a ~2 s transfer-setup round-trip per
    leaf (126 leaves ≈ 266 s despite ~34 MB/s bulk D2H). So the
    snapshot PACKS leaves on device into few large uint8 buffers
    (bitcast + concat, jitted; chunked at ~256 MB to bound the extra
    device memory) and fetches each in one bulk transfer, then splits
    back into numpy on host. This also IS the async contract's
    mandatory copy-out (the train step donates the device buffers).
    Single-process only: multi-host sharded arrays are left to orbax's
    distributed path (a process can't fetch non-addressable shards)."""
    import jax
    import numpy as np
    if jax.process_count() > 1:
        return state
    leaves, treedef = jax.tree_util.tree_flatten(state)
    dev = [(i, x) for i, x in enumerate(leaves)
           if isinstance(x, jax.Array)]
    out = list(leaves)
    # greedy chunks by byte budget (an oversized leaf goes alone)
    chunk, size = [], 0
    chunks = []
    for i, x in dev:
        if chunk and size + x.nbytes > _PACK_CHUNK_BYTES:
            chunks.append(chunk)
            chunk, size = [], 0
        chunk.append((i, x))
        size += x.nbytes
    if chunk:
        chunks.append(chunk)
    global _PACKER
    if _PACKER is None:
        _PACKER = jax.jit(_pack_chunk)   # trace cache shared across saves
    packer = _PACKER
    for chunk in chunks:
        buf = np.asarray(packer([x for _, x in chunk]))   # ONE transfer
        off = 0
        for i, x in chunk:
            n = x.nbytes
            out[i] = np.frombuffer(
                buf, dtype=np.dtype(x.dtype), count=x.size,
                offset=off).reshape(x.shape).copy()
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _host_template(template):
    """Mirror a restore template onto host numpy so orbax materializes
    numpy (tensorstore->host) instead of chunk-streaming H2D through the
    relay; callers re-place on device in one transfer (the Trainer's
    ``_place_state`` already does)."""
    import jax
    import numpy as np
    if template is None or jax.process_count() > 1:
        return template
    return jax.tree_util.tree_map(
        lambda x: np.empty(x.shape, x.dtype)
        if isinstance(x, jax.Array) else x, template)


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
        state = _snapshot_to_host(state)
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
                step, args=ocp.args.StandardRestore(_host_template(template)))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
