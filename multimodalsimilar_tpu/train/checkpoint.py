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
import threading
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


def _pack_on_device(state):
    """ON-DEVICE snapshot: bitcast+concat the tree's jax.Array leaves
    into few large uint8 buffers (~256 MB chunks — extra device memory
    is bounded per chunk, total ≈ state size until fetched).

    Why packing at all (round 5, checkpoint_cost.py on the relay
    harness): orbax/tensorstore serializes DEVICE arrays chunk-wise — a
    1.23 GB roberta-base TrainState ran >11 min without completing —
    and plain per-leaf ``device_get`` pays a ~2 s transfer-setup
    round-trip per leaf (126 leaves ≈ 266 s despite ~34 MB/s bulk D2H).

    The packed buffers are INDEPENDENT device arrays: the train step's
    donation of the state leaves cannot touch them (the pack program
    consumes the leaves before any donated reuse in stream order), so
    the D2H fetch can run on a background thread while training
    continues — the caller blocks only for the pack dispatch.

    Returns ``(treedef, out_leaves, chunks)`` where ``chunks`` is a list
    of ``(members, dev_buf)`` and ``members`` is ``[(leaf_idx, shape,
    dtype, nbytes, size), ...]``; non-jax leaves pass through in
    ``out_leaves`` untouched."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(state)
    dev = [(i, x) for i, x in enumerate(leaves)
           if isinstance(x, jax.Array)]
    out = list(leaves)
    groups, group, size = [], [], 0
    for i, x in dev:
        if group and size + x.nbytes > _PACK_CHUNK_BYTES:
            groups.append(group)
            group, size = [], 0
        group.append((i, x))
        size += x.nbytes
    if group:
        groups.append(group)
    global _PACKER
    if _PACKER is None:
        _PACKER = jax.jit(_pack_chunk)   # trace cache shared across saves
    chunks = []
    for group in groups:
        buf = _PACKER([x for _, x in group])      # dispatch, no readback
        members = [(i, x.shape, x.dtype, x.nbytes, x.size)
                   for i, x in group]
        chunks.append((members, buf))
    return treedef, out, chunks


def _fetch_chunks(treedef, out, chunks):
    """Read the packed device buffers back (one bulk transfer each) and
    rebuild the host-numpy tree."""
    import numpy as np
    for members, buf in chunks:
        host = np.asarray(buf)                    # ONE transfer
        off = 0
        for i, shape, dtype, nbytes, size in members:
            out[i] = np.frombuffer(
                host, dtype=np.dtype(dtype), count=size,
                offset=off).reshape(shape).copy()
            off += nbytes
    import jax
    return jax.tree_util.tree_unflatten(treedef, out)


def _snapshot_to_host(state):
    """Synchronous bulk device->host snapshot (see _pack_on_device).
    Single-process only: multi-host sharded arrays are left to orbax's
    distributed path (a process can't fetch non-addressable shards)."""
    import jax
    if jax.process_count() > 1:
        return state
    return _fetch_chunks(*_pack_on_device(state))


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
        """``async_save=True`` moves BOTH the device->host fetch and the
        disk write off the training path: ``save()`` blocks only to
        dispatch the on-device pack (an on-device copy — the train
        step's donation of the state buffers cannot corrupt it, see
        _pack_on_device), then a background thread fetches the packed
        buffers and runs the orbax write. Device memory ≈ one extra
        state copy is held until the fetch completes. Call ``wait()``
        (the Trainer does, at end of fit and before any restore) to
        ensure the last save is durable; a failed background save
        re-raises there."""
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self._last_saved = -1
        self._inflight: Optional[threading.Thread] = None
        self._bg_error: Optional[BaseException] = None

    def wait(self):
        """Block until any in-flight async save is durable on disk.
        Re-raises an error from the background save, if any."""
        t, self._inflight = self._inflight, None
        if t is not None:
            t.join()
        self._mgr.wait_until_finished()
        err, self._bg_error = self._bg_error, None
        if err is not None:
            raise err

    def _do_save(self, step: int, host_state: Any):
        if step in (self._mgr.all_steps() or []):
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(host_state))
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
        self.wait()
        import jax
        if not self.async_save or jax.process_count() > 1:
            self._do_save(step, _snapshot_to_host(state))
            self._last_saved = step
            return
        packed = _pack_on_device(state)   # blocks only for dispatch

        def run():
            try:
                self._do_save(step, _fetch_chunks(*packed))
            except BaseException as e:   # surfaced on the next wait()
                self._bg_error = e

        t = threading.Thread(target=run, daemon=True,
                             name="ckpt-async-save")
        t.start()
        self._inflight = t
        self._last_saved = step

    def clear(self):
        """Delete every stored step — the explicit, opt-in path for
        re-using a populated directory (Trainer ``overwrite=True``)."""
        self.wait()
        for s in list(self._mgr.all_steps() or []):
            self._mgr.delete(s)

    def restore(self, step: Optional[int] = None, template: Any = None):
        self.wait()                       # an in-flight async save first
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(_host_template(template)))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
