"""Sequence parallelism for the BERT tower (Megatron-SP style).

With ``--tensor_parallel`` alone, the per-layer LayerNorm / dropout /
residual-add work — and, more importantly, the RESIDUAL-STREAM activations
XLA saves for the backward pass — are replicated on every chip of the
``model`` axis: TP shards the matmul weights, but each boundary all-reduce
rematerializes the full [B, S, H] activation everywhere. Megatron-LM's
sequence parallelism (Korthikanti et al., 2022) shards exactly those
tensors along the sequence axis over the SAME model group, replacing each
boundary all-reduce with a reduce-scatter (into the sequence-sharded
region) and an all-gather (back into the next column-parallel matmul) —
identical communication volume, 1/N of the residual-stream activation
memory and of the LN/dropout flops per chip.

The reference has no counterpart (its only parallelism is single-process
``nn.DataParallel``, SURVEY.md §2.6); this is a TPU-native scaling lever
for its headline ``roberta-wwm-ext-large`` tower (readme.md:20).

TPU-native design: like ``parallel/tp.py``, NO hand-written collectives.
``BertConfig.sequence_parallel`` makes the model apply
``with_sharding_constraint(x, P(data, model, None))`` to the residual
stream at the Megatron boundary points (models/bert.py); GSPMD propagates
and picks the collective decomposition (on this XLA it favors
all-gather + all-to-all over literal reduce-scatter pairs — the measured
per-chip activation memory, not the op names, is the contract:
``benchmarks/multichip_projection.py --tensor_parallel --sequence_parallel``
and ``tests/test_sharding.py::test_sequence_parallel_*``).

The constraints are applied at TRACE time inside model code that has no
mesh argument, so the mesh is process-global state set by the Trainer
(``enable(mesh)``) before it builds its jitted programs — mirroring how
``jax.config`` options work. ``seq_shard`` is a no-op until then, so a
``sequence_parallel=True`` config can still trace mesh-less programs
(checkpoint restore templates, export paths) without error.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalsimilar_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_MESH: Optional[Mesh] = None


def enable(mesh: Mesh) -> None:
    """Point ``seq_shard`` at the training mesh. Idempotent; call before
    tracing any program whose model config has ``sequence_parallel=True``.
    Raises unless the mesh has a real model axis (a silent no-op flag
    would advertise memory savings it doesn't deliver)."""
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        raise ValueError(
            f"sequence_parallel needs a mesh model axis > 1, got "
            f"{dict(mesh.shape)} — pass --model_parallel N (with "
            f"--tensor_parallel) or drop --sequence_parallel")
    global _MESH
    _MESH = mesh


def disable() -> None:
    global _MESH
    _MESH = None


def seq_shard(x):
    """Constrain a [B, S, ...] activation to P(data, model, None...) —
    batch over the data axis (DP), sequence over the model axis (SP).
    No-op when ``enable`` hasn't run. XLA pads internally when S doesn't
    divide the axis (correctness never depends on divisibility)."""
    if _MESH is None:
        return x
    spec = P(DATA_AXIS, MODEL_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(_MESH, spec))
