"""Tensor parallelism (Megatron-style) for the BERT text tower.

The reference's only parallelism is single-process ``nn.DataParallel``
(SURVEY.md §2.6 — nlp_classifier_train_daodian_v2_dist.py:82-86); it has no
tensor parallelism at all. This module is the TPU-native scaling lever the
reference's headline tower invites: ``roberta-wwm-ext-large`` (readme.md:20,
24 layers x 1024 hidden) replicated under pure DP costs every chip the full
f32 params + Adam moments AND one ~1.3 GB gradient all-reduce per step
(PERF.md "Projected multi-chip scaling"). Sharding the tower's wide matmuls
over the existing ``model`` mesh axis splits both N-ways.

Design — the scaling-book recipe, not hand-written collectives:

* per-weight ``PartitionSpec`` annotations over ``MODEL_AXIS``; GSPMD
  propagates them through the jitted train step and inserts the
  all-reduces where row-parallel contractions produce partial sums
  (2 per layer forward, 2 backward — pinned by
  ``tests/test_sharding.py::test_tensor_parallel_hlo_collectives``);
* column-parallel QKV (heads split: each shard computes a contiguous
  slice of attention heads end-to-end — softmax over [B, nh/N, S, S]
  stays local), row-parallel attention output projection;
* column-parallel MLP intermediate (+ its bias), row-parallel MLP output;
* vocab-sharded word-embedding table [V, H] (the gather becomes a masked
  local lookup + the same boundary all-reduce);
* LayerNorms, position/type embeddings, pooler, biases of row-parallel
  projections: replicated (Megatron's layout).

The rules are path-based over the param tree (they apply identically to
Adam moments, whose trees mirror the params), gated on a ``layer_<i>``
path component so nothing outside a transformer layer can match by name.
Composes with the class-sharded ArcFace heads
(``TrainerConfig.model_parallel_heads``) over the same ``model`` axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

from jax.sharding import PartitionSpec as P

from multimodalsimilar_tpu.parallel.mesh import MODEL_AXIS


def _path_names(path) -> list:
    return [str(getattr(k, "key", getattr(k, "name", k))) for k in path]


def tp_partition_spec(path, leaf) -> Optional[P]:
    """Megatron-style PartitionSpec for a BERT-tower leaf, else None.

    ``path`` is a jax tree path (DictKey/GetAttrKey sequence); ``leaf``
    only needs ``.ndim``. Returns the spec WITHOUT checking divisibility —
    the caller (Trainer._place_state) validates the sharded dim against
    the mesh and falls back to replication with a diagnostic.
    """
    names = _path_names(path)
    if len(names) < 2:
        return None
    leaf_name, parent = names[-1], names[-2]
    ndim = getattr(leaf, "ndim", 0)

    # vocab-sharded token embedding (outside layer_<i>)
    if parent == "word_embeddings" and leaf_name == "embedding" and ndim == 2:
        return P(MODEL_AXIS, None)

    if not any(n.startswith("layer_") for n in names):
        return None
    grand = names[-3] if len(names) >= 3 else ""

    if grand == "attention":
        if parent in ("query", "key", "value"):
            # DenseGeneral kernel [H, nh, hd] / bias [nh, hd]: split heads
            if leaf_name == "kernel" and ndim == 3:
                return P(None, MODEL_AXIS, None)
            if leaf_name == "bias" and ndim == 2:
                return P(MODEL_AXIS, None)
        elif parent == "qkv":
            # fused variant: kernel [H, 3, nh, hd] / bias [3, nh, hd]
            if leaf_name == "kernel" and ndim == 4:
                return P(None, None, MODEL_AXIS, None)
            if leaf_name == "bias" and ndim == 3:
                return P(None, MODEL_AXIS, None)
        elif parent == "out" and leaf_name == "kernel" and ndim == 3:
            # row-parallel output proj [nh, hd, H]; bias replicated
            return P(MODEL_AXIS, None, None)
        return None

    if parent == "intermediate":
        # column-parallel MLP in [H, I]; bias [I] sharded with it
        if leaf_name == "kernel" and ndim == 2:
            return P(None, MODEL_AXIS)
        if leaf_name == "bias" and ndim == 1:
            return P(MODEL_AXIS)
    elif parent == "output" and leaf_name == "kernel" and ndim == 2:
        # row-parallel MLP out [I, H]; bias replicated
        return P(MODEL_AXIS, None)
    return None


def sharded_dim(spec: P) -> int:
    """Index of the MODEL_AXIS-sharded dimension of a tp spec."""
    return next(i for i, a in enumerate(spec) if a == MODEL_AXIS)


def tp_shardable(path, leaf, model_n: int) -> Tuple[Optional[P], Optional[bool]]:
    """(spec, ok): ok=True shard, ok=False indivisible (replicate + diagnose),
    (None, None) = not a tensor-parallel leaf."""
    spec = tp_partition_spec(path, leaf)
    if spec is None:
        return None, None
    dim = sharded_dim(spec)
    return spec, leaf.shape[dim] % model_n == 0
