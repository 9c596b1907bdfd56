"""Model-axis (class-sharded ArcFace) correctness on the virtual mesh.

The widest reference head is 10205 classes (nlp_classifier_train_daodian_v2)
— at large class counts the [C, D] ArcFace weight and its [B, C] logits
shard over the `model` axis. These tests pin that the sharded program
computes the SAME loss and gradients as the replicated one (GSPMD inserts
the collectives; math must be invariant).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalsimilar_tpu.ops.arcface import arcface_logits
from multimodalsimilar_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, create_mesh)


def _problem():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
    label = rng.integers(0, 64, size=(16,)).astype(np.int32)
    return x, w, label


def _loss(x, w, label):
    logits = arcface_logits(x, w, label, m=0.4)
    return jnp.mean(jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
        logits, label[:, None], 1)[:, 0])


def test_class_sharded_loss_and_grads_match_replicated():
    mesh = create_mesh(data=4, model=2)
    x, w, label = _problem()

    grad_fn = jax.jit(jax.value_and_grad(_loss, argnums=(0, 1)))

    # replicated run
    loss_r, (gx_r, gw_r) = grad_fn(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(label))

    # sharded run: batch over data, classes over model
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(DATA_AXIS)))
    ws = jax.device_put(jnp.asarray(w),
                        NamedSharding(mesh, P(MODEL_AXIS, None)))
    ls = jax.device_put(jnp.asarray(label),
                        NamedSharding(mesh, P(DATA_AXIS)))
    loss_s, (gx_s, gw_s) = grad_fn(xs, ws, ls)

    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    # collective accumulation order differs from the single-program sum;
    # agreement is up to float32 reduction noise
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)
    # the weight gradient must come back sharded over classes (no silent
    # full replication of the big head)
    assert gw_s.sharding.is_equivalent_to(
        NamedSharding(mesh, P(MODEL_AXIS, None)), ndim=2)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip validation path runs end-to-end here too."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
