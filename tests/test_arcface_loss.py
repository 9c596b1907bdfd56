"""Blockwise fused ArcFace+CE: exact value/grad parity with the naive path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalsimilar_tpu.ops.arcface import arcface_logits
from multimodalsimilar_tpu.ops.arcface_loss import arcface_ce_loss


def _naive_loss(x, w, label, m, s=64.0, easy_margin=False):
    logits = arcface_logits(x, w, label, m, s, easy_margin)
    return optax.softmax_cross_entropy_with_integer_labels(logits, label)


@pytest.fixture
def problem():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(24, 48)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(300, 48)).astype(np.float32) * 0.2)
    label = jnp.asarray(rng.integers(0, 300, size=(24,)).astype(np.int32))
    return x, w, label


@pytest.mark.parametrize("easy_margin", [False, True])
@pytest.mark.parametrize("tile_c", [64, 128, 512])
def test_loss_matches_naive(problem, tile_c, easy_margin):
    x, w, label = problem
    want = _naive_loss(x, w, label, 0.4, easy_margin=easy_margin)
    got = arcface_ce_loss(x, w, label, 0.4, 64.0, easy_margin, tile_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tile_c", [64, 512])
def test_grads_match_naive(problem, tile_c):
    x, w, label = problem

    def naive(x, w):
        return jnp.mean(_naive_loss(x, w, label, 0.37))

    def fused(x, w):
        return jnp.mean(arcface_ce_loss(x, w, label, 0.37, 64.0, False,
                                        tile_c))

    gx0, gw0 = jax.grad(naive, (0, 1))(x, w)
    gx1, gw1 = jax.grad(fused, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               rtol=1e-4, atol=1e-6)


def test_margin_grad_matches_naive(problem):
    """d loss / d m must be the true gradient (review finding: the custom
    VJP used to return a silent zero cotangent for the margin)."""
    x, w, label = problem

    def naive(m):
        return jnp.mean(_naive_loss(x, w, label, m))

    def fused(m):
        return jnp.mean(arcface_ce_loss(x, w, label, m, 64.0, False, 64))

    gm0 = jax.grad(naive)(jnp.asarray(0.37))
    gm1 = jax.grad(fused)(jnp.asarray(0.37))
    assert float(jnp.abs(gm0)) > 1e-3      # the margin genuinely matters
    np.testing.assert_allclose(float(gm1), float(gm0), rtol=1e-4)


def test_jit_and_dynamic_margin(problem):
    x, w, label = problem
    f = jax.jit(lambda m: jnp.mean(arcface_ce_loss(x, w, label, m)))
    a, b = float(f(0.2)), float(f(0.4))
    assert b > a  # larger margin -> larger loss on the target class
