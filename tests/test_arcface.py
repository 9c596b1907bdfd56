"""ArcFace parity vs the reference ArcMarginProduct semantics (arcface.py).

The torch module is re-stated here *in torch* (not imported from the
reference) so the test asserts mathematical parity with the published ArcFace
formulation, including the reference's easy_margin / th / mm branches.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodalsimilar_tpu.ops.arcface import (
    ArcFaceParams,
    arcface_logits,
    arcface_logits_fused,
    cosine_logits,
)


def torch_arcface(x, weight, label, s=64.0, m=0.40, easy_margin=False):
    """Reference semantics, arcface.py:45-63 (sine clamped for stability)."""
    cos_m, sin_m = math.cos(m), math.sin(m)
    th = math.cos(math.pi - m)
    mm = math.sin(math.pi - m) * m
    cosine = F.linear(F.normalize(x), F.normalize(weight))
    sine = torch.sqrt(torch.clamp(1.0 - torch.pow(cosine, 2), 0.0, 1.0))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = torch.where(cosine > 0, phi, cosine)
    else:
        phi = torch.where((cosine - th) > 0, phi, cosine - mm)
    one_hot = torch.zeros_like(cosine)
    one_hot.scatter_(1, label.view(-1, 1), 1)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * s


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    n_cls = 200
    x = rng.normal(size=(32, 96)).astype(np.float32)
    w = rng.normal(size=(n_cls, 96)).astype(np.float32) * 0.1
    label = rng.integers(0, n_cls, size=(32,)).astype(np.int32)
    return x, w, label


@pytest.mark.parametrize("easy_margin", [False, True])
@pytest.mark.parametrize("m", [0.4, 0.1, 0.99])
def test_matches_torch(problem, m, easy_margin):
    x, w, label = problem
    want = torch_arcface(torch.from_numpy(x), torch.from_numpy(w),
                         torch.from_numpy(label).long(), m=m,
                         easy_margin=easy_margin).numpy()
    got = arcface_logits(jnp.asarray(x), jnp.asarray(w), jnp.asarray(label),
                         m=m, easy_margin=easy_margin)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_test_is_plain_cosine(problem):
    x, w, _ = problem
    got = cosine_logits(jnp.asarray(x), jnp.asarray(w))
    want = F.linear(F.normalize(torch.from_numpy(x)),
                    F.normalize(torch.from_numpy(w))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert float(jnp.max(jnp.abs(got))) <= 1.0 + 1e-5


def test_margin_increases_target_difficulty(problem):
    """Property: margin only lowers the target-class logit, never others."""
    x, w, label = problem
    x_j, w_j, l_j = jnp.asarray(x), jnp.asarray(w), jnp.asarray(label)
    plain = 64.0 * cosine_logits(x_j, w_j)
    margined = arcface_logits(x_j, w_j, l_j, m=0.4)
    one_hot = jax.nn.one_hot(l_j, w.shape[0], dtype=bool)
    assert bool(jnp.all(margined[one_hot] <= plain[one_hot] + 1e-5))
    np.testing.assert_allclose(margined[~one_hot], plain[~one_hot],
                               rtol=1e-5, atol=1e-5)


def test_update_m_curriculum():
    p = ArcFaceParams(m=0.2)
    p = p.update_m(0.04)
    assert p.m == pytest.approx(0.24)
    # clamp: refuse to leave [1e-6, 1.0] — arcface.py:37
    assert p.update_m(1.0).m == pytest.approx(0.24)    # 1.24 > 1.0: rejected
    assert p.update_m(-0.5).m == pytest.approx(0.24)   # -0.26 < 0: rejected
    assert p.update_m(-0.1).m == pytest.approx(0.14)   # valid step down


def test_traced_margin_no_recompile(problem):
    """m is a dynamic scalar: one jit trace serves the whole curriculum."""
    x, w, label = problem
    traces = []

    @jax.jit
    def f(x, w, label, m):
        traces.append(1)
        return arcface_logits(x, w, label, m)

    for m in (0.1, 0.14, 0.18):
        f(jnp.asarray(x), jnp.asarray(w), jnp.asarray(label), m)
    assert len(traces) == 1


def test_fused_kernel_matches_pure(problem):
    x, w, label = problem
    want = arcface_logits(jnp.asarray(x), jnp.asarray(w), jnp.asarray(label),
                          m=0.4)
    got = arcface_logits_fused(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(label), 0.4,
                               tile_b=16, tile_c=128, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_kernel_gradients(problem):
    x, w, label = problem
    x_j, w_j, l_j = jnp.asarray(x), jnp.asarray(w), jnp.asarray(label)

    def loss_pure(x, w):
        logits = arcface_logits(x, w, l_j, m=0.4)
        return jnp.mean(jax.nn.logsumexp(logits, -1) -
                        jnp.take_along_axis(logits, l_j[:, None], 1)[:, 0])

    def loss_fused(x, w):
        logits = arcface_logits_fused(x, w, l_j, 0.4, 64.0, False,
                                      16, 128, True)
        return jnp.mean(jax.nn.logsumexp(logits, -1) -
                        jnp.take_along_axis(logits, l_j[:, None], 1)[:, 0])

    gx0, gw0 = jax.grad(loss_pure, (0, 1))(x_j, w_j)
    gx1, gw1 = jax.grad(loss_fused, (0, 1))(x_j, w_j)
    np.testing.assert_allclose(gx1, gx0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gw1, gw0, rtol=1e-4, atol=1e-5)
