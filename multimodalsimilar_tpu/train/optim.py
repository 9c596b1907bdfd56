"""Optimizers & LR schedules matching the reference training recipes.

* ``linear_schedule_with_warmup`` — HF ``get_scheduler("linear", ...)``
  semantics (nlp_classifier_train.py:91-97): linear ramp 0->lr over warmup
  steps, then linear decay to 0 at total steps. The reference passes
  fractional warmup (0.15/0.25 * total) — accepted here too.
* ``cosine_warm_restarts`` — torch CosineAnnealingWarmRestarts(T_0) semantics
  (cv_classifier_train_daodian.py:264-267), stepped per *epoch* in the
  reference; here per step with ``steps_per_epoch`` scaling.
* ``timm_cosine_schedule`` — timm ``CosineLRScheduler(t_initial, warmup_t,
  warmup_lr_init)`` semantics as used by cv_classifier_train.py:68-72:
  ``t_in_epochs=True`` (per-epoch LR; the reference's per-step
  ``step_update`` calls are no-ops in that mode), ``warmup_prefix=False``
  (the cosine phase is NOT shifted by the warmup), single cycle, lr_min
  after ``t_initial`` epochs (the reference's 10 "cooldown" epochs).
* ``adamp`` — timm ``AdamP`` (Heo et al., "Slowing Down the Slowdown"):
  Adam moments plus a projection that removes the radial component of the
  update on scale-invariant weights (detected by |cos(w, g)| < delta/sqrt(k)
  on channel/layer views) and shrinks their effective weight decay by
  ``wd_ratio``. Channel rows here are the LAST axis (Flax puts output
  features last; torch puts them first) so the semantics match timm's on
  the transposed layout.
* ``dual_group`` / ``dual_group_adamw`` — the reference's two-optimizer
  trick (tower at 5e-5, ArcFace head at 1e-2 with warmup,
  nlp_classifier_train.py:89-97; dual AdamP, cv_classifier_train.py:68-72)
  as one ``optax.multi_transform`` over a params-path predicate.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def linear_schedule_with_warmup(lr: float, warmup_steps: float,
                                total_steps: int) -> optax.Schedule:
    warmup = int(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(warmup > 0, step / max(warmup, 1), 1.0)
        decay_span = max(total_steps - warmup, 1)
        decay = jnp.maximum(0.0, (total_steps - step) / decay_span)
        return lr * jnp.where(step < warmup, warm, decay)

    return schedule


def cosine_warm_restarts(lr: float, t0_epochs: int, steps_per_epoch: int,
                         t_mult: int = 1, eta_min: float = 0.0
                         ) -> optax.Schedule:
    """eta_min + (lr-eta_min) * (1+cos(pi * t_cur/T_i)) / 2, restarting every
    T_i epochs, T_{i+1} = T_i * t_mult."""
    t0 = t0_epochs * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t0)
            t_i = float(t0)
        else:
            # closed form for geometric restarts
            n = jnp.floor(jnp.log1p((t_mult - 1) * step / t0)
                          / math.log(t_mult))
            start = t0 * (t_mult ** n - 1) / (t_mult - 1)
            t_cur = step - start
            t_i = t0 * t_mult ** n
        return eta_min + (lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t_cur / t_i))

    return schedule


def timm_cosine_schedule(lr: float, t_initial: int, steps_per_epoch: int,
                         warmup_t: int = 5, warmup_lr_init: float = 1e-3,
                         lr_min: float = 0.0) -> optax.Schedule:
    """timm CosineLRScheduler with t_in_epochs=True / warmup_prefix=False /
    cycle_limit=1 — the exact configuration of cv_classifier_train.py:68-72.

    The LR is a function of the epoch index (constant within an epoch):
      t < warmup_t:   warmup_lr_init + t * (lr - warmup_lr_init) / warmup_t
      t < t_initial:  lr_min + (lr - lr_min)/2 * (1 + cos(pi * t/t_initial))
                      (t NOT shifted by warmup_t: warmup_prefix=False)
      t >= t_initial: lr_min  (cooldown epochs, cv_classifier_train.py:60-62)
    """

    def schedule(step):
        t = jnp.asarray(step, jnp.float32) // steps_per_epoch
        warm = warmup_lr_init + t * (lr - warmup_lr_init) / max(warmup_t, 1)
        cos = lr_min + (lr - lr_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t / t_initial))
        out = jnp.where(t < warmup_t, warm, cos)
        return jnp.where(t >= t_initial, lr_min, out)

    return schedule


class AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def _adamp_project(p, g, perturb, delta, wd_ratio, eps):
    """AdamP's tangent-space projection for scale-invariant weights.

    timm views a weight as [rows, k] per channel (dim 0) then per layer
    (one row); Flax layouts put output features LAST, so the channel view
    here is [features, k] via moveaxis(-1, 0) — same semantics, transposed
    storage. Both candidate projections are computed and selected with
    ``where`` (data-dependent branches don't exist under jit).
    """
    if p.ndim <= 1:
        return perturb, jnp.float32(1.0)

    def candidate(rows_of):
        pv = rows_of(p)
        gv = rows_of(g)
        nv = rows_of(perturb)
        dot = jnp.sum(pv * gv, axis=1)
        np_ = jnp.linalg.norm(pv, axis=1)
        ng = jnp.linalg.norm(gv, axis=1)
        cos = jnp.abs(dot / (jnp.maximum(np_, eps) * jnp.maximum(ng, eps)))
        cond = jnp.max(cos) < delta / math.sqrt(pv.shape[1])
        pn = pv / (np_[:, None] + eps)
        proj = nv - pn * jnp.sum(pn * nv, axis=1, keepdims=True)
        return cond, proj

    def channel(x):
        return jnp.moveaxis(x, -1, 0).reshape(x.shape[-1], -1)

    def unchannel(rows):
        moved = rows.reshape((p.shape[-1],) + p.shape[:-1])
        return jnp.moveaxis(moved, 0, -1)

    c1, proj1 = candidate(channel)
    c2, proj2 = candidate(lambda x: x.reshape(1, -1))
    out = jnp.where(c1, unchannel(proj1),
                    jnp.where(c2, proj2.reshape(p.shape), perturb))
    wd = jnp.where(c1 | c2, jnp.float32(wd_ratio), jnp.float32(1.0))
    return out, wd


def adamp(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, nesterov: bool = False
          ) -> optax.GradientTransformation:
    """AdamP (timm.optim.AdamP semantics, used at cv_classifier_train.py:68).

    Per step (1-based ``t`` for bias correction, schedules indexed 0-based):
      m, v      Adam moments of g
      perturb   m̂/(sqrt(v̂)+eps)   (nesterov: (b1*m + (1-b1)*g) instead of m)
      if ndim>1 and the weight looks scale-invariant (|cos(w,g)| small on a
      channel or layer view): remove perturb's radial component and scale
      weight decay by wd_ratio.
      p <- p*(1 - lr*weight_decay*wd) - (lr/bc1)*perturb
    """
    sched = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))

    def init(params):
        zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)  # noqa
        return AdamPState(jnp.zeros([], jnp.int32), zeros(params),
                          zeros(params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        lr = sched(state.count)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        def leaf(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            perturb = ((b1 * m + (1 - b1) * g) if nesterov else m) / denom
            perturb, wd = _adamp_project(p, g, perturb, delta, wd_ratio, eps)
            upd = -(lr / bc1) * perturb
            if weight_decay > 0:
                upd = upd - lr * weight_decay * wd * p
            return upd

        updates = jax.tree_util.tree_map(leaf, params, grads, mu, nu)
        return updates, AdamPState(count, mu, nu)

    return optax.GradientTransformation(init, update)


# THE set of head-module names — shared by dual_group's LR split and the
# Trainer's model-parallel head sharding (Trainer._HEAD_NAMES aliases it).
# Two hand-kept copies once risked a new head name getting the tower LR or
# skipping its sharding silently.
HEAD_NAMES = frozenset({"head", "lv1_head", "lv2_head", "tag_head",
                        "classifier"})


def dual_group(
    tower_tx: optax.GradientTransformation,
    head_tx: optax.GradientTransformation,
    is_head: Optional[Callable[[tuple], bool]] = None,
) -> optax.GradientTransformation:
    """Two optimizers split by parameter path — the reference's dual-
    optimizer pattern (nlp_classifier_train.py:89-97,
    cv_classifier_train.py:68-72) as one transformation.

    ``is_head(path_tuple)`` decides group membership; the default matches
    any path containing a module named in ``HEAD_NAMES`` — i.e. ArcFace /
    output heads.
    """
    if is_head is None:
        def is_head(path):
            names = {getattr(k, "key", str(k)) for k in path}
            return bool(names & HEAD_NAMES)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "head" if is_head(path) else "tower", params)

    return optax.multi_transform({"tower": tower_tx, "head": head_tx},
                                 label_fn)


def dual_group_adamw(
    tower_schedule: optax.Schedule,
    head_schedule: optax.Schedule,
    is_head: Optional[Callable[[tuple], bool]] = None,
    weight_decay: float = 0.0,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with two LR groups split by parameter path (see dual_group)."""

    def adamw(sched):
        return optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)

    return dual_group(adamw(tower_schedule), adamw(head_schedule), is_head)
