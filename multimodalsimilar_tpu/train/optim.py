"""Optimizers & LR schedules matching the reference training recipes.

* ``linear_schedule_with_warmup`` — HF ``get_scheduler("linear", ...)``
  semantics (nlp_classifier_train.py:91-97): linear ramp 0->lr over warmup
  steps, then linear decay to 0 at total steps. The reference passes
  fractional warmup (0.15/0.25 * total) — accepted here too.
* ``cosine_warm_restarts`` — torch CosineAnnealingWarmRestarts(T_0) semantics
  (cv_classifier_train_daodian.py:264-267), stepped per *epoch* in the
  reference; here per step with ``steps_per_epoch`` scaling.
* ``dual_group_adamw`` — the reference's two-optimizer trick (tower at 5e-5,
  ArcFace head at 1e-2 with warmup, nlp_classifier_train.py:89-97) as one
  ``optax.multi_transform`` over a params-path predicate.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

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


def dual_group_adamw(
    tower_schedule: optax.Schedule,
    head_schedule: optax.Schedule,
    is_head: Optional[Callable[[tuple], bool]] = None,
    weight_decay: float = 0.0,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with two LR groups split by parameter path.

    ``is_head(path_tuple)`` decides group membership; the default matches any
    path containing a module named 'head', 'lv1_head', 'lv2_head', 'tag_head'
    or 'classifier' — i.e. ArcFace / output heads.
    """
    if is_head is None:
        def is_head(path):
            names = {getattr(k, "key", str(k)) for k in path}
            return bool(names & {"head", "lv1_head", "lv2_head", "tag_head",
                                 "classifier"})

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "head" if is_head(path) else "tower", params)

    def adamw(sched):
        return optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)

    return optax.multi_transform(
        {"tower": adamw(tower_schedule), "head": adamw(head_schedule)},
        label_fn)
