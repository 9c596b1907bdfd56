"""ArcFace head as a Flax module (parameter owner over ops.arcface).

Mirrors ``ArcMarginProduct`` (/root/reference/arcface.py:17-67): a single
[num_classes, dim] weight with xavier-uniform init, margin logits in training,
plain cosine logits in eval, and a dynamic margin for the per-epoch curriculum
(``update_m``, arcface.py:35-42) — here the margin is simply an argument, so
the curriculum never triggers a recompile.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from multimodalsimilar_tpu.ops.arcface import (
    ArcFaceParams, arcface_logits, arcface_logits_fused, cosine_logits)


class ArcFaceHead(nn.Module):
    num_classes: int
    params_af: ArcFaceParams = ArcFaceParams()
    use_fused: bool = False  # Pallas kernel (TPU); pure-JAX otherwise

    @nn.compact
    def __call__(self, x: jnp.ndarray, label: Optional[jnp.ndarray] = None,
                 m=None, is_test: bool = False) -> jnp.ndarray:
        weight = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_classes, x.shape[-1]), jnp.float32)
        if is_test or label is None:
            return cosine_logits(x, weight)
        m = self.params_af.m if m is None else m
        if self.use_fused:
            return arcface_logits_fused(x, weight, label, m,
                                        self.params_af.s,
                                        self.params_af.easy_margin)
        return arcface_logits(x, weight, label, m, self.params_af.s,
                              self.params_af.easy_margin)
