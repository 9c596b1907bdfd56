"""EfficientNet (B0-B7) in Flax — the image tower backbone.

The reference's image tower is timm's ``efficientnet_b4`` with the classifier
stripped (cv_classifier.py:23-27, image_emb.py:20). This is a ground-up NHWC
implementation shaped for TPU:

* NHWC layout (XLA's native conv layout on TPU; no transposes in the graph),
* bf16 compute / f32 BatchNorm statistics,
* torch-style *symmetric* conv padding (k//2) so embeddings are bit-compatible
  with timm's native (non-``tf_``) EfficientNet weights — TF/XLA 'SAME' pads
  asymmetrically at stride 2 and would break parity,
* stochastic depth per block (linearly scaled to ``drop_path_rate``).

Weights import from a timm state_dict via
``multimodalsimilar_tpu.models.hf_import.efficientnet_params_from_timm``
(timm names: conv_stem/bn1, blocks.S.I.{conv_pw,conv_dw,se.*,conv_pwl,...},
conv_head/bn2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

# (expand_ratio, channels, repeats, stride, kernel) — the EfficientNet-B0
# stage table; width/depth multipliers scale it to B1..B7.
_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

_VARIANTS = {
    # name: (width_mult, depth_mult, train_resolution, dropout)
    "efficientnet_b0": (1.0, 1.0, 224, 0.2),
    "efficientnet_b1": (1.0, 1.1, 240, 0.2),
    "efficientnet_b2": (1.1, 1.2, 260, 0.3),
    "efficientnet_b3": (1.2, 1.4, 300, 0.3),
    "efficientnet_b4": (1.4, 1.8, 380, 0.4),
    "efficientnet_b5": (1.6, 2.2, 456, 0.4),
    "efficientnet_b6": (1.8, 2.6, 528, 0.5),
    "efficientnet_b7": (2.0, 3.1, 600, 0.5),
}


def round_channels(channels: float, divisor: int = 8) -> int:
    """timm's make_divisible: round to nearest multiple, never below 90%."""
    new = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new < 0.9 * channels:
        new += divisor
    return new


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    width_mult: float = 1.0
    depth_mult: float = 1.0
    resolution: int = 224
    dropout: float = 0.2
    drop_path_rate: float = 0.2
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9          # flax EMA decay == 1 - torch momentum
    # Inference-only: BN pre-folded into conv weights/biases
    # (models.fold_bn.fold_efficientnet_bn); all BN ops vanish.
    folded: bool = False
    se_ratio: float = 0.25
    stem_channels: int = 32
    head_channels: int = 1280
    stages: Tuple[Tuple[int, int, int, int, int], ...] = _STAGES

    @classmethod
    def variant(cls, name: str, **kw) -> "EfficientNetConfig":
        if name == "tiny":  # 3-block test/smoke backbone, not a real B-variant
            # kw overrides still apply ('tiny' used to drop them silently)
            return dataclasses.replace(cls.tiny(), **kw)
        w, d, res, drop = _VARIANTS[name]
        base = dict(width_mult=w, depth_mult=d, resolution=res,
                    dropout=drop)
        base.update(kw)            # kw overrides the preset
        return cls(**base)

    @classmethod
    def b4(cls, **kw) -> "EfficientNetConfig":
        return cls.variant("efficientnet_b4", **kw)

    @classmethod
    def tiny(cls) -> "EfficientNetConfig":
        """Two trimmed stages for tests."""
        return cls(stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
                   stem_channels=8, head_channels=32, drop_path_rate=0.1)

    @property
    def num_features(self) -> int:
        """Feature dim after conv_head (1792 for B4 — daodian_infer.py:297
        uses the 512-d neck; the raw B4 feature is 1792)."""
        return round_channels(self.head_channels * self.width_mult)

    def block_plan(self):
        """Expanded per-block plan: list of (expand, in_c, out_c, stride, k,
        drop_path) honoring width/depth multipliers."""
        plan = []
        in_c = round_channels(self.stem_channels * self.width_mult)
        total = sum(round_repeats(r, self.depth_mult)
                    for (_, _, r, _, _) in self.stages)
        idx = 0
        for (exp, c, r, s, k) in self.stages:
            out_c = round_channels(c * self.width_mult)
            for i in range(round_repeats(r, self.depth_mult)):
                dp = self.drop_path_rate * idx / max(total, 1)
                plan.append((exp, in_c, out_c, s if i == 0 else 1, k, dp))
                in_c = out_c
                idx += 1
        return plan


def _conv(features: int, kernel: int, stride: int = 1, groups: int = 1,
          name: Optional[str] = None, policy: DTypePolicy = DTypePolicy(),
          use_bias: bool = False):
    """Conv with torch-style symmetric padding (k//2 each side); bias only
    when BN has been folded in."""
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                   feature_group_count=groups, dtype=policy.compute_dtype,
                   param_dtype=policy.param_dtype, name=name)


def _bn(cfg: EfficientNetConfig, policy: DTypePolicy, name: str):
    if cfg.folded:
        return lambda x, use_running_average=True: x   # BN folded into conv
    return nn.BatchNorm(momentum=cfg.bn_momentum, epsilon=cfg.bn_eps,
                        dtype=policy.reduce_dtype,
                        param_dtype=policy.param_dtype, name=name)


class SqueezeExcite(nn.Module):
    """SE gate; reduced width comes from the block's *input* channels
    (timm semantics), not the expanded width."""

    reduced: int
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x.astype(self.policy.reduce_dtype), axis=(1, 2),
                          keepdims=True).astype(self.policy.compute_dtype)
        s = nn.Conv(self.reduced, (1, 1), use_bias=True,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype,
                    name="conv_reduce")(pooled)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype,
                    name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class _DropPath(nn.Module):
    """Per-sample stochastic depth (timm drop_path): drop the residual branch
    with prob `rate`, scale survivors by 1/keep."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DepthwiseSeparable(nn.Module):
    """Stage-0 block (expand ratio 1): dw conv + SE + pw project."""

    cfg: EfficientNetConfig
    in_c: int
    out_c: int
    stride: int
    kernel: int
    drop_path: float
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        h = _conv(self.in_c, self.kernel, self.stride, groups=self.in_c,
                  name="conv_dw", policy=self.policy,
                  use_bias=self.cfg.folded)(x)
        h = _bn(self.cfg, self.policy, "bn1")(h, use_running_average=not train)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, int(self.in_c * self.cfg.se_ratio)),
                          self.policy, name="se")(h)
        h = _conv(self.out_c, 1, name="conv_pw", policy=self.policy,
                  use_bias=self.cfg.folded)(h)
        h = _bn(self.cfg, self.policy, "bn2")(h, use_running_average=not train)
        if self.stride == 1 and self.in_c == self.out_c:
            h = _DropPath(self.drop_path, name="drop_path")(h, train)
            h = h + shortcut
        return h


class InvertedResidual(nn.Module):
    """MBConv: pw expand + dw + SE + pw-linear project, residual when
    stride 1 and channels match."""

    cfg: EfficientNetConfig
    expand: int
    in_c: int
    out_c: int
    stride: int
    kernel: int
    drop_path: float
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        mid = self.in_c * self.expand
        h = _conv(mid, 1, name="conv_pw", policy=self.policy,
                  use_bias=self.cfg.folded)(x)
        h = _bn(self.cfg, self.policy, "bn1")(h, use_running_average=not train)
        h = nn.silu(h)
        h = _conv(mid, self.kernel, self.stride, groups=mid,
                  name="conv_dw", policy=self.policy,
                  use_bias=self.cfg.folded)(h)
        h = _bn(self.cfg, self.policy, "bn2")(h, use_running_average=not train)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, int(self.in_c * self.cfg.se_ratio)),
                          self.policy, name="se")(h)
        h = _conv(self.out_c, 1, name="conv_pwl", policy=self.policy,
                  use_bias=self.cfg.folded)(h)
        h = _bn(self.cfg, self.policy, "bn3")(h, use_running_average=not train)
        if self.stride == 1 and self.in_c == self.out_c:
            h = _DropPath(self.drop_path, name="drop_path")(h, train)
            h = h + shortcut
        return h


class EfficientNet(nn.Module):
    """Feature extractor: stem -> MBConv stages -> conv_head.

    ``__call__`` returns [B, H', W', num_features] feature maps (the torch
    model's pre-pool output); ``features`` returns globally average-pooled
    [B, num_features] embeddings — equivalent to the reference's
    ``reset_classifier(0)`` + AdaptiveAvgPool2d (cv_classifier.py:26-28).
    Input is NHWC, float, already normalized.
    """

    cfg: EfficientNetConfig = EfficientNetConfig()
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, pol = self.cfg, self.policy
        x = x.astype(pol.compute_dtype)
        h = _conv(round_channels(cfg.stem_channels * cfg.width_mult), 3, 2,
                  name="conv_stem", policy=pol, use_bias=cfg.folded)(x)
        h = _bn(cfg, pol, "bn1")(h, use_running_average=not train)
        h = nn.silu(h)

        plan = cfg.block_plan()
        # Group blocks into stages to mirror timm's blocks.{stage}.{idx}.
        per_stage = [round_repeats(r, cfg.depth_mult)
                     for (_, _, r, _, _) in cfg.stages]
        b = 0
        for s, n_blocks in enumerate(per_stage):
            for i in range(n_blocks):
                exp, in_c, out_c, stride, k, dp = plan[b]
                name = f"blocks_{s}_{i}"
                if exp == 1:
                    h = DepthwiseSeparable(cfg, in_c, out_c, stride, k, dp,
                                           pol, name=name)(h, train)
                else:
                    h = InvertedResidual(cfg, exp, in_c, out_c, stride, k,
                                         dp, pol, name=name)(h, train)
                b += 1

        h = _conv(cfg.num_features, 1, name="conv_head", policy=pol,
                  use_bias=cfg.folded)(h)
        h = _bn(cfg, pol, "bn2")(h, use_running_average=not train)
        h = nn.silu(h)
        return h

    def features(self, x, train: bool = False):
        h = self(x, train=train)
        return jnp.mean(h.astype(self.policy.reduce_dtype), axis=(1, 2))
