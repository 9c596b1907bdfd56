"""ConvNeXt backbone — the MXU-friendly tower for CNN-native resolutions.

The reference's image path is timm EfficientNet by name string
(cv_classifier.py:23 ``timm.create_model(model_name, ...)``). PERF.md's
measurements show the TPU trade-off: EfficientNet-B4 is VPU-bound (depthwise
+ SE elementwise traffic), the ViT alternative is pure MXU matmuls but its
attention grows quadratically in tokens, so at the production 384/512px
resolutions (cv train @512, cv_classifier_train_daodian.py:48) ViT loses its
edge. ConvNeXt fills that gap: per block one cheap 7x7 depthwise + two dense
1x1 projections (a 4x MLP — ~95% of FLOPs land on the MXU), and cost scales
*linearly* in pixels. It ships behind the same ``CvImageClassifier`` /
``ImageTower`` contract and name-string API (``--backbone convnext_tiny``).

Layer layout matches timm's ``convnext_{tiny,small,base}`` exactly (4x4
patchify stem + LN, per-stage LN + 2x2 downsample, blocks of
conv_dw(7x7) -> LN -> fc1(4D) -> GELU -> fc2(D) -> layer-scale gamma with
per-sample drop-path, global-average-pool -> head LN features) so timm
checkpoints import via ``hf_import.convnext_params_from_timm``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodalsimilar_tpu.models.efficientnet import _DropPath
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

_VARIANTS = {
    # name: (depths, dims)
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    ls_init: float = 1e-6          # layer-scale gamma init
    layer_norm_eps: float = 1e-6
    resolution: int = 224

    @classmethod
    def variant(cls, name: str, **kw) -> "ConvNeXtConfig":
        # kw overrides the preset (e.g. resolution=384)
        if name == "convnext_test":  # tiny test config
            base = dict(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64),
                        resolution=32)
        else:
            depths, dims = _VARIANTS[name]
            base = dict(depths=depths, dims=dims)
        base.update(kw)
        return cls(**base)

    @property
    def num_features(self) -> int:
        return self.dims[-1]

    def block_drop_paths(self):
        """timm's linearly-increasing per-block drop-path schedule."""
        total = sum(self.depths)
        rates, idx = [], 0
        for d in self.depths:
            stage = []
            for _ in range(d):
                stage.append(self.drop_path_rate * idx / max(total - 1, 1))
                idx += 1
            rates.append(stage)
        return rates


class ConvNeXtBlock(nn.Module):
    """conv_dw(7x7, per-channel) -> LN -> fc1 -> GELU -> fc2 -> gamma,
    residual with per-sample drop-path (timm ConvNeXtBlock semantics).

    Everything stays NHWC so the LN and the two Dense layers act on the
    channel axis directly — the fc pair is one [B*H*W, D] x [D, 4D] matmul
    chain, which is where the MXU time goes.
    """

    dim: int
    drop_path: float
    cfg: ConvNeXtConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, pol = self.cfg, self.policy
        h = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, use_bias=True,
                    dtype=pol.compute_dtype, param_dtype=pol.param_dtype,
                    name="conv_dw")(x.astype(pol.compute_dtype))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=pol.reduce_dtype,
                         param_dtype=pol.param_dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=pol.compute_dtype,
                     param_dtype=pol.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=pol.compute_dtype,
                     param_dtype=pol.param_dtype, name="fc2")(h)
        if cfg.ls_init:
            gamma = self.param("gamma", nn.initializers.constant(cfg.ls_init),
                               (self.dim,), pol.param_dtype)
            h = h * gamma.astype(h.dtype)
        if self.drop_path:
            h = _DropPath(self.drop_path, name="drop_path")(h, train)
        return x + h.astype(x.dtype)


class ConvNeXt(nn.Module):
    """timm convnext_* structure; ``features`` = GAP -> head LN."""

    cfg: ConvNeXtConfig = ConvNeXtConfig()
    policy: DTypePolicy = DTypePolicy()

    def setup(self):
        cfg, pol = self.cfg, self.policy

        def ln(name):
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                dtype=pol.reduce_dtype,
                                param_dtype=pol.param_dtype, name=name)

        def conv(dim, k, name):
            return nn.Conv(dim, (k, k), strides=(k, k), padding="VALID",
                           use_bias=True, dtype=pol.compute_dtype,
                           param_dtype=pol.param_dtype, name=name)

        self.stem_conv = conv(cfg.dims[0], 4, "stem_conv")
        self.stem_norm = ln("stem_norm")
        drop_paths = cfg.block_drop_paths()
        down_norms, down_convs, blocks = [], [], []
        for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if s > 0:
                down_norms.append(ln(f"downsample_norm_{s}"))
                down_convs.append(conv(dim, 2, f"downsample_conv_{s}"))
            blocks.append([ConvNeXtBlock(dim, drop_paths[s][b], cfg, pol,
                                         name=f"stage_{s}_block_{b}")
                           for b in range(depth)])
        self.down_norms = down_norms
        self.down_convs = down_convs
        self.blocks = blocks
        self.head_norm = ln("head_norm")

    def __call__(self, images, train: bool = False):
        """Returns the final [B, H/32, W/32, dims[-1]] feature map."""
        pol = self.policy
        x = self.stem_conv(images.astype(pol.compute_dtype))
        x = self.stem_norm(x).astype(pol.compute_dtype)
        for s, stage in enumerate(self.blocks):
            if s > 0:
                x = self.down_norms[s - 1](x).astype(pol.compute_dtype)
                x = self.down_convs[s - 1](x)
            for block in stage:
                x = block(x, train=train)
        return x

    def features(self, images, train: bool = False):
        """[B, dims[-1]] — global average pool then the head LayerNorm
        (timm's NormMlpClassifierHead with the classifier stripped,
        i.e. what ``reset_classifier(0)`` leaves, image_emb.py:20)."""
        x = self(images, train=train)
        x = jnp.mean(x.astype(self.policy.reduce_dtype), axis=(1, 2))
        return self.head_norm(x)
