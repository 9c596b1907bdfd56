"""Vision Transformer backbone — the MXU-friendly alternative image tower.

The reference's image path is timm EfficientNet by name string
(cv_classifier.py:23 ``timm.create_model(model_name, ...)``); EfficientNet is
elementwise/VPU-bound on TPU (PERF.md headroom #1: depthwise convs + SE gates
dominate, matmuls don't). A ViT is almost pure [B*N, D] matmuls — exactly
what the MXU wants — so it ships as an opt-in backbone behind the same
``CvImageClassifier`` / ``ImageTower`` contract and the same name-string API
(``--backbone vit_small``). Layer layout matches timm's
``vit_{tiny,small,base}_patch16_224`` exactly (patch conv + cls token +
learned pos embed, pre-LN blocks, fused-qkv attention, final LN, CLS pooling)
so timm checkpoints import via ``hf_import.vit_params_from_timm``.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

_VARIANTS = {
    # name: (hidden, layers, heads, mlp, patch, resolution)
    "vit_tiny": (192, 12, 3, 768, 16, 224),
    "vit_small": (384, 12, 6, 1536, 16, 224),
    "vit_base": (768, 12, 12, 3072, 16, 224),
}


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    patch_size: int = 16
    resolution: int = 224
    dropout: float = 0.0
    layer_norm_eps: float = 1e-6

    @classmethod
    def variant(cls, name: str, **kw) -> "ViTConfig":
        # kw overrides the preset (variant('vit_small', resolution=384)
        # is the CNN-native-resolution serving point, PERF.md shootout)
        if name == "vit_test":  # 2-layer test config
            base = dict(hidden_size=32, num_layers=2, num_heads=4,
                        mlp_dim=64, patch_size=8, resolution=32)
        else:
            h, l, nh, mlp, p, res = _VARIANTS[name]
            base = dict(hidden_size=h, num_layers=l, num_heads=nh,
                        mlp_dim=mlp, patch_size=p, resolution=res)
        base.update(kw)
        return cls(**base)

    @property
    def num_features(self) -> int:
        return self.hidden_size


class ViTBlock(nn.Module):
    cfg: ViTConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg, pol = self.cfg, self.policy
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=pol.reduce_dtype,
            param_dtype=pol.param_dtype, name=name)
        h = ln("norm1")(x)
        # fused qkv, timm layout: one [D, 3, nh, hd] projection
        qkv = nn.DenseGeneral((3, nh, hd), dtype=pol.compute_dtype,
                              param_dtype=pol.param_dtype, name="qkv")(h)
        q, k, v = (qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :])
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(hd)
        attn = nn.softmax(attn.astype(pol.reduce_dtype))
        attn = attn.astype(pol.compute_dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1),
                              dtype=pol.compute_dtype,
                              param_dtype=pol.param_dtype, name="proj")(out)
        if cfg.dropout:
            # timm drop_rate semantics: dropout after the attention proj
            # and after each MLP dense (VisionTransformer proj_drop /
            # mlp.drop) — cfg.dropout used to gate only the post-embedding
            # dropout, leaving `deterministic` dead here
            out = nn.Dropout(cfg.dropout)(out, deterministic)
        x = x + out.astype(x.dtype)
        h = ln("norm2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=pol.compute_dtype,
                     param_dtype=pol.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        if cfg.dropout:
            h = nn.Dropout(cfg.dropout)(h, deterministic)
        h = nn.Dense(cfg.hidden_size, dtype=pol.compute_dtype,
                     param_dtype=pol.param_dtype, name="fc2")(h)
        if cfg.dropout:
            h = nn.Dropout(cfg.dropout)(h, deterministic)
        return x + h.astype(x.dtype)


class ViT(nn.Module):
    """timm vit_*_patch16 structure; ``features`` = CLS after final LN."""

    cfg: ViTConfig = ViTConfig()
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg, pol = self.cfg, self.policy
        p = cfg.patch_size
        x = images.astype(pol.compute_dtype)
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=pol.compute_dtype, param_dtype=pol.param_dtype,
                    name="patch_embed")(x)
        B = x.shape[0]
        n = x.shape[1] * x.shape[2]
        x = x.reshape(B, n, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size), pol.param_dtype)
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02),
                         (1, n + 1, cfg.hidden_size), pol.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size))
                             .astype(x.dtype), x], axis=1)
        x = x + pos.astype(x.dtype)
        if cfg.dropout:
            x = nn.Dropout(cfg.dropout)(x, deterministic=not train)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, pol, name=f"block_{i}")(
                x, deterministic=not train)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=pol.reduce_dtype,
                         param_dtype=pol.param_dtype, name="norm")(x)
        return x

    def features(self, images, train: bool = False):
        """[B, hidden] CLS embedding — timm's 'token' pooling after norm."""
        return self(images, train=train)[:, 0]
