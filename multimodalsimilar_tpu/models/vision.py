"""Image tower and image classifier.

* ImageTower  <- image_emb.py:14-32 — backbone features (classifier stripped),
  optional BatchNorm1d, always L2-normalized output.
* CvImageClassifier <- cv_classifier.py:17-55 — backbone -> global average
  pool -> optional Dropout(0.5) + Linear(fc_dim) + BatchNorm1d neck ->
  ArcFace head (m defaults to 0.2, cv_classifier.py:19). ``predict_emb``
  returns the neck output (the 512-d embedding cached to emb.txt by
  daodian_infer.py:283).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from multimodalsimilar_tpu.models.convnext import ConvNeXt, ConvNeXtConfig
from multimodalsimilar_tpu.models.efficientnet import (
    EfficientNet, EfficientNetConfig)
from multimodalsimilar_tpu.models.heads import ArcFaceHead
from multimodalsimilar_tpu.models.vit import ViT, ViTConfig
from multimodalsimilar_tpu.ops.arcface import ArcFaceParams
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


def device_normalize(images):
    """uint8 [B,H,W,3] -> imagenet-normalized float32, inside jit.

    The host pipeline ships uint8 batches (4x smaller host->device
    transfers, data/images.py normalize_host=False); this applies the
    same f32 math as data.images.normalize on device (the constants are
    imported from there — one source of truth). Bit-identical on the CPU
    backend; on TPU XLA strength-reduces the divisions, leaving <=1e-6
    one-ulp differences (measured 7.2e-7, PERF.md). Float inputs pass
    through unchanged (dtype is static under jit — no retrace churn).
    """
    from multimodalsimilar_tpu.data.images import (
        IMAGENET_MEAN, IMAGENET_STD)
    if images.dtype != jnp.uint8:
        return images
    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def backbone_config(name: str, **kw):
    """Name-string backbone API (cv_classifier.py:23's timm.create_model
    equivalent): efficientnet_b0..b7 / tiny -> EfficientNetConfig;
    vit_{tiny,small,base} / vit_test -> ViTConfig (MXU-friendly at 224px);
    convnext_{tiny,small,base} / convnext_test -> ConvNeXtConfig
    (MXU-friendly at CNN-native 384/512px — linear in pixels)."""
    if name.startswith("vit"):
        return ViTConfig.variant(name, **kw)
    if name.startswith("convnext"):
        return ConvNeXtConfig.variant(name, **kw)
    return EfficientNetConfig.variant(name, **kw)


def build_backbone(cfg, policy: DTypePolicy, name: str = "backbone"):
    if isinstance(cfg, ViTConfig):
        return ViT(cfg, policy, name=name)
    if isinstance(cfg, ConvNeXtConfig):
        return ConvNeXt(cfg, policy, name=name)
    return EfficientNet(cfg, policy, name=name)


class ImageTower(nn.Module):
    """L2-normalized pooled backbone features (image_emb.py semantics)."""

    cfg: EfficientNetConfig = EfficientNetConfig.b4()
    use_bn: bool = False
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = build_backbone(self.cfg, self.policy).features(
            images, train=train)
        if self.use_bn:
            feats = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.policy.reduce_dtype,
                                 param_dtype=self.policy.param_dtype,
                                 name="bn_layer")(feats)
        from multimodalsimilar_tpu.ops.arcface import l2_normalize
        return l2_normalize(feats)


class CvImageClassifier(nn.Module):
    """EfficientNet + FC/BN neck + ArcFace (cv_classifier.py contract)."""

    cfg: EfficientNetConfig
    num_labels: int
    fc_dim: int = 512
    use_fc: bool = True
    arcface: ArcFaceParams = ArcFaceParams(m=0.2)
    use_fused_head: bool = False
    policy: DTypePolicy = DTypePolicy()

    def setup(self):
        self.backbone = build_backbone(self.cfg, self.policy)
        if self.use_fc:
            self.dropout = nn.Dropout(0.5)
            self.fc = nn.Dense(self.fc_dim, dtype=self.policy.reduce_dtype,
                               param_dtype=self.policy.param_dtype)
            self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                   dtype=self.policy.reduce_dtype,
                                   param_dtype=self.policy.param_dtype)
        self.head = ArcFaceHead(self.num_labels, self.arcface,
                                self.use_fused_head)

    def predict_emb(self, images, train: bool = False,
                    deterministic: Optional[bool] = None):
        """Backbone -> GAP -> (dropout -> fc -> bn) (cv_classifier.py:47-55).

        NB the reference applies Dropout inside predict_emb, so embeddings
        are noisy in train mode — we keep dropout tied to `train` the same
        way (deterministic inference passes train=False).
        """
        det = (not train) if deterministic is None else deterministic
        feats = self.backbone.features(images, train=train)
        if self.use_fc:
            feats = self.dropout(feats, deterministic=det)
            feats = self.fc(feats)
            feats = self.bn(feats, use_running_average=not train)
        return feats

    def __call__(self, images, label=None, is_test: bool = False, m=None,
                 train: bool = False):
        emb = self.predict_emb(images, train=train)
        return self.head(emb, label, m=m, is_test=is_test)
