"""ViT backbone: parity vs a torch restatement of timm's vit_*_patch16
structure, timm-weight import, and the CvImageClassifier/name-string
integration (the alternative MXU-friendly image tower).

timm itself is not installed (zero egress); TorchViT below restates the
exact module graph of timm/models/vision_transformer.py for the default
class_token + learned-pos-embed + pre-norm configuration: patch conv,
cls token, pos embed (cls position included), blocks of
LN->packed-qkv-attn->proj (+res), LN->MLP (+res), final LN, CLS pooling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn_t

from multimodalsimilar_tpu.models.hf_import import vit_params_from_timm
from multimodalsimilar_tpu.models.vision import (
    CvImageClassifier, backbone_config)
from multimodalsimilar_tpu.models.vit import ViT, ViTConfig
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()


class TorchBlock(nn_t.Module):
    def __init__(self, d, nh, mlp):
        super().__init__()
        self.norm1 = nn_t.LayerNorm(d, eps=1e-6)
        self.attn = nn_t.Module()
        self.attn.qkv = nn_t.Linear(d, 3 * d)
        self.attn.proj = nn_t.Linear(d, d)
        self.norm2 = nn_t.LayerNorm(d, eps=1e-6)
        self.mlp = nn_t.Module()
        self.mlp.fc1 = nn_t.Linear(d, mlp)
        self.mlp.fc2 = nn_t.Linear(mlp, d)
        self.nh = nh

    def forward(self, x):
        B, N, D = x.shape
        hd = D // self.nh
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.nh, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)       # [B, nh, N, hd] each
        a = (q @ k.transpose(-2, -1)) / (hd ** 0.5)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn.proj(o)
        h = self.norm2(x)
        return x + self.mlp.fc2(
            nn_t.functional.gelu(self.mlp.fc1(h)))


class TorchViT(nn_t.Module):
    """timm vision_transformer.py structure (state_dict-compatible keys)."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d, p = cfg.hidden_size, cfg.patch_size
        n = (cfg.resolution // p) ** 2
        self.patch_embed = nn_t.Module()
        self.patch_embed.proj = nn_t.Conv2d(3, d, p, stride=p)
        self.cls_token = nn_t.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn_t.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn_t.ModuleList(
            [TorchBlock(d, cfg.num_heads, cfg.mlp_dim)
             for _ in range(cfg.num_layers)])
        self.norm = nn_t.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x)                 # [B, D, H', W']
        B, D = x.shape[0], x.shape[1]
        x = x.flatten(2).transpose(1, 2)             # [B, N, D]
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]                    # CLS pooling


def _timm_keys(sd):
    """ModuleList 'blocks.0.' keys already match timm's naming."""
    return sd


def test_vit_matches_torch_restatement():
    cfg = ViTConfig.variant("vit_test")
    torch.manual_seed(0)
    ref = TorchViT(cfg).eval()
    with torch.no_grad():
        ref.cls_token.normal_(0, 0.02)
    params = vit_params_from_timm(_timm_keys(ref.state_dict()), cfg)
    model = ViT(cfg, policy=FP32)

    x = np.random.default_rng(0).normal(
        size=(2, 3, cfg.resolution, cfg.resolution)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      method=model.features)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_vit_variant_table():
    s = ViTConfig.variant("vit_small")
    assert (s.hidden_size, s.num_layers, s.num_heads, s.mlp_dim) == \
        (384, 12, 6, 1536)
    assert backbone_config("vit_small") == s
    b = backbone_config("efficientnet_b4")
    assert b.num_features == 1792


def test_cv_classifier_with_vit_backbone():
    """Same CvImageClassifier contract (neck + ArcFace + predict_emb) on the
    ViT backbone via the name-string API."""
    cfg = backbone_config("vit_test")
    model = CvImageClassifier(cfg, num_labels=5, fc_dim=8, policy=FP32)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, cfg.resolution, cfg.resolution, 3)).astype(np.float32))
    label = jnp.asarray([0, 3])
    variables = model.init({"params": jax.random.key(0)}, x, label=label)
    emb = model.apply(variables, x, method=model.predict_emb,
                      mutable=False)
    assert emb.shape == (2, 8)
    logits = model.apply(variables, x, is_test=True)
    assert logits.shape == (2, 5)


def test_cli_train_cv_vit_backbone(tmp_path):
    import os

    import cv2
    import pandas as pd

    from multimodalsimilar_tpu.cli import main

    n = 8
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(n)],
                       "tag_new_id": [i % 2 for i in range(n)]})
    img_root = str(tmp_path / "imgs")
    for _, r in df.iterrows():
        path = os.path.join(img_root, f"{r['goods_sku']}.jpg")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cv2.imwrite(path, np.full((16, 16, 3),
                                  int(r["tag_new_id"]) * 60 + 40, np.uint8))
    data = str(tmp_path / "cv.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "cv", "--data", data, "--img_root", img_root,
          "--output", out, "--backbone", "vit_test",
          "--image_size", "32", "--fc_dim", "8", "--batch_size", "4",
          "--epochs", "1", "--eval_every", "1000000", "--save_every", "2"])
    assert os.listdir(os.path.join(out, "ckpt"))


def test_vit_import_interpolates_pos_embed_to_new_resolution():
    """Imported 32px-checkpoint weights serve a 48px model: the position
    embedding grid is bicubic-interpolated (timm's fine-tune recipe); the
    same-resolution path is byte-identical."""
    import dataclasses

    cfg32 = ViTConfig.variant("vit_test")              # 32px, patch 8 -> 4x4
    torch.manual_seed(4)
    ref = TorchViT(cfg32).eval()
    sd = ref.state_dict()
    # same resolution: untouched
    p_same = vit_params_from_timm(sd, cfg32)
    np.testing.assert_array_equal(p_same["pos_embed"],
                                  sd["pos_embed"].numpy())
    # new resolution: grid 4x4 -> 6x6, CLS slot preserved
    cfg48 = dataclasses.replace(cfg32, resolution=48)
    p_new = vit_params_from_timm(sd, cfg48)
    assert p_new["pos_embed"].shape == (1, 37, cfg32.hidden_size)
    np.testing.assert_array_equal(p_new["pos_embed"][:, 0],
                                  sd["pos_embed"].numpy()[:, 0])
    # the upscaled model runs end-to-end on 48px inputs
    model = ViT(cfg48, policy=FP32)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 48, 48, 3)).astype(np.float32))
    out = model.apply({"params": p_new}, x, method=model.features)
    assert out.shape == (2, cfg32.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_block_dropout_active_in_train_mode():
    """cfg.dropout must regularize the blocks (timm drop_rate semantics:
    proj + mlp dropout), not just the post-embedding sum — `deterministic`
    was dead in ViTBlock."""
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.vit import ViT, ViTConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    cfg = ViTConfig.variant("vit_test", dropout=0.4)
    model = ViT(cfg, DTypePolicy.full_precision())
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)), jnp.float32)
    v = jax.jit(lambda im: model.init(
        {"params": jax.random.key(0)}, im))(x)
    # eval: deterministic regardless of rng
    e1 = model.apply(v, x, train=False)
    e2 = model.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # train: different dropout rngs -> different block outputs
    t1 = model.apply(v, x, train=True,
                     rngs={"dropout": jax.random.key(1)})
    t2 = model.apply(v, x, train=True,
                     rngs={"dropout": jax.random.key(2)})
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-4
