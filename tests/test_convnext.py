"""ConvNeXt backbone: parity vs a torch restatement of timm's convnext_*
structure, timm-weight import (both timm and FB-repo key namings), and the
CvImageClassifier/name-string integration (the MXU-friendly tower for the
production 384/512px resolutions where ViT's quadratic attention loses).

timm itself is not installed (zero egress); TorchConvNeXt below restates the
exact module graph of timm/models/convnext.py for the standard
(head_norm_first=False, conv_mlp=False) configuration: 4x4 patchify stem +
LayerNorm, per-stage LN + 2x2 strided downsample, blocks of 7x7 depthwise ->
channels-last LN -> fc1(4D) -> GELU -> fc2(D) -> layer-scale gamma (+res),
global-average-pool -> head LN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn_t

from multimodalsimilar_tpu.models.convnext import ConvNeXt, ConvNeXtConfig
from multimodalsimilar_tpu.models.hf_import import convnext_params_from_timm
from multimodalsimilar_tpu.models.vision import (
    CvImageClassifier, backbone_config)
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()


class LayerNorm2d(nn_t.LayerNorm):
    """timm's LayerNorm2d: LN over the channel axis of NCHW maps."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = nn_t.functional.layer_norm(
            x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class TorchBlock(nn_t.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn_t.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn_t.LayerNorm(dim, eps=1e-6)
        self.mlp = nn_t.Module()
        self.mlp.fc1 = nn_t.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn_t.Linear(4 * dim, dim)
        self.gamma = nn_t.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        h = self.conv_dw(x).permute(0, 2, 3, 1)
        h = self.norm(h)
        h = self.mlp.fc2(nn_t.functional.gelu(self.mlp.fc1(h)))
        return x + (self.gamma * h).permute(0, 3, 1, 2)


class TorchStage(nn_t.Module):
    def __init__(self, in_dim, dim, depth, downsample):
        super().__init__()
        if downsample:
            self.downsample = nn_t.Sequential(
                LayerNorm2d(in_dim, eps=1e-6),
                nn_t.Conv2d(in_dim, dim, 2, stride=2))
        else:
            self.downsample = nn_t.Identity()
        self.blocks = nn_t.ModuleList([TorchBlock(dim) for _ in range(depth)])

    def forward(self, x):
        x = self.downsample(x)
        for b in self.blocks:
            x = b(x)
        return x


class TorchConvNeXt(nn_t.Module):
    """timm convnext.py structure (state_dict-compatible keys)."""

    def __init__(self, cfg: ConvNeXtConfig):
        super().__init__()
        self.stem = nn_t.Sequential(
            nn_t.Conv2d(3, cfg.dims[0], 4, stride=4),
            LayerNorm2d(cfg.dims[0], eps=1e-6))
        dims = (cfg.dims[0],) + tuple(cfg.dims)
        self.stages = nn_t.ModuleList(
            [TorchStage(dims[s], cfg.dims[s], cfg.depths[s], downsample=s > 0)
             for s in range(len(cfg.depths))])
        self.head = nn_t.Module()
        self.head.norm = nn_t.LayerNorm(cfg.dims[-1], eps=1e-6)

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            x = stage(x)
        return self.head.norm(x.mean(dim=(2, 3)))


def _randomize(model):
    """Default inits leave gamma at 1e-6 (hides transposition bugs) — give
    every parameter a random value for the parity check."""
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.05)
    return model


def test_convnext_matches_torch_restatement():
    cfg = ConvNeXtConfig.variant("convnext_test")
    torch.manual_seed(0)
    ref = _randomize(TorchConvNeXt(cfg)).eval()
    params = convnext_params_from_timm(ref.state_dict(), cfg)
    model = ConvNeXt(cfg, policy=FP32)

    x = np.random.default_rng(0).normal(
        size=(2, 3, cfg.resolution, cfg.resolution)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      method=model.features)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_convnext_import_accepts_fb_repo_naming():
    """The original facebookresearch/ConvNeXt checkpoints use
    downsample_layers/dwconv/pwconv1/pwconv2/norm keys — same tensors,
    different names; the importer must produce the identical tree."""
    cfg = ConvNeXtConfig.variant("convnext_test")
    torch.manual_seed(1)
    sd = _randomize(TorchConvNeXt(cfg)).state_dict()

    def fb_name(k):
        k = k.replace("stem.0.", "downsample_layers.0.0.")
        k = k.replace("stem.1.", "downsample_layers.0.1.")
        k = k.replace("head.norm.", "norm.")
        for s in range(1, len(cfg.depths)):
            k = k.replace(f"stages.{s}.downsample.0.",
                          f"downsample_layers.{s}.0.")
            k = k.replace(f"stages.{s}.downsample.1.",
                          f"downsample_layers.{s}.1.")
        k = k.replace(".blocks.", ".").replace(".conv_dw.", ".dwconv.")
        k = k.replace(".mlp.fc1.", ".pwconv1.").replace(".mlp.fc2.",
                                                        ".pwconv2.")
        return k

    fb_sd = {fb_name(k): v for k, v in sd.items()}
    assert fb_sd.keys() != sd.keys()
    a = convnext_params_from_timm(sd, cfg)
    b = convnext_params_from_timm(fb_sd, cfg)
    jax.tree.map(np.testing.assert_array_equal, a, b)


def test_convnext_variant_table():
    t = ConvNeXtConfig.variant("convnext_tiny")
    assert (t.depths, t.dims) == ((3, 3, 9, 3), (96, 192, 384, 768))
    assert t.num_features == 768
    assert backbone_config("convnext_tiny") == t
    b = ConvNeXtConfig.variant("convnext_base")
    assert b.dims == (128, 256, 512, 1024)
    # drop-path schedule rises linearly block-by-block to the configured rate
    import dataclasses
    d = dataclasses.replace(t, drop_path_rate=0.3).block_drop_paths()
    flat = [r for stage in d for r in stage]
    assert flat[0] == 0.0 and abs(flat[-1] - 0.3) < 1e-9
    assert flat == sorted(flat)


def test_cv_classifier_with_convnext_backbone():
    """Same CvImageClassifier contract (neck + ArcFace + predict_emb) on the
    ConvNeXt backbone via the name-string API."""
    cfg = backbone_config("convnext_test")
    model = CvImageClassifier(cfg, num_labels=5, fc_dim=8, policy=FP32)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, cfg.resolution, cfg.resolution, 3)).astype(np.float32))
    label = jnp.asarray([0, 3])
    variables = model.init({"params": jax.random.key(0)}, x, label=label)
    emb = model.apply(variables, x, method=model.predict_emb, mutable=False)
    assert emb.shape == (2, 8)
    logits = model.apply(variables, x, is_test=True)
    assert logits.shape == (2, 5)


def test_cli_train_cv_convnext_backbone(tmp_path):
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
          "--output", out, "--backbone", "convnext_test",
          "--image_size", "32", "--fc_dim", "8", "--batch_size", "4",
          "--epochs", "1", "--eval_every", "1000000", "--save_every", "2"])
    assert os.listdir(os.path.join(out, "ckpt"))


def test_convnext_drop_path_train_mode_runs():
    """Stochastic depth engages only in train mode and keeps shapes/finite."""
    import dataclasses

    cfg = dataclasses.replace(ConvNeXtConfig.variant("convnext_test"),
                              drop_path_rate=0.5)
    model = ConvNeXt(cfg, policy=FP32)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x,
                           method=model.features)
    out = model.apply(variables, x, train=True, method=model.features,
                      rngs={"dropout": jax.random.key(1)})
    assert out.shape == (4, cfg.dims[-1])
    assert np.isfinite(np.asarray(out)).all()
