"""EfficientNet parity vs an independent torch implementation.

timm is not installed in this image, so the test re-states the MBConv
architecture in plain torch (conv/BN/SiLU semantics defined by torch itself,
state_dict emitted in timm's naming scheme) and checks our Flax model + the
timm-layout converter reproduce its outputs exactly. This pins down the risky
bits called out in SURVEY.md §7: padding semantics, BN eps/statistics, SE
reduced-width rule, and residual plumbing.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn_t

from multimodalsimilar_tpu.models.efficientnet import (
    EfficientNet, EfficientNetConfig, round_channels, round_repeats)
from multimodalsimilar_tpu.models.hf_import import efficientnet_params_from_timm
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()


# --- independent torch re-statement (timm naming) --------------------------

class TorchSE(nn_t.Module):
    def __init__(self, chs, reduced):
        super().__init__()
        self.conv_reduce = nn_t.Conv2d(chs, reduced, 1, bias=True)
        self.conv_expand = nn_t.Conv2d(reduced, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class TorchDsBlock(nn_t.Module):
    def __init__(self, in_c, out_c, stride, k, se_ratio):
        super().__init__()
        self.conv_dw = nn_t.Conv2d(in_c, in_c, k, stride, k // 2,
                                   groups=in_c, bias=False)
        self.bn1 = nn_t.BatchNorm2d(in_c)
        self.se = TorchSE(in_c, max(1, int(in_c * se_ratio)))
        self.conv_pw = nn_t.Conv2d(in_c, out_c, 1, bias=False)
        self.bn2 = nn_t.BatchNorm2d(out_c)
        self.has_res = stride == 1 and in_c == out_c

    def forward(self, x):
        h = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return x + h if self.has_res else h


class TorchIRBlock(nn_t.Module):
    def __init__(self, exp, in_c, out_c, stride, k, se_ratio):
        super().__init__()
        mid = in_c * exp
        self.conv_pw = nn_t.Conv2d(in_c, mid, 1, bias=False)
        self.bn1 = nn_t.BatchNorm2d(mid)
        self.conv_dw = nn_t.Conv2d(mid, mid, k, stride, k // 2,
                                   groups=mid, bias=False)
        self.bn2 = nn_t.BatchNorm2d(mid)
        self.se = TorchSE(mid, max(1, int(in_c * se_ratio)))
        self.conv_pwl = nn_t.Conv2d(mid, out_c, 1, bias=False)
        self.bn3 = nn_t.BatchNorm2d(out_c)
        self.has_res = stride == 1 and in_c == out_c

    def forward(self, x):
        h = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
        h = torch.nn.functional.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return x + h if self.has_res else h


class TorchEffNet(nn_t.Module):
    def __init__(self, cfg: EfficientNetConfig):
        super().__init__()
        stem = round_channels(cfg.stem_channels * cfg.width_mult)
        self.conv_stem = nn_t.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = nn_t.BatchNorm2d(stem)
        blocks = []
        in_c = stem
        for (exp, c, r, s, k) in cfg.stages:
            out_c = round_channels(c * cfg.width_mult)
            stage = []
            for i in range(round_repeats(r, cfg.depth_mult)):
                stride = s if i == 0 else 1
                if exp == 1:
                    stage.append(TorchDsBlock(in_c, out_c, stride, k,
                                              cfg.se_ratio))
                else:
                    stage.append(TorchIRBlock(exp, in_c, out_c, stride, k,
                                              cfg.se_ratio))
                in_c = out_c
            blocks.append(nn_t.Sequential(*stage))
        self.blocks = nn_t.Sequential(*blocks)
        self.conv_head = nn_t.Conv2d(in_c, cfg.num_features, 1, bias=False)
        self.bn2 = nn_t.BatchNorm2d(cfg.num_features)

    def forward(self, x):
        h = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
        h = self.blocks(h)
        h = torch.nn.functional.silu(self.bn2(self.conv_head(h)))
        return h


@pytest.fixture(scope="module")
def pair():
    cfg = EfficientNetConfig(
        stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3), (6, 24, 2, 2, 5)),
        stem_channels=8, head_channels=64, drop_path_rate=0.0)
    torch.manual_seed(0)
    ref = TorchEffNet(cfg).eval()
    # randomize BN stats so parity actually exercises them
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, nn_t.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    params, stats = efficientnet_params_from_timm(ref.state_dict(), cfg)
    model = EfficientNet(cfg, policy=FP32)
    return ref, model, {"params": params, "batch_stats": stats}, cfg


def test_matches_torch_eval(pair):
    ref, model, variables, cfg = pair
    x = np.random.default_rng(0).normal(size=(2, 3, 33, 33)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()        # NCHW
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_pooled_features(pair):
    ref, model, variables, cfg = pair
    x = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    feats = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        method=model.features)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).mean((2, 3)).numpy()
    assert feats.shape == (2, cfg.num_features)
    np.testing.assert_allclose(np.asarray(feats), want, rtol=1e-4, atol=1e-4)


def test_b4_feature_dim():
    assert EfficientNetConfig.b4().num_features == 1792


def test_b4_block_plan_matches_timm_counts():
    # timm efficientnet_b4: blocks per stage = [2, 4, 4, 6, 6, 8, 2]
    cfg = EfficientNetConfig.b4()
    per_stage = [round_repeats(r, cfg.depth_mult)
                 for (_, _, r, _, _) in cfg.stages]
    assert per_stage == [2, 4, 4, 6, 6, 8, 2]
    # and channel widths [24, 32, 56, 112, 160, 272, 448], stem 48
    widths = [round_channels(c * cfg.width_mult)
              for (_, c, _, _, _) in cfg.stages]
    assert widths == [24, 32, 56, 112, 160, 272, 448]
    assert round_channels(cfg.stem_channels * cfg.width_mult) == 48


def test_train_mode_batchnorm_and_droppath():
    cfg = EfficientNetConfig.tiny()
    model = EfficientNet(cfg, policy=FP32)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 16, 16, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)})
    # batch stats moved away from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.asarray(leaf).any()


def test_variant_tiny_honors_kw_overrides():
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    c = EfficientNetConfig.variant("tiny", resolution=64, drop_path_rate=0.0)
    assert c.resolution == 64 and c.drop_path_rate == 0.0
    assert c.stem_channels == 8            # the tiny preset still applies
