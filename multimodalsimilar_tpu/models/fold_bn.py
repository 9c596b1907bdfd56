"""Inference-time BatchNorm folding for EfficientNet.

Eval-mode BN is the affine ``y = (x - mean) / sqrt(var + eps) * gamma +
beta``; it folds into the preceding (bias-free) convolution as a per-output-
channel weight scale plus a bias. Folding removes every BN op from the
serving graph — fewer elementwise passes over the (large, spatially-wide)
activations, which is exactly where EfficientNet spends its time on TPU
(PERF.md: the network is elementwise-bound, not MXU-bound).

Usage:
    folded = fold_efficientnet_bn(params, batch_stats, cfg)
    model = EfficientNet(cfg, policy, folded=True)
    model.apply({"params": folded}, x)          # no batch_stats needed

The folded model is inference-only (no BN statistics to update).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig


def _fold_pair(conv: Dict, bn_p: Dict, bn_s: Dict, eps: float) -> Dict:
    """(conv kernel HWIO, bn params/stats) -> {kernel, bias}."""
    kernel = np.asarray(conv["kernel"], np.float32)
    gamma = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {"kernel": kernel * scale,            # broadcasts over O axis
            "bias": beta - mean * scale}


def fold_efficientnet_bn(params: Dict, batch_stats: Dict,
                         cfg: EfficientNetConfig) -> Dict:
    """Fold every conv+BN pair of an EfficientNet param tree.

    SE convs already carry biases and have no BN — copied through.
    """
    eps = cfg.bn_eps
    out: Dict = {}
    out["conv_stem"] = _fold_pair(params["conv_stem"], params["bn1"],
                                  batch_stats["bn1"], eps)
    for name, block in params.items():
        if not name.startswith("blocks_"):
            continue
        bs = batch_stats[name]
        fb: Dict = {"se": block["se"]}
        if "conv_pwl" in block:                   # InvertedResidual
            fb["conv_pw"] = _fold_pair(block["conv_pw"], block["bn1"],
                                       bs["bn1"], eps)
            fb["conv_dw"] = _fold_pair(block["conv_dw"], block["bn2"],
                                       bs["bn2"], eps)
            fb["conv_pwl"] = _fold_pair(block["conv_pwl"], block["bn3"],
                                        bs["bn3"], eps)
        else:                                     # DepthwiseSeparable
            fb["conv_dw"] = _fold_pair(block["conv_dw"], block["bn1"],
                                       bs["bn1"], eps)
            fb["conv_pw"] = _fold_pair(block["conv_pw"], block["bn2"],
                                       bs["bn2"], eps)
        out[name] = fb
    out["conv_head"] = _fold_pair(params["conv_head"], params["bn2"],
                                  batch_stats["bn2"], eps)
    return out


def fold_cv_classifier(variables: Dict, cfg: EfficientNetConfig):
    """Fold a CvImageClassifier's backbone BN for serving.

    Returns (folded_cfg, folded_variables). The 1-D neck BN (on the [B, 512]
    fc output) is negligible and kept as-is. Measured on v5e: +12% image
    embedding throughput on top of the bf16 inference policy.
    """
    import dataclasses
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params["backbone"] = fold_efficientnet_bn(
        params["backbone"], stats.pop("backbone"), cfg)
    folded_cfg = dataclasses.replace(cfg, folded=True)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return folded_cfg, out
