"""Import HF / timm torch weights into the Flax modules.

The reference ships no weights of its own — every model starts from a HF hub
checkpoint ('hfl/chinese-roberta-wwm-ext', nlp_classifier_train.py:63; timm
'efficientnet_b4', cv_classifier.py:23) and production checkpoints are whole
pickled torch modules (nlp_infer.py:121). These converters map torch
state_dicts (tensors or numpy arrays) onto our Flax param trees so reference
checkpoints can be verified for embedding parity and reused directly.

Only numpy is required at call time; torch tensors are accepted and detached.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.efficientnet import (
    EfficientNetConfig, round_repeats)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def bert_params_from_torch(state_dict: Mapping[str, "np.ndarray"],
                           config: BertConfig) -> Dict:
    """HF BertModel state_dict -> BertEncoderModel params.

    Accepts keys with or without the leading 'bert.' prefix. Torch Linear
    weights are [out, in] and transpose to Flax [in, out]; attention q/k/v
    reshape to DenseGeneral's [in, heads, head_dim].
    """
    sd = {k.removeprefix("bert."): _np(v) for k, v in state_dict.items()}
    H = config.hidden_size
    nh = config.num_heads
    hd = H // nh

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def qkv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T.reshape(H, nh, hd),
                "bias": sd[f"{prefix}.bias"].reshape(nh, hd)}

    def fused_qkv(p):
        ks = np.stack([sd[f"{p}.attention.self.{n}.weight"].T.reshape(
            H, nh, hd) for n in ("query", "key", "value")], axis=1)
        bs = np.stack([sd[f"{p}.attention.self.{n}.bias"].reshape(nh, hd)
                       for n in ("query", "key", "value")], axis=0)
        return {"kernel": ks, "bias": bs}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_norm": ln("embeddings.LayerNorm"),
        "pooler": lin("pooler.dense"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        attn_out = lin(f"{p}.attention.output.dense")
        # DenseGeneral with axis=(-2,-1): kernel [heads, head_dim, out].
        attn_out["kernel"] = attn_out["kernel"].reshape(nh, hd, H)
        if config.fused_qkv:
            attention = {"qkv": fused_qkv(p), "out": attn_out}
        else:
            attention = {
                "query": qkv(f"{p}.attention.self.query"),
                "key": qkv(f"{p}.attention.self.key"),
                "value": qkv(f"{p}.attention.self.value"),
                "out": attn_out,
            }
        params[f"layer_{i}"] = {
            "attention": attention,
            "attention_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params


def _interpolate_vit_pos_embed(pos: np.ndarray, target_tokens: int
                               ) -> np.ndarray:
    """Resize a ViT pos_embed [1, 1+N, D] to a new grid (timm's bicubic
    interpolation for fine-tuning at a different resolution; the CLS
    position is kept as-is)."""
    n = pos.shape[1] - 1
    if n + 1 == target_tokens:
        return pos
    import jax
    import jax.numpy as jnp
    g_old = int(round(n ** 0.5))
    g_new = int(round((target_tokens - 1) ** 0.5))
    grid = pos[0, 1:].reshape(g_old, g_old, -1)
    resized = jax.image.resize(jnp.asarray(grid),
                               (g_new, g_new, grid.shape[-1]), "bicubic")
    return np.concatenate(
        [pos[:, :1],
         np.asarray(resized).reshape(1, g_new * g_new, -1)], axis=1)


def vit_params_from_timm(state_dict: Mapping[str, "np.ndarray"],
                         config) -> Dict:
    """timm vit_*_patch16 state_dict -> params for ``models.vit.ViT``.

    Layouts: patch conv OIHW -> HWIO; packed qkv [3D, D] -> DenseGeneral
    [D, 3, heads, head_dim]; attn.proj [D, D] -> [heads, head_dim, D].
    The classifier head (stripped by reset_classifier(0)) is ignored.
    If ``config.resolution`` differs from the checkpoint's grid, the
    position embedding is bicubic-interpolated (timm's fine-tune recipe).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    D = config.hidden_size
    nh = config.num_heads
    hd = D // nh
    target_tokens = (config.resolution // config.patch_size) ** 2 + 1
    sd["pos_embed"] = _interpolate_vit_pos_embed(sd["pos_embed"],
                                                 target_tokens)

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params: Dict = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"]},
        "norm": ln("norm"),
    }
    for i in range(config.num_layers):
        b = f"blocks.{i}"
        qkv_w = sd[f"{b}.attn.qkv.weight"]        # [3D, D], rows q;k;v
        qkv_b = sd[f"{b}.attn.qkv.bias"]
        proj_w = sd[f"{b}.attn.proj.weight"]      # [D, D] out,in
        params[f"block_{i}"] = {
            "norm1": ln(f"{b}.norm1"),
            "qkv": {"kernel": qkv_w.reshape(3, nh, hd, D)
                    .transpose(3, 0, 1, 2),
                    "bias": qkv_b.reshape(3, nh, hd)},
            "proj": {"kernel": proj_w.T.reshape(nh, hd, D),
                     "bias": sd[f"{b}.attn.proj.bias"]},
            "norm2": ln(f"{b}.norm2"),
            "fc1": lin(f"{b}.mlp.fc1"),
            "fc2": lin(f"{b}.mlp.fc2"),
        }
    return params


def convnext_params_from_timm(state_dict: Mapping[str, "np.ndarray"],
                              config) -> Dict:
    """timm convnext_* state_dict -> params for ``models.convnext.ConvNeXt``.

    Layouts: conv kernels OIHW -> HWIO (depthwise [C,1,7,7] -> [7,7,1,C]);
    Linear [out, in] -> [in, out]; LayerNorm weight -> scale. Accepts both
    timm's block naming (conv_dw / norm / mlp.fc1 / mlp.fc2 / gamma) and the
    original FB repo's (dwconv / norm / pwconv1 / pwconv2 / gamma,
    downsample_layers.{i}); the stripped classifier (head.fc) is ignored.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}

    def get(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    def conv(*prefixes):
        # depthwise [C,1,7,7] -> [7,7,1,C] coincides with OIHW -> HWIO
        w = get(*(f"{p}.weight" for p in prefixes))
        return {"kernel": w.transpose(2, 3, 1, 0),
                "bias": get(*(f"{p}.bias" for p in prefixes))}

    def lin(*prefixes):
        return {"kernel": get(*(f"{p}.weight" for p in prefixes)).T,
                "bias": get(*(f"{p}.bias" for p in prefixes))}

    def ln(*prefixes):
        return {"scale": get(*(f"{p}.weight" for p in prefixes)),
                "bias": get(*(f"{p}.bias" for p in prefixes))}

    params: Dict = {
        "stem_conv": conv("stem.0", "downsample_layers.0.0"),
        "stem_norm": ln("stem.1", "downsample_layers.0.1"),
        "head_norm": ln("head.norm", "norm"),
    }
    for s, depth in enumerate(config.depths):
        if s > 0:
            params[f"downsample_norm_{s}"] = ln(
                f"stages.{s}.downsample.0", f"downsample_layers.{s}.0")
            params[f"downsample_conv_{s}"] = conv(
                f"stages.{s}.downsample.1", f"downsample_layers.{s}.1")
        for b in range(depth):
            t, t_fb = f"stages.{s}.blocks.{b}", f"stages.{s}.{b}"
            block = {
                "conv_dw": conv(f"{t}.conv_dw", f"{t_fb}.dwconv"),
                "norm": ln(f"{t}.norm", f"{t_fb}.norm"),
                "fc1": lin(f"{t}.mlp.fc1", f"{t_fb}.pwconv1"),
                "fc2": lin(f"{t}.mlp.fc2", f"{t_fb}.pwconv2"),
            }
            if config.ls_init:
                block["gamma"] = get(f"{t}.gamma", f"{t_fb}.gamma")
            params[f"stage_{s}_block_{b}"] = block
    return params


def efficientnet_params_from_timm(state_dict: Mapping[str, "np.ndarray"],
                                  config: EfficientNetConfig):
    """timm EfficientNet state_dict -> (params, batch_stats) for
    ``models.efficientnet.EfficientNet``.

    Layout changes: conv kernels OIHW -> HWIO; depthwise [C,1,k,k] ->
    [k,k,1,C]. timm block naming — stage-0 DepthwiseSeparableConv uses
    conv_dw/bn1/se/conv_pw/bn2; InvertedResidual uses
    conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3 — matches our module names 1:1.
    The classifier (stripped by the reference via reset_classifier(0),
    image_emb.py:20) is ignored if present.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(prefix, depthwise=False):
        # one permutation covers both: OIHW -> HWIO, and the depthwise
        # [C,1,k,k] -> [k,k,1,C] case is the SAME transpose(2, 3, 1, 0)
        del depthwise
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    def conv_b(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"{prefix}.bias"]}

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"],
                 "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    params, stats = {}, {}

    def put_bn(tree_p, tree_s, name, prefix):
        p, s = bn(prefix)
        tree_p[name] = p
        tree_s[name] = s

    params["conv_stem"] = conv("conv_stem")
    put_bn(params, stats, "bn1", "bn1")

    per_stage = [round_repeats(r, config.depth_mult)
                 for (_, _, r, _, _) in config.stages]
    for s_i, n_blocks in enumerate(per_stage):
        expand = config.stages[s_i][0]
        for b_i in range(n_blocks):
            t = f"blocks.{s_i}.{b_i}"
            bp, bs = {}, {}
            if expand == 1:
                bp["conv_dw"] = conv(f"{t}.conv_dw", depthwise=True)
                put_bn(bp, bs, "bn1", f"{t}.bn1")
                bp["se"] = {"conv_reduce": conv_b(f"{t}.se.conv_reduce"),
                            "conv_expand": conv_b(f"{t}.se.conv_expand")}
                bp["conv_pw"] = conv(f"{t}.conv_pw")
                put_bn(bp, bs, "bn2", f"{t}.bn2")
            else:
                bp["conv_pw"] = conv(f"{t}.conv_pw")
                put_bn(bp, bs, "bn1", f"{t}.bn1")
                bp["conv_dw"] = conv(f"{t}.conv_dw", depthwise=True)
                put_bn(bp, bs, "bn2", f"{t}.bn2")
                bp["se"] = {"conv_reduce": conv_b(f"{t}.se.conv_reduce"),
                            "conv_expand": conv_b(f"{t}.se.conv_expand")}
                bp["conv_pwl"] = conv(f"{t}.conv_pwl")
                put_bn(bp, bs, "bn3", f"{t}.bn3")
            params[f"blocks_{s_i}_{b_i}"] = bp
            stats[f"blocks_{s_i}_{b_i}"] = bs

    params["conv_head"] = conv("conv_head")
    put_bn(params, stats, "bn2", "bn2")
    return params, stats
