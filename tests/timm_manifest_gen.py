"""Independent generators for timm checkpoint layout manifests.

timm is not installed in this image (zero egress), but the production
reference depends on exact timm state_dict layouts
(`/root/reference/cv_classifier.py:23` timm.create_model('efficientnet_b4'),
image_emb.py:20 reset_classifier(0)). These generators re-state the PUBLIC
layout rules from the timm source — independently of both
`multimodalsimilar_tpu.models.*` configs and `models.hf_import` — and emit
{state_dict key: shape} manifests that are frozen as JSON under
tests/data/. Tests assert (a) generator == frozen JSON, (b) the
forward-parity torch restatements emit exactly these keys/shapes, and
(c) a manifest-built synthetic state_dict round-trips through
hf_import.*_from_timm onto the exact init tree of our Flax models — so
any drift between importer expectations and the public layout fails.

Layout provenance (all public, stable since timm 0.6.x):
* EfficientNet: timm/models/_efficientnet_blocks.py
  (DepthwiseSeparableConv: conv_dw/bn1/se/conv_pw/bn2; InvertedResidual:
  conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3; SqueezeExcite rd_channels =
  round(in_chs * 0.25) — rd_round_fn defaults to round and se_from_exp
  is False for the efficientnet family), timm/models/_efficientnet_builder.py
  (round_channels divisor 8 / 0.9 floor; repeats = ceil(r * depth_mult)),
  B4 multipliers (w 1.4, d 1.8) from timm/models/efficientnet.py.
* ViT: timm/models/vision_transformer.py (cls_token, pos_embed [1, N+1, D],
  patch_embed.proj conv, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,
  mlp.fc1,mlp.fc2}, final norm; vit_small_patch16_224: D=384, 12 layers,
  6 heads, mlp 1536).
* ConvNeXt: timm/models/convnext.py (stem.0 conv4x4/s4 + stem.1 LN,
  stages.{s}.downsample.{0 LN,1 conv2x2/s2} for s>=1,
  stages.{s}.blocks.{b}.{conv_dw 7x7 dw + bias, norm, mlp.fc1, mlp.fc2,
  gamma}, head.norm kept by reset_classifier(0); convnext_tiny:
  depths (3,3,9,3), dims (96,192,384,768)).

The classifier head (stripped by the reference's reset_classifier(0)) and
EMA/aux buffers are excluded; BatchNorm num_batches_tracked buffers are
included (scalar shape []) because real checkpoints carry them.
"""

import math


def _make_divisible(v, divisor=8, round_limit=0.9):
    new = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new < round_limit * v:
        new += divisor
    return new


def efficientnet_b4_manifest():
    width, depth = 1.4, 1.8
    # (expand, base_channels, base_repeats, stride, kernel) — B0 table
    stages = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
              (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
              (6, 320, 1, 1, 3)]
    m = {}

    def bn(prefix, c):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            m[f"{prefix}.{suffix}"] = [c]
        m[f"{prefix}.num_batches_tracked"] = []

    stem = _make_divisible(32 * width)
    m["conv_stem.weight"] = [stem, 3, 3, 3]
    bn("bn1", stem)
    in_c = stem
    for s_i, (exp, c, r, _, k) in enumerate(stages):
        out = _make_divisible(c * width)
        for b_i in range(int(math.ceil(r * depth))):
            t = f"blocks.{s_i}.{b_i}"
            se = max(1, int(round(in_c * 0.25)))
            if exp == 1:            # DepthwiseSeparableConv
                m[f"{t}.conv_dw.weight"] = [in_c, 1, k, k]
                bn(f"{t}.bn1", in_c)
                m[f"{t}.se.conv_reduce.weight"] = [se, in_c, 1, 1]
                m[f"{t}.se.conv_reduce.bias"] = [se]
                m[f"{t}.se.conv_expand.weight"] = [in_c, se, 1, 1]
                m[f"{t}.se.conv_expand.bias"] = [in_c]
                m[f"{t}.conv_pw.weight"] = [out, in_c, 1, 1]
                bn(f"{t}.bn2", out)
            else:                   # InvertedResidual
                mid = in_c * exp
                m[f"{t}.conv_pw.weight"] = [mid, in_c, 1, 1]
                bn(f"{t}.bn1", mid)
                m[f"{t}.conv_dw.weight"] = [mid, 1, k, k]
                bn(f"{t}.bn2", mid)
                m[f"{t}.se.conv_reduce.weight"] = [se, mid, 1, 1]
                m[f"{t}.se.conv_reduce.bias"] = [se]
                m[f"{t}.se.conv_expand.weight"] = [mid, se, 1, 1]
                m[f"{t}.se.conv_expand.bias"] = [mid]
                m[f"{t}.conv_pwl.weight"] = [out, mid, 1, 1]
                bn(f"{t}.bn3", out)
            in_c = out
    head = _make_divisible(1280 * width)
    m["conv_head.weight"] = [head, in_c, 1, 1]
    bn("bn2", head)
    return m


def vit_small_patch16_224_manifest():
    d, mlp, layers, patch, res = 384, 1536, 12, 16, 224
    n = (res // patch) ** 2
    m = {
        "cls_token": [1, 1, d],
        "pos_embed": [1, n + 1, d],
        "patch_embed.proj.weight": [d, 3, patch, patch],
        "patch_embed.proj.bias": [d],
        "norm.weight": [d],
        "norm.bias": [d],
    }
    for i in range(layers):
        b = f"blocks.{i}"
        m.update({
            f"{b}.norm1.weight": [d], f"{b}.norm1.bias": [d],
            f"{b}.attn.qkv.weight": [3 * d, d],
            f"{b}.attn.qkv.bias": [3 * d],
            f"{b}.attn.proj.weight": [d, d],
            f"{b}.attn.proj.bias": [d],
            f"{b}.norm2.weight": [d], f"{b}.norm2.bias": [d],
            f"{b}.mlp.fc1.weight": [mlp, d], f"{b}.mlp.fc1.bias": [mlp],
            f"{b}.mlp.fc2.weight": [d, mlp], f"{b}.mlp.fc2.bias": [d],
        })
    return m


def convnext_tiny_manifest():
    depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
    m = {
        "stem.0.weight": [dims[0], 3, 4, 4],
        "stem.0.bias": [dims[0]],
        "stem.1.weight": [dims[0]],
        "stem.1.bias": [dims[0]],
        "head.norm.weight": [dims[-1]],
        "head.norm.bias": [dims[-1]],
    }
    for s in range(len(depths)):
        c = dims[s]
        if s > 0:
            m[f"stages.{s}.downsample.0.weight"] = [dims[s - 1]]
            m[f"stages.{s}.downsample.0.bias"] = [dims[s - 1]]
            m[f"stages.{s}.downsample.1.weight"] = [c, dims[s - 1], 2, 2]
            m[f"stages.{s}.downsample.1.bias"] = [c]
        for b in range(depths[s]):
            t = f"stages.{s}.blocks.{b}"
            m.update({
                f"{t}.conv_dw.weight": [c, 1, 7, 7],
                f"{t}.conv_dw.bias": [c],
                f"{t}.norm.weight": [c], f"{t}.norm.bias": [c],
                f"{t}.mlp.fc1.weight": [4 * c, c],
                f"{t}.mlp.fc1.bias": [4 * c],
                f"{t}.mlp.fc2.weight": [c, 4 * c],
                f"{t}.mlp.fc2.bias": [c],
                f"{t}.gamma": [c],
            })
    return m


MANIFESTS = {
    "efficientnet_b4": efficientnet_b4_manifest,
    "vit_small_patch16_224": vit_small_patch16_224_manifest,
    "convnext_tiny": convnext_tiny_manifest,
}


if __name__ == "__main__":
    import json
    import os
    out_dir = os.path.join(os.path.dirname(__file__), "data")
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in MANIFESTS.items():
        path = os.path.join(out_dir, f"timm_manifest_{name}.json")
        with open(path, "w") as f:
            json.dump(fn(), f, indent=1, sort_keys=True)
        print(f"wrote {path}")
