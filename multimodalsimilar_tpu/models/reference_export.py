"""Export Flax params BACK to reference-layout torch state_dicts.

The inverse of ``reference_import``: a model trained here can be loaded by
the reference's own modules (``load_state_dict(strict=True)`` on
NlpClassifier / NlpClassifierMultilabel / NlpSentenceTransformer /
CvClassifier, /root/reference) and served by its unmodified inference
scripts — the two-way interchange a production migration needs.

Details that make strict loading work:

* The reference's text models register the SAME BertModel twice (``ptm`` and
  ``emb_layer.ptm``, nlp_classifier.py:9,14) — torch emits both key aliases,
  so we do too.
* TransformerEmb carries dead weights (``emb_layer``: Linear(hidden, 128),
  ``bn_layer``: BatchNorm1d(hidden) — created and never called,
  transformer_emb.py:12-13). They are emitted with fresh defaults (zeros /
  BN identity) purely to satisfy strict loading; they do not affect any
  forward.
* BatchNorm buffers include ``num_batches_tracked`` (int64 zero).

Values are numpy arrays; wrap with ``torch.from_numpy`` (or pass through —
``load_state_dict`` accepts tensors built from them) before loading.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.efficientnet import (
    EfficientNetConfig, round_repeats)


def _np32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def bert_params_to_torch(params: Mapping, config: BertConfig,
                         prefix: str = "",
                         include_position_ids: bool = False
                         ) -> Dict[str, np.ndarray]:
    """Inverse of hf_import.bert_params_from_torch (unfused layout).

    ``include_position_ids=True`` also emits the
    ``embeddings.position_ids`` arange buffer — transformers < 4.31 kept
    it as a persistent buffer, so strict loading into a BertModel from
    that era (the reference's vintage) needs the key; newer versions
    would reject it as unexpected, hence the flag.
    """
    H = config.hidden_size
    nh = config.num_heads
    hd = H // nh
    p = params
    out: Dict[str, np.ndarray] = {}

    def put_lin(name, tree):
        out[f"{prefix}{name}.weight"] = _np32(tree["kernel"]).T
        out[f"{prefix}{name}.bias"] = _np32(tree["bias"])

    def put_ln(name, tree):
        out[f"{prefix}{name}.weight"] = _np32(tree["scale"])
        out[f"{prefix}{name}.bias"] = _np32(tree["bias"])

    if include_position_ids:
        out[f"{prefix}embeddings.position_ids"] = np.arange(
            config.max_position_embeddings, dtype=np.int64)[None]
    out[f"{prefix}embeddings.word_embeddings.weight"] = _np32(
        p["word_embeddings"]["embedding"])
    out[f"{prefix}embeddings.position_embeddings.weight"] = _np32(
        p["position_embeddings"]["embedding"])
    out[f"{prefix}embeddings.token_type_embeddings.weight"] = _np32(
        p["token_type_embeddings"]["embedding"])
    put_ln("embeddings.LayerNorm", p["embeddings_norm"])
    for i in range(config.num_layers):
        t = f"encoder.layer.{i}"
        lp = p[f"layer_{i}"]
        attn = lp["attention"]
        if "qkv" in attn:      # fused layout: kernel [H, 3, nh, hd]
            kq = _np32(attn["qkv"]["kernel"])     # [H, 3, nh, hd]
            bq = _np32(attn["qkv"]["bias"])       # [3, nh, hd]
            for j, name in enumerate(("query", "key", "value")):
                out[f"{prefix}{t}.attention.self.{name}.weight"] = (
                    kq[:, j].reshape(H, H).T)
                out[f"{prefix}{t}.attention.self.{name}.bias"] = (
                    bq[j].reshape(H))
        else:
            for name in ("query", "key", "value"):
                out[f"{prefix}{t}.attention.self.{name}.weight"] = _np32(
                    attn[name]["kernel"]).reshape(H, H).T
                out[f"{prefix}{t}.attention.self.{name}.bias"] = _np32(
                    attn[name]["bias"]).reshape(H)
        out[f"{prefix}{t}.attention.output.dense.weight"] = _np32(
            attn["out"]["kernel"]).reshape(nh * hd, H).T
        out[f"{prefix}{t}.attention.output.dense.bias"] = _np32(
            attn["out"]["bias"])
        put_ln(f"{t}.attention.output.LayerNorm", lp["attention_norm"])
        put_lin(f"{t}.intermediate.dense", lp["intermediate"])
        put_lin(f"{t}.output.dense", lp["output"])
        put_ln(f"{t}.output.LayerNorm", lp["output_norm"])
    put_lin("pooler.dense", p["pooler"])
    return out


def _dead_transformer_emb_weights(config: BertConfig, emb_size: int = 128,
                                  prefix: str = "emb_layer."
                                  ) -> Dict[str, np.ndarray]:
    """TransformerEmb's never-used emb_layer/bn_layer (transformer_emb.py
    :12-13) — defaults only, required for strict state_dict loading."""
    H = config.hidden_size
    return {
        f"{prefix}emb_layer.weight": np.zeros((emb_size, H), np.float32),
        f"{prefix}emb_layer.bias": np.zeros((emb_size,), np.float32),
        f"{prefix}bn_layer.weight": np.ones((H,), np.float32),
        f"{prefix}bn_layer.bias": np.zeros((H,), np.float32),
        f"{prefix}bn_layer.running_mean": np.zeros((H,), np.float32),
        f"{prefix}bn_layer.running_var": np.ones((H,), np.float32),
        f"{prefix}bn_layer.num_batches_tracked": np.zeros((), np.int64),
    }


def _text_common(params: Mapping, config: BertConfig
                 ) -> Dict[str, np.ndarray]:
    bert = bert_params_to_torch(params["tower"]["encoder"], config)
    out = {}
    for k, v in bert.items():
        out[f"ptm.{k}"] = v
        out[f"emb_layer.ptm.{k}"] = v      # shared-module alias
    out.update(_dead_transformer_emb_weights(config))
    return out


def nlp_classifier_to_reference(params: Mapping, config: BertConfig
                                ) -> Dict[str, np.ndarray]:
    """NlpTextClassifier params -> reference NlpClassifier state_dict."""
    out = _text_common(params, config)
    out["classifier.weight"] = _np32(params["head"]["weight"])
    return out


def multilabel_classifier_to_reference(params: Mapping, config: BertConfig
                                       ) -> Dict[str, np.ndarray]:
    out = _text_common(params, config)
    out["firstcate_classifier.weight"] = _np32(
        params["lv1_head"]["weight"])
    out["secondcate_classifier.weight"] = _np32(
        params["lv2_head"]["weight"])
    out["tag_classifier.weight"] = _np32(params["tag_head"]["weight"])
    return out


def siamese_to_reference(params: Mapping, config: BertConfig
                         ) -> Dict[str, np.ndarray]:
    out = _text_common(params, config)
    out["classifier.weight"] = _np32(params["classifier"]["kernel"]).T
    out["classifier.bias"] = _np32(params["classifier"]["bias"])
    return out


def efficientnet_params_to_timm(params: Mapping, stats: Mapping,
                                config: EfficientNetConfig,
                                prefix: str = ""
                                ) -> Dict[str, np.ndarray]:
    """Inverse of hf_import.efficientnet_params_from_timm."""
    out: Dict[str, np.ndarray] = {}

    def put_conv(name, tree):
        # one transpose covers both layouts: HWIO -> OIHW and the depthwise
        # [k,k,1,C] -> [C,1,k,k] are the same axis permutation
        out[f"{prefix}{name}.weight"] = _np32(
            tree["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in tree:
            out[f"{prefix}{name}.bias"] = _np32(tree["bias"])

    def put_bn(name, ptree, stree):
        out[f"{prefix}{name}.weight"] = _np32(ptree["scale"])
        out[f"{prefix}{name}.bias"] = _np32(ptree["bias"])
        out[f"{prefix}{name}.running_mean"] = _np32(stree["mean"])
        out[f"{prefix}{name}.running_var"] = _np32(stree["var"])
        out[f"{prefix}{name}.num_batches_tracked"] = np.zeros((), np.int64)

    put_conv("conv_stem", params["conv_stem"])
    put_bn("bn1", params["bn1"], stats["bn1"])
    per_stage = [round_repeats(r, config.depth_mult)
                 for (_, _, r, _, _) in config.stages]
    for s_i, n_blocks in enumerate(per_stage):
        expand = config.stages[s_i][0]
        for b_i in range(n_blocks):
            t = f"blocks.{s_i}.{b_i}"
            bp = params[f"blocks_{s_i}_{b_i}"]
            bs = stats[f"blocks_{s_i}_{b_i}"]
            if expand == 1:
                put_conv(f"{t}.conv_dw", bp["conv_dw"])
                put_bn(f"{t}.bn1", bp["bn1"], bs["bn1"])
                put_conv(f"{t}.se.conv_reduce", bp["se"]["conv_reduce"])
                put_conv(f"{t}.se.conv_expand", bp["se"]["conv_expand"])
                put_conv(f"{t}.conv_pw", bp["conv_pw"])
                put_bn(f"{t}.bn2", bp["bn2"], bs["bn2"])
            else:
                put_conv(f"{t}.conv_pw", bp["conv_pw"])
                put_bn(f"{t}.bn1", bp["bn1"], bs["bn1"])
                put_conv(f"{t}.conv_dw", bp["conv_dw"])
                put_bn(f"{t}.bn2", bp["bn2"], bs["bn2"])
                put_conv(f"{t}.se.conv_reduce", bp["se"]["conv_reduce"])
                put_conv(f"{t}.se.conv_expand", bp["se"]["conv_expand"])
                put_conv(f"{t}.conv_pwl", bp["conv_pwl"])
                put_bn(f"{t}.bn3", bp["bn3"], bs["bn3"])
    put_conv("conv_head", params["conv_head"])
    put_bn("bn2", params["bn2"], stats["bn2"])
    return out


def cv_classifier_to_reference(params: Mapping, stats: Mapping,
                               config: EfficientNetConfig,
                               use_fc: bool = True
                               ) -> Dict[str, np.ndarray]:
    """CvImageClassifier params -> reference CvClassifier state_dict."""
    out = efficientnet_params_to_timm(params["backbone"],
                                      stats["backbone"], config,
                                      prefix="backbone.")
    if use_fc:
        out["fc.weight"] = _np32(params["fc"]["kernel"]).T
        out["fc.bias"] = _np32(params["fc"]["bias"])
        out["bn.weight"] = _np32(params["bn"]["scale"])
        out["bn.bias"] = _np32(params["bn"]["bias"])
        out["bn.running_mean"] = _np32(stats["bn"]["mean"])
        out["bn.running_var"] = _np32(stats["bn"]["var"])
        out["bn.num_batches_tracked"] = np.zeros((), np.int64)
    out["classifier.weight"] = _np32(params["head"]["weight"])
    return out


def multimodal_to_reference(params: Mapping, stats: Mapping,
                            text_config: BertConfig,
                            image_config: EfficientNetConfig
                            ) -> Dict[str, np.ndarray]:
    """MultimodalClassifier params -> reference MultimodalClassifier
    state_dict (cv.* = full CvClassifier, nlp.* = full NlpClassifier,
    classifier.weight = fused ArcFace — multimodal_classifier.py:16-22
    loads whole pickled sub-models, so both sub-heads are present)."""
    out: Dict[str, np.ndarray] = {}

    def with_default_head(sub: Mapping, dim: int) -> Mapping:
        # Sub-model ArcFace heads are dead weights in the fused model —
        # only predict_emb runs (multimodal_classifier.py:50-53) — so a
        # checkpoint trained BY THIS framework never materializes them
        # (flax init only creates called modules). Export defaults (zeros,
        # like the dead TransformerEmb weights) sized to the model's
        # default sub-head class count so strict loading and re-import
        # both shape-check.
        if "head" in sub:
            return sub
        sub = dict(sub)
        sub["head"] = {"weight": np.zeros((2, dim), np.float32)}
        return sub

    cv_p = params["cv"]
    cv_dim = (np.asarray(cv_p["fc"]["kernel"]).shape[1] if "fc" in cv_p
              else image_config.num_features)
    cv = cv_classifier_to_reference(with_default_head(cv_p, cv_dim),
                                    stats["cv"], image_config)
    for k, v in cv.items():
        out[f"cv.{k}"] = v
    nlp = nlp_classifier_to_reference(
        with_default_head(params["nlp"], text_config.hidden_size),
        text_config)
    for k, v in nlp.items():
        out[f"nlp.{k}"] = v
    out["classifier.weight"] = _np32(params["head"]["weight"])
    return out
