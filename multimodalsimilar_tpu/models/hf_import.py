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
        params[f"layer_{i}"] = {
            "attention": {
                "query": qkv(f"{p}.attention.self.query"),
                "key": qkv(f"{p}.attention.self.key"),
                "value": qkv(f"{p}.attention.self.value"),
                "out": attn_out,
            },
            "attention_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params
