"""int8 quantized text encoder: cosine fidelity vs fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import BertConfig as HFBertConfig, BertModel

from multimodalsimilar_tpu.models.bert import BertConfig, BertEncoderModel
from multimodalsimilar_tpu.models.hf_import import bert_params_from_torch
from multimodalsimilar_tpu.models.quant import (
    QuantBertEncoderModel, quantize_bert_params)
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


def test_quantized_encoder_cosine_fidelity():
    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    params = bert_params_from_torch(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)

    ref = BertEncoderModel(cfg, DTypePolicy.full_precision()).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    qparams = quantize_bert_params(params)
    got = QuantBertEncoderModel(cfg).apply(
        {"params": qparams}, jnp.asarray(ids), jnp.asarray(mask))

    a = np.asarray(got["pooler_output"], np.float32)
    b = np.asarray(ref["pooler_output"], np.float32)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1))
    # int8 PTQ target: inside the 1e-3 cosine parity budget on this model
    assert cos.min() > 1 - 1e-3, cos


def test_quantized_encoder_jits():
    cfg = BertConfig.tiny()
    model = BertEncoderModel(cfg, DTypePolicy.full_precision())
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab_size, size=(4, 12)).astype(np.int32))
    params = model.init(jax.random.key(0), ids)["params"]
    qparams = quantize_bert_params(jax.device_get(params))
    qmodel = QuantBertEncoderModel(cfg)
    f = jax.jit(lambda p, i: qmodel.apply({"params": p}, i))
    out = f(qparams, ids)
    assert out["pooler_output"].shape == (4, cfg.hidden_size)


def test_quantize_unfuses_fused_qkv_checkpoints():
    """A fused-qkv float checkpoint must quantize into the unfused
    query/key/value modules _QuantAttention instantiates (the dead 'qkv'
    subtree raised ScopeParamNotFoundError at apply) — and match the
    unfused quantization of the same weights numerically."""
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.bert import (BertConfig,
                                                   BertEncoderModel)
    from multimodalsimilar_tpu.models.quant import (QuantBertEncoderModel,
                                                    quantize_bert_params)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    pol = DTypePolicy.full_precision()
    cfg_f = BertConfig.tiny(fused_qkv=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        1, 64, size=(2, 8)), jnp.int32)
    pf = jax.jit(lambda i: BertEncoderModel(cfg_f, pol).init(
        {"params": jax.random.key(0)}, i))(ids)["params"]
    qp = quantize_bert_params(pf)
    assert "qkv" not in qp["layer_0"]["attention"]
    cfg_u = BertConfig.tiny()
    out = QuantBertEncoderModel(cfg_u, pol).apply(
        {"params": qp}, ids)
    assert np.isfinite(np.asarray(out["pooler_output"])).all()
