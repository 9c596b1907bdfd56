"""int8 weight + dynamic-activation quantization for embedding inference.

v5e's MXU multiplies int8 at 2x the bf16 rate. This module quantizes the
six Dense projections per layer (QKV, attention out, FFN in/out) to int8
with per-output-channel weight scales and a dynamic per-tensor activation
scale:

    y = (q(x) @ q(W)) * s_x * s_w + b,   q(v) = round(clip(v / s, ±127))

Embeddings, LayerNorm, softmax, and the pooler stay bf16/f32 — they are
bandwidth ops, not MXU ops. Accuracy is validated in tests (cosine distance
of pooled embeddings vs fp32 < 1e-3); production gating should re-check on
real checkpoints (PTQ error depends on weight distribution).

MEASURED (v5e, roberta-base, batch 256 seq 80): 61.3 ms vs 43.2 ms bf16 —
the per-activation round/clip/cast and f32 dequant epilogues cost more than
the int8 matmul saves through this XLA path, so the bf16 inference policy
remains the production default. Kept as a correct, tested baseline for a
future fused Pallas int8 kernel (quantize folded into the matmul epilogue).

``quantize_bert_params`` converts a trained BertEncoderModel param tree;
``QuantBertEncoderModel`` consumes it (same call signature / outputs).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


def _quantize_weight(kernel: np.ndarray):
    """[in, out...] kernel -> (int8 kernel, f32 per-out-channel scale)."""
    k = np.asarray(kernel, np.float32)
    flat = k.reshape(k.shape[0], -1)                  # [in, out_total]
    scale = np.abs(flat).max(axis=0) / 127.0          # per output channel
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(flat / scale), -127, 127).astype(np.int8)
    return q.reshape(k.shape), scale.reshape(k.shape[1:])


def quantize_bert_params(params: Dict) -> Dict:
    """BertEncoderModel params -> QuantBertEncoderModel params.

    Dense kernels inside encoder layers become {kernel_q, scale, bias};
    everything else (embeddings, layernorms, pooler) passes through.
    """
    out = {k: v for k, v in params.items() if not k.startswith("layer_")}
    for name, layer in params.items():
        if not name.startswith("layer_"):
            continue
        ql: Dict = {}
        attn = dict(layer["attention"])
        if "qkv" in attn:
            # unfuse a fused-qkv checkpoint: _QuantAttention only
            # instantiates unfused query/key/value modules (a dead 'qkv'
            # subtree raised ScopeParamNotFoundError at apply). Kernel is
            # [H, 3, heads, head_dim], bias [3, heads, head_dim]
            # (bert.py fused DenseGeneral) — slice per projection.
            fused = attn.pop("qkv")
            k3 = np.asarray(fused["kernel"], np.float32)
            b3 = np.asarray(fused["bias"], np.float32)
            for i, proj in enumerate(("query", "key", "value")):
                attn[proj] = {"kernel": k3[:, i], "bias": b3[i]}
        qattn: Dict = {}
        for proj in ("query", "key", "value"):
            kq, s = _quantize_weight(attn[proj]["kernel"])
            qattn[proj] = {"kernel_q": kq, "scale": s,
                           "bias": attn[proj]["bias"]}
        # attention out kernel is [heads, head_dim, H]; the quant module
        # consumes flattened [heads*head_dim, H]
        out_kernel = np.asarray(attn["out"]["kernel"], np.float32)
        out_kernel = out_kernel.reshape(-1, out_kernel.shape[-1])
        kq, s = _quantize_weight(out_kernel)
        qattn["out"] = {"kernel_q": kq, "scale": s,
                        "bias": attn["out"]["bias"]}
        ql["attention"] = qattn
        for proj in ("intermediate", "output"):
            kq, s = _quantize_weight(layer[proj]["kernel"])
            ql[proj] = {"kernel_q": kq, "scale": s,
                        "bias": layer[proj]["bias"]}
        ql["attention_norm"] = layer["attention_norm"]
        ql["output_norm"] = layer["output_norm"]
        out[name] = ql
    return out


class QuantDense(nn.Module):
    """Dense with int8 kernel + dynamic per-tensor activation scale."""

    features_shape: tuple   # kernel out shape, e.g. (H,) or (heads, hd)
    axis_contract: int = 1  # number of leading kernel dims contracted

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_dim,) + self.features_shape, jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           self.features_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          self.features_shape, jnp.float32)
        x32 = x.astype(jnp.float32)
        s_x = jnp.max(jnp.abs(x32)) / 127.0
        s_x = jnp.maximum(s_x, 1e-8)
        x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
        # int8 x int8 -> int32 on the MXU
        y = jax.lax.dot_general(
            x_q, kernel_q,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s_x * scale + bias
        return y


class _QuantAttention(nn.Module):
    config: BertConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, hidden, mask_bias):
        cfg, pol = self.config, self.policy
        hd = cfg.hidden_size // cfg.num_heads
        q = QuantDense((cfg.num_heads, hd), name="query")(hidden)
        k = QuantDense((cfg.num_heads, hd), name="key")(hidden)
        v = QuantDense((cfg.num_heads, hd), name="value")(hidden)
        scores = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32)) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(pol.compute_dtype)
        ctx = jnp.einsum("bhst,bthd->bshd", probs,
                         v.astype(pol.compute_dtype),
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], -1)
        return QuantDense((cfg.hidden_size,), name="out")(ctx)


class QuantBertEncoderModel(nn.Module):
    """int8-matmul BERT encoder (inference only; same outputs contract)."""

    config: BertConfig
    policy: DTypePolicy = DTypePolicy.inference()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic: bool = True):
        cfg, pol = self.config, self.policy
        B, S = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, S), jnp.int32)
        if position_ids is None:
            position_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
        embed = lambda n, v: nn.Embed(
            v, cfg.hidden_size, param_dtype=pol.param_dtype, name=n)
        h = (embed("word_embeddings", cfg.vocab_size)(input_ids)
             + embed("position_embeddings",
                     cfg.max_position_embeddings)(position_ids)
             + embed("token_type_embeddings",
                     cfg.type_vocab_size)(token_type_ids))
        h = nn.LayerNorm(cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=pol.param_dtype,
                         name="embeddings_norm")(h)
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                              jnp.finfo(jnp.float32).min
                              ).astype(jnp.float32)
        for i in range(cfg.num_layers):
            h = _QuantLayer(cfg, pol, name=f"layer_{i}")(h, mask_bias)
        pooled = nn.Dense(cfg.hidden_size, dtype=jnp.float32,
                          param_dtype=pol.param_dtype, name="pooler")(
            h[:, 0].astype(jnp.float32))
        return {"last_hidden_state": h,
                "pooler_output": jnp.tanh(pooled)}


class QuantTextEmbModel(nn.Module):
    """int8 text tower for serving: QuantBertEncoderModel + the same
    pooling as TextTower (models/towers.py) — drop-in for TextEmbedder's
    ``predict_emb`` contract. CLI: ``embed ... --int8`` / ``similar nlp
    --int8`` (converts a trained float checkpoint on load via
    ``quantize_text_tower_params``)."""

    config: BertConfig
    pool: str = "cls"
    policy: DTypePolicy = DTypePolicy.inference()

    @nn.compact
    def predict_emb(self, input_ids, attention_mask=None,
                    token_type_ids=None, deterministic: bool = True):
        out = QuantBertEncoderModel(self.config, self.policy,
                                    name="encoder")(
            input_ids, attention_mask, token_type_ids)
        if self.pool == "cls":
            return out["pooler_output"]
        if self.pool != "mean":
            raise ValueError(f"unknown pool {self.pool!r}")
        # inference-only module: TextTower's dropout is a no-op here
        from multimodalsimilar_tpu.models.towers import masked_mean_pool
        return masked_mean_pool(out["last_hidden_state"], input_ids,
                                attention_mask, self.policy.reduce_dtype)

    def __call__(self, *args, **kwargs):
        return self.predict_emb(*args, **kwargs)


def quantize_text_tower_params(classifier_params: Dict) -> Dict:
    """NlpTextClassifier params ({tower: {encoder: ...}, head: ...}) ->
    QuantTextEmbModel params ({encoder: quantized}); the ArcFace head is
    dropped (embedding-serving only)."""
    return {"encoder":
            quantize_bert_params(classifier_params["tower"]["encoder"])}


class _QuantLayer(nn.Module):
    config: BertConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, h, mask_bias):
        cfg, pol = self.config, self.policy
        attn = _QuantAttention(cfg, pol, name="attention")(h, mask_bias)
        h = nn.LayerNorm(cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=pol.param_dtype,
                         name="attention_norm")(
            h.astype(jnp.float32) + attn)
        mlp = QuantDense((cfg.intermediate_size,),
                         name="intermediate")(h)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = QuantDense((cfg.hidden_size,), name="output")(mlp)
        h = nn.LayerNorm(cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=pol.param_dtype, name="output_norm")(
            h + mlp)
        return h
