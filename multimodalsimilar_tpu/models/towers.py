"""Embedding towers: text (CLS / masked-mean pooled) over the Flax BERT stack.

TextTower(pool='cls')  == TransformerEmb  (transformer_emb.py:15-30): the
    encoder's tanh pooler output. The reference's emb_layer/bn_layer are dead
    weights (created, never called — transformer_emb.py:12-13) and are not
    reproduced.
TextTower(pool='mean') == TransformerSeqEmb (transformer_seq_emb.py:15-32):
    dropout on the sequence, multiply by the attention mask, sum / sum(mask).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from multimodalsimilar_tpu.models.bert import BertConfig, BertEncoderModel
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


def masked_mean_pool(last_hidden_state, input_ids, attention_mask,
                     reduce_dtype):
    """Masked mean over the sequence axis — the reference's
    TransformerSeqEmb pooling with the broadcast bug fixed
    (transformer_seq_emb.py:24-32; SURVEY.md §7). ONE copy shared by
    TextTower (mean path) and the int8 QuantTextEmbModel so the serving
    paths can't drift."""
    h = last_hidden_state.astype(reduce_dtype)
    if attention_mask is None:
        attention_mask = jnp.ones(input_ids.shape, jnp.int32)
    mask = attention_mask.astype(h.dtype)[:, :, None]
    total = jnp.sum(h * mask, axis=1)
    denom = jnp.sum(attention_mask.astype(h.dtype), axis=1, keepdims=True)
    return total / denom


class TextTower(nn.Module):
    config: BertConfig
    pool: str = "cls"           # 'cls' | 'mean'
    dropout: float = 0.1        # only used by the 'mean' path, as in the ref
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic: bool = True):
        out = BertEncoderModel(self.config, self.policy, name="encoder")(
            input_ids, attention_mask, token_type_ids, position_ids,
            deterministic=deterministic)
        if self.pool == "cls":
            return out["pooler_output"]
        if self.pool != "mean":
            raise ValueError(f"unknown pool {self.pool!r}")
        h = out["last_hidden_state"].astype(self.policy.reduce_dtype)
        h = nn.Dropout(self.dropout)(h, deterministic)
        return masked_mean_pool(h, input_ids, attention_mask,
                                self.policy.reduce_dtype)
