"""Task models: tower + ArcFace head(s), Siamese pairs.

Each mirrors a reference task model's contract — ``__call__`` with labels
returns margin logits (training) or cosine logits (``is_test=True``), and
``predict_emb`` exposes the raw embedding used by retrieval:

* NlpTextClassifier        <- nlp_classifier.py:6-42
* NlpMultilabelClassifier  <- nlp_classifier_multilabel.py:6-49
  (shared tower; per-level heads with margins lv1 0.4 / lv2 0.2 / tag 0.1)
* SiamesePairModel         <- nlp_sentence_transformer.py:6-52
  (shared tower; Linear([u; v; |u-v|]) -> 2 similar/dissimilar logits)

The image and fused-multimodal classifiers live in
``multimodalsimilar_tpu.models.vision`` / ``.multimodal`` (they depend on the
EfficientNet backbone).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.heads import ArcFaceHead
from multimodalsimilar_tpu.models.towers import TextTower
from multimodalsimilar_tpu.ops.arcface import ArcFaceParams
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


class NlpTextClassifier(nn.Module):
    """Text tower + single ArcFace head (nlp_classifier.py).

    ``pool='cls'`` = TransformerEmb pooler semantics (the reference default);
    ``pool='mean'`` = TransformerSeqEmb masked-mean semantics."""

    config: BertConfig
    num_labels: int
    arcface: ArcFaceParams = ArcFaceParams()   # s=64, m=0.40 (arcface.py:18)
    use_fused_head: bool = False
    pool: str = "cls"
    policy: DTypePolicy = DTypePolicy()

    def setup(self):
        self.tower = TextTower(self.config, pool=self.pool,
                               policy=self.policy)
        self.head = ArcFaceHead(self.num_labels, self.arcface,
                                self.use_fused_head)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 label=None, is_test: bool = False, m=None,
                 deterministic: bool = True):
        emb = self.tower(input_ids, attention_mask, token_type_ids,
                         deterministic=deterministic)
        return self.head(emb, label, m=m, is_test=is_test)

    def predict_emb(self, input_ids, attention_mask=None, token_type_ids=None,
                    deterministic: bool = True):
        return self.tower(input_ids, attention_mask, token_type_ids,
                          deterministic=deterministic)


class NlpMultilabelClassifier(nn.Module):
    """Shared tower + 3-level hierarchy heads (nlp_classifier_multilabel.py).

    Margins per level follow the reference: lv1 0.4, lv2 0.2, tag 0.1
    (nlp_classifier_multilabel.py:15-17).
    """

    config: BertConfig
    lv1_labels: int
    lv2_labels: int
    tag_labels: int
    lv1_arcface: ArcFaceParams = ArcFaceParams(m=0.4)
    lv2_arcface: ArcFaceParams = ArcFaceParams(m=0.2)
    tag_arcface: ArcFaceParams = ArcFaceParams(m=0.1)
    use_fused_head: bool = False
    policy: DTypePolicy = DTypePolicy()

    def setup(self):
        self.tower = TextTower(self.config, pool="cls", policy=self.policy)
        self.lv1_head = ArcFaceHead(self.lv1_labels, self.lv1_arcface,
                                    self.use_fused_head)
        self.lv2_head = ArcFaceHead(self.lv2_labels, self.lv2_arcface,
                                    self.use_fused_head)
        self.tag_head = ArcFaceHead(self.tag_labels, self.tag_arcface,
                                    self.use_fused_head)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 lv1_label=None, lv2_label=None, tag_label=None,
                 is_test: bool = False, deterministic: bool = True):
        emb = self.tower(input_ids, attention_mask, token_type_ids,
                         deterministic=deterministic)
        return (self.lv1_head(emb, lv1_label, is_test=is_test),
                self.lv2_head(emb, lv2_label, is_test=is_test),
                self.tag_head(emb, tag_label, is_test=is_test))

    def predict_emb(self, input_ids, attention_mask=None, token_type_ids=None,
                    deterministic: bool = True):
        return self.tower(input_ids, attention_mask, token_type_ids,
                          deterministic=deterministic)


class SiamesePairModel(nn.Module):
    """Shared-encoder sentence-pair classifier (nlp_sentence_transformer.py).

    Projection input is [u; v; |u-v|] (nlp_sentence_transformer.py:38-40);
    output is 2 similar/dissimilar logits.
    """

    config: BertConfig
    policy: DTypePolicy = DTypePolicy()

    def setup(self):
        self.tower = TextTower(self.config, pool="cls", policy=self.policy)
        self.classifier = nn.Dense(2, dtype=self.policy.reduce_dtype,
                                   param_dtype=self.policy.param_dtype)

    def __call__(self, query_input_ids, title_input_ids,
                 query_attention_mask=None, query_token_type_ids=None,
                 title_attention_mask=None, title_token_type_ids=None,
                 deterministic: bool = True):
        u = self.tower(query_input_ids, query_attention_mask,
                       query_token_type_ids, deterministic=deterministic)
        v = self.tower(title_input_ids, title_attention_mask,
                       title_token_type_ids, deterministic=deterministic)
        u = u.astype(self.policy.reduce_dtype)
        v = v.astype(self.policy.reduce_dtype)
        feats = jnp.concatenate([u, v, jnp.abs(u - v)], axis=-1)
        return self.classifier(feats)

    def predict_emb(self, input_ids, attention_mask=None, token_type_ids=None,
                    deterministic: bool = True):
        return self.tower(input_ids, attention_mask, token_type_ids,
                          deterministic=deterministic)
