"""Two-stream multimodal fusion classifier.

<- multimodal_classifier.py:14-57: pre-trained CV and NLP towers run on the
same batch; each tower's embedding is L2-normalized and concatenated
(1792 + 768 = 2560-d at reference scale, multimodal_classifier.py:50-56) and
an ArcFace head with m=0.5 (:22) classifies the fused vector.

Unlike the reference — which pickles whole sub-models and runs the two towers
sequentially on one device — both towers live in one jitted program here, so
XLA schedules their (independent) FLOPs back-to-back on the MXU without host
round-trips, and the fusion/normalize math fuses into the surrounding ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
from multimodalsimilar_tpu.models.heads import ArcFaceHead
from multimodalsimilar_tpu.models.vision import CvImageClassifier
from multimodalsimilar_tpu.ops.arcface import ArcFaceParams
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


from multimodalsimilar_tpu.ops.arcface import l2_normalize as _l2  # noqa: E402


class MultimodalClassifier(nn.Module):
    """norm(cv_emb) ++ norm(text_emb) -> ArcFace(m=0.5)."""

    text_config: BertConfig
    # EfficientNetConfig / ViTConfig / ConvNeXtConfig — CvImageClassifier
    # dispatches by type
    image_config: Any
    num_labels: int
    text_num_labels: int = 2       # sub-tower heads exist (loaded from
    image_num_labels: int = 2      # pre-trained classifiers) but only their
    fc_dim: int = 512              # towers run in the fused forward
    arcface: ArcFaceParams = ArcFaceParams(m=0.5)
    use_fused_head: bool = False
    policy: DTypePolicy = DTypePolicy()

    def setup(self):
        self.cv = CvImageClassifier(self.image_config, self.image_num_labels,
                                    fc_dim=self.fc_dim, policy=self.policy)
        self.nlp = NlpTextClassifier(self.text_config, self.text_num_labels,
                                     policy=self.policy)
        self.head = ArcFaceHead(self.num_labels, self.arcface,
                                self.use_fused_head)

    def predict_emb(self, images, input_ids, attention_mask=None,
                    token_type_ids=None, train: bool = False):
        img = self.cv.predict_emb(images, train=train)
        txt = self.nlp.predict_emb(input_ids, attention_mask, token_type_ids,
                                   deterministic=not train)
        img = _l2(img.astype(self.policy.reduce_dtype))
        txt = _l2(txt.astype(self.policy.reduce_dtype))
        return jnp.concatenate([img, txt], axis=-1)

    def __call__(self, images, input_ids, attention_mask=None,
                 token_type_ids=None, label=None, is_test: bool = False,
                 m=None, train: bool = False):
        emb = self.predict_emb(images, input_ids, attention_mask,
                               token_type_ids, train=train)
        return self.head(emb, label, m=m, is_test=is_test)
