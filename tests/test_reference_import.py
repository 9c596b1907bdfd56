"""Reference-checkpoint importers: embedding + logit parity vs torch modules
re-stating the reference's exact task-model structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn_t
import torch.nn.functional as F
from transformers import BertConfig as HFBertConfig, BertModel

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
from multimodalsimilar_tpu.models.reference_import import (
    cv_classifier_from_reference, nlp_classifier_from_reference)
from multimodalsimilar_tpu.models.vision import CvImageClassifier
from multimodalsimilar_tpu.ops.arcface import cosine_logits
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

FP32 = DTypePolicy.full_precision()


def test_nlp_classifier_import_parity():
    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")

    # the reference's NlpClassifier layout: ptm + classifier (ArcFace weight)
    class TorchNlpClassifier(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.ptm = BertModel(hf_cfg)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(10, cfg.hidden_size))

    torch.manual_seed(0)
    ref = TorchNlpClassifier().eval()
    params = nlp_classifier_from_reference(ref.state_dict(), cfg)
    model = NlpTextClassifier(cfg, num_labels=10, policy=FP32)

    ids = np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=(3, 10)).astype(np.int32)
    mask = np.ones((3, 10), np.int32)
    with torch.no_grad():
        want_emb = ref.ptm(torch.from_numpy(ids).long(),
                           attention_mask=torch.from_numpy(mask).long()
                           ).pooler_output
        want_logits = F.linear(F.normalize(want_emb),
                               F.normalize(ref.classifier.weight)).numpy()
    got_emb = model.apply({"params": params}, jnp.asarray(ids),
                          jnp.asarray(mask), method=model.predict_emb)
    got_logits = model.apply({"params": params}, jnp.asarray(ids),
                             jnp.asarray(mask), is_test=True)
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               rtol=1e-4, atol=1e-4)


def test_cv_classifier_import_parity():
    from tests.test_efficientnet import TorchEffNet
    ecfg = EfficientNetConfig(
        stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
        stem_channels=8, head_channels=32, drop_path_rate=0.0)

    class TorchCv(nn_t.Module):
        """cv_classifier.py structure: backbone + GAP + fc/bn + ArcFace."""

        def __init__(self):
            super().__init__()
            self.backbone = TorchEffNet(ecfg)
            self.fc = nn_t.Linear(ecfg.num_features, 12)
            self.bn = nn_t.BatchNorm1d(12)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(torch.randn(5, 12))

        def predict_emb(self, x):
            h = self.backbone(x).mean((2, 3))
            return self.bn(self.fc(h))

    torch.manual_seed(1)
    ref = TorchCv().eval()
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, (nn_t.BatchNorm2d, nn_t.BatchNorm1d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
    params, stats = cv_classifier_from_reference(ref.state_dict(), ecfg)
    model = CvImageClassifier(ecfg, num_labels=5, fc_dim=12, policy=FP32)

    x = np.random.default_rng(1).normal(size=(2, 3, 24, 24)).astype(
        np.float32)
    with torch.no_grad():
        want = ref.predict_emb(torch.from_numpy(x)).numpy()
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      method=model.predict_emb)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
