"""Round-trip: reference torch module -> Flax params -> reference state_dict.

Uses the ACTUAL reference modules (like tests/test_reference_golden.py):
instantiate with random weights, convert in via reference_import, convert
back out via reference_export, ``load_state_dict(strict=True)`` into a
freshly-initialized reference module, and require its outputs to equal the
original's exactly. Proves a model trained in this framework can be served
by the reference's unmodified code.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn as nn_t
from transformers import BertConfig as HFBertConfig, BertModel

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
from multimodalsimilar_tpu.models.reference_export import (
    cv_classifier_to_reference, multilabel_classifier_to_reference,
    nlp_classifier_to_reference, siamese_to_reference)
from multimodalsimilar_tpu.models.reference_import import (
    cv_classifier_from_reference, multilabel_classifier_from_reference,
    nlp_classifier_from_reference, siamese_from_reference)

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        import nlp_classifier               # noqa: F401
        import nlp_classifier_multilabel    # noqa: F401
        import nlp_sentence_transformer     # noqa: F401
        mods = dict(nlp_classifier=nlp_classifier,
                    nlp_classifier_multilabel=nlp_classifier_multilabel,
                    nlp_sentence_transformer=nlp_sentence_transformer)
    finally:
        sys.path.remove(REFERENCE)
    return mods


@pytest.fixture(scope="module")
def cfgs():
    cfg = BertConfig.tiny()
    hf = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")
    return cfg, hf


def _tensors(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
            sd.items()}


def _inputs(hf_cfg, seed=0, B=3, S=10):
    rng = np.random.default_rng(seed)
    ids = torch.from_numpy(rng.integers(
        0, hf_cfg.vocab_size, size=(B, S)).astype(np.int64))
    mask = torch.ones((B, S), dtype=torch.int64)
    return ids, mask


def _roundtrip(make_module, import_fn, export_fn, forward):
    """original -> import -> export -> strict-load into a fresh module;
    outputs must match the original's exactly (same tensors end-to-end)."""
    torch.manual_seed(0)
    original = make_module().eval()
    params = import_fn(original.state_dict())
    exported = export_fn(params)
    torch.manual_seed(1)                    # different init to overwrite
    fresh = make_module().eval()
    missing, unexpected = fresh.load_state_dict(_tensors(exported),
                                                strict=False)
    # strict up to non-persistent buffers (position_ids in some transformers
    # versions); no key we ship may be rejected and no weight may be missing
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing
    with torch.no_grad():
        want = forward(original)
        got = forward(fresh)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


def test_nlp_classifier_roundtrip(ref, cfgs):
    cfg, hf = cfgs
    ids, mask = _inputs(hf)
    label = torch.randint(0, 9, (ids.shape[0],))

    def forward(m):
        return [m.predict_emb(ids, query_attention_mask=mask).numpy(),
                m(ids, query_attention_mask=mask, is_test=True).numpy(),
                m(ids, query_attention_mask=mask, label=label).numpy()]

    _roundtrip(
        lambda: ref["nlp_classifier"].NlpClassifier(BertModel(hf), 9),
        lambda sd: nlp_classifier_from_reference(sd, cfg),
        lambda p: nlp_classifier_to_reference(p, cfg),
        forward)


def test_multilabel_roundtrip(ref, cfgs):
    cfg, hf = cfgs
    ids, mask = _inputs(hf, seed=1)

    def forward(m):
        return [t.numpy() for t in
                m(ids, query_attention_mask=mask, is_test=True)]

    _roundtrip(
        lambda: ref["nlp_classifier_multilabel"].NlpClassifierMultilabel(
            BertModel(hf), 4, 6, 11),
        lambda sd: multilabel_classifier_from_reference(sd, cfg),
        lambda p: multilabel_classifier_to_reference(p, cfg),
        forward)


def test_siamese_roundtrip(ref, cfgs):
    cfg, hf = cfgs
    ids, mask = _inputs(hf, seed=2)
    ids2, mask2 = _inputs(hf, seed=3)

    def forward(m):
        return [m(ids, ids2, query_attention_mask=mask,
                  title_attention_mask=mask2).numpy()]

    _roundtrip(
        lambda: ref["nlp_sentence_transformer"].NlpSentenceTransformer(
            BertModel(hf)),
        lambda sd: siamese_from_reference(sd, cfg),
        lambda p: siamese_to_reference(p, cfg),
        forward)


def test_cli_train_then_export_to_reference(ref, tmp_path, capsys):
    """Operational path: `cli train nlp` -> `cli export-checkpoint` -> the
    reference's NlpClassifier loads and serves the file."""
    import json
    import os

    import pandas as pd

    from multimodalsimilar_tpu.cli import main

    df = pd.DataFrame({
        "spu_name": [f"{'甲乙'[i % 2] * 3}商品{i}" for i in range(32)],
        "labels": [i % 2 for i in range(32)]})
    data = str(tmp_path / "train.csv")
    df.to_csv(data, index=False)
    out = str(tmp_path / "out")
    main(["train", "nlp", "--data", data, "--output", out,
          "--batch_size", "16", "--epochs", "1", "--max_length", "10",
          "--eval_every", "1000000", "--save_every", "2"])
    sd_path = str(tmp_path / "exported.pt")
    main(["export-checkpoint", "--kind", "nlp",
          "--checkpoint", os.path.join(out, "ckpt"),
          "--out", sd_path, "--bert_preset", "tiny"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["exported"] == "nlp"

    cfg = BertConfig.tiny()
    hf = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")
    m = ref["nlp_classifier"].NlpClassifier(BertModel(hf), 2).eval()
    missing, unexpected = m.load_state_dict(
        torch.load(sd_path, weights_only=True), strict=False)
    assert not unexpected
    assert all("position_ids" in k for k in missing)
    ids, mask = _inputs(hf, seed=5, S=10)
    with torch.no_grad():
        emb = m.predict_emb(ids, query_attention_mask=mask)
    assert torch.isfinite(emb).all()


def test_cv_classifier_roundtrip():
    """CvClassifier layout (cv_classifier.py structure; timm itself is not
    installed, so the torch side is the restatement used by the import
    parity tests)."""
    from tests.test_efficientnet import TorchEffNet

    ecfg = EfficientNetConfig(
        stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
        stem_channels=8, head_channels=32, drop_path_rate=0.0)

    class TorchCv(nn_t.Module):
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

    torch.manual_seed(0)
    original = TorchCv().eval()
    with torch.no_grad():
        for mod in original.modules():
            if isinstance(mod, (nn_t.BatchNorm2d, nn_t.BatchNorm1d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
    params, stats = cv_classifier_from_reference(original.state_dict(), ecfg)
    exported = cv_classifier_to_reference(params, stats, ecfg)
    torch.manual_seed(7)
    fresh = TorchCv().eval()
    missing, unexpected = fresh.load_state_dict(_tensors(exported),
                                                strict=True)
    assert not missing and not unexpected
    x = torch.from_numpy(np.random.default_rng(0).normal(
        size=(2, 3, 24, 24)).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(fresh.predict_emb(x).numpy(),
                                   original.predict_emb(x).numpy(),
                                   rtol=1e-6, atol=1e-6)


def test_multimodal_roundtrip():
    """MultimodalClassifier layout: whole CvClassifier + NlpClassifier
    sub-models + fused head (multimodal_classifier.py:16-22)."""
    from transformers import BertModel as HFBertModel

    from multimodalsimilar_tpu.models.reference_export import (
        multimodal_to_reference)
    from multimodalsimilar_tpu.models.reference_import import (
        multimodal_from_reference)
    from tests.test_efficientnet import TorchEffNet

    cfg = BertConfig.tiny()
    hf = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")
    ecfg = EfficientNetConfig(
        stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
        stem_channels=8, head_channels=32, drop_path_rate=0.0)

    class TorchCv(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TorchEffNet(ecfg)
            self.fc = nn_t.Linear(ecfg.num_features, 12)
            self.bn = nn_t.BatchNorm1d(12)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(torch.randn(5, 12))

    class TorchNlp(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.ptm = HFBertModel(hf)
            self.emb_layer = nn_t.Module()
            self.emb_layer.ptm = self.ptm
            self.emb_layer.emb_layer = nn_t.Linear(cfg.hidden_size, 128)
            self.emb_layer.bn_layer = nn_t.BatchNorm1d(cfg.hidden_size)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(4, cfg.hidden_size))

    class TorchMM(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.cv = TorchCv()
            self.nlp = TorchNlp()
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(6, 12 + cfg.hidden_size))

    torch.manual_seed(3)
    original = TorchMM().eval()
    params, stats = multimodal_from_reference(original.state_dict(), cfg,
                                              ecfg)
    exported = multimodal_to_reference(params, stats, cfg, ecfg)
    fresh = TorchMM().eval()
    missing, unexpected = fresh.load_state_dict(_tensors(exported),
                                                strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing
    for k, v in original.state_dict().items():
        if "emb_layer.emb_layer" in k or "emb_layer.bn_layer" in k:
            continue   # TransformerEmb dead weights export as defaults
        np.testing.assert_array_equal(
            fresh.state_dict()[k].numpy(), v.numpy(), err_msg=k)


def test_bert_export_fused_qkv_layout(cfgs):
    """fused_qkv=True param trees export to the same torch keys."""
    import dataclasses

    from multimodalsimilar_tpu.models.hf_import import bert_params_from_torch
    from multimodalsimilar_tpu.models.reference_export import (
        bert_params_to_torch)

    cfg, hf = cfgs
    torch.manual_seed(9)
    sd = {k: v for k, v in BertModel(hf).state_dict().items()}
    fused_cfg = dataclasses.replace(cfg, fused_qkv=True)
    params = bert_params_from_torch(sd, fused_cfg)
    back = bert_params_to_torch(params, fused_cfg)
    for k, v in sd.items():
        if "position_ids" in k:
            continue
        np.testing.assert_allclose(back[k], v.numpy(), rtol=0, atol=0,
                                   err_msg=k)


def test_multimodal_export_from_framework_trained_checkpoint():
    """A multimodal checkpoint trained BY THIS framework has no cv/nlp
    sub-heads (the fused forward never calls them, so flax init never
    materializes them) — export must synthesize defaults, not KeyError."""
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
    from multimodalsimilar_tpu.models.reference_export import (
        multimodal_to_reference)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    cfg = BertConfig.tiny()
    ecfg = EfficientNetConfig(
        stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
        stem_channels=8, head_channels=32, drop_path_rate=0.0)
    model = MultimodalClassifier(cfg, ecfg, num_labels=6, fc_dim=12,
                                 policy=DTypePolicy.full_precision())
    B, S, I = 2, 6, 16
    variables = jax.jit(lambda im, ii: model.init(
        {"params": jax.random.key(0)}, im, ii,
        label=jnp.zeros(im.shape[0], jnp.int32)))(
            jnp.zeros((B, I, I, 3)), jnp.ones((B, S), jnp.int32))
    params = variables["params"]
    assert "head" not in params["cv"]          # the precondition
    sd = multimodal_to_reference(params, variables["batch_stats"], cfg,
                                 ecfg)
    assert sd["cv.classifier.weight"].shape == (2, 12)
    assert sd["nlp.classifier.weight"].shape == (2, cfg.hidden_size)
    assert sd["classifier.weight"].shape == (6, 12 + cfg.hidden_size)
