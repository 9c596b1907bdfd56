"""Golden parity against the ACTUAL reference code at /root/reference.

Unlike tests/test_reference_import.py (which pins parity against torch
*re-statements* of the reference structure), these tests import the
reference's own modules — arcface.py, transformer_emb.py,
transformer_seq_emb.py, nlp_classifier.py, nlp_classifier_multilabel.py,
nlp_sentence_transformer.py — instantiate them with random weights on a small
HF BertModel, convert the state_dict through models.reference_import, and
assert our Flax models reproduce the reference modules' outputs (<1e-4) on
titles from the reference's checked-in test.csv. If any semantic drifts from
the real reference code, these fail.

The CV/timm-dependent reference files (cv_classifier.py, image_emb.py,
multimodal_classifier.py) import timm/torchvision, which are not installed
here; a minimal stub-module set (timm.create_model backed by the
independently-written TorchEffNet) lets their REAL code run too, so every
reference model module is golden-pinned — the only restated piece is the
timm backbone internals themselves (pinned separately against a hardcoded
B4 plan in test_efficientnet.py).
"""

import csv
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import BertConfig as HFBertConfig, BertModel

from multimodalsimilar_tpu.data.tokenizer import TextTokenizer, build_char_vocab
from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import (
    NlpMultilabelClassifier, NlpTextClassifier, SiamesePairModel)
from multimodalsimilar_tpu.models.reference_import import (
    multilabel_classifier_from_reference, nlp_classifier_from_reference,
    siamese_from_reference)
from multimodalsimilar_tpu.models.towers import TextTower
from multimodalsimilar_tpu.ops.arcface import (
    ArcFaceParams, arcface_logits, cosine_logits)
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

REFERENCE = "/root/reference"
FP32 = DTypePolicy.full_precision()


@pytest.fixture(scope="module")
def ref():
    """Import the real reference modules (flat top-level imports)."""
    sys.path.insert(0, REFERENCE)
    try:
        import arcface                      # noqa: F401
        import nlp_classifier               # noqa: F401
        import nlp_classifier_multilabel    # noqa: F401
        import nlp_sentence_transformer     # noqa: F401
        import transformer_emb              # noqa: F401
        import transformer_seq_emb          # noqa: F401
        mods = dict(
            arcface=arcface, nlp_classifier=nlp_classifier,
            nlp_classifier_multilabel=nlp_classifier_multilabel,
            nlp_sentence_transformer=nlp_sentence_transformer,
            transformer_emb=transformer_emb,
            transformer_seq_emb=transformer_seq_emb)
    finally:
        sys.path.remove(REFERENCE)
    return mods


@pytest.fixture(scope="module")
def titles():
    """Product titles from the reference's checked-in sample (test.csv)."""
    with open(f"{REFERENCE}/test.csv", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    return [r["spuname"] for r in rows[:16]]


@pytest.fixture(scope="module")
def setup(titles):
    """Tiny matched (our BertConfig, HF config, tokenized test.csv batch)."""
    vocab = build_char_vocab(titles)
    cfg = BertConfig.tiny(vocab_size=len(vocab) + 8)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")
    tok = TextTokenizer.from_vocab(vocab)
    batch = tok(titles, max_length=24)
    t = {k: torch.from_numpy(v).long() for k, v in batch.items()}
    j = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, hf_cfg, t, j


def _assert_close(got, want, tol=1e-4):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


# ---------------------------------------------------------------------------
# ArcMarginProduct (arcface.py:17-67)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("easy_margin", [False, True])
def test_arcmargin_golden(ref, easy_margin):
    torch.manual_seed(0)
    head = ref["arcface"].ArcMarginProduct(
        in_feature=32, out_feature=11, s=64.0, m=0.40,
        easy_margin=easy_margin)
    x = torch.randn(8, 32)
    label = torch.randint(0, 11, (8,))
    with torch.no_grad():
        want_train = head(x, label).numpy()
        want_test = head.forward_test(x).numpy()
    w = jnp.asarray(head.weight.detach().numpy())
    got_train = arcface_logits(jnp.asarray(x.numpy()), w,
                               jnp.asarray(label.numpy()), m=0.40, s=64.0,
                               easy_margin=easy_margin)
    got_test = cosine_logits(jnp.asarray(x.numpy()), w)
    _assert_close(got_train, want_train)
    _assert_close(got_test, want_test)


def test_arcmargin_update_m_golden(ref):
    """Margin curriculum: same trajectory as ArcMarginProduct.update_m,
    including the (1e-6, 1.0] clamp (arcface.py:35-42)."""
    torch.manual_seed(1)
    head = ref["arcface"].ArcMarginProduct(in_feature=16, out_feature=7,
                                           s=30.0, m=0.40)
    ours = ArcFaceParams(s=30.0, m=0.40)
    x = torch.randn(4, 16)
    label = torch.randint(0, 7, (4,))
    w = jnp.asarray(head.weight.detach().numpy())
    for delta in (0.04, 0.04, 0.7, -0.5, -2.0):  # last two: clamp territory
        head.update_m(delta)
        ours = ours.update_m(delta)
        assert ours.m == pytest.approx(head.m)
        with torch.no_grad():
            want = head(x, label).numpy()
        got = arcface_logits(jnp.asarray(x.numpy()), w,
                             jnp.asarray(label.numpy()), m=ours.m, s=ours.s)
        _assert_close(got, want)


# ---------------------------------------------------------------------------
# Text towers (transformer_emb.py / transformer_seq_emb.py)
# ---------------------------------------------------------------------------


def test_transformer_emb_golden(ref, setup):
    cfg, hf_cfg, t, j = setup
    torch.manual_seed(2)
    emb = ref["transformer_emb"].TransformerEmb(BertModel(hf_cfg)).eval()
    with torch.no_grad():
        want = emb(t["input_ids"],
                   query_token_type_ids=t["token_type_ids"],
                   query_attention_mask=t["attention_mask"]).numpy()
    params = nlp_classifier_from_reference(
        {**{f"classifier.weight": torch.zeros(2, cfg.hidden_size)},
         **emb.state_dict()}, cfg)
    tower = TextTower(cfg, pool="cls", policy=FP32)
    got = tower.apply({"params": params["tower"]}, j["input_ids"],
                      j["attention_mask"], j["token_type_ids"])
    _assert_close(got, want)


def test_transformer_seq_emb_golden(ref, setup):
    """TransformerSeqEmb is dead code in the reference (imported nowhere) and
    its forward crashes whenever hidden_size != batch_size: the final divide
    broadcasts sum_embedding [B,H] by sum_mask [B] (transformer_seq_emb.py:31)
    — torch aligns [B] with the H axis. We (a) pin that bug so any upstream
    fix is noticed, and (b) verify our mean pooling against the *intended*
    semantics computed from the reference module's own encoder output with
    the division done per row."""
    cfg, hf_cfg, t, j = setup
    torch.manual_seed(3)
    emb = ref["transformer_seq_emb"].TransformerSeqEmb(
        BertModel(hf_cfg)).eval()
    with pytest.raises(RuntimeError):
        emb(t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"])
    with torch.no_grad():
        # the module's own lines (transformer_seq_emb.py:22-30) ...
        seq = emb.ptm(input_ids=t["input_ids"],
                      attention_mask=t["attention_mask"],
                      token_type_ids=t["token_type_ids"]).last_hidden_state
        mask = t["attention_mask"].unsqueeze(2).type(
            emb.ptm.pooler.dense.weight.dtype)
        # ... with the broadcast-corrected division (intended mean pool)
        want = (torch.sum(seq * mask, dim=1)
                / torch.sum(t["attention_mask"], dim=1, keepdim=True)).numpy()
    params = nlp_classifier_from_reference(
        {**{"classifier.weight": torch.zeros(2, cfg.hidden_size)},
         **emb.state_dict()}, cfg)
    tower = TextTower(cfg, pool="mean", policy=FP32)
    got = tower.apply({"params": params["tower"]}, j["input_ids"],
                      j["attention_mask"], j["token_type_ids"])
    _assert_close(got, want)


# ---------------------------------------------------------------------------
# Task models
# ---------------------------------------------------------------------------


def _nlp_pair(ref, hf_cfg, cfg, num_labels=13, seed=4):
    torch.manual_seed(seed)
    tref = ref["nlp_classifier"].NlpClassifier(
        BertModel(hf_cfg), num_labels).eval()
    params = nlp_classifier_from_reference(tref.state_dict(), cfg)
    ours = NlpTextClassifier(cfg, num_labels=num_labels, policy=FP32)
    return tref, ours, params


def test_nlp_classifier_golden(ref, setup):
    cfg, hf_cfg, t, j = setup
    tref, ours, params = _nlp_pair(ref, hf_cfg, cfg)
    label_t = torch.randint(0, 13, (t["input_ids"].shape[0],))
    with torch.no_grad():
        want_emb = tref.predict_emb(
            t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"]).numpy()
        want_cos = tref(
            t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"], is_test=True).numpy()
        want_margin = tref(
            t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"],
            label=label_t).numpy()
    got_emb = ours.apply({"params": params}, j["input_ids"],
                         j["attention_mask"], j["token_type_ids"],
                         method=ours.predict_emb)
    got_cos = ours.apply({"params": params}, j["input_ids"],
                         j["attention_mask"], j["token_type_ids"],
                         is_test=True)
    got_margin = ours.apply({"params": params}, j["input_ids"],
                            j["attention_mask"], j["token_type_ids"],
                            label=jnp.asarray(label_t.numpy()))
    _assert_close(got_emb, want_emb)
    _assert_close(got_cos, want_cos)
    # margin logits are s=64-scaled; compare at matching tolerance
    np.testing.assert_allclose(np.asarray(got_margin), want_margin,
                               rtol=1e-4, atol=64 * 1e-4)


def test_nlp_classifier_dataparallel_golden(ref, setup):
    """The production v2_dist checkpoint layout: DataParallel 'module.'
    prefix (nlp_classifier_train_daodian_v2_dist.py:82-86; unwrapped by the
    reference at goodssku_emb.py:174-177)."""
    cfg, hf_cfg, t, j = setup
    tref, ours, _ = _nlp_pair(ref, hf_cfg, cfg, seed=5)
    dp_sd = torch.nn.DataParallel(tref).state_dict()
    assert all(k.startswith("module.") for k in dp_sd)
    params = nlp_classifier_from_reference(dp_sd, cfg)
    with torch.no_grad():
        want = tref.predict_emb(
            t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"]).numpy()
    got = ours.apply({"params": params}, j["input_ids"],
                     j["attention_mask"], j["token_type_ids"],
                     method=ours.predict_emb)
    _assert_close(got, want)


def test_multilabel_classifier_golden(ref, setup):
    cfg, hf_cfg, t, j = setup
    torch.manual_seed(6)
    tref = ref["nlp_classifier_multilabel"].NlpClassifierMultilabel(
        BertModel(hf_cfg), 5, 9, 17).eval()
    params = multilabel_classifier_from_reference(tref.state_dict(), cfg)
    ours = NlpMultilabelClassifier(cfg, lv1_labels=5, lv2_labels=9,
                                   tag_labels=17, policy=FP32)
    B = t["input_ids"].shape[0]
    lv1 = torch.randint(0, 5, (B,))
    lv2 = torch.randint(0, 9, (B,))
    tag = torch.randint(0, 17, (B,))
    with torch.no_grad():
        want_train = tref(
            t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"],
            firstcate_label=lv1, secondcate_label=lv2, tag_label=tag)
        want_test = tref(
            t["input_ids"], query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"], is_test=True)
    got_train = ours.apply(
        {"params": params}, j["input_ids"], j["attention_mask"],
        j["token_type_ids"], lv1_label=jnp.asarray(lv1.numpy()),
        lv2_label=jnp.asarray(lv2.numpy()),
        tag_label=jnp.asarray(tag.numpy()))
    got_test = ours.apply({"params": params}, j["input_ids"],
                          j["attention_mask"], j["token_type_ids"],
                          is_test=True)
    for g, w in zip(got_train, want_train):
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   rtol=1e-4, atol=64 * 1e-4)
    for g, w in zip(got_test, want_test):
        _assert_close(g, w.numpy())


def test_siamese_golden(ref, setup):
    cfg, hf_cfg, t, j = setup
    torch.manual_seed(7)
    tref = ref["nlp_sentence_transformer"].NlpSentenceTransformer(
        BertModel(hf_cfg)).eval()
    params = siamese_from_reference(tref.state_dict(), cfg)
    ours = SiamesePairModel(cfg, policy=FP32)
    B = t["input_ids"].shape[0]
    half = B // 2
    q_t = {k: v[:half] for k, v in t.items()}
    d_t = {k: v[half: 2 * half] for k, v in t.items()}
    q_j = {k: v[:half] for k, v in j.items()}
    d_j = {k: v[half: 2 * half] for k, v in j.items()}
    with torch.no_grad():
        want = tref(q_t["input_ids"], d_t["input_ids"],
                    query_token_type_ids=q_t["token_type_ids"],
                    query_attention_mask=q_t["attention_mask"],
                    title_token_type_ids=d_t["token_type_ids"],
                    title_attention_mask=d_t["attention_mask"]).numpy()
        want_emb = tref.predict_emb(
            q_t["input_ids"], query_token_type_ids=q_t["token_type_ids"],
            query_attention_mask=q_t["attention_mask"]).numpy()
    got = ours.apply({"params": params}, q_j["input_ids"], d_j["input_ids"],
                     query_attention_mask=q_j["attention_mask"],
                     query_token_type_ids=q_j["token_type_ids"],
                     title_attention_mask=d_j["attention_mask"],
                     title_token_type_ids=d_j["token_type_ids"])
    got_emb = ours.apply({"params": params}, q_j["input_ids"],
                         q_j["attention_mask"], q_j["token_type_ids"],
                         method=ours.predict_emb)
    _assert_close(got, want)
    _assert_close(got_emb, want_emb)


# ---------------------------------------------------------------------------
# Full TRAIN STEP: loss + gradients + dual-AdamW update vs the reference loop
# (nlp_classifier_train.py:89-97,116-133 — torch.optim.AdamW, so the effective
# weight_decay is torch's default 0.01 on both groups)
# ---------------------------------------------------------------------------


def test_train_step_golden(ref, titles):
    """Pins the whole training semantics, not just the forward: the Trainer's
    task loss (CE over margin logits), the backward through BERT + ArcFace,
    and one dual-group AdamW update must reproduce the reference training
    loop's numbers on the actual reference module.

    The converters in reference_import are pure layout transforms
    (rename/transpose), so applying them to a state_dict holding *gradients*
    converts torch grads into our param-tree layout for direct comparison.
    """
    import jax
    import optax

    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task

    # dropout off on both sides so the train-mode forward is deterministic
    vocab = build_char_vocab(titles)
    cfg = BertConfig.tiny(vocab_size=len(vocab) + 8,
                          hidden_dropout=0.0, attention_dropout=0.0)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tok = TextTokenizer.from_vocab(vocab)
    batch = tok(titles, max_length=24)
    t = {k: torch.from_numpy(v).long() for k, v in batch.items()}

    torch.manual_seed(11)
    tref = ref["nlp_classifier"].NlpClassifier(BertModel(hf_cfg), 13)
    tref.train()
    rng = np.random.default_rng(11)
    labels = rng.integers(0, 13, size=batch["input_ids"].shape[0])

    # --- torch side: the reference loop's loss/backward/step (:116-133) ---
    label_t = torch.from_numpy(labels).long()
    logits = tref(t["input_ids"], query_token_type_ids=t["token_type_ids"],
                  query_attention_mask=t["attention_mask"], label=label_t)
    loss_t = torch.nn.CrossEntropyLoss()(logits, label_t)
    opt_emb = torch.optim.AdamW(tref.emb_layer.parameters(), lr=5e-5)
    opt_fc = torch.optim.AdamW(tref.classifier.parameters(), lr=1e-2)
    params = nlp_classifier_from_reference(
        {k: v.detach().clone() for k, v in tref.state_dict().items()}, cfg)
    loss_t.backward()
    grad_sd = {k: (torch.zeros_like(p) if p.grad is None
                   else p.grad.detach().clone())
               for k, p in tref.named_parameters()}
    want_grads = nlp_classifier_from_reference(grad_sd, cfg)
    opt_emb.step()
    opt_fc.step()
    params_after_t = nlp_classifier_from_reference(tref.state_dict(), cfg)

    # --- our side: the Trainer's actual loss path + dual_group_adamw ---
    ours = NlpTextClassifier(cfg, num_labels=13, policy=FP32)
    task = text_arcface_task(ours)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jb["labels"] = jnp.asarray(labels.astype(np.int32))
    (loss_j, _), grads = jax.value_and_grad(task.train_loss, has_aux=True)(
        params, None, jb, jax.random.key(0), ours.arcface.m)

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda g, w: np.testing.assert_allclose(
        np.asarray(g), np.asarray(w), rtol=1e-3, atol=2e-5),
        grads, want_grads)

    # optimizer semantics in isolation: identical (torch-derived) grads
    # through dual_group_adamw must land on torch's post-step params.
    # torch.optim.AdamW default weight_decay=0.01 (what the reference runs).
    tx = dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2, weight_decay=0.01)
    updates, _ = tx.update(want_grads, tx.init(params), params)
    params_after_j = optax.apply_updates(params, updates)

    def assert_delta_close(before, after_j, after_t):
        np.testing.assert_allclose(np.asarray(after_j) - np.asarray(before),
                                   np.asarray(after_t) - np.asarray(before),
                                   rtol=2e-4, atol=2e-8)

    jax.tree.map(assert_delta_close, params, params_after_j, params_after_t)


def _import_with_stub_timm(module_name, create_model=None):
    """Import a reference module whose top-level imports need timm /
    torchvision (neither installed here) by installing minimal stub
    modules for the import, then removing them."""
    import importlib
    import types

    timm_stub = types.ModuleType("timm")
    if create_model is not None:
        timm_stub.create_model = create_model
    timm_data = types.ModuleType("timm.data")
    timm_data.resolve_data_config = lambda *a, **k: {}
    tf = types.ModuleType("timm.data.transforms_factory")
    tf.create_transform = lambda *a, **k: None
    timm_data.transforms_factory = tf
    timm_stub.data = timm_data
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    stubs = {"timm": timm_stub, "timm.data": timm_data,
             "timm.data.transforms_factory": tf, "torchvision": tv,
             "torchvision.transforms": tv.transforms}
    added = [k for k in stubs if k not in sys.modules]
    sys.modules.update({k: v for k, v in stubs.items() if k in added})
    sys.path.insert(0, REFERENCE)
    try:
        return importlib.import_module(module_name)
    finally:
        sys.path.remove(REFERENCE)
        for k in added:
            sys.modules.pop(k, None)


_TINY_EFFNET_KW = dict(stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
                       stem_channels=8, head_channels=32,
                       drop_path_rate=0.0)


from tests.test_efficientnet import TorchEffNet as _TorchEffNet  # noqa: E402


class _StubTimmBackbone(_TorchEffNet):
    """timm-shaped torch backbone — module-level so torch.save can pickle
    whole models holding it, the way production checkpoints were made:
    .classifier.in_features readable, classifier/global_pool replaceable
    by Identity, forward returning the unpooled feature map once they are."""

    def __init__(self):
        from multimodalsimilar_tpu.models.efficientnet import (
            EfficientNetConfig)
        super().__init__(EfficientNetConfig(**_TINY_EFFNET_KW))
        self.classifier = torch.nn.Linear(32, 10)
        self.global_pool = torch.nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        return self.classifier(self.global_pool(
            _TorchEffNet.forward(self, x)))


def test_cv_classifier_golden_with_stub_timm(ref):
    """Golden parity against the reference's ACTUAL cv_classifier.py — not a
    restatement of it. timm isn't installed, so a minimal stub provides
    `timm.create_model` backed by the independently-written TorchEffNet;
    everything downstream of create_model — the reference's Identity
    replacement of classifier/global_pool, its own AdaptiveAvgPool2d neck,
    dropout/fc/bn wiring and ArcFace routing (cv_classifier.py:17-55) —
    runs the reference's real code and must match CvImageClassifier.
    """
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.reference_import import (
        cv_classifier_from_reference)
    from multimodalsimilar_tpu.models.vision import CvImageClassifier

    ecfg = EfficientNetConfig(**_TINY_EFFNET_KW)
    ref_cv = _import_with_stub_timm(
        "cv_classifier", lambda name, pretrained=True: _StubTimmBackbone())
    torch.manual_seed(21)
    tcv = ref_cv.CvClassifier("stub_effnet", fc_dim=12, num_labels=5,
                              pretrained=False).eval()

    with torch.no_grad():
        for mod in tcv.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
    params, stats = cv_classifier_from_reference(tcv.state_dict(), ecfg)
    ours = CvImageClassifier(ecfg, num_labels=5, fc_dim=12, policy=FP32)

    rng = np.random.default_rng(21)
    x = rng.normal(size=(4, 3, 24, 24)).astype(np.float32)
    label = rng.integers(0, 5, size=4)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        want_emb = tcv.predict_emb(xt).numpy()
        want_cos = tcv(xt, is_test=True).numpy()
        want_margin = tcv(xt, label=torch.from_numpy(label).long()).numpy()
    vars_ = {"params": params, "batch_stats": stats}
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_emb = ours.apply(vars_, xj, method=ours.predict_emb)
    got_cos = ours.apply(vars_, xj, is_test=True)
    got_margin = ours.apply(vars_, xj, label=jnp.asarray(label))
    _assert_close(got_emb, want_emb)
    _assert_close(got_cos, want_cos)
    np.testing.assert_allclose(np.asarray(got_margin), want_margin,
                               rtol=1e-4, atol=64 * 1e-4)


@pytest.mark.parametrize("use_bn", [False, True])
def test_image_emb_golden_with_stub_timm(ref, use_bn):
    """Golden parity against the reference's ACTUAL image_emb.py (ImageEmb:
    timm backbone with reset_classifier(0) -> optional BatchNorm1d -> L2
    normalize, image_emb.py:14-32), via the same stub-timm trick."""
    from tests.test_efficientnet import TorchEffNet

    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.reference_import import (
        image_tower_from_reference)
    from multimodalsimilar_tpu.models.vision import ImageTower

    ecfg = EfficientNetConfig(**_TINY_EFFNET_KW)

    class StubBackbone(TorchEffNet):
        """timm num_classes=0 contract: after reset_classifier(0) the
        forward returns pooled, flattened pre-logits [B, C]."""

        def __init__(self):
            super().__init__(ecfg)
            self.classifier = torch.nn.Linear(32, 10)

        def reset_classifier(self, num_classes):
            assert num_classes == 0
            self.classifier = torch.nn.Identity()

        def forward(self, x):
            h = TorchEffNet.forward(self, x).mean((2, 3))
            return self.classifier(h)

    ref_ie = _import_with_stub_timm("image_emb")
    torch.manual_seed(31)
    tie = ref_ie.ImageEmb(StubBackbone(), use_bn=use_bn).eval()
    with torch.no_grad():
        for mod in tie.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)

    params, stats = image_tower_from_reference(tie.state_dict(), ecfg,
                                               use_bn=use_bn)
    ours = ImageTower(ecfg, use_bn=use_bn, policy=FP32)
    rng = np.random.default_rng(31)
    x = rng.normal(size=(4, 3, 24, 24)).astype(np.float32)
    with torch.no_grad():
        want = tie(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(got, want)


def test_multimodal_classifier_golden_with_stub_timm(ref, setup, titles,
                                                     tmp_path):
    """Golden parity against the reference's ACTUAL multimodal_classifier.py
    — its torch.load of whole pickled sub-models (multimodal_classifier.py:
    16-17), L2-normalize + concat fusion, and ArcFace(m=0.5) routing — by
    pickling a stub-timm CvClassifier and a tiny NlpClassifier to disk the
    way production checkpoints were made."""
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
    from multimodalsimilar_tpu.models.reference_import import (
        multimodal_from_reference)

    cfg, hf_cfg, t, j = setup
    ecfg = EfficientNetConfig(**_TINY_EFFNET_KW)
    ref_cv = _import_with_stub_timm(
        "cv_classifier", lambda name, pretrained=True: _StubTimmBackbone())
    ref_mm = _import_with_stub_timm("multimodal_classifier")
    torch.manual_seed(41)
    tcv = ref_cv.CvClassifier("stub", fc_dim=12, num_labels=5,
                              pretrained=False).eval()
    tnlp = ref["nlp_classifier"].NlpClassifier(BertModel(hf_cfg), 7).eval()
    with torch.no_grad():
        for mod in tcv.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
    cv_path = str(tmp_path / "cv.pt")
    nlp_path = str(tmp_path / "nlp.pt")
    torch.save(tcv, cv_path)     # whole pickled modules, like production
    torch.save(tnlp, nlp_path)
    emb_size = 12 + cfg.hidden_size
    # the reference targets torch < 2.6, where torch.load defaulted to
    # weights_only=False (whole-module pickles); restore that default for
    # its own torch.load calls (multimodal_classifier.py:16-17)
    orig_load = torch.load
    torch.load = lambda f, **kw: orig_load(
        f, **{**kw, "weights_only": False})
    try:
        tmm = ref_mm.MultimodalClassifier("cpu", cv_path, nlp_path,
                                          emb_size, 13).eval()
    finally:
        torch.load = orig_load

    params, stats = multimodal_from_reference(tmm.state_dict(), cfg, ecfg)
    ours = MultimodalClassifier(cfg, ecfg, num_labels=13,
                                text_num_labels=7, image_num_labels=5,
                                fc_dim=12, policy=FP32)
    rng = np.random.default_rng(41)
    B = t["input_ids"].shape[0]
    x = rng.normal(size=(B, 3, 24, 24)).astype(np.float32)
    label = rng.integers(0, 13, size=B)
    with torch.no_grad():
        want_emb = tmm.predict_emb(
            torch.from_numpy(x), t["input_ids"],
            query_token_type_ids=t["token_type_ids"],
            query_attention_mask=t["attention_mask"]).numpy()
        want_cos = tmm(torch.from_numpy(x), t["input_ids"],
                       query_token_type_ids=t["token_type_ids"],
                       query_attention_mask=t["attention_mask"],
                       is_test=True).numpy()
        want_margin = tmm(torch.from_numpy(x), t["input_ids"],
                          query_token_type_ids=t["token_type_ids"],
                          query_attention_mask=t["attention_mask"],
                          label=torch.from_numpy(label).long()).numpy()
    vars_ = {"params": params, "batch_stats": stats}
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_emb = ours.apply(vars_, xj, j["input_ids"], j["attention_mask"],
                         j["token_type_ids"], method=ours.predict_emb)
    got_cos = ours.apply(vars_, xj, j["input_ids"], j["attention_mask"],
                         j["token_type_ids"], is_test=True)
    got_margin = ours.apply(vars_, xj, j["input_ids"], j["attention_mask"],
                            j["token_type_ids"], label=jnp.asarray(label))
    _assert_close(got_emb, want_emb)
    _assert_close(got_cos, want_cos)
    np.testing.assert_allclose(np.asarray(got_margin), want_margin,
                               rtol=1e-4, atol=64 * 1e-4)


def test_train_trajectory_golden(ref, titles):
    """30 optimizer steps of the reference loop vs ours on IDENTICAL
    batches: losses must track step for step. The 1-step golden pins the
    math; this pins the integration — optimizer state evolving across
    steps, dual-group routing staying consistent, no slow semantic drift.
    Float noise compounds through Adam, so the tolerance grows with step.
    """
    import jax
    import optax

    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task

    vocab = build_char_vocab(titles)
    cfg = BertConfig.tiny(vocab_size=len(vocab) + 8,
                          hidden_dropout=0.0, attention_dropout=0.0)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tok = TextTokenizer.from_vocab(vocab)
    batch = tok(titles, max_length=24)
    t = {k: torch.from_numpy(v).long() for k, v in batch.items()}
    rng = np.random.default_rng(17)
    n_steps = 30
    labels = rng.integers(0, 13, size=(n_steps,
                                       batch["input_ids"].shape[0]))

    torch.manual_seed(17)
    tref = ref["nlp_classifier"].NlpClassifier(BertModel(hf_cfg), 13)
    tref.train()
    params = nlp_classifier_from_reference(
        {k: v.detach().clone() for k, v in tref.state_dict().items()}, cfg)
    opt_emb = torch.optim.AdamW(tref.emb_layer.parameters(), lr=5e-5)
    opt_fc = torch.optim.AdamW(tref.classifier.parameters(), lr=1e-2)
    ce = torch.nn.CrossEntropyLoss()
    torch_losses = []
    for s in range(n_steps):
        lab = torch.from_numpy(labels[s]).long()
        logits = tref(t["input_ids"],
                      query_token_type_ids=t["token_type_ids"],
                      query_attention_mask=t["attention_mask"], label=lab)
        loss = ce(logits, lab)
        opt_emb.zero_grad()
        opt_fc.zero_grad()
        loss.backward()
        opt_emb.step()
        opt_fc.step()
        torch_losses.append(float(loss.detach()))
    assert torch_losses[-1] < torch_losses[0]    # it actually learns

    ours = NlpTextClassifier(cfg, num_labels=13, policy=FP32)
    task = text_arcface_task(ours)
    tx = dual_group_adamw(lambda s: 5e-5, lambda s: 1e-2,
                          weight_decay=0.01)   # torch AdamW default wd

    @jax.jit
    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            task.train_loss, has_aux=True)(params, None, batch,
                                           jax.random.key(0),
                                           ours.arcface.m)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    opt_state = tx.init(params)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jax_losses = []
    for s in range(n_steps):
        jbs = dict(jb, labels=jnp.asarray(labels[s].astype(np.int32)))
        params, opt_state, loss = step(params, opt_state, jbs)
        jax_losses.append(float(loss))

    for s, (a, b) in enumerate(zip(jax_losses, torch_losses)):
        assert abs(a - b) <= 1e-3 + 2e-3 * s, (s, a, b)


def test_multilabel_train_loss_golden(ref, titles):
    """The v3_dist training loss — 10*CE(lv1) + 5*CE(lv2) + 1*CE(tag)
    (nlp_classifier_train_daodian_v3_dist.py:164-166) — and its gradients,
    against the actual reference multilabel module."""
    import jax

    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task

    vocab = build_char_vocab(titles)
    cfg = BertConfig.tiny(vocab_size=len(vocab) + 8,
                          hidden_dropout=0.0, attention_dropout=0.0)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tok = TextTokenizer.from_vocab(vocab)
    batch = tok(titles, max_length=24)
    t = {k: torch.from_numpy(v).long() for k, v in batch.items()}

    torch.manual_seed(12)
    tref = ref["nlp_classifier_multilabel"].NlpClassifierMultilabel(
        BertModel(hf_cfg), 5, 9, 17)
    tref.train()
    rng = np.random.default_rng(12)
    B = batch["input_ids"].shape[0]
    lv1 = rng.integers(0, 5, B)
    lv2 = rng.integers(0, 9, B)
    tag = rng.integers(0, 17, B)

    # torch side: the v3_dist loop's weighted loss + backward (:158-166)
    ce = torch.nn.CrossEntropyLoss()
    o1, o2, ot = tref(
        t["input_ids"], query_token_type_ids=t["token_type_ids"],
        query_attention_mask=t["attention_mask"],
        firstcate_label=torch.from_numpy(lv1).long(),
        secondcate_label=torch.from_numpy(lv2).long(),
        tag_label=torch.from_numpy(tag).long())
    loss_t = (10.0 * ce(o1, torch.from_numpy(lv1).long())
              + 5.0 * ce(o2, torch.from_numpy(lv2).long())
              + 1.0 * ce(ot, torch.from_numpy(tag).long()))
    params = multilabel_classifier_from_reference(
        {k: v.detach().clone() for k, v in tref.state_dict().items()}, cfg)
    loss_t.backward()
    grad_sd = {k: (torch.zeros_like(p) if p.grad is None
                   else p.grad.detach().clone())
               for k, p in tref.named_parameters()}
    want_grads = multilabel_classifier_from_reference(grad_sd, cfg)

    # our side: the Trainer's multilabel task loss
    ours = NlpMultilabelClassifier(cfg, lv1_labels=5, lv2_labels=9,
                                   tag_labels=17, policy=FP32)
    task = multilabel_arcface_task(ours)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jb["lv1_label"] = jnp.asarray(lv1.astype(np.int32))
    jb["lv2_label"] = jnp.asarray(lv2.astype(np.int32))
    jb["tag_label"] = jnp.asarray(tag.astype(np.int32))
    (loss_j, _), grads = jax.value_and_grad(task.train_loss, has_aux=True)(
        params, None, jb, jax.random.key(0), None)

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4, atol=1e-3)
    jax.tree.map(lambda g, w: np.testing.assert_allclose(
        np.asarray(g), np.asarray(w), rtol=1e-3, atol=2e-5),
        grads, want_grads)
