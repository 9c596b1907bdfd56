"""Convergence parity vs the REAL reference training loop.

The round-2 goldens pin per-step math (loss, grads, one optimizer step, a
30-step trajectory — test_reference_golden.py). This file closes the other
half of BASELINE.md's north star: *training outcome*. Both sides train to
convergence on the reference's checked-in labeled data (test.csv, 663
rows) from the SAME bridged init over the SAME batch sequence:

* torch side: the actual reference modules (`nlp_classifier.NlpClassifier`
  over a tiny BertModel) driven with the reference loop's exact semantics
  (nlp_classifier_train.py:90-159 — CrossEntropyLoss over ArcFace train
  logits, dual AdamW(5e-5 emb / 1e-2 fc, wd 0.01 torch default), HF
  linear schedules with 0 / 0.15*total warmup, margin-free eval every E
  steps with is_test=True);
* our side: the production Trainer.fit (real jitted train step, dual_group
  AdamW, linear_schedule_with_warmup, eval_metrics) warm-started from the
  converted torch init via ``fit(initial_state=...)``.

Asserted: eval-accuracy TRAJECTORIES stay close at every eval point, final
accuracies match within noise (and both learn far above chance), and the
two trained models' retrieval neighbor maps on the eval split
substantially agree. Tolerances reflect fp32 noise growth over ~480
steps of identical-dynamics training (measured: trajectories agree to 3
decimals at every point, neighbor overlap 0.98 — see PERF.md
"Convergence parity").
"""

import csv
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodalsimilar_tpu.data.text import preprocess_for_infer
from multimodalsimilar_tpu.data.tokenizer import TextTokenizer, build_char_vocab
from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
from multimodalsimilar_tpu.models.reference_import import (
    nlp_classifier_from_reference)
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

REFERENCE = "/root/reference"
BATCH = 32
EPOCHS = 30          # the reference's num_epochs (nlp_classifier_train.py:33)
EVAL_EVERY = 64


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        import arcface                      # noqa: F401
        import nlp_classifier               # noqa: F401
    finally:
        sys.path.remove(REFERENCE)
    return dict(arcface=arcface, nlp_classifier=nlp_classifier)


def _load_data():
    """test.csv -> (texts cleaned the reference way, 0-based labels)."""
    with open(f"{REFERENCE}/test.csv", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    texts = preprocess_for_infer([r["spuname"] for r in rows])
    raw = [int(r["category_name_id"]) for r in rows]
    remap = {v: i for i, v in enumerate(sorted(set(raw)))}
    labels = np.asarray([remap[v] for v in raw], np.int32)
    return texts, labels, len(remap)


def _splits(n):
    """Every 5th row held out (interleaved ~stratified split)."""
    idx = np.arange(n)
    return idx[idx % 5 != 0], idx[idx % 5 == 0]


@pytest.fixture(scope="module")
def run(ref, tmp_path_factory):
    """Train both sides once; all tests assert on the result."""
    from transformers import BertConfig as HFBertConfig, BertModel

    texts, labels, num_classes = _load_data()
    vocab = build_char_vocab(texts)
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
    tr_idx, ev_idx = _splits(len(texts))

    def tok_batch(idx):
        b = dict(tok([texts[i] for i in idx], max_length=24))
        b["labels"] = labels[idx]
        return b

    steps_per_epoch = len(tr_idx) // BATCH
    total = EPOCHS * steps_per_epoch
    train_batches = [tok_batch(tr_idx[s * BATCH:(s + 1) * BATCH])
                     for s in range(steps_per_epoch)]
    eval_batches = [tok_batch(ev_idx[s: s + BATCH])
                    for s in range(0, len(ev_idx), BATCH)]

    # ---- shared init: the real reference model, converted --------------
    torch.manual_seed(7)
    tref = ref["nlp_classifier"].NlpClassifier(BertModel(hf_cfg),
                                               num_classes)
    params0 = nlp_classifier_from_reference(
        {k: v.detach().clone() for k, v in tref.state_dict().items()}, cfg)

    # ---- torch side: the reference loop's exact semantics --------------
    from transformers import get_scheduler
    opt_emb = torch.optim.AdamW(tref.emb_layer.parameters(), lr=5e-5)
    opt_fc = torch.optim.AdamW(tref.classifier.parameters(), lr=1e-2)
    sch_emb = get_scheduler("linear", opt_emb, num_warmup_steps=0,
                            num_training_steps=total)
    sch_fc = get_scheduler("linear", opt_fc,
                           num_warmup_steps=0.15 * total,
                           num_training_steps=total)
    entroy = torch.nn.CrossEntropyLoss()

    def t_tensors(b):
        return {k: torch.from_numpy(np.asarray(v)).long()
                for k, v in b.items()}

    def torch_eval():
        tref.eval()
        hit = n = 0
        with torch.no_grad():
            for b in eval_batches:
                t = t_tensors(b)
                preds = tref(t["input_ids"],
                             query_token_type_ids=t["token_type_ids"],
                             query_attention_mask=t["attention_mask"],
                             label=t["labels"], is_test=True)
                hit += int((preds.argmax(-1) == t["labels"]).sum())
                n += len(b["labels"])
        return hit / n

    torch_traj = []
    global_step = 0
    for _ in range(EPOCHS):
        for b in train_batches:
            tref.train()
            t = t_tensors(b)
            preds = tref(t["input_ids"],
                         query_token_type_ids=t["token_type_ids"],
                         query_attention_mask=t["attention_mask"],
                         label=t["labels"])
            loss = entroy(preds, t["labels"])
            loss.backward()
            opt_emb.step()
            sch_emb.step()
            opt_emb.zero_grad()
            opt_fc.step()
            sch_fc.step()
            opt_fc.zero_grad()
            global_step += 1
            if global_step % EVAL_EVERY == 0:
                torch_traj.append(torch_eval())

    # ---- our side: the production Trainer.fit --------------------------
    import pandas as pd

    from multimodalsimilar_tpu.data.datasets import TextClassificationSource
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.train.optim import (
        dual_group_adamw, linear_schedule_with_warmup)
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import (
        Trainer, TrainerConfig, TrainState)

    model = NlpTextClassifier(cfg, num_labels=num_classes,
                              policy=DTypePolicy.full_precision())
    task = text_arcface_task(model)
    tx = dual_group_adamw(
        linear_schedule_with_warmup(5e-5, 0, total),
        linear_schedule_with_warmup(1e-2, 0.15 * total, total),
        weight_decay=0.01)              # torch.optim.AdamW default
    out = tmp_path_factory.mktemp("convergence")
    trainer = Trainer(task, tx, create_mesh(),
                      TrainerConfig(eval_every=EVAL_EVERY,
                                    save_every=10**9, log_every=10**9,
                                    metrics_path=str(out / "m.jsonl")))
    # texts are pre-cleaned above; clean=False avoids double-cleaning
    tr_df = pd.DataFrame({"spu_name": [texts[i] for i in tr_idx],
                          "labels": labels[tr_idx]})
    ev_df = pd.DataFrame({"spu_name": [texts[i] for i in ev_idx],
                          "labels": labels[ev_idx]})
    src_tr = TextClassificationSource(tr_df, tok, max_length=24,
                                      clean=False)
    src_ev = TextClassificationSource(ev_df, tok, max_length=24,
                                      clean=False)
    state0 = TrainState(step=jnp.zeros((), jnp.int32), params=params0,
                        batch_stats={}, opt_state=tx.init(params0),
                        margin=jnp.asarray(0.40, jnp.float32))
    final = trainer.fit(src_tr, num_epochs=EPOCHS, batch_size=BATCH,
                        eval_source=src_ev, shuffle=False,
                        initial_state=state0)

    import json
    ours_traj = [rec["eval/acc"]
                 for rec in (json.loads(l)
                             for l in open(out / "m.jsonl",
                                           encoding="utf-8"))
                 if "eval/acc" in rec]

    # ---- embeddings of the eval split from both trained models ---------
    def torch_embs():
        tref.eval()
        outs = []
        with torch.no_grad():
            for b in eval_batches:
                t = t_tensors(b)
                outs.append(tref.predict_emb(
                    t["input_ids"],
                    query_token_type_ids=t["token_type_ids"],
                    query_attention_mask=t["attention_mask"]).numpy())
        return np.concatenate(outs)

    def our_embs():
        outs = []
        for b in eval_batches:
            outs.append(np.asarray(model.apply(
                {"params": final.params}, jnp.asarray(b["input_ids"]),
                jnp.asarray(b["attention_mask"]),
                jnp.asarray(b["token_type_ids"]),
                method=model.predict_emb)))
        return np.concatenate(outs)

    assert len(torch_traj) == len(ours_traj) > 0
    return dict(torch_traj=torch_traj, ours_traj=ours_traj,
                torch_emb=torch_embs(), ours_emb=our_embs(),
                eval_labels=labels[ev_idx], num_classes=num_classes)


def test_accuracy_trajectories_match(run):
    """Margin-free eval accuracy stays close at EVERY eval point — the
    learning dynamics, not just the endpoint, agree."""
    t, o = np.asarray(run["torch_traj"]), np.asarray(run["ours_traj"])
    print(f"\ntorch: {np.round(t, 3).tolist()}")
    print(f"ours:  {np.round(o, 3).tolist()}")
    np.testing.assert_allclose(o, t, atol=0.10)
    # early dynamics are near-deterministic from the shared init
    assert abs(o[0] - t[0]) <= 0.06


def test_final_accuracy_parity_and_learning(run):
    t, o = run["torch_traj"][-1], run["ours_traj"][-1]
    chance = 1.0 / run["num_classes"]
    assert t > 4 * chance and o > 4 * chance     # both actually learned
    assert abs(t - o) <= 0.06


def test_trained_retrieval_maps_agree(run):
    """The deployed artifact is the neighbor map — the two trained models
    must retrieve substantially the same neighbors (k=5, IP-normalized,
    self excluded)."""
    from multimodalsimilar_tpu.retrieval.engine import SimilarityEngine

    k = 6
    keys = list(range(len(run["eval_labels"])))
    _, it = SimilarityEngine(run["torch_emb"], keys).search(k)
    _, io = SimilarityEngine(run["ours_emb"], keys).search(k)
    overlaps = [len(set(a[1:]) & set(b[1:])) / (k - 1)
                for a, b in zip(it, io)]
    mean_overlap = float(np.mean(overlaps))
    print(f"\nmean top-{k-1} neighbor overlap: {mean_overlap:.3f}")
    assert mean_overlap >= 0.6
