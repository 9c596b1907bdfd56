"""Task adapters: bind each model family to loss/eval logic for the Trainer.

One Trainer covers every reference training loop (SURVEY.md §2.3); the
variation between loops — which tensors feed the model, which labels feed
which head, how the loss is weighted — is captured here as a ``Task``:

* text_arcface_task       <- nlp_classifier_train*.py  (CE over margin logits)
* multilabel_arcface_task <- nlp_classifier_train_daodian_v3_dist.py
  (weighted 3-head CE, default 10/5/1 per --lv*_weight flags :79-87; accuracy
  tracked on the tag head :168-169)
* cv_arcface_task         <- cv_classifier_train*.py (batch_stats + dropout,
  margin curriculum driven by Trainer)
* multimodal_arcface_task <- multimodal_classifier_train.py
* pair_task               <- nlp_st_train_daodian.py (2-class CE)

Each Task exposes ``init(rng, batch)``, ``train_loss(params, batch_stats,
batch, rng, margin)`` and ``eval_metrics(params, batch_stats, batch)`` — all
pure functions, jitted by the Trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

Batch = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Task:
    model: Any
    init: Callable
    train_loss: Callable
    eval_metrics: Callable
    has_batch_stats: bool = False
    # False for tasks whose loss ignores the Trainer's margin state (the
    # multilabel heads carry fixed per-level margins; the pair loss has no
    # margin at all) — the Trainer fails loud if a margin curriculum is
    # configured for such a task instead of logging a curriculum that
    # never reaches the loss
    dynamic_margin: bool = True


def _ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def _acc(logits, labels):
    return jnp.mean(jnp.argmax(logits, -1) == labels)


def _mask_pad(logits, num_valid):
    """Mask PAD classes out of padded heads. `--model_parallel N` shards
    ArcFace weights [C, D] over classes, and XLA requires C divisible by N
    — but the v2 recipe's C=10205 (5*13*157) shares no factor with an
    8-chip mesh's model axis, so the CLI pads the head up and passes the
    true count here; pad logits become -inf (softmax weight 0, never the
    argmax), leaving loss/accuracy identical to the unpadded head."""
    if num_valid is None or num_valid >= logits.shape[-1]:
        return logits
    col = jnp.arange(logits.shape[-1])
    return jnp.where(col < num_valid, logits, -jnp.inf)


def _text_inputs(batch: Batch):
    return dict(input_ids=batch["input_ids"],
                attention_mask=batch.get("attention_mask"),
                token_type_ids=batch.get("token_type_ids"))


def text_arcface_task(model, fused_loss: bool = False,
                      loss_tile_c: int = 1024,
                      num_valid: int = None) -> Task:
    """``fused_loss=True`` streams ArcFace+CE over class tiles
    (ops/arcface_loss.py) — the [B, C] logits never hit HBM. Measured on
    v5e: a de-optimization at C=10205 (the scan serializes small matmuls
    and the head is <0.1% of the step; 1.73 s vs 0.134 s per step) — only
    worth enabling when [B, C] genuinely does not fit (C in the 100k+
    range), ideally via the Pallas kernel in a future round.

    ``num_valid``: true class count when the head is padded for
    `--model_parallel` divisibility (see _mask_pad)."""
    if fused_loss and num_valid is not None \
            and num_valid < model.num_labels:
        raise ValueError(
            "--fused_loss streams class tiles and cannot mask padded "
            "classes; drop --fused_loss or pick a --model_parallel that "
            "divides the class count")

    def init(rng, batch):
        return model.init({"params": rng}, **_text_inputs(batch),
                          label=batch["labels"])

    def train_loss(params, batch_stats, batch, rng, margin):
        if fused_loss:
            from multimodalsimilar_tpu.ops.arcface_loss import (
                arcface_ce_loss, cosine_argmax)
            emb = model.apply({"params": params}, **_text_inputs(batch),
                              deterministic=False, rngs={"dropout": rng},
                              method=model.predict_emb)
            w = params["head"]["weight"]
            af = model.arcface
            loss = jnp.mean(arcface_ce_loss(emb, w, batch["labels"],
                                            margin, af.s, af.easy_margin,
                                            loss_tile_c))
            pred = cosine_argmax(emb, w, loss_tile_c)
            acc = jnp.mean(pred == batch["labels"])
            return loss, ({"loss": loss, "acc": acc}, batch_stats)
        logits = _mask_pad(
            model.apply({"params": params}, **_text_inputs(batch),
                        label=batch["labels"], m=margin,
                        deterministic=False, rngs={"dropout": rng}),
            num_valid)
        loss = _ce(logits, batch["labels"])
        return loss, ({"loss": loss, "acc": _acc(logits, batch["labels"])},
                      batch_stats)

    def eval_metrics(params, batch_stats, batch):
        logits = _mask_pad(
            model.apply({"params": params}, **_text_inputs(batch),
                        is_test=True), num_valid)
        # eval CE at the model's own logit scale (forward_test returns the
        # raw cosine; the reference evaluates CE on s-scaled train logits)
        return {"acc": _acc(logits, batch["labels"]),
                "loss": _ce(model.arcface.s * logits, batch["labels"])}

    return Task(model, init, train_loss, eval_metrics)


def multilabel_arcface_task(model, weights=(10.0, 5.0, 1.0),
                            fused_loss: bool = False,
                            loss_tile_c: int = 1024,
                            num_valid=(None, None, None)) -> Task:
    """Weighted multi-head loss, v3_dist.py:164-166 semantics.

    ``fused_loss=True`` computes each head's ArcFace+CE blockwise over class
    tiles on the shared embedding — at reference scale the tag head alone is
    10205-wide. ``num_valid``: per-head (lv1, lv2, tag) true class counts
    when heads are padded for `--model_parallel` (see _mask_pad)."""
    if fused_loss and any(v is not None for v in num_valid):
        raise ValueError(
            "--fused_loss streams class tiles and cannot mask padded "
            "classes; drop --fused_loss or pick a --model_parallel that "
            "divides every head's class count")

    def labels(batch):
        return dict(lv1_label=batch["lv1_label"],
                    lv2_label=batch["lv2_label"],
                    tag_label=batch["tag_label"])

    def init(rng, batch):
        return model.init({"params": rng}, **_text_inputs(batch),
                          **labels(batch))

    def train_loss(params, batch_stats, batch, rng, margin):
        if fused_loss:
            from multimodalsimilar_tpu.ops.arcface_loss import (
                arcface_ce_loss, cosine_argmax)
            emb = model.apply({"params": params}, **_text_inputs(batch),
                              deterministic=False, rngs={"dropout": rng},
                              method=model.predict_emb)
            heads = (("lv1_head", "lv1_label", model.lv1_arcface),
                     ("lv2_head", "lv2_label", model.lv2_arcface),
                     ("tag_head", "tag_label", model.tag_arcface))
            loss = 0.0
            for w_loss, (head, lab, af) in zip(weights, heads):
                loss = loss + w_loss * jnp.mean(arcface_ce_loss(
                    emb, params[head]["weight"], batch[lab], af.m,
                    af.s, af.easy_margin, loss_tile_c))
            pred = cosine_argmax(emb, params["tag_head"]["weight"],
                                 loss_tile_c)
            return loss, ({"loss": loss,
                           "acc": jnp.mean(pred == batch["tag_label"])},
                          batch_stats)
        l1, l2, lt = model.apply({"params": params}, **_text_inputs(batch),
                                 **labels(batch), deterministic=False,
                                 rngs={"dropout": rng})
        l1, l2, lt = (_mask_pad(l, v)
                      for l, v in zip((l1, l2, lt), num_valid))
        loss = (weights[0] * _ce(l1, batch["lv1_label"])
                + weights[1] * _ce(l2, batch["lv2_label"])
                + weights[2] * _ce(lt, batch["tag_label"]))
        return loss, ({"loss": loss, "acc": _acc(lt, batch["tag_label"])},
                      batch_stats)

    def eval_metrics(params, batch_stats, batch):
        l1, l2, lt = model.apply({"params": params}, **_text_inputs(batch),
                                 is_test=True)
        l1, l2, lt = (_mask_pad(l, v)
                      for l, v in zip((l1, l2, lt), num_valid))
        return {"acc": _acc(lt, batch["tag_label"]),
                "lv1_acc": _acc(l1, batch["lv1_label"]),
                "lv2_acc": _acc(l2, batch["lv2_label"])}

    return Task(model, init, train_loss, eval_metrics,
                dynamic_margin=False)


def cv_arcface_task(model, num_valid: int = None) -> Task:
    # uint8 batches normalize inside the jitted step (device_normalize is a
    # no-op on float inputs) — the host ships 4x smaller transfers.
    # num_valid: true class count for --model_parallel padding (_mask_pad).
    from multimodalsimilar_tpu.models.vision import device_normalize

    def init(rng, batch):
        return model.init({"params": rng}, device_normalize(batch["images"]),
                          label=batch["labels"])

    def train_loss(params, batch_stats, batch, rng, margin):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            device_normalize(batch["images"]), label=batch["labels"],
            m=margin, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        logits = _mask_pad(logits, num_valid)
        loss = _ce(logits, batch["labels"])
        return loss, ({"loss": loss, "acc": _acc(logits, batch["labels"])},
                      mutated["batch_stats"])

    def eval_metrics(params, batch_stats, batch):
        logits = _mask_pad(
            model.apply({"params": params, "batch_stats": batch_stats},
                        device_normalize(batch["images"]), is_test=True),
            num_valid)
        # micro-F1 == accuracy for single-label multiclass
        # (cv_classifier_train_daodian.py:173 tracks micro-F1)
        return {"acc": _acc(logits, batch["labels"])}

    return Task(model, init, train_loss, eval_metrics,
                has_batch_stats=True)


def multimodal_arcface_task(model, num_valid: int = None) -> Task:
    # num_valid: true class count for --model_parallel padding (_mask_pad)
    from multimodalsimilar_tpu.models.vision import device_normalize

    def inputs(batch):
        return (device_normalize(batch["images"]),), _text_inputs(batch)

    def init(rng, batch):
        args, kw = inputs(batch)
        return model.init({"params": rng}, *args, **kw,
                          label=batch["labels"])

    def train_loss(params, batch_stats, batch, rng, margin):
        args, kw = inputs(batch)
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, *args, **kw,
            label=batch["labels"], m=margin, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        logits = _mask_pad(logits, num_valid)
        loss = _ce(logits, batch["labels"])
        return loss, ({"loss": loss, "acc": _acc(logits, batch["labels"])},
                      mutated["batch_stats"])

    def eval_metrics(params, batch_stats, batch):
        args, kw = inputs(batch)
        logits = _mask_pad(
            model.apply({"params": params, "batch_stats": batch_stats},
                        *args, **kw, is_test=True), num_valid)
        return {"acc": _acc(logits, batch["labels"])}

    return Task(model, init, train_loss, eval_metrics,
                has_batch_stats=True)


def pair_task(model) -> Task:
    def inputs(batch):
        return dict(
            query_input_ids=batch["query_input_ids"],
            title_input_ids=batch["title_input_ids"],
            query_attention_mask=batch.get("query_attention_mask"),
            query_token_type_ids=batch.get("query_token_type_ids"),
            title_attention_mask=batch.get("title_attention_mask"),
            title_token_type_ids=batch.get("title_token_type_ids"))

    def init(rng, batch):
        return model.init({"params": rng}, **inputs(batch))

    def train_loss(params, batch_stats, batch, rng, margin):
        logits = model.apply({"params": params}, **inputs(batch),
                             deterministic=False, rngs={"dropout": rng})
        loss = _ce(logits, batch["labels"])
        return loss, ({"loss": loss, "acc": _acc(logits, batch["labels"])},
                      batch_stats)

    def eval_metrics(params, batch_stats, batch):
        logits = model.apply({"params": params}, **inputs(batch))
        return {"acc": _acc(logits, batch["labels"]),
                "loss": _ce(logits, batch["labels"])}

    return Task(model, init, train_loss, eval_metrics,
                dynamic_margin=False)
