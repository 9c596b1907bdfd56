"""`cli eval` / `cli import-checkpoint` / `cli export-checkpoint` —
standalone margin-free evaluation and reference-checkpoint interop."""

from __future__ import annotations

import json
import sys

from multimodalsimilar_tpu.cli.common import (
    _bert_config, _ckpt_has_pp, _mesh, _require_tokenizer_with_checkpoint,
    _restore_required, _seq_buckets, _tokenizer)


def cmd_eval(args):
    """Margin-free evaluation of a checkpoint on a labeled dataset (the
    reference's in-loop is_test=True eval, as a standalone job)."""
    import jax
    from multimodalsimilar_tpu.data.datasets import (
        TextClassificationSource, read_table)
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.train.optim import dual_group_adamw
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig

    df = read_table(args.data)
    _require_tokenizer_with_checkpoint(args)
    tok = _tokenizer(args, df=df)
    src = TextClassificationSource(df, tok, args.text_col, args.label_col,
                                   args.max_length,
                                   seq_buckets=_seq_buckets(args))
    # what this split's labels actually require of the head — enforced
    # against the checkpoint REGARDLESS of --num_labels (out-of-range
    # labels flow into clamped gathers and silently bogus loss/accuracy)
    data_implied = int(df[args.label_col].max()) + 1
    # --num_labels: the TRAINING class count (head size BEFORE any
    # --model_parallel padding); without it the width is derived from
    # this split, which breaks if the split lacks the top label
    num_labels = args.num_labels or data_implied
    # raw (template-free) restore BEFORE building the model: the checkpoint
    # is the ground truth for the head width — `train --model_parallel N`
    # pads the class count to a divisible one (_pad_for_model_parallel), so
    # a data-inferred width would fail restore with a shape error. Eval at
    # the checkpoint's width with the pad logits masked to -inf, exactly
    # like the in-loop eval (tasks._mask_pad).
    restored = _restore_required(args.checkpoint) if args.checkpoint \
        else None
    num_valid = None
    head_w = (restored or {}).get("params", {}).get("head", {}).get("weight")
    if head_w is not None:
        head_classes = int(head_w.shape[0])
        if head_classes < data_implied:
            raise SystemExit(
                f"eval: checkpoint head has {head_classes} classes but the "
                f"data implies {data_implied} (max {args.label_col} + 1) — "
                f"labels out of the head's range. Wrong checkpoint, wrong "
                f"--label_col, or a label map mismatch.")
        if args.num_labels:
            # masked (pad) classes must not appear as labels either —
            # a -inf true-class logit is an always-wrong row + inf loss
            if not data_implied <= args.num_labels <= head_classes:
                raise SystemExit(
                    f"eval: --num_labels {args.num_labels} must lie in "
                    f"[data-implied {data_implied}, checkpoint head "
                    f"{head_classes}] — it is the TRAINING class count "
                    f"(the head size before --model_parallel padding)")
            if args.num_labels < head_classes:
                print(f"eval: checkpoint head {head_classes} classes, "
                      f"--num_labels {args.num_labels} valid — masking "
                      f"{head_classes - args.num_labels} pad classes like "
                      f"the in-loop eval", file=sys.stderr, flush=True)
                num_valid = args.num_labels
        elif head_classes > data_implied:
            # Head WIDER than the data implies: either model-parallel
            # class padding (a few dead pad rows) or an eval split that
            # simply lacks the top training labels. Only the user knows
            # the true trained class count, and masking anything below it
            # would hide REAL trained classes (inflating accuracy vs the
            # in-loop eval, which masks only the pad rows).
            raise SystemExit(
                f"eval: checkpoint head has {head_classes} classes, data "
                f"implies only {data_implied}. Pass --num_labels with the "
                f"TRAINING class count so only model-parallel pad classes "
                f"are masked (e.g. --num_labels 10205 for a 10208-padded "
                f"head); an inferred count would mask real classes.")
        num_labels = head_classes
    model = NlpTextClassifier(
        _bert_config(args.bert_preset,
                     pipeline_parallel=int(_ckpt_has_pp(args.checkpoint))),
        num_labels, pool=args.pool)
    mesh = _mesh(args)
    trainer = Trainer(text_arcface_task(model, num_valid=num_valid),
                      dual_group_adamw(lambda s: 0.0, lambda s: 0.0), mesh,
                      TrainerConfig(log_every=10**9))
    # drop_remainder=False: shapes only — and datasets smaller than the
    # batch size must not yield an empty iterator
    batch = next(src.batches(args.batch_size, shuffle=False,
                             drop_remainder=False))
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    state = trainer.init_state_from_device_batch(shard_batch(mesh, batch))
    if restored is not None:
        # graft params/batch_stats from the raw restore: eval needs no
        # optimizer state, and a template built with one optimizer cannot
        # restore checkpoints from another (--optimizer adamp,
        # --grad_accum, or import-checkpoint outputs). Re-place onto the
        # eval mesh explicitly: a raw restore keeps the SAVED placement
        # (import-checkpoint writes single-device arrays), and mixing it
        # with the mesh-placed step/margin is a jit device error.
        from multimodalsimilar_tpu.parallel.mesh import replicated
        repl = replicated(mesh)
        state = state.replace(
            params=jax.device_put(restored["params"], repl),
            batch_stats=(jax.device_put(restored["batch_stats"], repl)
                         if restored.get("batch_stats")
                         else state.batch_stats))
    # drop_remainder=False: evaluate the WHOLE split (matching trainer.fit's
    # in-loop eval), not just the full batches
    metrics = trainer.evaluate(state, src.batches(args.batch_size,
                                                  shuffle=False,
                                                  drop_remainder=False))
    print(json.dumps({k: float(v) for k, v in metrics.items()}))

def cmd_import_checkpoint(args):
    """Migrate a reference torch checkpoint (state_dict .pt) into an orbax
    checkpoint usable by every pipeline here.

    For whole-module pickles (torch.save(model)), first extract the
    state_dict with the reference code importable:
        torch.save(torch.load('model.pt').state_dict(), 'sd.pt')
    """
    import torch
    from multimodalsimilar_tpu.models import reference_import as ri
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.train.checkpoint import CheckpointManager

    sd = torch.load(args.state_dict, map_location="cpu",
                    weights_only=True)
    bert_cfg = _bert_config(args.bert_preset)
    if args.kind == "nlp":
        params = ri.nlp_classifier_from_reference(sd, bert_cfg)
        stats = {}
    elif args.kind == "multilabel":
        params = ri.multilabel_classifier_from_reference(sd, bert_cfg)
        stats = {}
    elif args.kind == "siamese":
        params = ri.siamese_from_reference(sd, bert_cfg)
        stats = {}
    elif args.kind in ("cv", "multimodal"):
        from multimodalsimilar_tpu.models.vision import backbone_config
        if not isinstance(backbone_config(args.backbone),
                          EfficientNetConfig):
            raise SystemExit(
                "import-checkpoint: reference cv/multimodal checkpoints are "
                "timm EfficientNets (cv_classifier_train_daodian.py:190) — "
                "pass an efficientnet_* backbone. ViT/ConvNeXt towers train "
                "from scratch or import timm weights via "
                "hf_import.{vit,convnext}_params_from_timm.")
        if args.kind == "cv":
            params, stats = ri.cv_classifier_from_reference(
                sd, EfficientNetConfig.variant(args.backbone))
        else:
            params, stats = ri.multimodal_from_reference(
                sd, bert_cfg, EfficientNetConfig.variant(args.backbone))
    else:
        raise SystemExit(f"unknown kind {args.kind}")
    if getattr(args, "pipeline_parallel", 0):
        if args.kind == "cv":
            # mirrors cmd_train_cv's refusal: the cv tower has no BERT
            # layer stack, so stack_tree would silently no-op
            raise SystemExit(
                "import-checkpoint: --pipeline_parallel shards the BERT "
                "layer stack; --kind cv has no text tower, so the flag "
                "would have no effect. Drop it (train cv refuses it too).")
        # write the stacked (pp_layers) layout so `train --resume` /
        # warm starts with --pipeline_parallel restore structurally
        from multimodalsimilar_tpu.models.bert import stack_tree
        params = stack_tree(params)
    ckpt = CheckpointManager(args.out)
    # same fail-fast discipline as Trainer.fit: importing step 0 into a
    # directory holding a previous run's LATER steps would be silently
    # shadowed (restore() picks latest_step), serving the old model
    # instead of the imported reference weights
    existing = ckpt.latest_step()
    if existing is not None and not args.overwrite:
        raise SystemExit(
            f"import-checkpoint: {args.out} already holds checkpoints "
            f"(latest step {existing}); the imported step-0 weights would "
            f"be shadowed by them on restore. Pass --overwrite to clear "
            f"the directory, or use a fresh --out.")
    if existing is not None:
        ckpt.clear()
    ckpt.save(0, {"params": params, "batch_stats": stats}, force=True)
    print(json.dumps({"imported": args.kind, "out": args.out}))

def cmd_export_checkpoint(args):
    """The inverse of import-checkpoint: write an orbax checkpoint back out
    as a reference-layout torch state_dict (.pt) loadable with
    load_state_dict(strict=True) by the reference's own modules — serve a
    model trained here with the unmodified reference inference scripts."""
    import torch
    import numpy as np
    from multimodalsimilar_tpu.models import reference_export as re_
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.train.checkpoint import CheckpointManager

    if args.kind in ("cv", "multimodal"):
        from multimodalsimilar_tpu.models.vision import backbone_config
        if not isinstance(backbone_config(args.backbone),
                          EfficientNetConfig):
            raise SystemExit(
                "export-checkpoint: ViT/ConvNeXt backbones have no "
                "reference equivalent (the reference CvClassifier requires "
                "a timm CNN with a .classifier head, cv_classifier.py:24) "
                "— only EfficientNet checkpoints export.")
    state = CheckpointManager(args.checkpoint).restore()
    if state is None:
        raise SystemExit(f"no checkpoint found at {args.checkpoint}")
    # PP checkpoints store the tower stack as pp_layers/stack; the
    # reference layout is per-layer — unstack first (no-op otherwise)
    from multimodalsimilar_tpu.models.bert import unstack_tree
    params = unstack_tree(state["params"])
    stats = state.get("batch_stats", {})
    bert_cfg = _bert_config(args.bert_preset)
    if args.kind == "nlp":
        sd = re_.nlp_classifier_to_reference(params, bert_cfg)
    elif args.kind == "multilabel":
        sd = re_.multilabel_classifier_to_reference(params, bert_cfg)
    elif args.kind == "siamese":
        sd = re_.siamese_to_reference(params, bert_cfg)
    elif args.kind == "cv":
        sd = re_.cv_classifier_to_reference(
            params, stats, EfficientNetConfig.variant(args.backbone))
    elif args.kind == "multimodal":
        sd = re_.multimodal_to_reference(
            params, stats, bert_cfg,
            EfficientNetConfig.variant(args.backbone))
    else:
        raise SystemExit(f"unknown kind {args.kind}")
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    torch.save(tensors, args.out)
    print(json.dumps({"exported": args.kind, "out": args.out,
                      "tensors": len(tensors)}))
