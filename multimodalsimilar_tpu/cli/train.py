"""`cli train {nlp,multilabel,cv,pair,multimodal,fasttext}` — the
reference's 10 training scripts as one Trainer-backed command family
(SURVEY.md §2.3)."""

from __future__ import annotations

import json
import os
import sys

from multimodalsimilar_tpu.cli.common import (_bert_config, _mesh,
                                              _seq_buckets, _tokenizer)


def _add_common_train_flags(p):
    p.add_argument("--config", help="YAML file preloading flags")
    p.add_argument("--data", required=True, help="train csv/parquet")
    p.add_argument("--eval_data", help="eval csv/parquet")
    p.add_argument("--output", default="./output", help="checkpoint dir")
    p.add_argument("--tokenizer", help="HF tokenizer name/path (offline ok)")
    p.add_argument("--text_col", default="spu_name")
    p.add_argument("--label_col", default="labels")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--max_length", type=int, default=128)
    p.add_argument("--tower_lr", type=float, default=5e-5)
    p.add_argument("--head_lr", type=float, default=1e-2)
    p.add_argument("--head_warmup_frac", type=float, default=0.15)
    p.add_argument("--tower_warmup_frac", type=float, default=0.0,
                   help="linear-scheduler warmup fraction for the tower group\n"
                        "(the single-optimizer pair recipe warms ALL params,\n"
                        "nlp_st_train_daodian.py:153-156)")
    p.add_argument("--optimizer", choices=["adamw", "adamp"],
                   default="adamw",
                   help="adamp = timm recipe (cv_classifier_train.py:68)")
    p.add_argument("--scheduler",
                   choices=["linear", "timm_cosine", "cosine_warm_restarts"],
                   default="linear",
                   help="timm_cosine = CosineLRScheduler(t_initial, "
                        "warmup_t, warmup_lr_init) per-epoch semantics; "
                        "cosine_warm_restarts = torch "
                        "CosineAnnealingWarmRestarts(T_0) "
                        "(cv_classifier_train_daodian.py:264-267)")
    p.add_argument("--t0_epochs", type=int, default=7,
                   help="cosine_warm_restarts restart period")
    p.add_argument("--warmup_epochs", type=int, default=5,
                   help="timm_cosine warmup_t")
    p.add_argument("--warmup_lr_init", type=float, default=1e-3)
    p.add_argument("--lr_min", type=float, default=0.0)
    p.add_argument("--cooldown_epochs", type=int, default=0,
                   help="epochs past t_initial held at lr_min "
                        "(cv_classifier_train.py:60-62)")
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="tower group weight decay")
    p.add_argument("--head_weight_decay", type=float, default=0.0)
    p.add_argument("--eval_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--weighted_sampling", action="store_true")
    p.add_argument("--no_clean", action="store_true",
                   help="tokenize raw titles without preprocess_for_infer — the\n"
                        "v2/v3 recipes do (nlp_classifier_train_daodian_v2.py:52-53);\n"
                        "the 796/daodian recipes clean (nlp_classifier_train.py:53)")
    p.add_argument("--margin", type=float, default=0.4)
    p.add_argument("--margin_delta_per_epoch", type=float, default=0.0)
    p.add_argument("--bert_preset", default="tiny",
                   choices=["tiny", "base", "large"])
    p.add_argument("--fused_loss", action="store_true",
                   help="stream ArcFace+CE over class tiles (wide heads)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer layers in the backward "
                        "pass (less activation HBM, ~+30%% fwd FLOPs)")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "dots"],
                   help="with --remat: 'dots' saves weight-matmul outputs "
                        "and recomputes only elementwise/LN/softmax work "
                        "(cheaper recompute, more activation HBM than "
                        "'full' per-layer remat)")
    p.add_argument("--remat_skip", type=int, default=0, metavar="K",
                   help="with --remat: leave every K-th transformer layer "
                        "un-rematerialized (0 = remat all) — interpolates "
                        "memory/recompute between --remat and no remat; "
                        "standard encoder only")
    p.add_argument("--async_save", action="store_true",
                   help="periodic checkpoint saves block only for the "
                        "device->host state copy; the disk write overlaps "
                        "the next steps (the end-of-run save is always "
                        "completed durably)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in --output")
    p.add_argument("--overwrite", action="store_true",
                   help="discard existing checkpoints in --output and start "
                        "fresh (without this, a non-resume run into a "
                        "populated checkpoint dir fails fast)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of a few steady-state "
                        "steps to DIR (TensorBoard-loadable)")
    p.add_argument("--model_parallel", type=int, default=1, metavar="N",
                   help="mesh model-axis size: shards ArcFace head weights "
                        "(and their optimizer moments) over classes; data "
                        "axis gets devices/N")
    p.add_argument("--tensor_parallel", action="store_true",
                   help="Megatron-style tensor parallelism of the BERT "
                        "tower over the --model_parallel axis (column-"
                        "parallel QKV/MLP-in, row-parallel attn-out/MLP-"
                        "out, vocab-sharded embeddings) — splits tower "
                        "params, Adam moments and the gradient all-reduce "
                        "N-ways; requires --model_parallel N > 1")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="Megatron-style sequence parallelism on top of "
                        "--tensor_parallel: the tower's residual-stream "
                        "activations (and LN/dropout work) shard along the "
                        "sequence axis over the model mesh group. A memory "
                        "lever — best at model axis >= 4 (-22%% per-chip "
                        "temp); this XLA's decomposition adds gather "
                        "traffic, so skip it at N=2 (PERF.md). Requires "
                        "--tensor_parallel")
    p.add_argument("--pipeline_parallel", type=int, default=0, metavar="M",
                   help="GPipe pipeline parallelism of the BERT tower over "
                        "the --model_parallel axis with M microbatches per "
                        "step (bubble (P-1)/(M+P-1)): the layer stack "
                        "becomes one stacked param tree sharded over "
                        "stages — each chip holds num_layers/N layers' "
                        "params + Adam moments. Alternative to "
                        "--tensor_parallel (mutually exclusive); requires "
                        "--model_parallel N > 1 dividing num_layers; the "
                        "per-chip batch must divide by M. Checkpoints use "
                        "the stacked layout (pp_layers)")
    p.add_argument("--grad_accum", type=int, default=1, metavar="K",
                   help="accumulate grads over K micro-batches before each "
                        "optimizer step (effective batch = K*batch_size; "
                        "the _dist recipes' 1024/2048 global batches on "
                        "one chip)")
    p.add_argument("--bf16_grads", action="store_true",
                   help="reduce data-parallel gradients in bfloat16 "
                        "(shard_map psum) — half the per-step all-reduce "
                        "bytes; grads pick up ~1e-2 bf16 rounding and BN "
                        "tasks use per-shard batch statistics. "
                        "Incompatible with --model_parallel")
    p.add_argument("--seed", type=int, default=0)

def _opt_step_units(args, steps_per_epoch):
    """(accum, optimizer steps per epoch, total optimizer steps).

    Schedules advance once per OPTIMIZER step — under --grad_accum K the
    inner transform (and its schedule counter) fires every K micro-steps,
    so schedules must be built in optimizer-step units or warmup/decay
    would stretch K-fold."""
    accum = int(getattr(args, "grad_accum", 1) or 1)
    per_epoch = max(steps_per_epoch // accum, 1)
    return accum, per_epoch, args.epochs * per_epoch

def _trainer(task, args, steps_per_epoch, mesh):
    from multimodalsimilar_tpu.train.optim import (
        adamp, cosine_warm_restarts, dual_group, dual_group_adamw,
        linear_schedule_with_warmup, timm_cosine_schedule)
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    accum, opt_steps_per_epoch, total = _opt_step_units(args,
                                                        steps_per_epoch)
    if args.scheduler == "timm_cosine":
        t_initial = max(args.epochs - args.cooldown_epochs, 1)
        tower_sched = timm_cosine_schedule(
            args.tower_lr, t_initial, opt_steps_per_epoch,
            args.warmup_epochs, args.warmup_lr_init, args.lr_min)
        head_sched = timm_cosine_schedule(
            args.head_lr, t_initial, opt_steps_per_epoch,
            args.warmup_epochs, args.warmup_lr_init, args.lr_min)
    elif args.scheduler == "cosine_warm_restarts":
        tower_sched = cosine_warm_restarts(args.tower_lr, args.t0_epochs,
                                           opt_steps_per_epoch)
        head_sched = cosine_warm_restarts(args.head_lr, args.t0_epochs,
                                          opt_steps_per_epoch)
    else:
        tower_sched = linear_schedule_with_warmup(
            args.tower_lr,
            getattr(args, "tower_warmup_frac", 0.0) * total, total)
        head_sched = linear_schedule_with_warmup(
            args.head_lr, args.head_warmup_frac * total, total)
    import optax
    if args.optimizer == "adamp":
        tx = dual_group(
            adamp(tower_sched, weight_decay=args.weight_decay),
            adamp(head_sched, weight_decay=args.head_weight_decay))
    else:
        tx = dual_group(
            optax.adamw(tower_sched, weight_decay=args.weight_decay),
            optax.adamw(head_sched, weight_decay=args.head_weight_decay))
    if accum > 1:
        # the reference's _dist recipes train at global batch 8x128 / 2048
        # over DataParallel GPUs (nlp_classifier_train_daodian_v2_dist.py:32,
        # .._v3_dist.py:33); K accumulation micro-steps reproduce the same
        # effective batch on fewer chips. Schedules above AND the Trainer's
        # eval_every/save_every/log_every all count optimizer steps.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    cfg = TrainerConfig(
        eval_every=args.eval_every, save_every=args.save_every,
        log_every=args.log_every,
        margin_init=args.margin,
        margin_delta_per_epoch=args.margin_delta_per_epoch,
        checkpoint_dir=os.path.join(args.output, "ckpt"),
        metrics_path=os.path.join(args.output, "metrics.jsonl"),
        profile_dir=args.profile,
        model_parallel_heads=getattr(args, "model_parallel", 1) > 1,
        tensor_parallel=getattr(args, "tensor_parallel", False),
        sequence_parallel=getattr(args, "sequence_parallel", False),
        pipeline_parallel=getattr(args, "pipeline_parallel", 0) > 0,
        bf16_grad_allreduce=getattr(args, "bf16_grads", False),
        grad_accum=accum,
        overwrite=getattr(args, "overwrite", False),
        async_save=getattr(args, "async_save", False),
        seed=args.seed)
    os.makedirs(args.output, exist_ok=True)
    return Trainer(task, tx, mesh, cfg)

def _sampler_fn(args, df, label_col):
    if not args.weighted_sampling:
        return None
    from multimodalsimilar_tpu.data.sampling import (
        WeightedSampler, class_balance_weights)
    w = class_balance_weights(df[label_col].values)
    return lambda epoch: WeightedSampler(w, seed=args.seed + epoch)

def _pad_for_model_parallel(num_labels, args):
    """(head_size, num_valid): pad a class count up to a --model_parallel
    multiple (XLA shards require divisible dims; 10205 = 5*13*157 shares
    no factor with an 8-chip model axis). Pad classes are masked to -inf
    in the task loss/eval (train/tasks._mask_pad) — loss and accuracy are
    identical to the unpadded head."""
    mp = int(getattr(args, "model_parallel", 1) or 1)
    if mp <= 1 or num_labels % mp == 0:
        return num_labels, None
    padded = -(-num_labels // mp) * mp
    print(f"--model_parallel {mp}: padding head {num_labels} -> {padded} "
          f"classes ({padded - num_labels} masked pad classes)",
          file=sys.stderr)
    return padded, num_labels

def cmd_train_nlp(args):
    import pandas as pd
    from multimodalsimilar_tpu.data.datasets import (
        TextClassificationSource, read_table)
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.ops.arcface import ArcFaceParams
    from multimodalsimilar_tpu.train.tasks import text_arcface_task

    df = read_table(args.data, require=[args.text_col, args.label_col])
    tok = _tokenizer(args, save_dir=args.output, df=df)
    src = TextClassificationSource(df, tok, args.text_col, args.label_col,
                                   args.max_length,
                                   clean=not args.no_clean,
                                   seq_buckets=_seq_buckets(args))
    num_labels, num_valid = _pad_for_model_parallel(
        int(df[args.label_col].max()) + 1, args)
    model = NlpTextClassifier(_bert_config(args.bert_preset,
                                       remat=args.remat,
                                       sequence_parallel=args.sequence_parallel,
                                       pipeline_parallel=args.pipeline_parallel,
                                       remat_policy=args.remat_policy,
                                       remat_skip=args.remat_skip),
                              num_labels,
                              arcface=ArcFaceParams(m=args.margin),
                              pool=getattr(args, "pool", "cls"))
    mesh = _mesh(args)
    steps = max(len(df) // args.batch_size, 1)
    trainer = _trainer(text_arcface_task(model, fused_loss=args.fused_loss,
                                         num_valid=num_valid),
                       args, steps, mesh)
    eval_src = None
    if args.eval_data:
        eval_src = TextClassificationSource(
            read_table(args.eval_data), tok, args.text_col, args.label_col,
            args.max_length, clean=not args.no_clean,
            seq_buckets=_seq_buckets(args))
    trainer.fit(src, args.epochs, args.batch_size, eval_src,
                sampler_fn=_sampler_fn(args, df, args.label_col),
                resume=args.resume)

def cmd_train_multilabel(args):
    from multimodalsimilar_tpu.data.datasets import (
        TextClassificationSource, read_table)
    from multimodalsimilar_tpu.models.classifiers import (
        NlpMultilabelClassifier)
    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task

    df = read_table(args.data, require=[args.text_col, args.lv1_col,
                                        args.lv2_col, args.tag_col])
    tok = _tokenizer(args, save_dir=args.output, df=df)
    cols = [args.lv1_col, args.lv2_col, args.tag_col]
    src = TextClassificationSource(df, tok, args.text_col, cols,
                                   args.max_length,
                                   clean=not args.no_clean,
                                   seq_buckets=_seq_buckets(args))
    lv1, v1 = _pad_for_model_parallel(int(df[args.lv1_col].max()) + 1,
                                      args)
    lv2, v2 = _pad_for_model_parallel(int(df[args.lv2_col].max()) + 1,
                                      args)
    tag, vt = _pad_for_model_parallel(int(df[args.tag_col].max()) + 1,
                                      args)
    model = NlpMultilabelClassifier(
        _bert_config(args.bert_preset, remat=args.remat,
                     sequence_parallel=args.sequence_parallel,
                     pipeline_parallel=args.pipeline_parallel,
                     remat_policy=args.remat_policy,
                     remat_skip=args.remat_skip),
        lv1_labels=lv1, lv2_labels=lv2, tag_labels=tag)
    mesh = _mesh(args)
    steps = max(len(df) // args.batch_size, 1)
    task = multilabel_arcface_task(
        model, weights=(args.lv1_weight, args.lv2_weight, args.tag_weight),
        fused_loss=args.fused_loss, num_valid=(v1, v2, vt))

    # label columns keep their own names in multi-label batches
    def renamed(source):
        class Renamed:
            def batches(self, *a, **kw):
                for b in source.batches(*a, **kw):
                    b["lv1_label"] = b.pop(args.lv1_col)
                    b["lv2_label"] = b.pop(args.lv2_col)
                    b["tag_label"] = b.pop(args.tag_col)
                    yield b
        return Renamed()

    eval_src = None
    if args.eval_data:
        eval_src = renamed(TextClassificationSource(
            read_table(args.eval_data), tok, args.text_col, cols,
            args.max_length, clean=not args.no_clean,
            seq_buckets=_seq_buckets(args)))
    trainer = _trainer(task, args, steps, mesh)
    trainer.fit(renamed(src), args.epochs, args.batch_size, eval_src,
                sampler_fn=_sampler_fn(args, df, args.lv2_col),
                resume=args.resume)

def cmd_train_cv(args):
    if args.fused_loss or args.remat or args.remat_skip \
            or args.remat_policy != "full" \
            or getattr(args, "tensor_parallel", False) \
            or getattr(args, "sequence_parallel", False) \
            or getattr(args, "pipeline_parallel", 0):
        raise SystemExit(
            "train cv: --fused_loss/--remat/--remat_policy/--remat_skip/"
            "--tensor_parallel/--sequence_parallel/--pipeline_parallel "
            "apply to the BERT-tower text recipes; the cv task has none "
            "of them — refusing to silently ignore them")
    from multimodalsimilar_tpu.data.datasets import (
        ImageClassificationSource, read_table)
    from multimodalsimilar_tpu.models.vision import (
        CvImageClassifier, backbone_config)
    from multimodalsimilar_tpu.ops.arcface import ArcFaceParams
    from multimodalsimilar_tpu.train.tasks import cv_arcface_task

    df = read_table(args.data, require=[args.key_col, args.label_col])
    steps_per_epoch = max(len(df) // args.batch_size, 1)
    if args.eval_every is None:
        args.eval_every = steps_per_epoch
    if args.save_every is None:
        args.save_every = steps_per_epoch
    src = ImageClassificationSource(df, args.img_root, args.key_col,
                                    args.label_col, args.image_size,
                                    train_aug=True,
                                    decode_cache=args.decode_cache,
                                    emit="uint8")
    cv_labels, cv_valid = _pad_for_model_parallel(
        int(df[args.label_col].max()) + 1, args)
    model = CvImageClassifier(
        backbone_config(args.backbone), num_labels=cv_labels,
        fc_dim=args.fc_dim, arcface=ArcFaceParams(m=args.margin))
    mesh = _mesh(args)
    steps = max(len(df) // args.batch_size, 1)
    trainer = _trainer(cv_arcface_task(model, num_valid=cv_valid),
                       args, steps, mesh)
    eval_src = None
    if args.eval_data:
        eval_src = ImageClassificationSource(
            read_table(args.eval_data), args.img_root, args.key_col,
            args.label_col, args.image_size,
            decode_cache=args.decode_cache, emit="uint8")
    trainer.fit(src, args.epochs, args.batch_size, eval_src,
                sampler_fn=_sampler_fn(args, df, args.label_col),
                resume=args.resume)

def cmd_train_pair(args):
    if args.fused_loss:
        raise SystemExit("train pair: --fused_loss needs an ArcFace head; "
                         "the pair loss is 2-class CE — refusing to "
                         "silently ignore it")
    from multimodalsimilar_tpu.data.datasets import (
        PairTextSource, read_table)
    from multimodalsimilar_tpu.models.classifiers import SiamesePairModel
    from multimodalsimilar_tpu.train.tasks import pair_task

    df = read_table(args.data)
    tok = _tokenizer_pair(args, df)
    src = PairTextSource(df, tok, args.max_length, seed=args.seed,
                         seq_buckets=_seq_buckets(args))
    model = SiamesePairModel(_bert_config(
        args.bert_preset, remat=args.remat,
        sequence_parallel=args.sequence_parallel,
        pipeline_parallel=args.pipeline_parallel,
        remat_policy=args.remat_policy, remat_skip=args.remat_skip))
    mesh = _mesh(args)
    steps = max(len(df) // args.batch_size, 1)
    trainer = _trainer(pair_task(model), args, steps, mesh)
    eval_src = None
    if args.eval_data:
        eval_src = PairTextSource(read_table(args.eval_data), tok,
                                  args.max_length, seed=args.seed,
                                  seq_buckets=_seq_buckets(args))
    # the reference class-balances anchors by inverse tag frequency
    # (nlp_st_train_daodian.py:102-116,131-132)
    trainer.fit(src, args.epochs, args.batch_size, eval_src,
                sampler_fn=_sampler_fn(args, src.df, "tag_id"),
                resume=args.resume)

def _tokenizer_pair(args, df):
    # full train->serve contract like the other train commands: vocab.txt
    # --tokenizer values load as vocab files, and a derived char vocab is
    # persisted to {output}/vocab.txt so serve jobs can reuse the token ids
    return _tokenizer(args, save_dir=args.output, df=df, text_col="title")

def cmd_train_multimodal(args):
    if args.fused_loss:
        raise SystemExit("train multimodal: --fused_loss is not wired for "
                         "the fused-tower task — refusing to silently "
                         "ignore it")
    from multimodalsimilar_tpu.data.datasets import (
        MultimodalSource, read_table)
    from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
    from multimodalsimilar_tpu.models.vision import backbone_config
    from multimodalsimilar_tpu.train.tasks import multimodal_arcface_task

    df = read_table(args.data)
    tok = _tokenizer(args, save_dir=args.output, df=df)
    src = MultimodalSource(df, tok, args.img_root, args.text_col,
                           args.key_col, args.label_col, args.max_length,
                           args.image_size, train_aug=True,
                           decode_cache=args.decode_cache, emit="uint8",
                           seq_buckets=_seq_buckets(args),
                           clean=not args.no_clean)
    mm_labels, mm_valid = _pad_for_model_parallel(
        int(df[args.label_col].max()) + 1, args)
    model = MultimodalClassifier(
        _bert_config(args.bert_preset, remat=args.remat,
                     sequence_parallel=args.sequence_parallel,
                     pipeline_parallel=args.pipeline_parallel,
                     remat_policy=args.remat_policy,
                     remat_skip=args.remat_skip),
        backbone_config(args.backbone),
        num_labels=mm_labels, fc_dim=args.fc_dim)
    mesh = _mesh(args)
    steps = max(len(df) // args.batch_size, 1)
    trainer = _trainer(multimodal_arcface_task(model, num_valid=mm_valid),
                       args, steps, mesh)
    eval_src = None
    if args.eval_data:
        eval_src = MultimodalSource(
            read_table(args.eval_data), tok, args.img_root, args.text_col,
            args.key_col, args.label_col, args.max_length, args.image_size,
            decode_cache=args.decode_cache, emit="uint8",
            seq_buckets=_seq_buckets(args), clean=not args.no_clean)
    trainer.fit(src, args.epochs, args.batch_size, eval_src,
                sampler_fn=_sampler_fn(args, df, args.label_col),
                resume=args.resume)

def cmd_train_fasttext(args):
    import pandas as pd
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.models.fasttext import train_supervised
    df = read_table(args.data)
    K = getattr(args, "chain_steps", None)
    if K is None:
        # measured decision (PERF "fastText component", round 5): the
        # TPU path is dispatch-bound at step-per-program — chaining 8
        # steps per lax.scan program measured 2.0x (163k -> 320k
        # tokens/s); on CPU dispatch is cheap and chaining is a wash
        import jax
        K = 8 if jax.default_backend() != "cpu" else 1
        print(f"train fasttext: --chain_steps {K} "
              f"({jax.default_backend()} default)", file=sys.stderr)
    model = train_supervised(df[args.text_col].astype(str).tolist(),
                             df[args.label_col].tolist(), dim=args.dim,
                             lr=args.lr, epochs=args.epochs,
                             word_ngrams=2, chain_steps=K)
    import pickle
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "fasttext.pkl"), "wb") as f:
        pickle.dump(model, f)
    if args.eval_data:
        ev = read_table(args.eval_data)
        n, p, r = model.test(ev[args.text_col].astype(str).tolist(),
                             ev[args.label_col].tolist())
        print(json.dumps({"n": n, "precision": p, "recall": r}))
