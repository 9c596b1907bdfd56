"""Embedder construction shared by the embed / similar / serve command
families: checkpointed text, cv and multimodal towers in the measured
serving config (DTypePolicy.inference, folded BN)."""

from __future__ import annotations

import os
import sys

from multimodalsimilar_tpu.cli.common import (
    _bert_config, _ckpt_has_pp, _emb_cache,
    _require_tokenizer_with_checkpoint, _restore_required, _tokenizer)


def _load_cv_tower(args, checkpoint, num_labels):
    """(model, variables) in the measured serving config —
    DTypePolicy.inference() (+43% on EffNet-B4) with BN folded into convs
    (+12%, exact math). ONE construction site: `similar daodian` used to
    hand-roll the tower on the training dtype path with unfolded BN."""
    import jax
    import jax.numpy as jnp
    from multimodalsimilar_tpu.models.vision import (
        CvImageClassifier, backbone_config)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    cfg = backbone_config(args.backbone)
    model = CvImageClassifier(cfg, num_labels=num_labels,
                              fc_dim=args.fc_dim,
                              policy=DTypePolicy.inference())
    if checkpoint:
        # restore supplies the full params/batch_stats tree — a jitted
        # init here would be minutes of relay compile whose output the
        # restore discards wholesale
        state = _restore_required(checkpoint)
        variables = {"params": state["params"],
                     "batch_stats": state.get("batch_stats", {})}
    else:
        x = jnp.zeros((1, args.image_size, args.image_size, 3))
        variables = jax.jit(lambda x: model.init(
            {"params": jax.random.key(0)}, x,
            label=jnp.zeros(1, jnp.int32)))(x)
    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    if isinstance(cfg, EfficientNetConfig):
        # fold BN into convs for serving; ViT backbones have no BN to fold
        from multimodalsimilar_tpu.models.fold_bn import fold_cv_classifier
        folded_cfg, variables = fold_cv_classifier(
            jax.device_get(variables), cfg)
        model = CvImageClassifier(folded_cfg, num_labels=num_labels,
                                  fc_dim=args.fc_dim,
                                  policy=DTypePolicy.inference())
    return model, variables

def _build_cv_embed_fn(args):
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder

    model, variables = _load_cv_tower(args, args.checkpoint,
                                      args.num_labels)
    embedder = ImageEmbedder(
        model, variables, image_size=args.image_size,
        batch_size=args.batch_size,
        cache_path_for_key=lambda k: os.path.join(args.img_root, str(k),
                                                  "emb.txt"),
        cache=_emb_cache(args), emb_dim=args.fc_dim)

    def embed_fn(sub):
        keys = sub[args.key_col].astype(str).tolist()
        return embedder.embed_keys(
            keys, lambda k: [os.path.join(args.img_root, k, f"{i}.jpg")
                             for i in range(8)])

    return embed_fn

def _build_text_embedder(args, df=None):
    """TextEmbedder from a checkpoint (or random init for smoke runs)."""
    import jax
    import jax.numpy as jnp
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.pipelines.embedders import TextEmbedder

    _require_tokenizer_with_checkpoint(args)
    # _tokenizer reads --data itself only in the vocab-from-corpus case;
    # callers pass their already-loaded df so a multi-GB table isn't read
    # twice (and the --tokenizer branch never needs it at all)
    tok = _tokenizer(args, df=df)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy
    ckpt_pp = _ckpt_has_pp(getattr(args, "checkpoint", None))
    model = NlpTextClassifier(_bert_config(args.bert_preset,
                                           pipeline_parallel=int(ckpt_pp)),
                              args.num_labels,
                              pool=getattr(args, "pool", "cls"),
                              policy=DTypePolicy.inference())
    sample = tok(["x"], args.max_length)
    # init under jit: eager flax init dispatches one device round-trip per
    # parameter (minutes for a base BERT through the TPU relay)
    variables = jax.jit(lambda x: model.init(
        {"params": jax.random.key(0)}, x,
        label=jnp.zeros(x.shape[0], jnp.int32)))(
            jnp.asarray(sample["input_ids"]))
    if args.checkpoint:
        state = _restore_required(args.checkpoint)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
    if getattr(args, "int8", False):
        # loud, like --fused_loss/--pallas_topk: real + tested, but the
        # bf16 policy measured faster through this XLA path
        from multimodalsimilar_tpu.models.quant import (
            QuantTextEmbModel, quantize_text_tower_params)
        print("--int8: int8 PTQ text tower — cosine parity < 1e-3, but "
              "measured slower than the bf16 default on this harness "
              "(PERF.md headroom #2)", file=sys.stderr)
        if ckpt_pp:
            raise SystemExit(
                "--int8: the int8 PTQ tower does not support the "
                "pipeline-parallel stacked layout; export the checkpoint "
                "to the sequential layout first "
                "(models.bert.unstack_layer_params) or drop --int8")
        model = QuantTextEmbModel(_bert_config(args.bert_preset),
                                  pool=getattr(args, "pool", "cls"),
                                  policy=DTypePolicy.inference())
        variables = {"params":
                     quantize_text_tower_params(variables["params"])}
    from multimodalsimilar_tpu.utils.buckets import parse_buckets
    buckets = parse_buckets(getattr(args, "length_buckets", None))
    return TextEmbedder(model, variables, tok, args.max_length,
                        args.batch_size, length_buckets=buckets)

def _build_embed_fn(args, df=None):
    """key->embedding dict interface over the text embedder (the batch
    jobs' merge-by-key contract, goodssku_emb.py:183-195)."""
    embedder = _build_text_embedder(args, df=df)

    def embed_fn(sub):
        em = embedder(sub[args.text_col].astype(str).tolist())
        return dict(zip(sub[args.key_col].astype(str), em))

    return embed_fn

def _embed_fn_from_embedder(embedder):
    """texts -> [N, D] by calling the TextEmbedder directly — the serve
    hot path must not pay a DataFrame+dict round-trip per micro-batch on
    this host's one slow CPU (review finding)."""
    def embed_texts(texts):
        import numpy as np
        return np.asarray(embedder(list(texts)))

    return embed_texts

def _build_embed_fn_texts(args, df=None):
    return _embed_fn_from_embedder(_build_text_embedder(args, df=df))

def _multimodal_embedder(args, df):
    """MultimodalEmbedder over the checkpointed fused tower — shared by
    the offline similar job (_fused_embeddings) and the online serving
    daemon (serve --tower multimodal)."""
    from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
    from multimodalsimilar_tpu.models.vision import backbone_config
    from multimodalsimilar_tpu.pipelines.embedders import MultimodalEmbedder
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    _require_tokenizer_with_checkpoint(args)   # same garbage-vocab trap
    tok = _tokenizer(args, df=df)
    model = MultimodalClassifier(
        _bert_config(args.bert_preset,
                     pipeline_parallel=int(_ckpt_has_pp(args.checkpoint))),
        backbone_config(args.backbone),
        num_labels=args.num_labels, fc_dim=args.fc_dim,
        policy=DTypePolicy.inference())
    # no init here: the checkpoint is mandatory on this path, and a jitted
    # init of a fused B4+BERT tower costs minutes of relay compile for a
    # result the restore would discard wholesale
    state = _restore_required(args.checkpoint)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return MultimodalEmbedder(model, variables, tok, args.max_length,
                              args.image_size, args.batch_size)

def _fused_embeddings(args, df, embedder=None):
    """Compute fused 2560-d embeddings in-process from a multimodal
    checkpoint — what the reference job does (multimodal_infer.py:119-134
    torch.loads the model and embeds per row). Returns (embeddings,
    surviving row positions): rows whose image fails to load are skipped
    like the reference's per-row try/except."""
    import numpy as np

    from multimodalsimilar_tpu.data import images as I

    if embedder is None:
        embedder = _multimodal_embedder(args, df)
    # decode + embed in bounded chunks: a warehouse-scale table must not
    # hold every decoded image in host RAM at once (~433 KB per 380px row)
    chunk_rows = max(args.batch_size, 1) * 8
    keys = df[args.key_col].astype(str).tolist()
    texts_all = df[args.text_col].astype(str).tolist()
    out_parts, keep = [], []
    for s in range(0, len(df), chunk_rows):
        imgs, texts = [], []
        for pos in range(s, min(s + chunk_rows, len(df))):
            img = I.load_eval(
                os.path.join(args.img_root, f"{keys[pos]}.jpg"),
                args.image_size, normalize_host=False)
            if img is None:
                continue
            imgs.append(img)
            keep.append(pos)
            texts.append(texts_all[pos])
        if imgs:
            out_parts.append(embedder(np.stack(imgs), texts))
    if not keep:
        raise SystemExit(f"no readable images under {args.img_root} for "
                         f"any row — check --img_root/--key_col")
    return np.concatenate(out_parts), keep
