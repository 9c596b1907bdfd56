"""BERT/RoBERTa encoder in Flax — the text tower backbone.

The reference wraps a HF torch ``BertModel`` ('hfl/chinese-roberta-wwm-ext',
a BERT-architecture model despite the RoBERTa name) and consumes either its
``pooler_output`` (transformer_emb.py:15-30) or a masked mean over
``last_hidden_state`` (transformer_seq_emb.py:15-32). This module provides the
same contract as a native Flax implementation designed for TPU:

* bfloat16 compute / float32 params & softmax (MXU-friendly),
* static [B, S] shapes (S <= 128 in every reference job) so XLA tiles all
  matmuls onto the systolic array,
* one fused attention einsum chain per layer — at S=128 a flash-attention
  kernel buys nothing; the FLOPs live in the 4 dense projections + MLP, which
  XLA already maps to the MXU back-to-back.

Weights import 1:1 from a HF torch state_dict via
``multimodalsimilar_tpu.models.hf_import.bert_params_from_torch``.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128              # bert-base-chinese / roberta-wwm vocab
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # One [H, 3*H] projection instead of three [H, H] matmuls. Measured
    # *slower* on v5e at the production shape (55.2 vs 50.2 ms/batch —
    # the post-matmul slicing costs more than the merge saves), so the
    # default stays False; kept as an option for other shapes.
    fused_qkv: bool = False
    # Rematerialize each transformer layer in the backward pass
    # (jax.checkpoint): trades ~30% more forward FLOPs for not holding every
    # layer's activations in HBM — enables bigger train batches. Measured
    # sweep in PERF.md (round 2).
    remat: bool = False
    # Two finer-grained points between full remat (~20% step-time cost at
    # the large tower) and no remat (cannot compile the flagship batch on
    # one 16 GB chip — PERF.md "Large tower"):
    # * remat_policy="dots": jax.checkpoint with
    #   dots_with_no_batch_dims_saveable — weight-matmul outputs are SAVED,
    #   only elementwise/LN/softmax/attention work recomputes. Much cheaper
    #   recompute, much larger residency than per-layer full remat.
    # * remat_skip=k: every k-th layer (i % k == 0) is NOT rematerialized —
    #   memory/recompute interpolates between the extremes. 0 = remat all.
    #   Standard encoder only (the PP scan body must be layer-uniform).
    remat_policy: str = "full"
    remat_skip: int = 0
    # Megatron-style sequence parallelism over the tensor-parallel mesh
    # axis: the residual stream (and the LN/dropout work on it) is sharded
    # along the sequence axis between the TP matmul regions, cutting the
    # saved-activation memory per chip ~N-ways. Constraint points follow
    # Korthikanti et al. 2022; requires tensor_parallel training (the
    # Trainer enables the mesh — parallel/sp.py; a no-op otherwise).
    sequence_parallel: bool = False
    # GPipe pipeline parallelism over the mesh `model` axis
    # (parallel/pp.py): the transformer stack becomes ONE stacked
    # [L, ...] param tree (``pp_layers/stack``) sharded over pipeline
    # stages; the forward runs the SPMD GPipe schedule when the Trainer
    # scopes a mesh, else a sequential lax.scan with identical math.
    # Param layout converters: stack_layer_params / unstack_layer_params.
    pipeline_parallel: bool = False
    # GPipe microbatches per step (bubble fraction (P-1)/(M+P-1)); the
    # per-chip batch must divide by it.
    pp_microbatches: int = 4

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        """Small config for tests."""
        base = dict(vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=64)
        base.update(kw)
        return cls(**base)

    @classmethod
    def roberta_wwm_ext(cls, **kw) -> "BertConfig":
        """hfl/chinese-roberta-wwm-ext (base, 768-d)."""
        return cls(**kw)

    @classmethod
    def roberta_wwm_ext_large(cls, **kw) -> "BertConfig":
        """hfl/chinese-roberta-wwm-ext-large (readme.md:20)."""
        return cls(hidden_size=1024, num_layers=24, num_heads=16,
                   intermediate_size=4096, **kw)


def _remat_policy(cfg: "BertConfig"):
    """jax.checkpoint policy for the config — None (save nothing, the
    classic full per-layer remat) or dots_with_no_batch_dims_saveable
    (weight-matmul outputs saved; only elementwise/LN/softmax/attention
    batched-matmul work recomputes)."""
    if cfg.remat_policy == "full":
        return None
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"remat_policy must be 'full' or 'dots', "
                     f"got {cfg.remat_policy!r}")


def _sp(x, cfg: "BertConfig"):
    """Sequence-parallel residual-stream constraint (no-op unless the
    config opts in AND the Trainer enabled the mesh — parallel/sp.py)."""
    if not cfg.sequence_parallel:
        return x
    from multimodalsimilar_tpu.parallel.sp import seq_shard
    return seq_shard(x)


class BertSelfAttention(nn.Module):
    config: BertConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, hidden, mask_bias, deterministic: bool):
        cfg, pol = self.config, self.policy
        head_dim = cfg.hidden_size // cfg.num_heads
        if cfg.fused_qkv:
            qkv = nn.DenseGeneral(
                (3, cfg.num_heads, head_dim), dtype=pol.compute_dtype,
                param_dtype=pol.param_dtype, name="qkv")(hidden)
            q, k, v = (qkv[..., 0, :, :], qkv[..., 1, :, :],
                       qkv[..., 2, :, :])
        else:
            dense = lambda name: nn.DenseGeneral(
                (cfg.num_heads, head_dim), dtype=pol.compute_dtype,
                param_dtype=pol.param_dtype, name=name)
            q = dense("query")(hidden)
            k = dense("key")(hidden)
            v = dense("value")(hidden)
        # [B, H, S, S] scores, accumulated and softmaxed in float32.
        scores = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=pol.reduce_dtype)
        scores = scores / jnp.sqrt(jnp.asarray(head_dim, pol.reduce_dtype))
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhst,bthd->bshd", probs.astype(pol.compute_dtype), v,
                         preferred_element_type=pol.reduce_dtype)
        out = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1),
                              dtype=pol.compute_dtype,
                              param_dtype=pol.param_dtype, name="out")(
            ctx.astype(pol.compute_dtype))
        return out


class BertLayer(nn.Module):
    config: BertConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, hidden, mask_bias, deterministic: bool):
        cfg, pol = self.config, self.policy
        attn = BertSelfAttention(cfg, pol, name="attention")(
            hidden, mask_bias, deterministic)
        # Megatron-SP boundary points: the row-parallel projection outputs
        # (attn, mlp) and the LN outputs constrain to sequence-sharded, so
        # dropout / residual-add / LN run (and their saved activations
        # live) at [B, S/N, H]; GSPMD inserts the gathers feeding the next
        # column-parallel matmul. All are no-ops without sequence_parallel.
        attn = _sp(attn, cfg)
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic)
        hidden = nn.LayerNorm(cfg.layer_norm_eps, dtype=pol.reduce_dtype,
                              param_dtype=pol.param_dtype,
                              name="attention_norm")(hidden + attn)
        hidden = _sp(hidden.astype(pol.compute_dtype), cfg)

        mlp = nn.Dense(cfg.intermediate_size, dtype=pol.compute_dtype,
                       param_dtype=pol.param_dtype, name="intermediate")(hidden)
        mlp = nn.gelu(mlp, approximate=False)  # HF 'gelu' is the erf form
        mlp = nn.Dense(cfg.hidden_size, dtype=pol.compute_dtype,
                       param_dtype=pol.param_dtype, name="output")(mlp)
        mlp = _sp(mlp, cfg)
        mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic)
        hidden = nn.LayerNorm(cfg.layer_norm_eps, dtype=pol.reduce_dtype,
                              param_dtype=pol.param_dtype,
                              name="output_norm")(hidden + mlp)
        return _sp(hidden.astype(pol.compute_dtype), cfg)


class PipelinedBertLayers(nn.Module):
    """The transformer stack as ONE stacked [L, ...] param pytree, executed
    by the GPipe schedule (parallel/pp.py) when a pipeline mesh is active
    and by a sequential ``lax.scan`` otherwise. Same per-layer math as the
    ``layer_<i>`` modules (it IS ``BertLayer.apply`` under the hood);
    ``stack_layer_params``/``unstack_layer_params`` convert checkpoints
    between the two layouts."""

    config: BertConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, hidden, mask_bias, deterministic: bool):
        from multimodalsimilar_tpu.parallel import pp
        cfg, pol = self.config, self.policy
        layer_mod = BertLayer(cfg, pol)

        def init_stack(rng):
            # one init per layer (distinct weights, like the named layer_<i>
            # modules), vmapped into the stacked [L, ...] layout; batch row
            # 0 is enough — param shapes don't depend on the batch.
            def one(key):
                return layer_mod.init({"params": key}, hidden[:1],
                                      mask_bias[:1], True)["params"]
            return jax.vmap(one)(jax.random.split(rng, cfg.num_layers))

        stacked = self.param("stack", init_stack)
        use_dropout = (not deterministic
                       and (cfg.hidden_dropout > 0
                            or cfg.attention_dropout > 0))
        rng = (self.make_rng("dropout") if use_dropout
               else jax.random.key(0))

        def layer_fn(p_l, h, mb, key):
            return layer_mod.apply(
                {"params": p_l}, h, mb, deterministic,
                rngs={"dropout": key} if use_dropout else None)

        if cfg.remat_skip:
            raise ValueError(
                "remat_skip requires the standard encoder: the pipeline-"
                "parallel stack runs one uniform scan body per layer, so "
                "per-layer remat choices cannot apply (use remat_policy "
                "or drop --pipeline_parallel)")
        if cfg.remat:
            layer_fn = jax.checkpoint(layer_fn, policy=_remat_policy(cfg))
        return pp.gpipe(layer_fn, stacked, hidden, mask_bias, rng,
                        cfg.pp_microbatches)


def stack_layer_params(params: dict, num_layers: int) -> dict:
    """Convert a sequential encoder param tree (``layer_0..layer_{L-1}``)
    into the ``pipeline_parallel`` layout (``pp_layers/stack`` with a
    leading [L] axis). Non-layer keys (embeddings, pooler, norms) pass
    through unchanged — HF warm starts compose as
    ``stack_layer_params(bert_params_from_torch(sd), L)``."""
    out = {k: v for k, v in params.items() if not k.startswith("layer_")}
    layers = [params[f"layer_{i}"] for i in range(num_layers)]
    out["pp_layers"] = {
        "stack": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)}
    return out


def unstack_layer_params(params: dict) -> dict:
    """Inverse of ``stack_layer_params`` (for reverse export / inspection)."""
    out = {k: v for k, v in params.items() if k != "pp_layers"}
    stack = params["pp_layers"]["stack"]
    n = jax.tree_util.tree_leaves(stack)[0].shape[0]
    for i in range(n):
        out[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stack)
    return out


def stack_tree(tree):
    """Recursively convert every sequential ``layer_<i>`` block in a param
    pytree into the pipeline-parallel stacked layout (inverse of
    ``unstack_tree``; layer count inferred from the keys) — lets
    reference/HF imports warm-start ``--pipeline_parallel`` training.
    No-op on trees without ``layer_<i>`` nodes."""
    if isinstance(tree, dict):
        n = sum(1 for k in tree if k.startswith("layer_"))
        if n:
            tree = stack_layer_params(tree, n)
        return {k: (v if k == "pp_layers" else stack_tree(v))
                for k, v in tree.items()}
    return tree


def unstack_tree(tree):
    """Recursively convert every pipeline-parallel stacked layer tree in a
    param pytree back to the sequential ``layer_<i>`` layout — lets the
    reverse exporters (and any sequential-layout consumer) accept
    checkpoints trained with ``--pipeline_parallel``. No-op on trees
    without a ``pp_layers`` node."""
    if isinstance(tree, dict):
        if "pp_layers" in tree:
            tree = unstack_layer_params(tree)
        return {k: unstack_tree(v) for k, v in tree.items()}
    return tree


class BertEncoderModel(nn.Module):
    """Embeddings + transformer stack + tanh pooler (= HF BertModel)."""

    config: BertConfig
    policy: DTypePolicy = DTypePolicy()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic: bool = True):
        cfg, pol = self.config, self.policy
        B, S = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, S), jnp.int32)
        if position_ids is None:
            position_ids = jnp.arange(S, dtype=jnp.int32)[None, :]

        embed = lambda n, v: nn.Embed(
            v, cfg.hidden_size, param_dtype=pol.param_dtype, name=n)
        h = (embed("word_embeddings", cfg.vocab_size)(input_ids)
             + embed("position_embeddings",
                     cfg.max_position_embeddings)(position_ids)
             + embed("token_type_embeddings",
                     cfg.type_vocab_size)(token_type_ids))
        h = nn.LayerNorm(cfg.layer_norm_eps, dtype=pol.reduce_dtype,
                         param_dtype=pol.param_dtype,
                         name="embeddings_norm")(h)
        h = _sp(h, cfg)   # embeddings LN/dropout region is seq-sharded too
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic)
        h = h.astype(pol.compute_dtype)

        # Additive attention bias: 0 for attended, big-negative for padding.
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                              jnp.finfo(pol.reduce_dtype).min)
        mask_bias = mask_bias.astype(pol.reduce_dtype)

        if cfg.pipeline_parallel:
            h = PipelinedBertLayers(cfg, pol, name="pp_layers")(
                h, mask_bias, deterministic)
        else:
            # static_argnums counts self at 0:
            # (h=1, mask_bias=2, deterministic=3)
            layer_cls = (nn.remat(BertLayer, static_argnums=(3,),
                                  policy=_remat_policy(cfg))
                         if cfg.remat else BertLayer)
            for i in range(cfg.num_layers):
                cls = (BertLayer if cfg.remat and cfg.remat_skip
                       and i % cfg.remat_skip == 0 else layer_cls)
                h = cls(cfg, pol, name=f"layer_{i}")(
                    h, mask_bias, deterministic)

        pooled = nn.Dense(cfg.hidden_size, dtype=pol.compute_dtype,
                          param_dtype=pol.param_dtype, name="pooler")(h[:, 0])
        pooled = jnp.tanh(pooled.astype(pol.reduce_dtype))
        return {"last_hidden_state": h, "pooler_output": pooled}
