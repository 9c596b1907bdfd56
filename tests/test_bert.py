"""Flax BERT encoder parity vs HF torch BertModel (random weights, no hub)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import BertConfig as HFBertConfig, BertModel

from multimodalsimilar_tpu.models.bert import BertConfig, BertEncoderModel
from multimodalsimilar_tpu.models.hf_import import bert_params_from_torch
from multimodalsimilar_tpu.utils.dtypes import DTypePolicy


@pytest.fixture(scope="module")
def pair():
    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    model = BertEncoderModel(cfg, policy=DTypePolicy.full_precision())
    params = bert_params_from_torch(hf.state_dict(), cfg)
    return hf, model, params, cfg


def _inputs(cfg, batch=4, seq=16, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size, size=(batch, seq))
    mask = np.ones((batch, seq), np.int32)
    # ragged padding on half the rows
    mask[::2, seq // 2:] = 0
    types = rng.integers(0, 2, size=(batch, seq))
    return ids.astype(np.int32), mask, types.astype(np.int32)


def test_matches_hf_outputs(pair):
    hf, model, params, cfg = pair
    ids, mask, types = _inputs(cfg)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long(),
                  token_type_ids=torch.from_numpy(types).long())
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(mask), jnp.asarray(types))
    np.testing.assert_allclose(
        got["pooler_output"], want.pooler_output.numpy(),
        rtol=1e-4, atol=1e-4)
    # padded positions diverge (HF computes garbage there; we only assert
    # attended positions, which is what both poolings consume)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"])[m],
        want.last_hidden_state.numpy()[m], rtol=1e-4, atol=1e-4)


def test_bf16_policy_close_to_fp32(pair):
    hf, _, params, cfg = pair
    ids, mask, types = _inputs(cfg)
    bf16_model = BertEncoderModel(cfg)  # default policy: bf16 compute
    got = bf16_model.apply({"params": params}, jnp.asarray(ids),
                           jnp.asarray(mask), jnp.asarray(types))
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long(),
                  token_type_ids=torch.from_numpy(types).long())
    # bf16 has ~3 decimal digits; embeddings must stay directionally exact.
    a = np.asarray(got["pooler_output"], np.float32)
    b = want.pooler_output.numpy()
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1))
    assert cos.min() > 1 - 1e-3


def test_jit_static_shapes(pair):
    _, model, params, cfg = pair
    ids, mask, types = _inputs(cfg)
    f = jax.jit(lambda p, i, m, t: model.apply({"params": p}, i, m, t))
    out = f(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
    assert out["pooler_output"].shape == (4, cfg.hidden_size)


def test_fused_qkv_matches_unfused(pair):
    """fused_qkv packs the same weights into one projection — outputs must
    be identical to the 3-matmul path."""
    import dataclasses
    hf, _, _, cfg = pair
    unfused_cfg = dataclasses.replace(cfg, fused_qkv=False)
    fused_params = bert_params_from_torch(hf.state_dict(), cfg)
    unfused_params = bert_params_from_torch(hf.state_dict(), unfused_cfg)
    ids, mask, types = _inputs(cfg)
    out_f = BertEncoderModel(cfg, DTypePolicy.full_precision()).apply(
        {"params": fused_params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types))
    out_u = BertEncoderModel(unfused_cfg,
                             DTypePolicy.full_precision()).apply(
        {"params": unfused_params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types))
    np.testing.assert_allclose(np.asarray(out_f["pooler_output"]),
                               np.asarray(out_u["pooler_output"]),
                               rtol=1e-5, atol=1e-6)


def test_inference_policy_parity(pair):
    """bf16-everything inference policy keeps cosine distance ~1e-5 of fp32
    (far inside the 1e-3 parity bound that gates production use)."""
    hf, _, params, cfg = pair
    ids, mask, types = _inputs(cfg)
    import torch
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long(),
                  token_type_ids=torch.from_numpy(types).long()
                  ).pooler_output.numpy()
    out = np.asarray(
        BertEncoderModel(cfg, DTypePolicy.inference()).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(types))["pooler_output"], np.float32)
    cos = (out * want).sum(-1) / (np.linalg.norm(out, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert cos.min() > 1 - 1e-3


def _train_loss_and_grads(cfg, ids, mask, params=None, use_jit=True):
    """Scalar train-style loss + grads for a config (dropout off so the
    remat variants are comparable). ``params=None`` inits fresh (seed 0,
    identical across configs — remat knobs don't touch param shapes)."""
    model = BertEncoderModel(cfg, DTypePolicy())   # f32 everywhere
    if params is None:
        params = model.init({"params": jax.random.key(0)}, ids, mask,
                            deterministic=True)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, ids, mask,
                          deterministic=True)
        return jnp.sum(out["pooler_output"] ** 2)

    f = jax.value_and_grad(loss_fn)
    if use_jit:
        loss, grads = jax.jit(f)(params)
    else:
        with jax.disable_jit():
            loss, grads = f(params)
    return float(loss), grads


def _flat(tree):
    return np.concatenate([np.asarray(l, np.float64).ravel()
                           for l in jax.tree_util.tree_leaves(tree)])


_REMAT_VARIANTS = (dict(remat=True),
                   dict(remat=True, remat_policy="dots"),
                   dict(remat=True, remat_skip=2),
                   dict(remat=True, remat_skip=3, remat_policy="dots"))


def test_remat_variants_match_no_remat_interpreted():
    """--remat, --remat_policy dots and --remat_skip K change WHAT is
    saved for the backward pass, never the math: under disable_jit
    (where jax.checkpoint evaluates as identity-of-computation) every
    variant's loss and grads equal the no-remat encoder bit-for-bit."""
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, size=(4, 16)).astype(np.int32))
    mask = jnp.ones((4, 16), jnp.int32)
    base = BertConfig.tiny(num_layers=4)
    ref_loss, ref_grads = _train_loss_and_grads(base, ids, mask,
                                                use_jit=False)
    for kw in _REMAT_VARIANTS:
        loss, grads = _train_loss_and_grads(
            BertConfig.tiny(num_layers=4, **kw), ids, mask, use_jit=False)
        assert loss == ref_loss, kw
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            grads, ref_grads)


def test_remat_variants_match_no_remat_jitted():
    """Jitted remat grads match no-remat within this fixture's own
    measured order-sensitivity.

    Bit-equality under jit is NOT a property remat can promise: XLA
    compiles the recomputed forward into the backward with different
    fusion/association, and this fixture amplifies reassociation —
    permuting the batch rows (mathematically invariant for a sum loss)
    moves the NO-REMAT graph's grads by ~0.16 abs / 1.2e-3 l2rel, the
    same magnitude as the remat deltas; an f64 ground-truth probe shows
    every remat variant lands as close to the true grads as the
    no-remat graph does (CPU: remat 2.8e-3 vs interpreted 7.0e-3
    l2rel; TPU: 6.2-7.9e-3 vs 7.1e-3 no-remat). So the bound here is
    self-calibrating: remat error ≤ 64× the measured permutation
    sensitivity (a real wrong-backward bug is orders beyond that), and
    the interpreted-mode bit-equality above pins the math identity."""
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, size=(4, 16)).astype(np.int32))
    mask = jnp.ones((4, 16), jnp.int32)
    base = BertConfig.tiny(num_layers=4)
    model = BertEncoderModel(base, DTypePolicy())
    params = model.init({"params": jax.random.key(0)}, ids, mask,
                        deterministic=True)["params"]
    ref_loss, ref_grads = _train_loss_and_grads(base, ids, mask, params)
    ref_flat = _flat(ref_grads)

    # Measure intrinsic order-sensitivity of THIS graph: batch-row
    # permutation leaves the summed loss/grads mathematically unchanged
    # but reassociates every reduction.
    perm = np.array([1, 0, 3, 2])
    _, perm_grads = _train_loss_and_grads(base, ids[perm], mask[perm],
                                          params)
    sens = np.linalg.norm(_flat(perm_grads) - ref_flat)
    ref_norm = np.linalg.norm(ref_flat)
    # Floor: never assert tighter than f32 noise even if the perm probe
    # got lucky on some backend.
    tol = max(64.0 * sens, 1e-4 * ref_norm)

    for kw in _REMAT_VARIANTS:
        loss, grads = _train_loss_and_grads(
            BertConfig.tiny(num_layers=4, **kw), ids, mask, params)
        assert abs(loss - ref_loss) <= 1e-4 * abs(ref_loss), kw
        err = np.linalg.norm(_flat(grads) - ref_flat)
        assert err <= tol, (kw, err, tol, float(sens))


def test_remat_skip_refused_under_pipeline_parallel():
    """The PP scan body is layer-uniform — per-layer remat choices must
    refuse loudly, not silently apply to no layer."""
    cfg = BertConfig.tiny(num_layers=2, pipeline_parallel=True,
                          pp_microbatches=1, remat=True, remat_skip=2)
    model = BertEncoderModel(cfg, DTypePolicy())
    ids = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(ValueError, match="remat_skip"):
        model.init({"params": jax.random.key(0)}, ids,
                   jnp.ones((2, 8), jnp.int32), deterministic=True)


def test_remat_knobs_require_remat_cli():
    from multimodalsimilar_tpu.cli.common import _bert_config
    with pytest.raises(SystemExit, match="remat"):
        _bert_config("tiny", remat=False, remat_policy="dots")
    with pytest.raises(SystemExit, match="remat"):
        _bert_config("tiny", remat=False, remat_skip=2)
    cfg = _bert_config("tiny", remat=True, remat_policy="dots",
                       remat_skip=3)
    assert cfg.remat_policy == "dots" and cfg.remat_skip == 3
