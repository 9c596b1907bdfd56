"""Fused ArcFace + softmax-cross-entropy over class tiles.

The reference computes full [B, C] ArcFace logits and feeds them to
CrossEntropyLoss (nlp_classifier_train.py:116-121). At C = 10205 (the tag
head, nlp_classifier_train_daodian_v2.py:80) and beyond, materializing the
logits in HBM twice (forward + backward) is pure bandwidth waste: softmax-CE
only needs three reductions — max, sum-exp, and the target logit.

``arcface_ce_loss`` streams the class dimension in tiles:

  forward:  lax.scan over class tiles; each tile is one MXU matmul of
            normalized x against normalized w-tile with the margin applied to
            the target column, folded into an online (max, sumexp, target)
            accumulator — the [B, C] matrix never exists.
  backward: custom VJP re-scans the tiles, reconstructing each tile's
            softmax probabilities from the saved (max, sumexp) statistics and
            accumulating dx / dw tile-by-tile (two MXU matmuls per tile).

Gradients are exact (they differentiate the same function; verified against
the naive implementation in tests). Peak memory: O(B·D + C_tile·D + B·C_tile)
instead of O(B·C).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

_EPS = 1e-12


def _norm_rows(v):
    # same contract as ops.arcface.l2_normalize (torch F.normalize) in the
    # fused-kernel rsqrt form; equal to within one ulp for norm >= eps and
    # pinned against the plain path by this module's parity tests
    return v * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS * _EPS))


def _margin_tile(cosine, is_target, m, s, easy_margin):
    cos_m, sin_m = jnp.cos(m), jnp.sin(m)
    sine = jnp.sqrt(jnp.clip(1.0 - cosine * cosine, 0.0, 1.0))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine + cos_m > 0, phi, cosine - sin_m * m)
    return s * jnp.where(is_target, phi, cosine)


def _pad_classes(w, tile_c):
    c = w.shape[0]
    pad = (-c) % tile_c
    if pad:
        pad_rows = jnp.zeros((pad, w.shape[1]), w.dtype).at[:, 0].set(1.0)
        w = jnp.concatenate([w, pad_rows], axis=0)
    return w, c


def _forward_scan(x, w, label, m, s, easy_margin, tile_c):
    """Returns (loss [B], (max [B], sumexp [B]))."""
    xn = _norm_rows(x.astype(jnp.float32))
    wp, c = _pad_classes(w.astype(jnp.float32), tile_c)
    tiles = wp.reshape(-1, tile_c, wp.shape[1])
    n_tiles = tiles.shape[0]
    b = x.shape[0]
    m = jnp.asarray(m, jnp.float32)

    def body(carry, inp):
        run_max, run_sum, target = carry
        t_idx, w_tile = inp
        wn = _norm_rows(w_tile)
        cosine = jnp.dot(xn, wn.T, preferred_element_type=jnp.float32)
        col = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 1)
               + t_idx * tile_c)
        is_target = col == label[:, None]
        valid = col < c
        logits = _margin_tile(cosine, is_target, m, s, easy_margin)
        logits = jnp.where(valid, logits, -jnp.inf)
        tile_max = jnp.max(logits, axis=1)
        new_max = jnp.maximum(run_max, tile_max)
        # rescale the running sum to the new max (online logsumexp)
        run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.sum(
            jnp.where(valid, jnp.exp(logits - new_max[:, None]), 0.0),
            axis=1)
        target = target + jnp.sum(
            jnp.where(is_target, logits, 0.0), axis=1)
        return (new_max, run_sum, target), None

    init = (jnp.full((b,), -jnp.inf, jnp.float32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.float32))
    (run_max, run_sum, target), _ = jax.lax.scan(
        body, init, (jnp.arange(n_tiles), tiles))
    lse = run_max + jnp.log(run_sum)
    return lse - target, (run_max, run_sum)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def arcface_ce_loss(x, weight, label, m, s=64.0, easy_margin=False,
                    tile_c: int = 1024):
    """Per-example ArcFace cross-entropy loss [B], blockwise over classes.

    Same math as CE(arcface_logits(x, weight, label, m, s), label) — the
    [B, C] logits are never materialized.
    """
    loss, _ = _forward_scan(x, weight, label, m, s, easy_margin, tile_c)
    return loss


def _fwd(x, weight, label, m, s, easy_margin, tile_c):
    loss, (run_max, run_sum) = _forward_scan(x, weight, label, m, s,
                                             easy_margin, tile_c)
    return loss, (x, weight, label, jnp.asarray(m, jnp.float32),
                  run_max, run_sum)


def _bwd(s, easy_margin, tile_c, res, g):
    """g: [B] cotangent of per-example losses.

    d loss / d logits = softmax(logits) - onehot; chain through the margin
    and the row/tile normalizations tile-by-tile.
    """
    x, weight, label, m, run_max, run_sum = res
    x32 = x.astype(jnp.float32)
    xn = _norm_rows(x32)
    wp, c = _pad_classes(weight.astype(jnp.float32), tile_c)
    tiles = wp.reshape(-1, tile_c, wp.shape[1])
    n_tiles = tiles.shape[0]

    def tile_grad(t_idx, w_tile):
        wn32 = w_tile.astype(jnp.float32)

        def tile_loss_contrib(xn_in, w_in, m_in):
            """This tile's contribution to (sumexp-part, target-part) of the
            loss, as a function of *normalized x*, raw tile weights, and the
            margin — differentiable, [B,tile] only."""
            wn = _norm_rows(w_in)
            cosine = jnp.dot(xn_in, wn.T,
                             preferred_element_type=jnp.float32)
            col = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 1)
                   + t_idx * tile_c)
            is_target = col == label[:, None]
            valid = col < c
            logits = _margin_tile(cosine, is_target,
                                  m_in, s, easy_margin)
            exp_part = jnp.sum(
                jnp.where(valid, jnp.exp(logits - run_max[:, None]), 0.0),
                axis=1) / run_sum
            target_part = jnp.sum(jnp.where(is_target, logits, 0.0),
                                  axis=1)
            # per-example loss contribution (summing over tiles gives the
            # exact total: sum_t exp_part_t = 1 -> lse term contributes
            # log(run_sum)+run_max overall; its gradient splits per tile
            # as softmax weights, which is what exp_part's grad yields)
            return exp_part, target_part

        def scalarized(xn_in, w_in, m_in):
            e, t = tile_loss_contrib(xn_in, w_in, m_in)
            # d lse / d logits within the tile = softmax = d(e)/d(logits)
            # (e is already normalized by the global run_sum); total loss
            # cotangent: g * (d e_term) - g * (d target term)
            return jnp.sum(g * e) - jnp.sum(g * t)

        return jax.grad(scalarized, argnums=(0, 1, 2))(xn, wn32, m)

    def body(carry, inp):
        dxn_acc, dm_acc = carry
        t_idx, w_tile = inp
        dxn, dw_tile, dm = tile_grad(t_idx, w_tile)
        return (dxn_acc + dxn, dm_acc + dm), dw_tile

    (dxn_total, dm_total), dw_tiles = jax.lax.scan(
        body, (jnp.zeros_like(xn), jnp.zeros((), jnp.float32)),
        (jnp.arange(n_tiles), tiles))
    dw = dw_tiles.reshape(-1, wp.shape[1])[:weight.shape[0]]

    # chain dxn -> dx through the row normalization of x
    _, nvjp = jax.vjp(lambda v: _norm_rows(v), x32)
    dx = nvjp(dxn_total)[0].astype(x.dtype)
    # dm: only the target entries' phi depends on the margin, and the
    # per-tile grad above chains softmax - onehot through it exactly
    return dx, dw.astype(weight.dtype), None, dm_total


arcface_ce_loss.defvjp(_fwd, _bwd)


def cosine_argmax(x, weight, tile_c: int = 1024) -> jnp.ndarray:
    """Blockwise argmax of the cosine logits [B] — the margin-free top-1
    prediction, without materializing [B, C]. No gradient (metrics only)."""
    xn = _norm_rows(jax.lax.stop_gradient(x).astype(jnp.float32))
    wp, c = _pad_classes(jax.lax.stop_gradient(weight).astype(jnp.float32),
                         tile_c)
    tiles = wp.reshape(-1, tile_c, wp.shape[1])

    def body(carry, inp):
        best_val, best_idx = carry
        t_idx, w_tile = inp
        wn = _norm_rows(w_tile)
        cosine = jnp.dot(xn, wn.T, preferred_element_type=jnp.float32)
        col = (jax.lax.broadcasted_iota(jnp.int32, cosine.shape, 1)
               + t_idx * tile_c)
        cosine = jnp.where(col < c, cosine, -jnp.inf)
        tile_val = jnp.max(cosine, axis=1)
        tile_idx = jnp.argmax(cosine, axis=1) + t_idx * tile_c
        take = tile_val > best_val
        return (jnp.where(take, tile_val, best_val),
                jnp.where(take, tile_idx, best_idx)), None

    b = x.shape[0]
    init = (jnp.full((b,), -jnp.inf, jnp.float32),
            jnp.zeros((b,), jnp.int32))
    (_, best_idx), _ = jax.lax.scan(
        body, init, (jnp.arange(tiles.shape[0]), tiles))
    return best_idx
