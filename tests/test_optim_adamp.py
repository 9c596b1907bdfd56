"""AdamP + timm CosineLRScheduler parity (cv_classifier_train.py:68-72).

timm is not installed in this environment, so the oracles are torch/python
restatements of timm's published AdamP optimizer (timm/optim/adamp.py, the
ClovaAI algorithm) and CosineLRScheduler._get_lr (t_in_epochs=True,
warmup_prefix=False, cycle_limit=1) — the exact configuration the reference
uses. Layout note: timm's channel view takes dim-0 rows (torch puts output
features first); our adamp takes last-axis rows (Flax puts output features
last), so the torch oracle runs on W and ours on W.T.
"""

import math

import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from multimodalsimilar_tpu.train.optim import adamp, timm_cosine_schedule


# -- oracle: timm.optim.AdamP semantics -------------------------------------


def _torch_adamp_step(p, g, state, lr, b1=0.9, b2=0.999, eps=1e-8,
                      weight_decay=0.0, delta=0.1, wd_ratio=0.1,
                      nesterov=False):
    state["step"] += 1
    bc1 = 1 - b1 ** state["step"]
    bc2 = 1 - b2 ** state["step"]
    state["m"].mul_(b1).add_(g, alpha=1 - b1)
    state["v"].mul_(b2).addcmul_(g, g, value=1 - b2)
    denom = (state["v"].sqrt() / math.sqrt(bc2)).add_(eps)
    step_size = lr / bc1
    perturb = ((b1 * state["m"] + (1 - b1) * g) if nesterov
               else state["m"]) / denom
    wd = 1.0
    if len(p.shape) > 1:
        for view in (lambda x: x.reshape(x.size(0), -1),
                     lambda x: x.reshape(1, -1)):
            cos = torch.nn.functional.cosine_similarity(
                view(g), view(p), dim=1, eps=eps).abs_()
            if cos.max() < delta / math.sqrt(view(p).size(1)):
                expand = [-1] + [1] * (len(p.shape) - 1)
                p_n = p / view(p).norm(dim=1).view(expand).add(eps)
                perturb = perturb - p_n * view(p_n * perturb).sum(
                    dim=1).view(expand)
                wd = wd_ratio
                break
    if weight_decay > 0:
        p.mul_(1 - lr * weight_decay * wd)
    p.add_(perturb, alpha=-step_size)


@pytest.mark.parametrize("nesterov", [False, True])
@pytest.mark.parametrize("weight_decay", [0.0, 1e-2])
def test_adamp_matches_timm_semantics(nesterov, weight_decay):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    # [out, in] torch layout; scale-invariant-looking weight (unit rows, so
    # random grads are near-orthogonal -> projection fires) + a 1-D bias
    w = torch.nn.functional.normalize(torch.randn(6, 40), dim=1) * 1.0
    b = torch.randn(6)
    params_t = {"w": w.clone(), "b": b.clone()}
    state_t = {k: {"step": 0, "m": torch.zeros_like(v),
                   "v": torch.zeros_like(v)} for k, v in params_t.items()}

    params_j = {"w": jnp.asarray(w.numpy().T), "b": jnp.asarray(b.numpy())}
    tx = adamp(1e-2, weight_decay=weight_decay, nesterov=nesterov)
    opt_state = tx.init(params_j)

    for step in range(6):
        g_w = torch.from_numpy(
            rng.normal(size=(6, 40)).astype(np.float32))
        # mix in one aligned-gradient step so the no-projection branch runs
        if step == 3:
            g_w = params_t["w"].clone() * 2.0
        g_b = torch.from_numpy(rng.normal(size=(6,)).astype(np.float32))
        for name, g in (("w", g_w), ("b", g_b)):
            _torch_adamp_step(params_t[name], g, state_t[name], lr=1e-2,
                              weight_decay=weight_decay, nesterov=nesterov)
        grads_j = {"w": jnp.asarray(g_w.numpy().T),
                   "b": jnp.asarray(g_b.numpy())}
        updates, opt_state = tx.update(grads_j, opt_state, params_j)
        params_j = optax.apply_updates(params_j, updates)

    np.testing.assert_allclose(np.asarray(params_j["w"]).T,
                               params_t["w"].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params_j["b"]),
                               params_t["b"].numpy(), rtol=1e-5, atol=1e-6)


def test_adamp_conv_kernel_projection_matches():
    """4-D kernel: torch OIHW vs Flax HWIO — same channel-row semantics."""
    rng = np.random.default_rng(1)
    w_oihw = torch.nn.functional.normalize(
        torch.from_numpy(rng.normal(size=(8, 4, 3, 3)).astype(np.float32))
        .reshape(8, -1), dim=1).reshape(8, 4, 3, 3)
    params_t = {"w": w_oihw.clone()}
    state_t = {"w": {"step": 0, "m": torch.zeros_like(w_oihw),
                     "v": torch.zeros_like(w_oihw)}}
    to_hwio = lambda x: np.transpose(x, (2, 3, 1, 0))  # noqa: E731
    params_j = {"w": jnp.asarray(to_hwio(w_oihw.numpy()))}
    tx = adamp(5e-3)
    opt_state = tx.init(params_j)
    for _ in range(4):
        g = torch.from_numpy(
            rng.normal(size=(8, 4, 3, 3)).astype(np.float32))
        _torch_adamp_step(params_t["w"], g, state_t["w"], lr=5e-3)
        grads_j = {"w": jnp.asarray(to_hwio(g.numpy()))}
        updates, opt_state = tx.update(grads_j, opt_state, params_j)
        params_j = optax.apply_updates(params_j, updates)
    np.testing.assert_allclose(to_hwio(params_t["w"].numpy()),
                               np.asarray(params_j["w"]),
                               rtol=1e-5, atol=1e-6)


# -- oracle: timm CosineLRScheduler._get_lr ----------------------------------


def _timm_cosine_lr(t, lr, t_initial, warmup_t, warmup_lr_init, lr_min=0.0):
    """timm/scheduler/cosine_lr.py with t_in_epochs=True, warmup_prefix=False,
    cycle_mul=1, cycle_decay=1, cycle_limit=1 (the reference's config)."""
    if t < warmup_t:
        return warmup_lr_init + t * (lr - warmup_lr_init) / warmup_t
    i = t // t_initial
    if i >= 1:  # cycle_limit=1
        return lr_min
    t_curr = t - t_initial * i
    return lr_min + 0.5 * (lr - lr_min) * (
        1 + math.cos(math.pi * t_curr / t_initial))


def test_timm_cosine_schedule_golden():
    # the reference's exact numbers: lr=1e-4, t_initial=300 training epochs,
    # warmup_t=5, warmup_lr_init=1e-3 (warmup DECAYS: init > lr), 10 cooldown
    lr, t_init, warm, winit = 1e-4, 300, 5, 1e-3
    spe = 7  # steps per epoch
    sched = timm_cosine_schedule(lr, t_init, spe, warm, winit)
    for epoch in [0, 1, 4, 5, 6, 150, 299, 300, 305, 309]:
        want = _timm_cosine_lr(epoch, lr, t_init, warm, winit)
        for step_in_epoch in (0, spe - 1):
            got = float(sched(epoch * spe + step_in_epoch))
            assert got == pytest.approx(want, rel=1e-6), (epoch,
                                                          step_in_epoch)
