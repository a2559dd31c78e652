"""Optimizer / schedule behavior pins.

LARS expectations follow the published algorithm (arXiv:1708.03888) with the
reference's conventions: weight decay folded into the gradient *before* the
trust-ratio rescale, 1-D params exempt from both, vanilla momentum SGD
underneath. SGD expectations cross-checked against torch.optim.SGD."""

import numpy as np
import torch

import jax.numpy as jnp

from pixflow_tpu.train import (
    lars_sgd, sgd, frozen_momentum_branch_mask,
    warmup_cosine, warmup_multistep,
)
from pixflow_tpu.train.schedule import scale_lr, ETA_MIN

RNG = np.random.default_rng(4)


def _tree(params_np):
    return {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
            for k, v in params_np.items()}


def test_sgd_matches_torch():
    w = RNG.standard_normal((4, 3)).astype(np.float32)
    b = RNG.standard_normal((3,)).astype(np.float32)
    gw = RNG.standard_normal((4, 3)).astype(np.float32)
    gb = RNG.standard_normal((3,)).astype(np.float32)
    lr, mu, wd = 0.1, 0.9, 1e-2

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b.copy()))
    opt = torch.optim.SGD([tw, tb], lr=lr, momentum=mu, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        opt.step()

    params = _tree({"m": {"w": w, "b": b}})
    grads = _tree({"m": {"w": gw, "b": gb}})
    tx = sgd(lr, momentum=mu, weight_decay=wd)
    st = tx.init(params)
    for _ in range(3):
        upd, st = tx.update(grads, st, params)
        params = {"m": {k: params["m"][k] + upd["m"][k] for k in ("w", "b")}}

    np.testing.assert_allclose(np.asarray(params["m"]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["m"]["b"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_lars_trust_ratio_math():
    w = RNG.standard_normal((8, 8)).astype(np.float32)
    g = RNG.standard_normal((8, 8)).astype(np.float32)
    lr, mu, wd, trust, eps = 0.5, 0.9, 1e-5, 1e-3, 1e-8

    # expected (one step, momentum buffer starts at 0)
    g_wd = g + wd * w
    a = trust * np.linalg.norm(w) / (np.linalg.norm(g_wd) + eps)
    want = w - lr * (g_wd * a)

    params = _tree({"m": {"w": w}})
    tx = lars_sgd(lr, momentum=mu, weight_decay=wd, trust_coef=trust, eps=eps)
    st = tx.init(params)
    upd, st = tx.update(_tree({"m": {"w": g}}), st, params)
    got = np.asarray(params["m"]["w"] + upd["m"]["w"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lars_skips_1d_params():
    b = RNG.standard_normal((5,)).astype(np.float32)
    g = RNG.standard_normal((5,)).astype(np.float32)
    lr = 0.5
    params = _tree({"m": {"b": b}})
    tx = lars_sgd(lr, momentum=0.9, weight_decay=1e-2)
    st = tx.init(params)
    upd, _ = tx.update(_tree({"m": {"b": g}}), st, params)
    # no weight decay, no trust scaling: plain -lr * g
    np.testing.assert_allclose(np.asarray(upd["m"]["b"]), -lr * g, rtol=1e-6)


def test_frozen_mask_blocks_momentum_branch():
    params = {"encoder": {"w": jnp.ones((3, 3))},
              "encoder_k": {"w": jnp.ones((3, 3))}}
    grads = {"encoder": {"w": jnp.ones((3, 3))},
             "encoder_k": {"w": jnp.zeros((3, 3))}}
    mask = frozen_momentum_branch_mask(params)
    assert mask["encoder_k"]["w"] is True
    tx = lars_sgd(0.1, weight_decay=1e-2, frozen_mask=mask)
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    # without the mask, weight decay alone would move encoder_k
    np.testing.assert_allclose(np.asarray(upd["encoder_k"]["w"]), 0.0)
    assert np.abs(np.asarray(upd["encoder"]["w"])).sum() > 0


def test_warmup_cosine_boundary_values():
    base, epochs, warm, spe, mult = 4.0, 100, 5, 10, 100.0
    sch = warmup_cosine(base, epochs, warm, spe, mult)
    # t=0: base/multiplier
    np.testing.assert_allclose(float(sch(0)), base / mult, rtol=1e-6)
    # t=warmup_steps: base
    np.testing.assert_allclose(float(sch(warm * spe)), base, rtol=1e-6)
    # mid-cosine follows the closed form
    t_max = (epochs - warm) * spe
    t = warm * spe + t_max // 2
    want = ETA_MIN + (base - ETA_MIN) * (1 + np.cos(
        np.pi * (t - warm * spe) / t_max)) / 2
    np.testing.assert_allclose(float(sch(t)), want, rtol=1e-6)
    # end of training: eta_min
    np.testing.assert_allclose(float(sch(warm * spe + t_max)), ETA_MIN,
                               atol=1e-8)


def test_warmup_cosine_monotonic_warmup():
    sch = warmup_cosine(1.0, 10, 2, 5, 100.0)
    vals = [float(sch(t)) for t in range(11)]
    assert all(b > a for a, b in zip(vals, vals[1:]))


def test_warmup_multistep_decays():
    sch = warmup_multistep(1.0, warmup_epoch=1, steps_per_epoch=10,
                           decay_epochs=(3, 5), decay_rate=0.1)
    np.testing.assert_allclose(float(sch(10)), 1.0, rtol=1e-6)   # warmup end
    np.testing.assert_allclose(float(sch(31)), 0.1, rtol=1e-6)   # after 1st
    np.testing.assert_allclose(float(sch(51)), 0.01, rtol=1e-6)  # after 2nd


def test_linear_lr_scaling_rule():
    # lr = global_batch/256 * base (reference main_pretrain.py:62,69)
    assert scale_lr(1.0, 1024) == 4.0
    assert scale_lr(0.03, 256) == 0.03
