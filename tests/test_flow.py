"""Flow composition and cycle-consistency behavior pins.

Expectations are computed independently with PyTorch public ops
(grid_sample/interpolate) following the paper's Eq. 1 and arXiv:1711.07837,
i.e. the same math the reference implements."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from pixflow_tpu.ops import (
    concat_flow,
    all_concat_flow,
    forward_backward_consistency,
    compose_and_mask,
    mask_ratio,
)

RNG = np.random.default_rng(1)


def _torch_compose(flows_kbhwc):
    """Independent composition: advect a coord grid through each flow."""
    k, b, h, w, _ = flows_kbhwc.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.stack([xs, ys], axis=0)[None].repeat(b, 0).astype(np.float32)
    coords = torch.from_numpy(base.copy())  # [B, 2, H, W]
    for i in range(k):
        flow = torch.from_numpy(np.transpose(flows_kbhwc[i], (0, 3, 1, 2)))
        gx = 2 * coords[:, 0] / (w - 1) - 1
        gy = 2 * coords[:, 1] / (h - 1) - 1
        grid = torch.stack([gx, gy], dim=-1)
        sampled = tF.grid_sample(flow, grid, align_corners=True)
        coords = coords + sampled
    out = coords - torch.from_numpy(base)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def test_concat_flow_single_is_identity():
    flows = RNG.standard_normal((1, 2, 6, 8, 2)).astype(np.float32)
    out = np.asarray(concat_flow(jnp.asarray(flows)))
    np.testing.assert_allclose(out, flows[0])


@pytest.mark.parametrize("k", [2, 3, 5])
def test_concat_flow_matches_independent_composition(k):
    flows = (2.0 * RNG.standard_normal((k, 2, 10, 12, 2))).astype(np.float32)
    want = _torch_compose(flows)
    got = np.asarray(concat_flow(jnp.asarray(flows)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_concat_flow_zero_flows_compose_to_zero():
    flows = np.zeros((4, 1, 5, 5, 2), np.float32)
    out = np.asarray(concat_flow(jnp.asarray(flows)))
    np.testing.assert_allclose(out, 0.0)


def test_concat_flow_constant_translation_composes_additively():
    # Two constant 1-px-right flows compose to 2 px wherever the warped
    # lookup stays in bounds.
    flows = np.zeros((2, 1, 8, 8, 2), np.float32)
    flows[..., 0] = 1.0
    out = np.asarray(concat_flow(jnp.asarray(flows)))
    np.testing.assert_allclose(out[0, :, :6, 0], 2.0, atol=1e-5)


def test_all_concat_flow_window_structure():
    k, b, h, w = 3, 1, 6, 6
    fwd = RNG.standard_normal((k, b, h, w, 2)).astype(np.float32)
    bwd = RNG.standard_normal((k, b, h, w, 2)).astype(np.float32)
    f_s, b_s = all_concat_flow(jnp.asarray(fwd), jnp.asarray(bwd),
                               use_flow_frames=True)
    assert f_s.shape[0] == k * (k + 1) // 2  # spans: 3x len1, 2x len2, 1x len3
    # span-1 entries are the raw flows in order
    np.testing.assert_allclose(np.asarray(f_s[0]), fwd[0])
    np.testing.assert_allclose(np.asarray(f_s[1]), fwd[1])
    np.testing.assert_allclose(np.asarray(f_s[2]), fwd[2])
    # backward windows mirror: first span-1 backward window is bwd[k-1:k]
    np.testing.assert_allclose(np.asarray(b_s[0]), bwd[2])
    np.testing.assert_allclose(np.asarray(b_s[2]), bwd[0])
    # final entry is the full composition
    np.testing.assert_allclose(np.asarray(f_s[-1]),
                               _torch_compose(fwd), rtol=1e-4, atol=1e-4)


def test_fused_upsample_compose_matches_materialized():
    from pixflow_tpu.ops import upflow8
    k, b, h, w = 3, 2, 4, 5
    flows = RNG.standard_normal((k, b, h, w, 2)).astype(np.float32)
    fused = concat_flow(jnp.asarray(flows), upsample8=True)
    up = jnp.stack([upflow8(jnp.asarray(flows[i])) for i in range(k)])
    materialized = concat_flow(up)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(materialized),
                               rtol=1e-4, atol=1e-4)


def test_cycle_consistency_perfect_flow_is_trusted():
    # fwd = +2px right, bwd = -2px: perfect cycle, interior pixels trusted.
    b, h, w = 1, 12, 16
    fwd = np.zeros((b, h, w, 2), np.float32)
    bwd = np.zeros((b, h, w, 2), np.float32)
    fwd[..., 0] = 2.0
    bwd[..., 0] = -2.0
    mask = np.asarray(forward_backward_consistency(
        jnp.asarray(fwd), jnp.asarray(bwd), alpha_1=0.01, alpha_2=0.5))
    assert mask.shape == (b, h, w)
    # interior pixels whose +2px target stays strictly in bounds are trusted
    # (rows 0 and h-1 sit exactly at |y|=1 and fail the strict bound, same
    # as the reference's `< 1` check)
    # (pixel w-3 lands exactly on the last column, |x|=1, also rejected)
    assert mask[0, 1:h - 1, :w - 3].all()
    assert not mask[0, 0].any() and not mask[0, h - 1].any()
    # pixels that warp onto or past the frame edge are not trusted
    assert not mask[0, :, w - 3:].any()


def test_cycle_consistency_inconsistent_flow_is_rejected():
    b, h, w = 1, 12, 16
    fwd = np.zeros((b, h, w, 2), np.float32)
    bwd = np.zeros((b, h, w, 2), np.float32)
    fwd[..., 0] = 3.0
    bwd[..., 0] = 4.0  # cycle residual of 7px: far beyond tolerance
    mask = np.asarray(forward_backward_consistency(
        jnp.asarray(fwd), jnp.asarray(bwd), alpha_1=0.01, alpha_2=0.5))
    assert not mask.any()


def test_cycle_consistency_alpha2_tolerance_scale():
    # residual below alpha_2/sqrt(h^2+w^2) in normalized units passes
    b, h, w = 1, 10, 10
    fwd = np.zeros((b, h, w, 2), np.float32)
    bwd = np.zeros((b, h, w, 2), np.float32)
    mask_tight = np.asarray(forward_backward_consistency(
        jnp.asarray(fwd), jnp.asarray(bwd), 0.01, 0.5))
    # zero flow, zero residual: all interior pixels pass; exact-boundary
    # pixels sit at |coord|=1 and fail the strict in-bounds check
    assert mask_tight[0, 1:-1, 1:-1].all()
    assert not mask_tight[0, 0].any()


def test_compose_and_mask_headline_path():
    """nframe=6 recipe shape contract: 5 flows/sample at 1/8 res, flow_up."""
    b, k, h, w = 2, 5, 6, 8
    fwd = 0.5 * RNG.standard_normal((b, k, h, w, 2)).astype(np.float32)
    bwd = 0.5 * RNG.standard_normal((b, k, h, w, 2)).astype(np.float32)
    flow_f, flow_b, m_f, m_b = compose_and_mask(
        jnp.asarray(fwd), jnp.asarray(bwd),
        flow_up=True, use_flow_frames=False, alpha_1=0.01, alpha_2=0.5)
    assert flow_f.shape == (b, 8 * h, 8 * w, 2)
    assert flow_b.shape == (b, 8 * h, 8 * w, 2)
    assert m_f.shape == (b, 8 * h, 8 * w) and m_f.dtype == jnp.bool_
    r = mask_ratio(m_f)
    assert r.shape == (b,)
    assert ((0.0 <= np.asarray(r)) & (np.asarray(r) <= 1.0)).all()


def test_compose_and_mask_no_mask_when_alphas_none():
    b, k, h, w = 1, 2, 4, 4
    fwd = RNG.standard_normal((b, k, h, w, 2)).astype(np.float32)
    bwd = RNG.standard_normal((b, k, h, w, 2)).astype(np.float32)
    flow_f, flow_b, m_f, m_b = compose_and_mask(
        jnp.asarray(fwd), jnp.asarray(bwd), flow_up=False,
        use_flow_frames=False, alpha_1=None, alpha_2=None)
    assert m_f is None and m_b is None
    assert flow_f.shape == (b, h, w, 2)


def test_compose_and_mask_flow_frames_mode():
    b, k, h, w = 1, 3, 4, 4
    fwd = RNG.standard_normal((b, k, h, w, 2)).astype(np.float32)
    bwd = RNG.standard_normal((b, k, h, w, 2)).astype(np.float32)
    flow_f, flow_b, m_f, m_b = compose_and_mask(
        jnp.asarray(fwd), jnp.asarray(bwd), flow_up=False,
        use_flow_frames=True, alpha_1=0.01, alpha_2=0.5)
    s = k * (k + 1) // 2
    assert flow_f.shape == (s, b, h, w, 2)
    assert m_f.shape == (s, b, h, w)
