"""Exact-parity tests: the lazy point-domain flow_up pipeline
(ops/flow_points.py) vs the materializing full-res path
(ops/flow.compose_and_mask(flow_up=True) + ops/loss.warp_points_with_flow).

Every assertion here pins the lazy path to the same numbers the reference's
FLOW_UP=y recipe produces (upflow8 -> grid_sample composition -> cycle mask ->
per-bin-center reads), on small coarse fields where materializing is cheap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixflow_tpu.ops.flow import (
    compose_and_mask,
    concat_flow,
    forward_backward_consistency,
    span_windows,
)
from pixflow_tpu.ops.flow_points import (
    LazyFlowUp,
    advect_up,
    composed_flow_at,
    cycle_mask_at,
    flow_up_warp_points,
    mask_ratio_estimate,
    sample_up,
)
from pixflow_tpu.ops.loss import pixpro_pair_loss, warp_points_with_flow
from pixflow_tpu.ops.resample import (
    denormalize_flow,
    grid_sample,
    upflow8,
)

H, W = 6, 9          # coarse field -> fine 48 x 72
HF, WF = 8 * H, 8 * W
K, B = 3, 2
A1, A2 = 0.01, 0.5


def _flows(seed, k=K, scale=1.0):
    # scale=1.0 coarse ~= 8 px fine-res steps: large but realistic motion.
    # (At adversarial scales trajectory composition chaotically amplifies
    # even ulp-level float noise between two exact formulations: the fine
    # field's slope exceeds 1/px, so paths separate — see the violent-scale
    # test below, which asserts quantile agreement instead.)
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        scale * rng.standard_normal((k, B, H, W, 2)).astype(np.float32))


def _pts(seed, n=64, pad=3.0):
    """Random continuous fine-pixel points, including out-of-bounds ones."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-pad, WF - 1 + pad, (B, n)).astype(np.float32)
    y = rng.uniform(-pad, HF - 1 + pad, (B, n)).astype(np.float32)
    return jnp.asarray(np.stack([x, y], axis=-1))


def _norm_pts(pts):
    """Fine-pixel points -> normalized grid [B, N, 1, 2] for grid_sample."""
    gx = 2.0 * pts[..., 0] / (WF - 1) - 1.0
    gy = 2.0 * pts[..., 1] / (HF - 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)[:, :, None, :]


def test_sample_up_matches_materialized_upsample():
    coarse = _flows(0)[0]
    pts = _pts(1)
    lazy = 8.0 * sample_up(coarse, pts)
    ref = grid_sample(upflow8(coarse), _norm_pts(pts))[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(lazy), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("is_norm", [False, True])
@pytest.mark.parametrize("k", [1, K])
def test_advect_matches_concat_flow_at_grid_points(is_norm, k):
    flows = _flows(2, k=k)
    ref_field = concat_flow(flows, is_norm=is_norm, upsample8=True)
    ys, xs = np.meshgrid(np.arange(HF), np.arange(WF), indexing="ij")
    pts = jnp.asarray(
        np.broadcast_to(
            np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)[None],
            (B, HF * WF, 2)))
    lazy = advect_up(flows, pts, is_norm=is_norm).reshape(B, HF, WF, 2)
    # atol 1e-3: a 1-ulp position difference can flip which side of a tent
    # kink a trajectory samples, which composition then amplifies for a
    # handful of points (2/13824 here)
    np.testing.assert_allclose(np.asarray(lazy), np.asarray(ref_field),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("is_norm", [False, True])
def test_composed_flow_at_matches_grid_sample_of_composition(is_norm):
    flows = _flows(3)
    pts = _pts(4)
    ref_field = concat_flow(flows, is_norm=is_norm, upsample8=True)
    if is_norm:
        ref_field = denormalize_flow(ref_field, HF, WF)
    ref = grid_sample(ref_field, _norm_pts(pts))[:, :, 0, :]
    lazy = composed_flow_at(flows, pts, is_norm=is_norm)
    np.testing.assert_allclose(np.asarray(lazy), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("is_norm", [False, True])
def test_cycle_mask_matches_full_field(is_norm):
    fwd, bwd = _flows(5), _flows(6)
    f_field = concat_flow(fwd, is_norm=is_norm, upsample8=True)
    b_field = concat_flow(bwd, is_norm=is_norm, upsample8=True)
    ref_mask, ref_cycle = forward_backward_consistency(
        f_field, b_field, A1, A2, is_norm=is_norm, return_cycle=True)

    ys, xs = np.meshgrid(np.arange(HF), np.arange(WF), indexing="ij")
    pts = jnp.asarray(
        np.broadcast_to(
            np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)[None],
            (B, HF * WF, 2)))
    lazy = np.asarray(cycle_mask_at(fwd, bwd, pts, A1, A2, is_norm=is_norm)
                      ).reshape(B, HF, WF)

    # Boolean thresholds can flip under ~1e-6 float reassociation right at
    # the decision boundary; require agreement away from it.
    import math
    fwd_n = f_field if is_norm else f_field * jnp.asarray(
        [2.0 / (WF - 1), 2.0 / (HF - 1)])
    margin = np.asarray(
        jnp.sum(ref_cycle ** 2, -1)
        - A1 * (jnp.sum(fwd_n ** 2, -1)
                + jnp.sum((ref_cycle - fwd_n) ** 2, -1))
        - A2 / math.sqrt(HF * HF + WF * WF))
    decided = np.abs(margin) > 1e-4
    agree = (lazy == np.asarray(ref_mask)) | ~decided
    assert agree.all(), f"{(~agree).sum()} mask mismatches away from boundary"


def _coords(seed, n=B):
    """Random 10-vector crop coords on a (HF, WF)-sized original image."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n, 10), np.float32)
    for i in range(n):
        w = int(rng.integers(WF // 3, WF - 1))
        h = int(rng.integers(HF // 3, HF - 1))
        j = int(rng.integers(0, WF - w))
        ii = int(rng.integers(0, HF - h))
        out[i] = [j / (WF - 1), ii / (HF - 1), (j + w - 1) / (WF - 1),
                  (ii + h - 1) / (HF - 1), j, ii, w, h, WF, HF]
    return jnp.asarray(out)


@pytest.mark.parametrize("is_norm", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_warp_points_full_pipeline_parity(is_norm, masked):
    fwd_b = jnp.transpose(_flows(7), (1, 0, 2, 3, 4))  # [B, K, h, w, 2]
    bwd_b = jnp.transpose(_flows(8), (1, 0, 2, 3, 4))
    a1, a2 = (A1, A2) if masked else (None, None)

    field_f, field_b, m_f, m_b = compose_and_mask(
        fwd_b, bwd_b, flow_up=True, use_flow_frames=False,
        alpha_1=a1, alpha_2=a2, is_norm=is_norm)

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(0, WF - 1, (B, 7, 7)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, HF - 1, (B, 7, 7)).astype(np.float32))
    orig = (jnp.full((B,), float(HF)), jnp.full((B,), float(WF)))

    rx, ry, rm = warp_points_with_flow(field_f, x, y, orig, m_f)

    lf = LazyFlowUp(flows=jnp.transpose(fwd_b, (1, 0, 2, 3, 4)),
                    flows_rev=jnp.transpose(bwd_b, (1, 0, 2, 3, 4)),
                    alpha1=a1, alpha2=a2, is_norm=is_norm)
    lx, ly, lm = flow_up_warp_points(lf, x, y, orig)

    np.testing.assert_allclose(np.asarray(lx), np.asarray(rx),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ly), np.asarray(ry),
                               rtol=1e-4, atol=2e-3)
    if masked:
        assert (np.asarray(lm) == np.asarray(rm)).mean() > 0.995
    else:
        assert lm is None and rm is None


def test_pair_loss_parity_lazy_vs_materialized():
    fwd_b = jnp.transpose(_flows(10), (1, 0, 2, 3, 4))
    bwd_b = jnp.transpose(_flows(11), (1, 0, 2, 3, 4))
    field_f, _, m_f, _ = compose_and_mask(
        fwd_b, bwd_b, flow_up=True, use_flow_frames=False,
        alpha_1=A1, alpha_2=A2)

    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((B, 7, 7, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, 7, 7, 16)).astype(np.float32))
    cq, ck = _coords(13), _coords(14)

    ref_loss, (ref_pn, ref_pm) = pixpro_pair_loss(
        q, k, cq, ck, 0.7, flow=field_f, flow_mask=m_f)

    lf = LazyFlowUp(flows=jnp.transpose(fwd_b, (1, 0, 2, 3, 4)),
                    flows_rev=jnp.transpose(bwd_b, (1, 0, 2, 3, 4)),
                    alpha1=A1, alpha2=A2)
    lazy_loss, (lazy_pn, lazy_pm) = pixpro_pair_loss(
        q, k, cq, ck, 0.7, flow=lf, flow_mask=None)

    np.testing.assert_allclose(float(lazy_loss), float(ref_loss),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lazy_pn), np.asarray(ref_pn))


def test_multi_span_windows_parity():
    kk = 3
    fwd_b = jnp.transpose(_flows(15, k=kk), (1, 0, 2, 3, 4))
    bwd_b = jnp.transpose(_flows(16, k=kk), (1, 0, 2, 3, 4))
    fields_f, fields_b, ms_f, ms_b = compose_and_mask(
        fwd_b, bwd_b, flow_up=True, use_flow_frames=True,
        alpha_1=A1, alpha_2=A2)

    fwd = jnp.transpose(fwd_b, (1, 0, 2, 3, 4))
    bwd = jnp.transpose(bwd_b, (1, 0, 2, 3, 4))

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.uniform(0, WF - 1, (B, 7, 7)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, HF - 1, (B, 7, 7)).astype(np.float32))
    orig = (jnp.full((B,), float(HF)), jnp.full((B,), float(WF)))

    for i, (span, s) in enumerate(span_windows(kk)):
        rx, ry, rm = warp_points_with_flow(fields_f[i], x, y, orig, ms_f[i])
        lf = LazyFlowUp(flows=fwd[s:s + span],
                        flows_rev=bwd[kk - s - span:kk - s],
                        alpha1=A1, alpha2=A2)
        lx, ly, lm = flow_up_warp_points(lf, x, y, orig)
        np.testing.assert_allclose(np.asarray(lx), np.asarray(rx),
                                   rtol=1e-4, atol=2e-3,
                                   err_msg=f"window {i} (span {span} @ {s})")
        assert (np.asarray(lm) == np.asarray(rm)).mean() > 0.99, \
            f"window {i} mask"

        # reverse direction pairs the mirrored backward window with the
        # forward window as its cycle partner
        rx2, ry2, rm2 = warp_points_with_flow(fields_b[i], x, y, orig, ms_b[i])
        lb = LazyFlowUp(flows=bwd[kk - s - span:kk - s],
                        flows_rev=fwd[s:s + span],
                        alpha1=A1, alpha2=A2)
        lx2, ly2, lm2 = flow_up_warp_points(lb, x, y, orig)
        np.testing.assert_allclose(np.asarray(lx2), np.asarray(rx2),
                                   rtol=1e-4, atol=2e-3)
        assert (np.asarray(lm2) == np.asarray(rm2)).mean() > 0.99


def test_advect_violent_flows_quantile_agreement():
    """At adversarial flow magnitudes (32 px/step on a 48x72 field) float
    noise is chaotically amplified; require near-total pointwise agreement
    and bounded worst-case divergence."""
    flows = _flows(20) * 4.0
    ref = np.asarray(concat_flow(flows, upsample8=True))
    ys, xs = np.meshgrid(np.arange(HF), np.arange(WF), indexing="ij")
    pts = jnp.asarray(
        np.broadcast_to(
            np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)[None],
            (B, HF * WF, 2)))
    lazy = np.asarray(advect_up(flows, pts)).reshape(B, HF, WF, 2)
    err = np.abs(lazy - ref)
    assert np.quantile(err, 0.995) < 1e-3, np.quantile(err, 0.995)
    assert err.max() < 0.1, err.max()


def test_mask_ratio_estimate_tracks_full_field():
    fwd, bwd = _flows(18), _flows(19)
    f_field = concat_flow(fwd, upsample8=True)
    b_field = concat_flow(bwd, upsample8=True)
    full = np.asarray(
        1.0 - forward_backward_consistency(f_field, b_field, A1, A2)
        .astype(np.float32).mean(axis=(-2, -1)))
    est = np.asarray(mask_ratio_estimate(fwd, bwd, A1, A2, stride=4))
    np.testing.assert_allclose(est, full, atol=0.08)
