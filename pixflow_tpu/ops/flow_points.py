"""Point-domain (lazy) evaluation of the full-resolution `flow_up` pipeline.

The reference's FLOW_UP=y recipe materializes 720x1280 flow fields: it 8x
upsamples every stored 1/8-res RAFT flow, composes them into long-range flows
by iterated full-res grid_sample warps, computes full-res cycle-consistency
masks, and then — in the loss — reads those giant fields back at only
49 feature-bin centers per sample (`contrast/util.py:185-200,252-297` feeding
`contrast/models/PixPro.py:46-89`). On TPU the full-res gathers cost seconds
per step.

This module restructures that pipeline TPU-natively without changing a single
number: every quantity the loss consumes is a *pointwise* functional of the
coarse flow stack, so we evaluate the composed flow and the cycle mask exactly
at the <=441 points per (sample, span, direction) that are actually read.

Key identity: bilinearly sampling the align-corners 8x-upsampled field U(f) at
an arbitrary fine-pixel coordinate p is a separable linear functional of the
*coarse* field,

    U(f)(p) = w_y(p_y)^T f w_x(p_x),
    w(p) = (1-a) * tent(s(i0) - j) + a * tent(s(i0+1) - j),

with i0 = floor(p), a = frac(p), s(i) = i*(n_coarse-1)/(n_fine-1) the
align-corners source position, tent(d) = max(0, 1-|d|), and taps outside the
fine image zeroed (grid_sample zeros padding). The composite weight vectors
are dense over the tiny coarse axis (90/160), so sampling becomes small MXU
einsums instead of full-res gathers. Long-range composition is then trajectory
advection of individual points (the composed field's value at fine pixel q IS
the trajectory of q), and the loss's own bilinear/nearest reads become 4-tap /
1-tap blends of advected points.

Exact parity with the materializing path (`ops.flow.compose_and_mask` with
flow_up=True + `ops.loss.warp_points_with_flow`) is asserted in
tests/test_flow_points.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def composite_weights_1d(p: jnp.ndarray, n_fine: int, n_coarse: int) -> jnp.ndarray:
    """Weights w [..., n_coarse] such that `w @ f` equals the bilinear
    (zeros-padded) sample, at fine coordinate `p`, of the align-corners
    (n_coarse -> n_fine) upsample of the 1-D signal f.

    With n_coarse == n_fine this degenerates to the plain grid_sample
    two-tap bilinear weight row.
    """
    dtype = p.dtype
    i0 = jnp.floor(p)
    a = p - i0
    v0 = (i0 >= 0.0) & (i0 <= n_fine - 1.0)
    v1 = (i0 >= -1.0) & (i0 <= n_fine - 2.0)
    scale = 0.0 if n_fine == 1 else (n_coarse - 1) / (n_fine - 1)
    s0 = i0 * scale
    s1 = (i0 + 1.0) * scale
    j = jax.lax.broadcasted_iota(dtype, p.shape + (n_coarse,), p.ndim)
    t0 = jnp.maximum(0.0, 1.0 - jnp.abs(s0[..., None] - j))
    t1 = jnp.maximum(0.0, 1.0 - jnp.abs(s1[..., None] - j))
    w0 = jnp.where(v0[..., None], (1.0 - a)[..., None] * t0, 0.0)
    w1 = jnp.where(v1[..., None], a[..., None] * t1, 0.0)
    return w0 + w1


def sample_up(coarse: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample the (align-corners, 8x) upsample of `coarse` at fine-pixel
    points, without materializing it and without the x8 flow magnitude scale.

    coarse: [B, h, w, C]; pts: [B, N, 2] (x, y) in fine pixels of the
    (8h, 8w) grid. Returns [B, N, C] ==
    grid_sample(resize_align_corners(coarse, (8h, 8w)), normalize(pts)).
    """
    b, h, w, _ = coarse.shape
    wy = composite_weights_1d(pts[..., 1], 8 * h, h)  # [B, N, h]
    wx = composite_weights_1d(pts[..., 0], 8 * w, w)  # [B, N, w]
    t = jnp.einsum("bny,byxc->bnxc", wy, coarse.astype(jnp.float32),
                   precision=_HI, preferred_element_type=jnp.float32)
    return jnp.einsum("bnx,bnxc->bnc", wx, t, precision=_HI,
                      preferred_element_type=jnp.float32)


def advect_up(flows: jnp.ndarray, pts: jnp.ndarray,
              is_norm: bool = False) -> jnp.ndarray:
    """Long-range composed flow evaluated at fine-pixel points.

    flows: [K, B, h, w, 2] coarse per-frame-pair flows; pts: [B, N, 2] fine
    pixels. Returns [B, N, 2]: the value the field built by
    `concat_flow(flows, is_norm, upsample8=True)` takes at integer points
    (and its exact trajectory extension at fractional ones) — pixel units, or
    normalized fine units when is_norm (the flow_cat_norm accumulation).
    """
    k, b, h, w, _ = flows.shape
    hf, wf = 8 * h, 8 * w

    # Positions replicate the materializing path's float32 op order exactly
    # (concat_flow normalizes coords, grid_sample denormalizes them): the
    # roundtrip is an exact-math identity, but flow composition chaotically
    # amplifies even ulp-level positional noise, so bit-alignment matters
    # for parity.
    def _denorm(gn):
        return jnp.stack([(gn[..., 0] + 1.0) * 0.5 * (wf - 1),
                          (gn[..., 1] + 1.0) * 0.5 * (hf - 1)], axis=-1)

    def _norm(p):
        return jnp.stack([2.0 * p[..., 0] / (wf - 1) - 1.0,
                          2.0 * p[..., 1] / (hf - 1) - 1.0], axis=-1)

    if is_norm:
        def step(cn, f):
            # normalize_flow(upflow8(f)) sampled at denormalized positions
            s = sample_up(f, _denorm(cn))
            s = jnp.stack([2.0 * (8.0 * s[..., 0]) / (wf - 1),
                           2.0 * (8.0 * s[..., 1]) / (hf - 1)], axis=-1)
            return cn + s, None

        c0 = _norm(pts)
        c1, _ = jax.lax.scan(step, c0, flows)
        return c1 - c0

    def step(p, f):
        return p + 8.0 * sample_up(f, _denorm(_norm(p))), None

    p1, _ = jax.lax.scan(step, pts, flows)
    return p1 - pts


def _taps_1d(p: jnp.ndarray, n: int):
    """Bilinear tap coordinates and weights with grid_sample zeros-padding
    validity folded into the weights. p: [...] fine coords."""
    i0 = jnp.floor(p)
    a = p - i0
    w0 = jnp.where((i0 >= 0.0) & (i0 <= n - 1.0), 1.0 - a, 0.0)
    w1 = jnp.where((i0 >= -1.0) & (i0 <= n - 2.0), a, 0.0)
    return i0, i0 + 1.0, w0, w1


def _bilinear_taps(pts: jnp.ndarray, hf: int, wf: int):
    """4 bilinear tap points [B, N, 4, 2] + weights [B, N, 4] for arbitrary
    fine-pixel points [B, N, 2]."""
    x0, x1, wx0, wx1 = _taps_1d(pts[..., 0], wf)
    y0, y1, wy0, wy1 = _taps_1d(pts[..., 1], hf)
    tx = jnp.stack([x0, x1, x0, x1], axis=-1)
    ty = jnp.stack([y0, y0, y1, y1], axis=-1)
    tw = jnp.stack([wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1], axis=-1)
    return jnp.stack([tx, ty], axis=-1), tw


def composed_flow_at(flows: jnp.ndarray, pts: jnp.ndarray,
                     is_norm: bool = False) -> jnp.ndarray:
    """grid_sample of the composed full-res (pixel-unit) flow field at
    arbitrary fine-pixel points, via 4-tap blending of advected trajectories.

    flows: [K, B, h, w, 2]; pts: [B, N, 2] fine px. Returns [B, N, 2] in
    pixel units (the materializing path denormalizes norm-composed flows
    before the loss reads them — `ops.flow.compose_and_mask`).
    """
    k, b, h, w, _ = flows.shape
    hf, wf = 8 * h, 8 * w
    tap_pts, tw = _bilinear_taps(pts, hf, wf)
    f = advect_up(flows, tap_pts.reshape(b, -1, 2), is_norm)
    if is_norm:
        f = f * jnp.asarray([(wf - 1) / 2.0, (hf - 1) / 2.0], f.dtype)
    f = f.reshape(b, -1, 4, 2)
    return jnp.sum(f * tw[..., None], axis=2)


def cycle_mask_at(flows_fwd: jnp.ndarray, flows_bwd: jnp.ndarray,
                  pts: jnp.ndarray, alpha_1: float, alpha_2: float,
                  is_norm: bool = False) -> jnp.ndarray:
    """Full-res cycle-consistency mask (`ops.flow.forward_backward_consistency`
    of the composed upsampled fields) evaluated exactly at integer fine-pixel
    points. pts: [B, N, 2] -> [B, N] bool."""
    k, b, h, w, _ = flows_fwd.shape
    hf, wf = 8 * h, 8 * w

    def _norm_flow(f):
        return jnp.stack([2.0 * f[..., 0] / (wf - 1),
                          2.0 * f[..., 1] / (hf - 1)], axis=-1)

    fwd = advect_up(flows_fwd, pts, is_norm)
    fwd_n = fwd if is_norm else _norm_flow(fwd)

    c0n = jnp.stack([2.0 * pts[..., 0] / (wf - 1) - 1.0,
                     2.0 * pts[..., 1] / (hf - 1) - 1.0], axis=-1)
    c1n = c0n + fwd_n
    in_bounds = (jnp.abs(c1n[..., 0]) < 1.0) & (jnp.abs(c1n[..., 1]) < 1.0)

    # grid_sample(bwd_composed_n, c1n): 4-tap blend of backward trajectories
    # (positions in grid_sample's exact float32 op order)
    r = jnp.stack([(c1n[..., 0] + 1.0) * 0.5 * (wf - 1),
                   (c1n[..., 1] + 1.0) * 0.5 * (hf - 1)], axis=-1)
    tap_pts, tw = _bilinear_taps(r, hf, wf)
    bw = advect_up(flows_bwd, tap_pts.reshape(b, -1, 2), is_norm)
    bw_n = bw if is_norm else _norm_flow(bw)
    bwd_interp = jnp.sum(bw_n.reshape(b, -1, 4, 2) * tw[..., None], axis=2)

    cycle_sq = jnp.sum((fwd_n + bwd_interp) ** 2, axis=-1)
    a2 = alpha_2 / math.sqrt(hf * hf + wf * wf)
    eps = alpha_1 * (jnp.sum(fwd_n ** 2, axis=-1)
                     + jnp.sum(bwd_interp ** 2, axis=-1)) + a2
    return in_bounds & ((cycle_sq - eps) <= 0.0)


@flax.struct.dataclass
class LazyFlowUp:
    """A full-res composed flow (+ cycle mask), represented by its coarse
    flow stack and evaluated on demand at the points the loss reads.

    flows:     [K, B, h, w, 2] flows composing this direction's warp.
    flows_rev: [K, B, h, w, 2] reverse-direction flows (cycle mask); may be
               None when no masking is requested.
    """
    flows: Any
    flows_rev: Any = None
    alpha1: Optional[float] = flax.struct.field(pytree_node=False, default=None)
    alpha2: Optional[float] = flax.struct.field(pytree_node=False, default=None)
    is_norm: bool = flax.struct.field(pytree_node=False, default=False)


def flow_up_warp_points(lf: LazyFlowUp, x: jnp.ndarray, y: jnp.ndarray,
                        orig_hw) -> tuple:
    """Lazy drop-in for: `compose_and_mask(..., flow_up=True)` followed by
    `ops.loss.warp_points_with_flow` on the resulting full-res field + mask.

    x, y: [B, ...] points in original-image pixels; orig_hw: per-sample
    (H_orig, W_orig) arrays [B]. Returns (x', y', mask_at_points).
    """
    shp = x.shape
    b = shp[0]
    h_orig, w_orig = orig_hw
    h_orig = h_orig.reshape(b)
    w_orig = w_orig.reshape(b)
    _, _, h, w, _ = lf.flows.shape
    hf, wf = 8 * h, 8 * w

    xo = x.reshape(b, -1)
    yo = y.reshape(b, -1)
    # original-image px -> fine px in warp_points_with_flow's exact float32
    # op order (normalize by orig size, grid_sample denormalizes by fine)
    gx = 2.0 * xo / (w_orig - 1.0)[:, None] - 1.0
    gy = 2.0 * yo / (h_orig - 1.0)[:, None] - 1.0
    cx = (gx + 1.0) * 0.5 * (wf - 1)
    cy = (gy + 1.0) * 0.5 * (hf - 1)
    pts = jnp.stack([cx, cy], axis=-1)

    f = composed_flow_at(lf.flows, pts, lf.is_norm)
    out_x = xo + f[..., 0] / (wf / w_orig)[:, None]
    out_y = yo + f[..., 1] / (hf / h_orig)[:, None]

    mask_pts = None
    if lf.alpha1 is not None and lf.alpha2 is not None:
        # nearest-sample of the fine mask field (round half-to-even + zeros
        # padding, matching grid_sample_nearest)
        rx = jnp.round(cx)
        ry = jnp.round(cy)
        valid = (rx >= 0) & (rx <= wf - 1) & (ry >= 0) & (ry <= hf - 1)
        m = cycle_mask_at(lf.flows, lf.flows_rev, jnp.stack([rx, ry], axis=-1),
                          lf.alpha1, lf.alpha2, lf.is_norm)
        mask_pts = (valid & m).reshape(shp)

    return out_x.reshape(shp), out_y.reshape(shp), mask_pts


def mask_ratio_estimate(flows_fwd: jnp.ndarray, flows_bwd: jnp.ndarray,
                        alpha_1: float, alpha_2: float, is_norm: bool = False,
                        stride: int = 32) -> jnp.ndarray:
    """Strided estimate of the reference's full-res mask_ratio telemetry
    (fraction of *untrusted* pixels, `contrast/util.py:360-366`): the exact
    cycle mask evaluated on every `stride`-th fine pixel. Returns [B]."""
    k, b, h, w, _ = flows_fwd.shape
    hf, wf = 8 * h, 8 * w
    ys = jnp.arange(0, hf, stride, dtype=jnp.float32)
    xs = jnp.arange(0, wf, stride, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.broadcast_to(
        jnp.stack([gx.ravel(), gy.ravel()], axis=-1)[None],
        (b, gx.size, 2))
    m = cycle_mask_at(flows_fwd, flows_bwd, pts, alpha_1, alpha_2, is_norm)
    return jnp.mean((~m).astype(jnp.float32), axis=-1)
