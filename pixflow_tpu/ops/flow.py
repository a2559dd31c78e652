"""Optical-flow field algebra: long-range composition and cycle-consistency.

This is the TPU-native redesign of the reference's flow orchestration layer
(`contrast/util.py:75-366`). There the composition/masking ran eagerly on GPU
tensors outside the DDP graph; here every function is pure and jit-safe so the
whole pipeline lives *inside* the compiled train step (flows stream in from the
host as raw per-frame-pair fields and everything else fuses into the XLA
program).

Conventions:
    flow fields: [..., H, W, 2] channels-last, (fx, fy) in pixel units unless
                 a `_norm` suffix / `is_norm=True` says otherwise.
    masks:       [..., H, W] bool, True = flow trusted at that pixel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .resample import (
    coords_grid,
    denormalize_flow,
    grid_sample_auto as grid_sample,
    normalize_coords,
    normalize_flow,
    upflow8,
)


def concat_flow(flows: jnp.ndarray, is_norm: bool = False,
                upsample8: bool = False) -> jnp.ndarray:
    """Compose K consecutive flows into one long-range flow (paper Eq. 1).

    flows: [K, B, H, W, 2]. Iteratively advects a coordinate grid: the k-th
    flow is sampled at the current warped positions and accumulated
    (reference `contrast/util.py:301-330`). Returns [B, H, W, 2].

    With is_norm=True, inputs and output are in normalized units and the
    accumulation runs in normalized space (reference `flow_cat_norm` path).

    With upsample8=True, each flow is 8x-upsampled *inside* the scan before
    being sampled (mathematically identical to upflow8-then-compose, but only
    one full-resolution field is live at a time — the reference materializes
    all K upsampled flows up front, `contrast/util.py:185-191`).
    """
    k, b, h, w, _ = flows.shape
    if upsample8:
        h, w = 8 * h, 8 * w
    if k == 1:
        out = upflow8(flows[0]) if upsample8 else flows[0]
        return normalize_flow(out, h, w) if is_norm else out

    base = jnp.broadcast_to(coords_grid(h, w, flows.dtype)[None], (b, h, w, 2))

    if is_norm:
        coords0 = normalize_coords(base, h, w)

        def step(coords1, flow):
            if upsample8:
                flow = upflow8(flow)
            flow_n = normalize_flow(flow, h, w)
            sampled = grid_sample(flow_n, coords1)
            return coords1 + sampled, None

        coords1, _ = jax.lax.scan(step, coords0, flows)
        return coords1 - coords0

    def step(coords1, flow):
        if upsample8:
            flow = upflow8(flow)
        grid = normalize_coords(coords1, h, w)
        sampled = grid_sample(flow, grid)
        return coords1 + sampled, None

    coords1, _ = jax.lax.scan(step, base, flows)
    return coords1 - base


def all_concat_flow(
    flow_fwds: jnp.ndarray,
    flow_bwds: jnp.ndarray,
    is_norm: bool = False,
    use_flow_frames: bool = True,
    upsample8: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Every (span, start) composition of K consecutive flows.

    flow_fwds, flow_bwds: [K, B, H, W, 2]. With use_flow_frames=False only the
    full-span composition is built and returned as [1, B, H, W, 2]; otherwise
    all K*(K+1)/2 windows are stacked to [S, B, H, W, 2] in the reference's
    order (span-major, start ascending; backward windows mirrored —
    `contrast/util.py:105-126`).
    """
    if not use_flow_frames:
        fwd = concat_flow(flow_fwds, is_norm, upsample8)[None]
        bwd = concat_flow(flow_bwds, is_norm, upsample8)[None]
        return fwd, bwd

    k = flow_fwds.shape[0]
    fwd_list, bwd_list = [], []
    for span_m1 in range(k):
        span = span_m1 + 1
        for s in range(k - span + 1):
            bwd_end = k - s
            fwd_list.append(concat_flow(flow_fwds[s:s + span], is_norm,
                                        upsample8))
            bwd_list.append(concat_flow(flow_bwds[bwd_end - span:bwd_end],
                                        is_norm, upsample8))
    return jnp.stack(fwd_list), jnp.stack(bwd_list)


def forward_backward_consistency(
    flow_fwd: jnp.ndarray,
    flow_bwd: jnp.ndarray,
    alpha_1: float = 0.01,
    alpha_2: float = 0.5,
    is_norm: bool = False,
    return_cycle: bool = False,
):
    """Cycle-consistency occlusion mask (arXiv:1711.07837; reference
    `contrast/util.py:252-297`).

    A pixel is trusted iff (a) its forward-warped position lands strictly
    inside the frame and (b) the normalized round-trip residual
    ||w_f(x) + w_b(x + w_f(x))||^2 is below
    alpha_1 * (||w_f||^2 + ||w_b_interp||^2) + alpha_2 / sqrt(h^2 + w^2),
    everything measured in normalized coordinates.

    flow_fwd/flow_bwd: [B, H, W, 2]. Returns mask [B, H, W] bool
    (and the normalized cycle residual if return_cycle).
    """
    b, h, w, _ = flow_fwd.shape
    if is_norm:
        fwd_n, bwd_n = flow_fwd, flow_bwd
    else:
        fwd_n = normalize_flow(flow_fwd, h, w)
        bwd_n = normalize_flow(flow_bwd, h, w)

    base = jnp.broadcast_to(coords_grid(h, w, flow_fwd.dtype)[None], (b, h, w, 2))
    coords0_n = normalize_coords(base, h, w)
    coords1_n = coords0_n + fwd_n

    in_bounds = (jnp.abs(coords1_n[..., 0]) < 1.0) & (jnp.abs(coords1_n[..., 1]) < 1.0)

    bwd_interp_n = grid_sample(bwd_n, coords1_n)
    cycle_n = fwd_n + bwd_interp_n

    alpha_2 = alpha_2 / math.sqrt(h * h + w * w)
    cycle_sq = jnp.sum(cycle_n**2, axis=-1)
    eps = alpha_1 * (jnp.sum(fwd_n**2, axis=-1) + jnp.sum(bwd_interp_n**2, axis=-1)) + alpha_2

    mask = in_bounds & ((cycle_sq - eps) <= 0.0)
    if return_cycle:
        return mask, cycle_n
    return mask


def compose_and_mask(
    flows_fwd: jnp.ndarray,
    flows_bwd: jnp.ndarray,
    *,
    flow_up: bool = False,
    use_flow_frames: bool = False,
    alpha_1: float | None = None,
    alpha_2: float | None = None,
    is_norm: bool = False,
):
    """Full in-step flow preprocessing for the precomputed-flow-file path.

    Mirrors the pipeline of reference `apply_optical_flow`
    (`contrast/util.py:174-248`) but fully jit-compiled: optional 8x
    upsampling, long-range composition, and cycle-consistency masks.

    flows_fwd, flows_bwd: [B, K, h, w, 2] raw per-frame-pair RAFT flows
    (1/8-res when flow_up=True). Returns (flow_fwd, flow_bwd, mask_fwd,
    mask_bwd):
        use_flow_frames=False -> flows [B, H, W, 2], masks [B, H, W] or None
        use_flow_frames=True  -> flows [S, B, H, W, 2], masks [S, B, H, W]
    Output flows are always in pixel units (the reference denormalizes
    norm-composed flows before the loss, `util.py:229-231`).
    """
    b, k, h, w, _ = flows_fwd.shape
    fwd = jnp.transpose(flows_fwd, (1, 0, 2, 3, 4))  # [K, B, h, w, 2]
    bwd = jnp.transpose(flows_bwd, (1, 0, 2, 3, 4))

    # flow_up (reference upflow8-then-compose) runs fused inside the
    # composition scan: one full-res field live at a time instead of K.
    fwd_s, bwd_s = all_concat_flow(fwd, bwd, is_norm=is_norm,
                                   use_flow_frames=use_flow_frames,
                                   upsample8=flow_up)

    mask_fwd = mask_bwd = None
    if alpha_1 is not None and alpha_2 is not None:
        mask_f = [forward_backward_consistency(f, bk, alpha_1, alpha_2, is_norm)
                  for f, bk in zip(fwd_s, bwd_s)]
        mask_b = [forward_backward_consistency(bk, f, alpha_1, alpha_2, is_norm)
                  for f, bk in zip(fwd_s, bwd_s)]
        mask_fwd = jnp.stack(mask_f)
        mask_bwd = jnp.stack(mask_b)

    if is_norm:
        hh, ww = fwd_s.shape[-3:-1]
        fwd_s = denormalize_flow(fwd_s, hh, ww)
        bwd_s = denormalize_flow(bwd_s, hh, ww)

    if not use_flow_frames:
        fwd_s, bwd_s = fwd_s[-1], bwd_s[-1]
        if mask_fwd is not None:
            mask_fwd, mask_bwd = mask_fwd[-1], mask_bwd[-1]

    return fwd_s, bwd_s, mask_fwd, mask_bwd


def span_windows(k: int):
    """The (length, start) enumeration of `all_concat_flow`'s stacked output
    (span-major, start ascending): window i composes forward flows
    [start, start+length) i.e. frame `start` -> frame `start+length`."""
    out = []
    for span_m1 in range(k):
        span = span_m1 + 1
        for s in range(k - span + 1):
            out.append((span, s))
    return out


def mask_ratio(mask: jnp.ndarray | None) -> jnp.ndarray | None:
    """Fraction of *untrusted* pixels per field (reference `util.py:360-366`)."""
    if mask is None:
        return None
    return jnp.mean((~mask).astype(jnp.float32), axis=(-2, -1))
