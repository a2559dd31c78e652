"""PixPro loss geometry: crop-coordinate algebra, flow warping of the feature
grid, the positive-pair mask, and the pixel-propagation (PPM) attention.

Re-derives the behavior of reference `contrast/models/PixPro.py:46-247`
(regression_loss + add_optical_flow) and `PixPro.py:339-363` (featprop) as
pure, jit-friendly functions over channels-last tensors. One deliberate
refinement: the original-image size entering the bin-diagonal/center math is
taken *per sample* from the crop-coordinate vector (columns 8/9) instead of
from batch element 0 only — identical on fixed-size video datasets like
BDD100k, and correct (rather than approximate) on mixed-size image sets.

Crop coordinates are the 10-vector emitted by the data pipeline, matching
reference `contrast/data/transform_coord.py:208-210`:
    [x0/(W-1), y0/(H-1), x1/(W-1), y1/(H-1), j, i, w, h, W, H]
with (j, i) the crop's top-left corner, (w, h) its size, and (W, H) the
original image size.
"""

from __future__ import annotations

import jax.numpy as jnp

from .flow_points import LazyFlowUp, flow_up_warp_points
from .resample import grid_sample, grid_sample_nearest

_NORM_EPS = 1e-12  # torch F.normalize default


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x / max(||x||_2, 1e-12), matching torch.nn.functional.normalize."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, _NORM_EPS)


def bin_centers(coord: jnp.ndarray, feat_hw: tuple[int, int]):
    """Feature-bin center coordinates in original-image pixel space.

    coord: [B, 10] crop coordinates. feat_hw: (H, W) of the feature map.
    Returns (x, y): each [B, H, W], the center of every feature bin expressed
    in pixels of the *original* (pre-crop) image — reference
    `PixPro.py:140-148,192-199`.
    """
    h, w = feat_hw
    xs = (jnp.arange(w, dtype=coord.dtype) + 0.5)[None, None, :]  # [1,1,W]
    ys = (jnp.arange(h, dtype=coord.dtype) + 0.5)[None, :, None]  # [1,H,1]

    bin_w = ((coord[:, 2] - coord[:, 0]) / w)[:, None, None]
    bin_h = ((coord[:, 3] - coord[:, 1]) / h)[:, None, None]
    start_x = coord[:, 0][:, None, None]
    start_y = coord[:, 1][:, None, None]

    w_orig = coord[:, 8][:, None, None]
    h_orig = coord[:, 9][:, None, None]

    x = (xs * bin_w + start_x) * (w_orig - 1.0)
    y = (ys * bin_h + start_y) * (h_orig - 1.0)
    return jnp.broadcast_to(x, bin_w.shape[:1] + (h, w)), jnp.broadcast_to(y, bin_h.shape[:1] + (h, w))


def warp_points_with_flow(
    flow: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    orig_hw: tuple[jnp.ndarray, jnp.ndarray],
    mask: jnp.ndarray | None = None,
):
    """Advect point coordinates by a flow field sampled at those points.

    flow: [B, Hf, Wf, 2] pixel-unit flow (possibly at a different resolution
    than the original image — e.g. 1/8-res RAFT output); x, y: [B, H, W]
    points in original-image pixels; orig_hw: per-sample (H_orig, W_orig)
    arrays [B]; mask: optional [B, Hm, Wm] bool validity field.

    Returns (x', y', mask_at_points). When the flow resolution differs from
    the original image, flow values are rescaled by the resolution ratio
    exactly as reference `add_optical_flow` (`PixPro.py:46-89`):
    out = x + fx / (Wf / W_orig).

    `flow` may also be a `LazyFlowUp`: the full-res flow_up composition +
    cycle mask evaluated lazily at exactly these points (same math, no
    materialized 720x1280 fields — ops/flow_points.py); `mask` must then be
    None (the lazy object computes its own).
    """
    if isinstance(flow, LazyFlowUp):
        assert mask is None, "LazyFlowUp computes its own cycle mask"
        return flow_up_warp_points(flow, x, y, orig_hw)
    b, hf, wf, _ = flow.shape
    h_orig, w_orig = orig_hw
    h_orig = h_orig.reshape(b, 1, 1)
    w_orig = w_orig.reshape(b, 1, 1)

    gx = 2.0 * x / (w_orig - 1.0) - 1.0
    gy = 2.0 * y / (h_orig - 1.0) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)  # [B, H, W, 2]

    f = grid_sample(flow, grid)  # [B, H, W, 2]
    ratio_w = wf / w_orig
    ratio_h = hf / h_orig
    out_x = x + f[..., 0] / ratio_w
    out_y = y + f[..., 1] / ratio_h

    mask_pts = None
    if mask is not None:
        m = grid_sample_nearest(mask.astype(flow.dtype)[..., None], grid)
        mask_pts = m[..., 0] > 0.5
    return out_x, out_y, mask_pts


def pair_loss_geometry(
    coord_q: jnp.ndarray,
    coord_k: jnp.ndarray,
    feat_hw: tuple[int, int],
    pos_ratio: float = 0.5,
    flow: jnp.ndarray | None = None,
    flow_mask: jnp.ndarray | None = None,
):
    """Positive-pair geometry of `pixpro_pair_loss`, exposed for debugging.

    Returns a dict with the bin centers before the flow warp
    (`q_x_pre`/`q_y_pre`, each [B, H, W]), after it (`q_x`/`q_y`), the
    target-view centers (`k_x`/`k_y`), the sampled flow-validity mask at the
    warped points (`mask_pts`, [B, H, W] bool or None), and the positive-pair
    mask `pos` [B, N, N]. This is the same computation the loss performs —
    the renders it feeds (`utils/visualize.py:save_debug_bundle`) are the
    TPU counterpart of reference `contrast/debug_utils.py:422-719`
    (draw_points / draw_point_positive_pair inside regression_loss,
    `PixPro.py:99-104,419-426`).
    """
    h, w = feat_hw
    b = coord_q.shape[0]
    n = h * w

    q_x_pre, q_y_pre = bin_centers(coord_q, (h, w))
    k_x, k_y = bin_centers(coord_k, (h, w))

    w_orig = coord_q[:, 8][:, None, None]
    h_orig = coord_q[:, 9][:, None, None]

    q_bin_w = ((coord_q[:, 2] - coord_q[:, 0]) / w)[:, None, None]
    q_bin_h = ((coord_q[:, 3] - coord_q[:, 1]) / h)[:, None, None]
    k_bin_w = ((coord_k[:, 2] - coord_k[:, 0]) / w)[:, None, None]
    k_bin_h = ((coord_k[:, 3] - coord_k[:, 1]) / h)[:, None, None]

    q_diag = jnp.sqrt((q_bin_w * (w_orig - 1.0)) ** 2 + (q_bin_h * (h_orig - 1.0)) ** 2)
    k_diag = jnp.sqrt((k_bin_w * (w_orig - 1.0)) ** 2 + (k_bin_h * (h_orig - 1.0)) ** 2)
    max_diag = jnp.maximum(q_diag, k_diag)  # [B, 1, 1]

    q_x, q_y, mask_pts = q_x_pre, q_y_pre, None
    if flow is not None:
        q_x, q_y, mask_pts = warp_points_with_flow(
            flow, q_x_pre, q_y_pre,
            (coord_q[:, 9], coord_q[:, 8]),
            flow_mask,
        )

    dx = q_x.reshape(b, n, 1) - k_x.reshape(b, 1, n)
    dy = q_y.reshape(b, n, 1) - k_y.reshape(b, 1, n)
    dist = jnp.sqrt(dx * dx + dy * dy) / max_diag

    pos = dist < pos_ratio  # [B, N, N]
    if mask_pts is not None:
        pos = pos & mask_pts.reshape(b, n, 1)
    return {
        "q_x_pre": q_x_pre, "q_y_pre": q_y_pre,
        "q_x": q_x, "q_y": q_y, "k_x": k_x, "k_y": k_y,
        "mask_pts": mask_pts, "pos": pos,
    }


def pixpro_pair_loss(
    q: jnp.ndarray,
    k: jnp.ndarray,
    coord_q: jnp.ndarray,
    coord_k: jnp.ndarray,
    pos_ratio: float = 0.5,
    flow: jnp.ndarray | None = None,
    flow_mask: jnp.ndarray | None = None,
    reduce: bool = True,
):
    """Pixel-pair contrastive regression loss (reference `PixPro.py:92-247`).

    q: online predictions [B, H, W, C] (already L2-normalized over C);
    k: momentum targets  [B, H, W, C] (normalized, no gradient);
    coord_q/coord_k: [B, 10] crop coordinates of the two views;
    flow: optional [B, Hf, Wf, 2] forward flow warping q's view onto k's;
    flow_mask: optional [B, Hm, Wm] bool cycle-consistency validity.

    Positive pairs are feature-bin pairs whose (flow-warped) center distance
    in original-image pixels is below pos_ratio * max(bin diagonal), ANDed
    with the sampled flow-validity mask. Returns
    (loss, (pos_num [B], pos_mean [B])) with
    loss = -2 * mean_b[ sum(q.k * mask) / (sum(mask) + 1e-6) ].
    """
    b, h, w, c = q.shape
    n = h * w

    pos = pair_loss_geometry(coord_q, coord_k, (h, w), pos_ratio,
                             flow, flow_mask)["pos"]
    pos_f = pos.astype(jnp.float32)

    logit = jnp.einsum(
        "bxc,byc->bxy",
        q.reshape(b, n, c), k.reshape(b, n, c),
        preferred_element_type=jnp.float32,
    )

    pos_sum = jnp.sum(pos_f, axis=(1, 2))
    per_sample = jnp.sum(logit * pos_f, axis=(1, 2)) / (pos_sum + 1e-6)
    loss = -2.0 * (jnp.mean(per_sample) if reduce else per_sample)

    pos_num = pos_sum
    pos_mean = jnp.mean(pos_f, axis=(1, 2))
    return loss, (pos_num, pos_mean)


def ppm_attention(
    feat: jnp.ndarray,
    value: jnp.ndarray,
    p: float = 1.0,
    clamp_value: float = 0.0,
) -> jnp.ndarray:
    """Pixel-propagation module: cosine-similarity attention over positions.

    feat: [B, H, W, C] projector output (pre-normalization); value: [B, H, W,
    C] value-transformed features (pre-normalization). Computes
    A = clamp(f^T f, min=clamp_value) ** p over normalized features and
    returns sum_j A[i, j] * v_j — reference featprop (`PixPro.py:339-363`).
    """
    b, h, w, c = feat.shape
    n = h * w
    f = l2_normalize(feat).reshape(b, n, c)
    v = l2_normalize(value).reshape(b, n, c)

    att = jnp.einsum("bxc,byc->bxy", f, f, preferred_element_type=jnp.float32)
    att = jnp.maximum(att, clamp_value)
    if p < 1.0:
        att = att + 1e-6
    if p != 1.0:
        att = att ** p
    att = att.astype(v.dtype)

    out = jnp.einsum("bxy,byc->bxc", att, v, preferred_element_type=jnp.float32)
    return out.astype(feat.dtype).reshape(b, h, w, c)


def instance_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """BYOL-style instance loss -2 * mean(<x, y>) over normalized vectors.

    x, y: [B, C] (already L2-normalized). Reference `PixPro.py:365-366`.
    """
    return -2.0 * jnp.mean(jnp.sum(x * y, axis=-1))
