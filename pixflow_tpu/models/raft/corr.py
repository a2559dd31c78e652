"""All-pairs correlation volume + pyramid lookup (pure functions).

Same math as the reference's CorrBlock (`contrast/flow/corr.py:12-60`): a
single big MXU matmul builds <f1, f2>/sqrt(C) for every pixel pair, 2x
average pooling builds a 4-level pyramid over the *target* dimensions, and
the lookup bilinearly samples a (2r+1)^2 window around the current flow
target at every level.

The lookup is where the reference needed its `alt_cuda_corr` CUDA extension
(effectively dead in its tree); the TPU-native answer is `lookup_corr_mxu`:
the window sampling is separable into two batched tent-weight contractions
that run on the systolic array — measured 22x (small) / 40x (basic)
end-to-end RAFT speedup over the gather lowering at 360x640 on v5e
(docs/PERF.md)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.resample import grid_sample


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4,
                       store_dtype=jnp.float32) -> List[jnp.ndarray]:
    """fmap1, fmap2: [B, H, W, C] -> list of [B*H*W, h_l, w_l, 1].

    The einsum accumulates in f32 on the MXU regardless of input dtype
    (bf16 fmaps run at native MXU rate). `store_dtype` sets the pyramid's
    HBM dtype: the volume is re-read by every refinement iteration's
    lookup — at 360x640 batch 4 that is ~275 MB/iter at f32 — so bf16
    storage halves the loop's dominant traffic (measured -17% lookup
    time, docs/PERF.md; values are normalized dot products, ~0.4%
    relative rounding). f32 default keeps the oracle-exact path."""
    b, h, w, c = fmap1.shape
    corr = jnp.einsum("bxc,byc->bxy", fmap1.reshape(b, h * w, c),
                      fmap2.reshape(b, h * w, c),
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
    corr = corr.reshape(b * h * w, h, w, 1).astype(store_dtype)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        if min(corr.shape[1:3]) >= 2:  # stop shrinking at 1x1 (tiny inputs)
            corr = nn.avg_pool(corr, (2, 2), (2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_corr_gather(pyramid: List[jnp.ndarray], coords: jnp.ndarray,
                       radius: int = 4) -> jnp.ndarray:
    """Gather-path lookup (see `lookup_corr` for the dispatching entry).
    coords: [B, H, W, 2] current target positions (pixels, level 0).
    Returns [B, H, W, num_levels*(2r+1)^2]."""
    b, h, w, _ = coords.shape
    r = radius
    win = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # window channel order parity: the reference adds meshgrid(dy, dx) onto
    # (x, y)-ordered centroids (`corr.py:37-43`), which enumerates the window
    # x-offset along the *slow* axis. delta[i, j] = (off_i -> x, off_j -> y).
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)

    out = []
    centroid = coords.reshape(b * h * w, 1, 1, 2)
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[1:3]
        pts = centroid / (2 ** lvl) + delta[None]  # [BHW, win, win, 2]
        # degenerate 1-wide/-tall levels: everything samples the one texel
        # (avoids the 0-division NaN; unreachable at real training sizes)
        gx = (2.0 * pts[..., 0] / (wl - 1) - 1.0) if wl > 1 \
            else jnp.zeros_like(pts[..., 0])
        gy = (2.0 * pts[..., 1] / (hl - 1) - 1.0) if hl > 1 \
            else jnp.zeros_like(pts[..., 1])
        grid = jnp.stack([gx, gy], axis=-1)
        sampled = grid_sample(corr, grid)  # [BHW, win, win, 1]
        out.append(sampled.reshape(b, h, w, win * win))
    return jnp.concatenate(out, axis=-1)


def lookup_corr_mxu(pyramid: List[jnp.ndarray], coords: jnp.ndarray,
                    radius: int = 4) -> jnp.ndarray:
    """MXU lookup: the (2r+1)^2 window is a regular integer grid around one
    fractional centroid, so bilinear sampling is SEPARABLE — per level it is
    two batched tent-weight contractions

        out[n, i, j] = ty[n, j, :] @ corr[n] @ tx[n, i, :]^T

    with tent(x) = max(0, 1-|x|) giving exactly the zeros-padded bilinear
    taps (same trick as ops/resample.grid_sample_mxu). TPU gathers do not
    vectorize; these einsums run on the systolic array and make the GRU
    refinement loop compute-bound (docs/PERF.md). Exact same numbers as the
    gather path (test-pinned)."""
    b, h, w, _ = coords.shape
    r = radius
    win = 2 * r + 1
    n = b * h * w
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)  # window offsets

    cx = coords[..., 0].reshape(n)
    cy = coords[..., 1].reshape(n)

    out = []
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[1:3]
        corr_l = corr.reshape(n, hl, wl)
        xs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, wl), 2)
        ys = jax.lax.broadcasted_iota(jnp.float32, (1, 1, hl), 2)
        px = cx[:, None] / (2 ** lvl) + offs[None, :]  # [N, win]
        py = cy[:, None] / (2 ** lvl) + offs[None, :]
        # degenerate 1-wide/-tall levels sample the single texel with
        # weight 1 (same convention as the gather path's zero-size guard)
        tx = (jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - xs)) if wl > 1
              else jnp.ones((n, win, 1), jnp.float32))             # [N,win,wl]
        ty = (jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - ys)) if hl > 1
              else jnp.ones((n, win, 1), jnp.float32))             # [N,win,hl]
        t1 = jnp.einsum("njy,nyx->njx", ty, corr_l,
                        preferred_element_type=jnp.float32)       # [N,win,wl]
        # out[n, i, j]: x-offset i slow, y-offset j fast (window-order
        # parity with the reference's meshgrid(ij) layout)
        o = jnp.einsum("nix,njx->nij", tx, t1,
                       preferred_element_type=jnp.float32)        # [N,win,win]
        out.append(o.reshape(b, h, w, win * win))
    return jnp.concatenate(out, axis=-1)


def lookup_corr(pyramid: List[jnp.ndarray], coords: jnp.ndarray,
                radius: int = 4) -> jnp.ndarray:
    """coords: [B, H, W, 2] current target positions (pixels, level 0).
    Returns [B, H, W, num_levels*(2r+1)^2]. Dispatches to the MXU separable
    tent-matmul lookup for real workloads; the gather path remains for tiny
    point counts (where matmul padding overhead dominates)."""
    n = coords.shape[0] * coords.shape[1] * coords.shape[2]
    # symbolic batch (jax.export serving artifacts): `n >= 256` is
    # inconclusive, and any real serving size wants the MXU path
    if not isinstance(n, int) or n >= 256:
        return lookup_corr_mxu(pyramid, coords, radius)
    return lookup_corr_gather(pyramid, coords, radius)
