"""All-pairs correlation volume + pyramid lookup (pure functions).

Same math as the reference's CorrBlock (`contrast/flow/corr.py:12-60`): a
single big MXU matmul builds <f1, f2>/sqrt(C) for every pixel pair, 2x
average pooling builds a 4-level pyramid over the *target* dimensions, and
the lookup bilinearly samples a (2r+1)^2 window around the current flow
target at every level. The memory-light `alt_cuda_corr` CUDA variant
(effectively dead in the reference) is not ported; a Pallas fused lookup is
the planned equivalent."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from ...ops.resample import grid_sample


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4) -> List[jnp.ndarray]:
    """fmap1, fmap2: [B, H, W, C] -> list of [B*H*W, h_l, w_l, 1]."""
    b, h, w, c = fmap1.shape
    corr = jnp.einsum("bxc,byc->bxy", fmap1.reshape(b, h * w, c),
                      fmap2.reshape(b, h * w, c),
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
    corr = corr.reshape(b * h * w, h, w, 1)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        if min(corr.shape[1:3]) >= 2:  # stop shrinking at 1x1 (tiny inputs)
            corr = nn.avg_pool(corr, (2, 2), (2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid: List[jnp.ndarray], coords: jnp.ndarray,
                radius: int = 4) -> jnp.ndarray:
    """coords: [B, H, W, 2] current target positions (pixels, level 0).
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
