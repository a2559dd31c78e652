"""Device-side photometric augmentation (the TPU half of the host pipeline).

The reference runs BYOL's photometric stack (color jitter in random order,
grayscale, Gaussian blur, solarize — `contrast/data/transform.py:17-70`)
through PIL on DataLoader workers: ~10 ms of single-core host work per
sample pair, the dominant host cost after the fused ROI decode. This module
moves every photometric op onto the TPU as one static jitted program over
the uint8 crop batch; the host only *samples* the random parameters
(`data/transforms.py: TransformCompose(device_photometric=True)`), which
keeps the rng stream — and therefore the crop/flip geometry — bit-identical
to the host-PIL path.

Static program (per crop, in 0..255 float):

    affine segment 1 -> hue shift -> affine segment 2 -> Gaussian blur
    -> solarize

Why two affine segments reproduce the *shuffled* jitter order exactly:
brightness (f*x), contrast (f*x + (1-f)*mean_gray) and saturation
(f*x + (1-f)*gray(x)) are all linear operators on the image that mutually
commute in float math (gray/mean_gray are luma projections with
w_r+w_g+w_b = 1, so scaling and gray-mixing pass through each other); only
the position of the non-linear hue op matters. Each segment is therefore
one composed per-sample transform

    x -> clip(M x + c0 + c1 * (v . mean(x) + s))

whose [3,3] matrix / offsets the host composes from the sampled factors in
the sampled order (including the one mean-dependent contrast term and the
trailing grayscale projection). Blur is a per-sample-sigma separable
truncated Gaussian applied as two banded matmuls on the MXU (row-normalized
at the edges). Solarize inverts >=128.

Parity with the host PIL path is bounded, not bit-exact (tested): PIL
clips+rounds to uint8 after *every* op and its GaussianBlur is a 3-pass box
approximation, while this program clips once per segment and applies a true
Gaussian — differences are a few counts at saturated pixels, the same order
as the PIL-vs-torchvision-tensor gap the reference itself straddles.

Parameter layout (`PARAM_DIM` floats per crop, packed by
`data/transforms.py:sample_photometric_params`):
    [0:9]   M1 row-major     [9:12]  c0_1     [12:15] c1_1
    [15:18] v1               [18]    s1
    [19]    hue delta (turns)
    [20:29] M2               [29:32] c0_2     [32:35] c1_2
    [35:38] v2               [38]    s2
    [39]    blur sigma (<=0: skip)   [40]    solarize flag
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PARAM_DIM = 41
BLUR_RADIUS = 6  # static taps; covers 3*sigma at the BYOL max sigma=2


def _affine_segment(x, m, c0, c1, v, s):
    """x: [B,H,W,3] 0..255; m: [B,3,3]; c0,c1,v: [B,3]; s: [B]."""
    mu = jnp.mean(x, axis=(1, 2))                       # [B,3]
    mean_gray = jnp.einsum("bc,bc->b", v, mu) + s       # [B]
    y = jnp.einsum("bij,bhwj->bhwi", m, x)
    y = y + (c0 + c1 * mean_gray[:, None])[:, None, None, :]
    return jnp.clip(y, 0.0, 255.0)


def _hue_shift(x, delta):
    """HSV hue rotation by `delta` turns (float; torchvision adjust_hue
    semantics, vs the host path's uint8 PIL HSV roundtrip).
    x: [B,H,W,3] in 0..255; delta: [B]."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_c,
        jnp.where(mx == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0))
    h = jnp.where(c > 0, h, 0.0) % 6.0
    h = (h + delta[:, None, None] * 6.0) % 6.0

    sector = h % 2.0
    xs = c * (1.0 - jnp.abs(sector - 1.0))
    zero = jnp.zeros_like(c)
    k = jnp.floor(h).astype(jnp.int32)
    r1 = jnp.select([k == 0, k == 1, k == 2, k == 3, k == 4],
                    [c, xs, zero, zero, xs], c)
    g1 = jnp.select([k == 0, k == 1, k == 2, k == 3, k == 4],
                    [xs, c, c, xs, zero], zero)
    b1 = jnp.select([k == 0, k == 1, k == 2, k == 3, k == 4],
                    [zero, zero, xs, c, c], xs)
    m = (mx - c)[..., None]
    return jnp.stack([r1, g1, b1], axis=-1) + m


def _blur_mat(n: int, sigma: jnp.ndarray) -> jnp.ndarray:
    """[B, n, n] row-normalized truncated-Gaussian band matrices.
    sigma<=~0 degenerates to the identity (only the d=0 tap survives)."""
    i = jnp.arange(n, dtype=jnp.float32)
    d = i[None, :] - i[:, None]                          # [n, n]
    s = jnp.maximum(sigma, 1e-3)[:, None, None]
    a = jnp.exp(-0.5 * jnp.square(d / s))
    a = jnp.where(jnp.abs(d) <= BLUR_RADIUS, a, 0.0)
    return a / jnp.sum(a, axis=-1, keepdims=True)


def _gaussian_blur(x, sigma):
    """Separable per-sample blur as two banded MXU matmuls.
    x: [B,H,W,3]; sigma: [B] (<=0 rows come out exactly identity)."""
    b, h, w, _ = x.shape
    ah = _blur_mat(h, sigma)
    aw = _blur_mat(w, sigma)
    y = jnp.einsum("bij,bjwc->biwc", ah, x)
    return jnp.einsum("bwj,bhjc->bhwc", aw, y)


def apply_photometric(x: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Apply the full photometric stack to a crop batch.

    x: [B,H,W,3] uint8 or float in 0..255 (post-crop/flip host output).
    params: [B, PARAM_DIM] from `data/transforms.py:sample_photometric_params`.
    Returns float32 [B,H,W,3] in 0..255 (caller normalizes).
    """
    x = x.astype(jnp.float32)
    p = params.astype(jnp.float32)
    m1 = p[:, 0:9].reshape(-1, 3, 3)
    m2 = p[:, 20:29].reshape(-1, 3, 3)

    x = _affine_segment(x, m1, p[:, 9:12], p[:, 12:15], p[:, 15:18], p[:, 18])
    x = _hue_shift(x, p[:, 19])
    x = _affine_segment(x, m2, p[:, 29:32], p[:, 32:35], p[:, 35:38], p[:, 38])
    x = _gaussian_blur(x, p[:, 39])
    solar = p[:, 40][:, None, None, None] > 0.5
    # 127.5 cut == PIL's >=128 on integer values, robust to the ~1e-5 f32
    # noise the hue roundtrip leaves on exact-128 pixels
    x = jnp.where(solar & (x >= 127.5), 255.0 - x, x)
    return x


apply_photometric_jit = jax.jit(apply_photometric)
