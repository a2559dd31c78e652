"""Pallas TPU kernel: fused bilinear warp via tent-weight MXU contraction.

The hot custom op of this framework is sampling a small flow field at many
arbitrary points (long-range flow composition + cycle-consistency, reference
`contrast/util.py:301-330,252-297`). The XLA lowering of gather-based
bilinear sampling is scalar-bound on TPU; the einsum tent formulation (see
`ops/resample.grid_sample_mxu`) fixes that but still round-trips its
[points, W] tent matrices and [points, W*C] partial products through HBM.

This kernel fuses the whole warp per (batch, point-chunk) program in VMEM:

    ay = max(0, 1 - |iota_H - y|)        # [chunk, H]  tent rows  (VPU)
    ax = max(0, 1 - |iota_W - x|)        # [chunk, W]  tent cols  (VPU)
    per channel c:
        t   = ay @ field[c]              # [chunk, W]           (MXU)
        out = sum(t * ax, axis=1)        # [chunk]              (VPU)

Identical math to torch grid_sample(align_corners=True, padding='zeros'):
the tent weight of source index i for coordinate x is exactly the bilinear
floor/ceil tap weight, zero outside the image.

Fields are channel-planar [B, C, H, W] here so each channel is a clean
2-D MXU operand (channels-last would waste lanes on C=2).

EXPERIMENTAL: on-chip adjudication (docs/PERF.md round-3 section, measured
via tools/bench_warp.py) has `grid_sample_mxu`'s batched XLA einsums 2.8x
FASTER than this kernel at the composition shape (per-program [chunk,H]
contractions underfill the MXU) and the gather path faster at full-res.
`ops/resample.grid_sample_auto` therefore never dispatches here."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


def _warp_kernel(field_ref, xy_ref, out_ref, *, h, w, c):
    # field_ref: [1, H, C*W] (channels pre-packed along lanes on the host);
    # xy_ref: [1, chunk, 2]; out_ref: [1, chunk, C]
    chunk = xy_ref.shape[1]
    x = xy_ref[0, :, 0]
    y = xy_ref[0, :, 1]

    # iota must be integer-typed on TPU; cast after
    iw = jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1).astype(jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (chunk, h), 1).astype(jnp.float32)
    ax = jnp.maximum(0.0, 1.0 - jnp.abs(iw - x[:, None]))  # [chunk, W]
    ay = jnp.maximum(0.0, 1.0 - jnp.abs(ih - y[:, None]))  # [chunk, H]

    # one wide MXU contraction over all channels: [chunk, H] @ [H, C*W]
    t = jnp.dot(ay, field_ref[0], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    for ch in range(c):
        out_ref[0, :, ch] = jnp.sum(t[:, ch * w:(ch + 1) * w] * ax, axis=1)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def tent_warp_pallas(field: jnp.ndarray, coords_px: jnp.ndarray,
                     chunk: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Sample `field` at pixel coordinates with bilinear/zeros semantics.

    field: [B, H, W, C] float32; coords_px: [B, N, 2] (x, y) in pixels.
    Returns [B, N, C]. N must not be huge relative to VMEM; chunk tiles it.
    """
    b, h, w, c = field.shape
    _, n, _ = coords_px.shape
    # pack channels along lanes: [B, H, C*W], column index = ch*W + x
    field_pl = jnp.transpose(field, (0, 1, 3, 2)).reshape(b, h, c * w)
    field_pl = field_pl.astype(jnp.float32)

    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        coords_px = jnp.pad(coords_px, ((0, 0), (0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_warp_kernel, h=h, w=w, c=c),
        grid=(b, n_pad // chunk),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM if _HAS_PALLAS else None),
            pl.BlockSpec((1, chunk, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM if _HAS_PALLAS else None),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM if _HAS_PALLAS else None),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        interpret=interpret,
    )(field_pl, coords_px.astype(jnp.float32))
    return out[:, :n]


def grid_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """grid_sample-compatible wrapper: normalized grid [B, Hg, Wg, 2] ->
    [B, Hg, Wg, C]."""
    bsz, h, w, c = img.shape
    gb, gh, gw, _ = grid.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    coords = jnp.stack([x, y], axis=-1).reshape(gb, gh * gw, 2)
    out = tent_warp_pallas(img, coords, interpret=interpret)
    return out.reshape(gb, gh, gw, c).astype(img.dtype)
