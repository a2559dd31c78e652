"""RAFT optical-flow network in Flax with a lax.scan refinement loop.

Capability parity with the reference's vendored RAFT
(`contrast/flow/raft.py`): small (hdim 96 / cdim 64, r=3) and basic
(128/128, r=4) variants, 4-level all-pairs correlation pyramid, GRU
iterative refinement with per-iteration stop-gradient on the coordinates
(`raft.py:140-141`), convex upsampling for the basic variant / upflow8 for
small. Inference-only here: pretraining uses it as a frozen flow oracle
(`main_pretrain.py:55-57`)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.resample import coords_grid, upflow8
from .corr import build_corr_pyramid, lookup_corr
from .extractor import Encoder
from .update import BasicUpdateBlock, SmallUpdateBlock


def convex_upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (reference `raft.py:85-96`).

    flow: [B, H, W, 2]; mask: [B, H, W, 64*9] (conv output, channel layout
    (9, 8, 8) like the torch view). Returns [B, 8H, 8W, 2]."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    f8 = 8.0 * flow
    pad = jnp.pad(f8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood, (dy, dx) raster order = torch unfold order
    patches = jnp.stack([
        pad[:, dy:dy + h, dx:dx + w, :]
        for dy in range(3) for dx in range(3)
    ], axis=3)  # [B, H, W, 9, 2]

    up = jnp.einsum("bhwkpq,bhwkc->bhwpqc", mask, patches,
                    preferred_element_type=jnp.float32)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [B, H, 8, W, 8, 2]
    return up.reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    small: bool = False
    corr_levels: int = 4
    dtype: Any = jnp.float32
    # corr-pyramid HBM storage dtype; None follows `dtype`. The pyramid is
    # the refinement loop's dominant HBM traffic, so f32 compute + bf16
    # storage is the accuracy-cheap fast mode (docs/PERF.md)
    corr_dtype: Any = None

    @property
    def corr_radius(self) -> int:
        return 3 if self.small else 4

    @property
    def hidden_dim(self) -> int:
        return 96 if self.small else 128

    @property
    def context_dim(self) -> int:
        return 64 if self.small else 128

    @nn.compact
    def __call__(self, image1, image2, iters: int = 12,
                 flow_init: Optional[jnp.ndarray] = None,
                 all_iters: bool = False):
        """image1, image2: [B, H, W, 3] in [0, 255] (uint8 or float).
        Returns (flow_low [B, H/8, W/8, 2], flow_up [B, H, W, 2]) — the
        reference's test_mode output pair (`raft.py:159-160`).

        all_iters=True returns (flow_low, flow_ups [iters, B, H, W, 2]):
        every refinement iteration's full-resolution prediction, the
        training-mode output the gamma-weighted sequence loss consumes
        (train/raft_trainer.py). Each iteration detaches coords1 exactly
        like test mode, so gradients flow through one update step at a time
        (the original RAFT training scheme)."""
        hdim, cdim = self.hidden_dim, self.context_dim
        corr_ch = self.corr_levels * (2 * self.corr_radius + 1) ** 2

        image1 = 2.0 * (image1.astype(self.dtype) / 255.0) - 1.0
        image2 = 2.0 * (image2.astype(self.dtype) / 255.0) - 1.0

        fnet = Encoder(output_dim=128 if self.small else 256,
                       norm_fn="instance", small=self.small,
                       dtype=self.dtype, name="fnet")
        cnet = Encoder(output_dim=hdim + cdim,
                       norm_fn="none" if self.small else "batch",
                       small=self.small, dtype=self.dtype, name="cnet")
        if self.small:
            update = SmallUpdateBlock(corr_ch, hdim, self.dtype,
                                      name="update_block")
        else:
            update = BasicUpdateBlock(corr_ch, hdim, self.dtype,
                                      name="update_block")

        # shared feature pass over both frames (batch-concat like the
        # reference's list input, `extractor.py:176-179`)
        # corr accumulates in f32 on the MXU either way; under bf16 compute
        # the pyramid is also *stored* bf16 — the volume is the refinement
        # loop's dominant HBM traffic (corr.py:build_corr_pyramid)
        fmaps = fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        pyramid = build_corr_pyramid(
            fmap1, fmap2, self.corr_levels,
            store_dtype=self.corr_dtype or self.dtype)

        c = cnet(image1)
        net = jnp.tanh(c[..., :hdim])
        inp = nn.relu(c[..., hdim:])

        b, h8, w8, _ = fmap1.shape
        coords0 = jnp.broadcast_to(coords_grid(h8, w8)[None], (b, h8, w8, 2))
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        # static refinement loop; re-calling the same named submodule shares
        # its parameters across iterations (the GRU weights are tied)
        def _up(flow_low, up_mask):
            if up_mask is None or self.small:
                return upflow8(flow_low)
            return convex_upsample_flow(flow_low, up_mask.astype(jnp.float32))

        up_mask = None
        preds = []
        for _ in range(iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_corr(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta = update(net, inp, corr.astype(self.dtype),
                                         flow.astype(self.dtype))
            coords1 = coords1 + delta.astype(jnp.float32)
            if all_iters:
                preds.append(_up(coords1 - coords0, up_mask))

        flow_low = coords1 - coords0
        if all_iters:
            return flow_low, jnp.stack(preds, axis=0)
        return flow_low, _up(flow_low, up_mask)


def raft_batch_flows(model: RAFT, variables, frames: jnp.ndarray,
                     iters: int = 12, up: bool = False,
                     micro_batch: Optional[int] = None):
    """Frozen-RAFT flow stacks for the live (non-file) pretraining path.

    frames: [B, n, H, W, 3] uint8. Runs RAFT over consecutive pairs forward
    and backward (reference `util.calc_optical_flow`, `util.py:77-102`;
    micro-batching replaces `mem_reduce_calc_optical_flow`). Returns
    (flows_fwd, flows_bwd): [B, n-1, h, w, 2] with h, w = H/8, W/8 (or full
    res when up=True, the reference's `--flow_up` for live RAFT).

    All 2(n-1) directed pairs run through ONE `lax.map` body (RAFT is
    traced/compiled once, and exactly one pair-forward's buffers are live
    at a time). The earlier Python unroll let XLA keep several 720p
    pair-forwards live at once — at 720x1280 the level-0 corr volume alone
    is ~0.8 GB f32 per pair, and batch 2 / n_frames 6 overflowed the 16 GB
    chip at compile (docs/PERF.md live multi-span section). The map body
    indexes into the closed-over frames array, so nothing is duplicated.
    """
    b, n, H, W, _ = frames.shape
    assert n >= 2, "need at least two frames for flow"
    idx = 1 if up else 0

    mb = b if micro_batch is None else min(micro_batch, b)
    if b % mb:
        # snap to the largest divisor of b (static shapes under jit need
        # equal chunks; e.g. b=6, flow_bs=4 -> chunks of 3)
        mb = max(d for d in range(1, mb + 1) if b % d == 0)
    n_chunks = b // mb

    # directed pair table: entries 0..n-2 = forward (i -> i+1),
    # entries n-1..2n-3 = backward (i+1 -> i)
    src = jnp.concatenate([jnp.arange(n - 1), jnp.arange(1, n)])
    dst = jnp.concatenate([jnp.arange(1, n), jnp.arange(n - 1)])
    n_pairs = 2 * (n - 1)

    def one(args):
        p_src, p_dst, c = args
        fr = jax.lax.dynamic_slice_in_dim(frames, c * mb, mb, axis=0)
        out = model.apply(variables, jnp.take(fr, p_src, axis=1),
                          jnp.take(fr, p_dst, axis=1), iters=iters)
        return jax.lax.stop_gradient(out[idx])

    # map axis laid out [pair-major, chunk-minor] so the reshape below
    # reassembles [n_pairs, B, ...]
    flows = jax.lax.map(one, (jnp.repeat(src, n_chunks),
                              jnp.repeat(dst, n_chunks),
                              jnp.tile(jnp.arange(n_chunks), n_pairs)))
    flows = flows.reshape(n_pairs, b, *flows.shape[2:])
    fwd = jnp.moveaxis(flows[:n - 1], 0, 1)
    # backward stack in reversed-pair order (reference util.py:88-91)
    bwd = jnp.moveaxis(flows[n - 1:][::-1], 0, 1)
    return fwd, bwd
