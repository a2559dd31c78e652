"""PixPro: pixel-level contrastive model with online + momentum branches.

Functional redesign of reference `contrast/models/PixPro.py:258-439`. The
torch version mutates its key encoder in-place mid-forward and relies on
DDP/SyncBN side effects; here the model is a pure Flax module whose parameter
tree carries both branches side by side:

    params = {encoder, projector, value_transform[, projector_instance,
              predictor], encoder_k, projector_k[, projector_instance_k]}

and the EMA update is an explicit pure function over that tree
(`ema_update`), applied by the train step *before* the momentum forward with
the pre-step online params — same ordering as the reference
(`PixPro.py:398-399` updates keys before the no-grad key forward).

Cross-replica BatchNorm is the `axis_name` threaded into every BatchNorm
(replaces `nn.SyncBatchNorm.convert_sync_batchnorm`, `PixPro.py:289-292`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

from ..ops.loss import l2_normalize, pixpro_pair_loss, ppm_attention, instance_loss
from .heads import MLP2d
from .resnet import make_resnet

# online-branch subtree -> momentum-branch subtree
EMA_PAIRS = (
    ("encoder", "encoder_k"),
    ("projector", "projector_k"),
    ("projector_instance", "projector_instance_k"),
)


def momentum_schedule(k, total_steps: int, base_momentum: float):
    """Cosine-ramped EMA momentum: 1 - (1-m) * (cos(pi*k/K)+1)/2.

    Starts at `base_momentum` and ramps to 1.0 over training — reference
    `PixPro.py:294-295,321-327` (K = per-replica total steps, k = current).
    """
    k = jnp.asarray(k, jnp.float32)
    ramp = (jnp.cos(jnp.pi * k / total_steps) + 1.0) / 2.0
    return 1.0 - (1.0 - base_momentum) * ramp


def ema_update(params, momentum):
    """new_k = m * k + (1-m) * q for every EMA pair present in `params`."""
    params = unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    for q_name, k_name in EMA_PAIRS:
        if q_name in params and k_name in params:
            params[k_name] = jax.tree.map(
                lambda pk, pq: pk * momentum + pq * (1.0 - momentum),
                params[k_name], params[q_name])
    return params


def init_momentum_from_online(params):
    """Copy online subtrees into their momentum twins (init-time only;
    reference `PixPro.py:281-287`)."""
    params = unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    for q_name, k_name in EMA_PAIRS:
        if q_name in params and k_name in params:
            params[k_name] = jax.tree.map(jnp.copy, params[q_name])
    return params


class PixPro(nn.Module):
    """Online encoder->projector->PPM + momentum encoder->projector."""

    arch: str = "resnet50"
    pixpro_p: float = 1.0
    pixpro_clamp_value: float = 0.0
    pixpro_transform_layer: int = 0
    pixpro_pos_ratio: float = 0.7
    pixpro_ins_loss_weight: float = 0.0
    proj_inner_dim: int = 4096
    proj_out_dim: int = 256
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9
    # perf: run both views through each branch as ONE 2B-batch pass (bigger
    # convs -> better MXU utilization). BatchNorm still computes *per-view*
    # statistics inside the fused batch (models/norm.py:ViewBatchNorm), so
    # the math — including running-average order — is exactly the
    # reference's sequential two-call semantics. multi_span_loss fuses the
    # same way (one 2BF pass; group 0 = all view-1 frame crops).
    fuse_views: bool = False
    # use the fused Pallas pair-similarity kernel (TPU only; exact value and
    # gradient parity with the XLA composition is test-asserted)
    use_fused_pair_loss: bool = False
    # rematerialize encoder residual blocks in backward (larger batches)
    remat: bool = False

    def setup(self):
        common = dict(dtype=self.dtype, axis_name=self.axis_name,
                      bn_momentum=self.bn_momentum,
                      view_groups=2 if self.fuse_views else 1)
        enc = lambda: make_resnet(self.arch, head_type="early_return",
                                  remat=self.remat, **common)
        head = lambda: MLP2d(self.proj_inner_dim, self.proj_out_dim, **common)

        self.encoder = enc()
        self.projector = head()
        self.encoder_k = enc()
        self.projector_k = head()

        if self.pixpro_transform_layer == 0:
            self.value_transform = None
        elif self.pixpro_transform_layer == 1:
            self.value_transform = nn.Dense(self.proj_out_dim,
                                            dtype=self.dtype,
                                            name="value_transform")
        elif self.pixpro_transform_layer == 2:
            self.value_transform = MLP2d(self.proj_out_dim, self.proj_out_dim,
                                         name="value_transform", **common)
        else:
            raise NotImplementedError(
                f"pixpro_transform_layer={self.pixpro_transform_layer}")

        if self.pixpro_ins_loss_weight > 0.0:
            self.projector_instance = head()
            self.projector_instance_k = head()
            self.predictor = head()

    # --- branch forwards -------------------------------------------------

    def featprop(self, proj, train: bool = True):
        """Pixel propagation: value transform + cosine-attention smoothing
        (reference featprop, `PixPro.py:339-363`)."""
        if self.value_transform is None:
            value = proj
        elif isinstance(self.value_transform, MLP2d):
            value = self.value_transform(proj, train)
        else:
            value = self.value_transform(proj)
        return ppm_attention(proj, value, p=self.pixpro_p,
                             clamp_value=self.pixpro_clamp_value)

    def online(self, im, train: bool = True):
        """Online branch: returns L2-normalized pixel predictions
        [B, h, w, C] (+ normalized instance prediction [B, C] if enabled)."""
        feat = self.encoder(im, train)
        proj = self.projector(feat, train)
        pred = l2_normalize(self.featprop(proj, train))

        inst = None
        if self.pixpro_ins_loss_weight > 0.0:
            pi = self.projector_instance(feat, train)
            pi = self.predictor(pi, train)
            # global mean == reference AvgPool2d(7) on the canonical 7x7 map
            pi = jnp.mean(pi, axis=(1, 2))
            inst = l2_normalize(pi)
        return pred, inst

    def momentum_branch(self, im, train: bool = True):
        """Momentum branch: normalized projections (targets). Gradients are
        stopped by the caller; BN here still runs in train mode, exactly like
        the reference's never-eval'd key encoder."""
        feat = self.encoder_k(im, train)
        proj = l2_normalize(self.projector_k(feat, train))

        inst = None
        if self.pixpro_ins_loss_weight > 0.0:
            pk = self.projector_instance_k(feat, train)
            pk = jnp.mean(pk, axis=(1, 2))
            inst = l2_normalize(pk)
        return proj, inst

    # --- multi-span loss (use_flow_frames mode) ---------------------------

    def multi_span_loss(self, ims1, ims2, coords1, coords2,
                        flows_fwd, flows_bwd, masks_fwd, masks_bwd,
                        spans, n_frames_eff, train: bool = True):
        """Every-(span,start) pairing over the frame window.

        The reference *ships* this mode broken: its loader emits per-frame
        crop lists (`dataset.py:451-483`) that its loss cannot consume (a
        5-D flow reaches grid_sample; plus the missing calc_frame_ratio,
        SURVEY.md §4.6). Defined semantics here: every composed window
        (length l, start s) pairs the view-1 crop of frame s with the view-2
        crop of frame s+l, warped by that window's flow; pair losses average
        over the windows valid for each sample's real frame count.

        ims1: [B, F, H, W, 3] view-1 crops of frames 0..F-1 (F = n_frames-1)
        ims2: [B, F, H, W, 3] view-2 crops of frames 1..F
        coords1/coords2: [B, F, 10]; flows/masks: [S, B, h, w(, 2)] in
        `all_concat_flow` order; spans: static [(length, start)];
        n_frames_eff: [B] real frame counts (short videos -> padded tails).
        """
        b, f = ims1.shape[:2]

        def flat(x):
            return x.reshape((b * f,) + x.shape[2:])

        def unflat(x):
            return x.reshape((b, f) + x.shape[1:])

        if self.fuse_views:
            # one 2BF pass per branch; ViewBatchNorm(view_groups=2) keeps
            # per-view statistics with group 0 = view 1, matching the
            # sequential call order below bit-for-bit (models/norm.py)
            fused = jnp.concatenate([flat(ims1), flat(ims2)], axis=0)
            pred, _ = self.online(fused, train)
            pred_1, pred_2 = jnp.split(pred, 2, axis=0)
            proj_ng, _ = self.momentum_branch(fused, train)
            proj_1_ng, proj_2_ng = jnp.split(proj_ng, 2, axis=0)
        else:
            pred_1, _ = self.online(flat(ims1), train)
            pred_2, _ = self.online(flat(ims2), train)
            proj_1_ng, _ = self.momentum_branch(flat(ims1), train)
            proj_2_ng, _ = self.momentum_branch(flat(ims2), train)
        pred_1, pred_2 = unflat(pred_1), unflat(pred_2)
        proj_1_ng = jax.lax.stop_gradient(unflat(proj_1_ng))
        proj_2_ng = jax.lax.stop_gradient(unflat(proj_2_ng))

        eff = jnp.asarray(n_frames_eff, jnp.float32)
        loss_1 = jnp.zeros((b,), jnp.float32)
        loss_2 = jnp.zeros((b,), jnp.float32)
        weight = jnp.zeros((b,), jnp.float32)
        pos_num_1 = jnp.zeros((b,), jnp.float32)
        pos_num_2 = jnp.zeros((b,), jnp.float32)
        pos_mean_1 = jnp.zeros((b,), jnp.float32)
        pos_mean_2 = jnp.zeros((b,), jnp.float32)

        for i, (length, s) in enumerate(spans):
            e = s + length  # target frame index
            valid = (e <= (eff - 1.0)).astype(jnp.float32)  # [B]
            l1, (pn1, pm1) = pixpro_pair_loss(
                pred_1[:, s], proj_2_ng[:, e - 1],
                coords1[:, s], coords2[:, e - 1], self.pixpro_pos_ratio,
                flow=flows_fwd[i], flow_mask=None if masks_fwd is None
                else masks_fwd[i], reduce=False)
            l2, (pn2, pm2) = pixpro_pair_loss(
                pred_2[:, e - 1], proj_1_ng[:, s],
                coords2[:, e - 1], coords1[:, s], self.pixpro_pos_ratio,
                flow=flows_bwd[i], flow_mask=None if masks_bwd is None
                else masks_bwd[i], reduce=False)
            loss_1 = loss_1 + valid * l1
            loss_2 = loss_2 + valid * l2
            weight = weight + valid
            pos_num_1 = pos_num_1 + valid * pn1
            pos_num_2 = pos_num_2 + valid * pn2
            pos_mean_1 = pos_mean_1 + valid * pm1
            pos_mean_2 = pos_mean_2 + valid * pm2

        denom = jnp.maximum(weight, 1.0)
        loss = jnp.mean((loss_1 + loss_2) / denom)
        # per-direction telemetry averaged over each sample's valid windows
        # (reference logs pos_num_1/pos_num_2 separately, main_pretrain.py:280)
        stats = {
            "pos_num_1": pos_num_1 / denom, "pos_mean_1": pos_mean_1 / denom,
            "pos_num_2": pos_num_2 / denom, "pos_mean_2": pos_mean_2 / denom,
        }
        return loss, stats

    # --- full loss (both views) ------------------------------------------

    def __call__(self, im1, im2, coord1, coord2,
                 flow_fwd=None, flow_bwd=None,
                 mask_fwd=None, mask_bwd=None,
                 train: bool = True):
        """Symmetric PixPro loss over the two views (reference
        `PixPro.py:368-439`). Flow (if given) warps each query grid onto the
        other view's frame. Returns (loss, stats_dict)."""
        if self.fuse_views:
            def split2(x):
                return None if x is None else jnp.split(x, 2, axis=0)
            both = jnp.concatenate([im1, im2], axis=0)
            pred, inst = self.online(both, train)
            (pred_1, pred_2), inst_12 = split2(pred), split2(inst)
            inst_1, inst_2 = inst_12 if inst_12 else (None, None)
            proj_ng, inst_ng = self.momentum_branch(both, train)
            proj_1_ng, proj_2_ng = split2(proj_ng)
            inst_ng12 = split2(inst_ng)
            inst_1_ng, inst_2_ng = inst_ng12 if inst_ng12 else (None, None)
        else:
            pred_1, inst_1 = self.online(im1, train)
            pred_2, inst_2 = self.online(im2, train)
            proj_1_ng, inst_1_ng = self.momentum_branch(im1, train)
            proj_2_ng, inst_2_ng = self.momentum_branch(im2, train)
        proj_1_ng = jax.lax.stop_gradient(proj_1_ng)
        proj_2_ng = jax.lax.stop_gradient(proj_2_ng)

        if self.use_fused_pair_loss:
            from ..ops.pallas.pair_loss import pixpro_pair_loss_fused as pair_loss
        else:
            pair_loss = pixpro_pair_loss
        loss_1, (pos_num_1, pos_mean_1) = pair_loss(
            pred_1, proj_2_ng, coord1, coord2, self.pixpro_pos_ratio,
            flow=flow_fwd, flow_mask=mask_fwd)
        loss_2, (pos_num_2, pos_mean_2) = pair_loss(
            pred_2, proj_1_ng, coord2, coord1, self.pixpro_pos_ratio,
            flow=flow_bwd, flow_mask=mask_bwd)
        loss = loss_1 + loss_2

        stats = {
            "pos_num_1": pos_num_1, "pos_mean_1": pos_mean_1,
            "pos_num_2": pos_num_2, "pos_mean_2": pos_mean_2,
        }

        if self.pixpro_ins_loss_weight > 0.0:
            inst_1_ng = jax.lax.stop_gradient(inst_1_ng)
            inst_2_ng = jax.lax.stop_gradient(inst_2_ng)
            li = instance_loss(inst_1, inst_2_ng) + instance_loss(inst_2, inst_1_ng)
            loss = loss + self.pixpro_ins_loss_weight * li
            stats["loss_instance"] = li

        return loss, stats
