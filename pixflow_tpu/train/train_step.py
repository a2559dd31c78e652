"""The compiled PixPro train step.

One jitted SPMD program per config containing everything the reference does
per iteration across Python/DDP/NCCL boundaries (`main_pretrain.py:213-269`
+ `PixPro.forward` + `util.apply_optical_flow`):

    flow upsample -> long-range composition -> cycle masks ->
    cosine-ramped EMA update (pre-key-forward, reference ordering) ->
    4x encoder forwards + PPM -> pixel-pair loss ->
    gradient reduction over the data mesh -> LARS/SGD update -> metrics.

Parallelism is pure GSPMD: the batch is sharded over the mesh's `data` axis
via in_shardings and parameters are replicated. Batch statistics computed by
BatchNorm are then means over the *global* batch (the partitioner inserts the
cross-chip all-reduce), which reproduces the reference's SyncBN exactly
(`PixPro.py:289-292`); likewise the loss mean and its gradients are global,
reproducing DDP's gradient all-reduce. No hand-written collectives — they
compile onto ICI directly. (An earlier shard_map variant was functionally
identical but orders of magnitude slower through the axon tunnel.)

Host work per step is reduced to feeding image/coord/flow arrays."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
from ..models.pixpro import ema_update, momentum_schedule
from ..ops.flow import compose_and_mask, mask_ratio, span_windows
from ..ops.flow_points import LazyFlowUp, mask_ratio_estimate
from ..parallel.mesh import DATA_AXIS

_MEAN = jnp.asarray(IMAGENET_MEAN)
_STD = jnp.asarray(IMAGENET_STD)


def _prep_images(x):
    """Device-side ImageNet normalization for uint8-transferred batches
    (4x less host->device traffic than pre-normalized f32)."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - _MEAN) / _STD
    return x


def _prep_images_aug(x, aug_params):
    """Device-side photometric augmentation (ops/augment.py) + ImageNet
    normalization: the host pipeline only decodes/crops/flips and samples
    the parameters, freeing ~10 ms of single-core PIL work per sample.
    Accepts [B,H,W,3] crops or [B,F,H,W,3] multi-span stacks."""
    from ..ops.augment import apply_photometric
    if x.ndim == 5:  # [B, F, H, W, 3] + params [B, F, P]
        b, f = x.shape[:2]
        y = apply_photometric(x.reshape((b * f,) + x.shape[2:]),
                              aug_params.reshape(b * f, -1))
        y = y.reshape((b, f) + y.shape[1:])
    else:
        y = apply_photometric(x, aug_params)
    return (y / 255.0 - _MEAN) / _STD


def _prep_flows(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def make_train_step(
    model,
    tx,
    *,
    lr_schedule,
    ema_total_steps: int,
    ema_base_momentum: float,
    mesh=None,
    use_flow: bool = False,
    flow_up: bool = False,
    flow_up_lazy: bool = True,
    flow_cat_norm: bool = False,
    use_flow_frames: bool = False,
    alpha1: Optional[float] = None,
    alpha2: Optional[float] = None,
    mask_ratio_stride: int = 32,
    flow_telemetry: bool = True,
    raft_fn=None,
    device_aug: bool = False,
    donate: bool = True,
):
    """Build the jitted train step.

    batch dict fields:
        im1, im2      [B, H, W, 3] float32 (normalized)
        coord1, coord2 [B, 10]
        flows_fwd, flows_bwd [B, K, h, w, 2]   (use_flow + flow files)
        frames        [B, n, H, W, 3] uint8    (use_flow + on-the-fly RAFT)
    Returns step_fn(state, batch) -> (new_state, metrics).
    """
    if use_flow_frames:
        # multi-span works with precomputed flow files OR live RAFT: the
        # reference's on-the-fly branch composes every (span,start) window
        # too (`contrast/util.py:129-171` calls all_concat_flow with
        # use_flow_frames on freshly computed flows).
        assert use_flow, "use_flow_frames requires use_flow"
    assert getattr(model, "axis_name", None) is None, \
        "GSPMD step: build the model with axis_name=None (BN stats are " \
        "global through sharding propagation, not named collectives)"

    def step_fn(state, batch):
        # EMA update of the momentum branch with the *pre-step* online params,
        # before the key forward (reference `PixPro.py:398-399,321-337`).
        m = momentum_schedule(state.ema_k, ema_total_steps, ema_base_momentum)
        params = ema_update(state.params, m)

        flow_fwd = flow_bwd = mask_fwd = mask_bwd = None
        lazy_mask_metrics = None
        if use_flow:
            if raft_fn is not None:
                flows_fwd, flows_bwd = raft_fn(batch["frames"])
            else:
                flows_fwd = _prep_flows(batch["flows_fwd"])
                flows_bwd = _prep_flows(batch["flows_bwd"])
            if flow_up and flow_up_lazy:
                # TPU-native flow_up: never materialize 720x1280 fields —
                # the loss evaluates the composed flow + cycle mask lazily
                # at the bin centers it reads (ops/flow_points.py; exact
                # parity with the materializing path is test-asserted).
                fwd = jnp.transpose(flows_fwd, (1, 0, 2, 3, 4))  # [K,B,h,w,2]
                bwd = jnp.transpose(flows_bwd, (1, 0, 2, 3, 4))
                kk = fwd.shape[0]

                def lazy(f, r):
                    return LazyFlowUp(
                        flows=f, flows_rev=r if alpha1 is not None else None,
                        alpha1=alpha1, alpha2=alpha2, is_norm=flow_cat_norm)

                if use_flow_frames:
                    flow_fwd, flow_bwd = [], []
                    for span, s in span_windows(kk):
                        fw, bw = fwd[s:s + span], bwd[kk - s - span:kk - s]
                        flow_fwd.append(lazy(fw, bw))
                        flow_bwd.append(lazy(bw, fw))
                else:
                    flow_fwd, flow_bwd = lazy(fwd, bwd), lazy(bwd, fwd)
                if flow_telemetry and alpha1 is not None and alpha2 is not None:
                    # telemetry on the full-span window: exact mask values
                    # on a strided fine grid (the reference averages all
                    # 720x1280 pixels; this is the same statistic sampled).
                    # This costs ~12% of the whole step (763 -> 875 img/s
                    # measured) — the driver therefore compiles a second
                    # telemetry-free variant and runs this one only on
                    # logged steps (flow_telemetry=False elsewhere).
                    lazy_mask_metrics = (
                        jnp.mean(mask_ratio_estimate(
                            fwd, bwd, alpha1, alpha2, flow_cat_norm,
                            stride=mask_ratio_stride)),
                        jnp.mean(mask_ratio_estimate(
                            bwd, fwd, alpha1, alpha2, flow_cat_norm,
                            stride=mask_ratio_stride)))
            else:
                flow_fwd, flow_bwd, mask_fwd, mask_bwd = compose_and_mask(
                    flows_fwd, flows_bwd, flow_up=flow_up,
                    use_flow_frames=use_flow_frames, alpha_1=alpha1,
                    alpha_2=alpha2, is_norm=flow_cat_norm)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            if use_flow_frames:
                # span enumeration from the flow stack itself (precomputed
                # [B,K,...] files or the live raft_fn output), so the live
                # path needs no flows_fwd batch key
                spans = span_windows(flows_fwd.shape[1])
                if device_aug:
                    ims1 = _prep_images_aug(batch["ims1"], batch["augs1"])
                    ims2 = _prep_images_aug(batch["ims2"], batch["augs2"])
                else:
                    ims1 = _prep_images(batch["ims1"])
                    ims2 = _prep_images(batch["ims2"])
                (loss, stats), mut = model.apply(
                    variables, ims1, ims2,
                    batch["coords1"], batch["coords2"],
                    flow_fwd, flow_bwd, mask_fwd, mask_bwd,
                    spans, batch["n_frames_eff"],
                    train=True, mutable=["batch_stats"],
                    method=model.multi_span_loss)
            else:
                if device_aug:
                    im1 = _prep_images_aug(batch["im1"], batch["aug1"])
                    im2 = _prep_images_aug(batch["im2"], batch["aug2"])
                else:
                    im1 = _prep_images(batch["im1"])
                    im2 = _prep_images(batch["im2"])
                (loss, stats), mut = model.apply(
                    variables, im1, im2,
                    batch["coord1"], batch["coord2"],
                    flow_fwd, flow_bwd, mask_fwd, mask_bwd,
                    train=True, mutable=["batch_stats"])
            return loss, (stats, mut["batch_stats"])

        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        updates, new_opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # metrics (aggregated on-device). The reference meters the two pair
        # directions separately (`main_pretrain.py:280-307` pos_1/pos_2);
        # surface both per-direction values and the combined aggregates.
        pos_num_1 = jnp.sum(stats["pos_num_1"])
        pos_num_2 = jnp.sum(stats["pos_num_2"])
        pos_mean_1 = jnp.mean(stats["pos_mean_1"])
        pos_mean_2 = jnp.mean(stats["pos_mean_2"])
        metrics = {
            "loss": loss,
            "lr": lr_schedule(state.step),
            "ema_momentum": m,
            "pos_num_1": pos_num_1,
            "pos_num_2": pos_num_2,
            "pos_mean_1": pos_mean_1,
            "pos_mean_2": pos_mean_2,
            "pos_num": pos_num_1 + pos_num_2,
            "pos_mean": (pos_mean_1 + pos_mean_2) / 2.0,
        }
        if mask_fwd is not None:
            metrics["mask_ratio_fwd"] = jnp.mean(mask_ratio(mask_fwd))
            metrics["mask_ratio_bwd"] = jnp.mean(mask_ratio(mask_bwd))
        elif lazy_mask_metrics is not None:
            metrics["mask_ratio_fwd"] = lazy_mask_metrics[0]
            metrics["mask_ratio_bwd"] = lazy_mask_metrics[1]

        new_state = state.replace(
            step=state.step + 1,
            ema_k=state.ema_k + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    donate_args = (0,) if donate else ()
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_sharded = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(step_fn,
                       in_shardings=(replicated, batch_sharded),
                       out_shardings=(replicated, replicated),
                       donate_argnums=donate_args)
    return jax.jit(step_fn, donate_argnums=donate_args)
