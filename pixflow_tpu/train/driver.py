"""Pretraining driver: config -> loader -> mesh -> compiled step -> epochs.

The TPU-native counterpart of reference `main_pretrain.py:130-412`
(main/main_prog/train): builds the data-parallel mesh, the PixPro model with
cross-replica BN, the LARS/SGD optimizer with linear LR scaling, the jitted
train step, then runs the epoch loop with auto-resume, checkpointing, and
per-step metric logging."""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import PretrainConfig
from ..data import build_pretrain_loader
from ..models import PixPro
from ..parallel import (any_process, make_data_mesh, make_global_batch,
                        replicate_tree, DATA_AXIS)
from ..utils import (AverageMeter, latest_checkpoint, load_checkpoint,
                     save_checkpoint, setup_logger)
from .lars import frozen_momentum_branch_mask, lars_sgd, sgd
from .schedule import make_lr_schedule, scale_lr
from .state import create_train_state
from .train_step import make_train_step


def _verbose_dump(batch, n_frames: int):
    """--verbose: raw per-rank numeric dumps from the flow path, the
    reference's debug-print-for-raft flag (`contrast/option.py:79`,
    `contrast/util.py:95-101`, `contrast/models/PixPro.py:54-57`). The
    reference prints whole tensors with .tolist(); at production sizes that
    is gigabytes per step, so each array prints dtype/shape/min/max/mean
    plus its first 8 raw values — the same per-rank numbers, bounded."""
    rank = jax.process_index()
    for key in ("frames", "flows_fwd", "flows_bwd", "im1", "im2",
                "ims1", "ims2"):
        if key not in batch:
            continue
        a = np.asarray(batch[key])
        # reductions in-place on the original dtype (mean accumulates f64):
        # an .astype(np.float64) copy of e.g. live-flow frames (b=64 x 6 x
        # 720x1280x3 uint8 ~ 1 GB) would allocate ~8.5 GB per rank per step
        head = np.array2string(a.reshape(-1)[:8], precision=4, separator=", ")
        print(f"rank: {rank} {key}: {a.dtype} {tuple(a.shape)} "
              f"min {float(a.min()):.5g} max {float(a.max()):.5g} "
              f"mean {float(a.mean(dtype=np.float64)):.5g} head {head}",
              flush=True)
    for key in ("coord1", "coord2", "coords1", "coords2"):
        if key in batch:
            a = np.asarray(batch[key])
            # the loss-side size prints (`PixPro.py:54-57`): the coord
            # vector's trailing (w, h, W, H) fields are exactly orig/cur size
            print(f"rank: {rank} {key}: {a.dtype} {tuple(a.shape)}",
                  np.round(a.reshape(a.shape[0], -1), 4).tolist(), flush=True)
    print(f"rank: {rank} n_frames: {n_frames}", flush=True)


def _peak_memory_mb():
    """Peak bytes in use on device 0, if the backend exposes memory_stats
    (TPU/GPU do; CPU returns None)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 1e6
    except Exception:
        pass
    return None


def build_model(cfg: PretrainConfig, axis_name: Optional[str]) -> PixPro:
    dtype = jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32
    # multi-span batches F frames per view (B*F images/call), which already
    # saturates the MXU: fused views measure throughput-NEUTRAL there
    # (86.96 vs 86.49 samples/s) at 3.3x the compile time (885 vs 267 s on
    # this 1-core host), so the driver keeps multi-span unfused. Fusing is
    # still supported and semantics-exact (test_multi_span_fused_views_
    # equivalence) — the standard 2-image step is where it pays (+43% at
    # batch 8, +15-18% at 64; docs/PERF.md).
    multi_span = (cfg.flow.use_flow_frames and cfg.flow.use_flow
                  and cfg.data.n_frames > 2)
    return PixPro(
        fuse_views=cfg.model.fuse_views and not multi_span,
        arch=cfg.model.arch,
        pixpro_p=cfg.model.pixpro_p,
        pixpro_clamp_value=cfg.model.pixpro_clamp_value,
        pixpro_transform_layer=cfg.model.pixpro_transform_layer,
        pixpro_pos_ratio=cfg.model.pixpro_pos_ratio,
        pixpro_ins_loss_weight=cfg.model.pixpro_ins_loss_weight,
        proj_out_dim=cfg.model.feature_dim,
        dtype=dtype,
        axis_name=axis_name,
    )


def build_optimizer(cfg: PretrainConfig, lr_schedule, params):
    mask = frozen_momentum_branch_mask(params)
    if cfg.optim.optimizer == "lars":
        return lars_sgd(lr_schedule, momentum=cfg.optim.momentum,
                        weight_decay=cfg.optim.weight_decay,
                        frozen_mask=mask)
    if cfg.optim.optimizer == "sgd":
        return sgd(lr_schedule, momentum=cfg.optim.momentum,
                   weight_decay=cfg.optim.weight_decay, frozen_mask=mask)
    raise NotImplementedError(cfg.optim.optimizer)


def live_flow_micro_batch(flow_bs: Optional[int],
                          n_devices: int) -> Optional[int]:
    """RAFT micro-batch for the on-the-fly flow pass. Unset -> 4 PER
    DEVICE: the standalone corr-volume sweet spot (batch 4 beats 8 by
    1.4x per-pair on v5e, docs/PERF.md), scaled by the mesh because
    raft_fn sees the GLOBAL batch inside the GSPMD step — a fixed chunk
    would idle a pod's chips. Mainly a memory bound in-step (A/B at batch
    16 measured neutral, PERF.md). flow_bs<=0 requests the unchunked
    full-batch pass; the reference's default was 8/GPU
    (`contrast/util.py:136`)."""
    if flow_bs is None:
        return 4 * n_devices
    if flow_bs <= 0:
        return None
    return flow_bs


def _make_raft_fn(cfg: PretrainConfig, n_devices: int = 1):
    """Build the in-step RAFT flow closure for the on-the-fly path.

    Returns (raft_fn, lazy_up). With --flow_up, RAFT-SMALL's full-res
    output is *exactly* `upflow8(flow_low)` (reference
    `contrast/flow/raft.py:152-160` — no convex upsampling head), which is
    precisely the U(f) identity the lazy point-domain engine implements
    (ops/flow_points.py): the small model therefore emits the COARSE stack
    (up=False) and the train step's LazyFlowUp path composes/masks it
    without ever materializing 720x1280 fields — same numbers, out of the
    gather-bound regime (docs/PERF.md). Only the basic model's convex
    upsampling genuinely needs RAFT's own full-res output
    (`calc_optical_flow(up=True)`, `util.py:83-91`); there the composition
    runs on the materialized fields and must not upsample again."""
    from ..models.raft import load_raft, raft_batch_flows
    raft, variables = load_raft(
        cfg.flow.flow_model, small=cfg.flow.small,
        dtype=getattr(jnp, cfg.flow.raft_dtype),
        corr_dtype=None if cfg.flow.raft_corr_dtype == "follow"
        else getattr(jnp, cfg.flow.raft_corr_dtype))

    micro = live_flow_micro_batch(cfg.flow.flow_bs, n_devices)
    lazy_up = (cfg.flow.flow_up and cfg.flow.flow_up_lazy and cfg.flow.small)

    def raft_fn(frames):  # [B, n, H, W, 3] uint8
        return raft_batch_flows(raft, variables, frames,
                                iters=cfg.flow.raft_iters,
                                up=cfg.flow.flow_up and not lazy_up,
                                micro_batch=micro)
    return raft_fn, lazy_up


def train(cfg: PretrainConfig):
    # preemption-safe checkpointing: TPU VMs get preempted with a SIGTERM
    # grace window; finish the in-flight step, save, and exit cleanly so
    # --auto-resume continues. Installed first thing so a TERM during the
    # (minutes-long) first compile is also handled. (The reference has no
    # equivalent — a killed run loses the whole epoch.)
    import signal
    import threading
    stop_requested = threading.Event()
    prev_handler = None
    try:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda *_: stop_requested.set())
    except ValueError:
        pass  # not the main thread (e.g. driven from a test harness)

    logger = setup_logger(cfg.runtime.output_dir, jax.process_index())
    if jax.process_index() == 0:
        os.makedirs(cfg.runtime.output_dir, exist_ok=True)
        with open(os.path.join(cfg.runtime.output_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())
        logger.info("config:\n%s", cfg.to_json())

    mesh = make_data_mesh(cfg.runtime.mesh_shape)
    n_devices = mesh.devices.size
    if n_devices == 1:
        # single chip: skip sharding annotations entirely (plain jit); the
        # experimental axon platform executes annotated programs through a
        # slow fallback, and with one device they are semantically identical.
        mesh = None
    global_batch = cfg.data.batch_size * n_devices
    logger.info("mesh: %d devices, global batch %d", n_devices, global_batch)

    loader = build_pretrain_loader(
        cfg, global_batch_size=global_batch,
        num_hosts=jax.process_count(), host_id=jax.process_index())
    # restart-transcode rides the native ROI decoder (datasets.py requires
    # both); without it the flag would silently do nothing while still
    # triggering whole-corpus byte caching below — surface that.
    restart_transcode = (getattr(cfg.data, "restart_transcode", False)
                         and getattr(cfg.data, "native_decode", False))
    if getattr(cfg.data, "restart_transcode", False) and not restart_transcode:
        logger.warning("--restart-transcode requires --native-decode; "
                       "ignoring it (no in-memory transcode, no byte cache)")
    # byte cache: zip mode (reference semantics) — or any corpus when the
    # restart-transcode fast decode path needs cached bytes to rewrite
    if cfg.data.cache_mode != "no" and (cfg.data.zip_mode or restart_transcode):
        loader.dataset.init_cache(cfg.data.cache_mode, jax.process_index(),
                                  jax.process_count())
    steps_per_epoch = len(loader)
    num_instances = len(loader.dataset)
    logger.info("dataset: %d instances, %d steps/epoch",
                num_instances, steps_per_epoch)

    lr_peak = scale_lr(cfg.optim.base_lr, global_batch)
    lr_schedule = make_lr_schedule(
        cfg.optim.lr_scheduler, lr_peak, cfg.optim.epochs,
        cfg.optim.warmup_epoch, steps_per_epoch,
        cfg.optim.warmup_multiplier, cfg.optim.lr_decay_epochs,
        cfg.optim.lr_decay_rate)

    # GSPMD data parallelism: the model stays axis-free; BN statistics and
    # gradients become global through the sharded batch dimension.
    model = build_model(cfg, axis_name=None)
    init_model = model

    # EMA ramp: K = total per-replica steps = steps_per_epoch * epochs
    # (reference PixPro.py:294-295); counter k resumes from the checkpoint.
    ema_total = max(steps_per_epoch * cfg.optim.epochs, 1)
    ema_k0 = steps_per_epoch * (cfg.optim.start_epoch - 1)

    rng = jax.random.PRNGKey(cfg.runtime.seed)
    sample_im = jnp.zeros((2, cfg.data.image_size, cfg.data.image_size, 3),
                          jnp.float32)
    dummy_tx = sgd(lr_schedule)
    state = create_train_state(rng, init_model, dummy_tx,
                               {"im1": sample_im}, ema_k0=ema_k0)
    tx = build_optimizer(cfg, lr_schedule, state.params)
    state = state.replace(opt_state=tx.init(state.params))

    # warm start from published weights (reference load_pretrained,
    # `main_pretrain.py:86-93`): model params/stats only, optimizer fresh
    if cfg.runtime.pretrained_model:
        from ..utils.checkpoint import load_published
        pub = load_published(cfg.runtime.pretrained_model)
        params = dict(state.params)
        stats = dict(state.batch_stats)
        for k, v in pub["params"].items():
            if k in params:
                params[k] = jax.tree.map(jnp.asarray, v)
        for k, v in pub.get("batch_stats", {}).items():
            if k in stats:
                stats[k] = jax.tree.map(jnp.asarray, v)
        state = state.replace(params=params, batch_stats=stats)
        logger.info("loaded pretrained model %s (epoch %s)",
                    cfg.runtime.pretrained_model, pub.get("epoch"))

    ckpt_backend = getattr(cfg.runtime, "checkpoint_backend", "msgpack")

    def _save_ckpt(epoch_, state_, extra_=None):
        """Checkpoint save. COLLECTIVE for the orbax backend: every process
        must call CheckpointManager.save() (orbax elects the primary writer
        and each process writes its addressable shards) — gating it on rank
        0 deadlocks the pod on the first save. msgpack stays rank-0-only
        (single-writer whole-tree file, reference `main_pretrain.py:114-127`
        torch.save-on-rank-0 semantics)."""
        if ckpt_backend == "orbax":
            from ..utils.checkpoint_orbax import save_checkpoint_orbax
            return save_checkpoint_orbax(cfg.runtime.output_dir, epoch_,
                                         state_, cfg.to_json(), extra=extra_)
        if jax.process_index() != 0:
            return None
        return save_checkpoint(cfg.runtime.output_dir, epoch_, state_,
                               cfg.to_json(), extra=extra_)

    start_epoch = cfg.optim.start_epoch
    resume_skip, resume_skip_epoch = 0, -1
    resume_path = cfg.runtime.resume
    ckpt_extra = {}
    if ckpt_backend == "orbax":
        from ..utils.checkpoint_orbax import (ORBAX_DIR,
                                              latest_checkpoint_orbax,
                                              load_checkpoint_orbax)
        if resume_path and os.path.isdir(resume_path):
            # explicit resume from an orbax path: the output dir holding
            # <dir>/orbax/, the orbax/ dir itself, or a specific step dir
            # <dir>/orbax/<step> (the exact path the driver logs at save)
            p = os.path.abspath(os.path.normpath(resume_path))
            base, parent = os.path.basename(p), os.path.dirname(p)
            step_num = None
            if base.isdigit() and os.path.basename(parent) == ORBAX_DIR:
                run_dir, step_num = os.path.dirname(parent), int(base)
            elif base == ORBAX_DIR:
                run_dir = parent
            else:
                run_dir = p
            state, ckpt_epoch, ckpt_extra = load_checkpoint_orbax(
                run_dir, state, step=step_num, mesh=mesh)
            start_epoch = ckpt_epoch + 1
            logger.info("resumed from orbax %s (epoch %d)", p, ckpt_epoch)
        elif resume_path:
            # explicit msgpack file under the orbax backend: cross-backend
            # migration (load old-format, save new-format from here on)
            state, ckpt_epoch, ckpt_extra = load_checkpoint(resume_path,
                                                            state)
            start_epoch = ckpt_epoch + 1
            logger.info("resumed msgpack %s under orbax backend (epoch %d)",
                        resume_path, ckpt_epoch)
        elif cfg.runtime.auto_resume:
            step = latest_checkpoint_orbax(cfg.runtime.output_dir)
            if step is not None:
                state, ckpt_epoch, ckpt_extra = load_checkpoint_orbax(
                    cfg.runtime.output_dir, state, mesh=mesh)
                start_epoch = ckpt_epoch + 1
                logger.info("resumed from orbax step %d (epoch %d)",
                            step, ckpt_epoch)
            else:
                # no orbax history: fall back to msgpack checkpoints so a
                # backend switch never silently restarts a finished run
                prev = latest_checkpoint(cfg.runtime.output_dir)
                if prev:
                    state, ckpt_epoch, ckpt_extra = load_checkpoint(prev,
                                                                    state)
                    start_epoch = ckpt_epoch + 1
                    logger.info("resumed msgpack %s under orbax backend "
                                "(epoch %d)", prev, ckpt_epoch)
    else:
        if cfg.runtime.auto_resume and not resume_path:
            resume_path = latest_checkpoint(cfg.runtime.output_dir) or ""
        if resume_path:
            state, ckpt_epoch, ckpt_extra = load_checkpoint(resume_path, state)
            start_epoch = ckpt_epoch + 1
            logger.info("resumed from %s (epoch %d, step %d)",
                        resume_path, ckpt_epoch, int(state.step))
    if ckpt_extra.get("resume_idx"):
        # step-exact preemption resume: re-enter the interrupted epoch and
        # fast-forward its deterministic stream past the completed batches
        start_epoch = int(ckpt_extra["resume_epoch"])
        resume_skip = int(ckpt_extra["resume_idx"])
        resume_skip_epoch = start_epoch
        logger.info("step-exact resume: epoch %d from batch %d",
                    start_epoch, resume_skip)

    if mesh is not None:
        # materialize the TrainState as fully replicated global arrays on
        # the mesh. On multi-process runs host-local values cannot feed a
        # mesh that spans non-addressable devices (init is same-seed
        # deterministic and checkpoints live on the job's shared
        # filesystem, so every process holds the identical host value);
        # single-process this is the device_put the jit would have done.
        state = replicate_tree(state, mesh)

    use_flow = cfg.flow.use_flow
    raft_fn, raft_lazy_up = None, False
    if use_flow and not cfg.flow.use_flow_file:
        raft_fn, raft_lazy_up = _make_raft_fn(cfg, n_devices)

    step_kwargs = dict(
        lr_schedule=lr_schedule,
        ema_total_steps=ema_total,
        ema_base_momentum=cfg.model.pixpro_momentum,
        mesh=mesh, use_flow=use_flow,
        # live RAFT-basic already emits full-res flows under --flow_up;
        # live RAFT-small emits the coarse stack and rides the same lazy
        # flow_up path as file flows (_make_raft_fn)
        flow_up=cfg.flow.flow_up and (raft_fn is None or raft_lazy_up),
        flow_up_lazy=cfg.flow.flow_up_lazy,
        flow_cat_norm=cfg.flow.flow_cat_norm,
        use_flow_frames=cfg.flow.use_flow_frames and use_flow
        and cfg.data.n_frames > 2,
        alpha1=cfg.flow.alpha1, alpha2=cfg.flow.alpha2,
        raft_fn=raft_fn,
        device_aug=getattr(cfg.data, "device_aug", False))
    step_fn = make_train_step(model, tx, **step_kwargs)
    # the in-step strided mask telemetry costs ~12% of the whole step on
    # the lazy flow_up path (763 -> 875 img/s measured); un-logged steps
    # therefore run a telemetry-free compilation of the same program
    step_fn_fast = step_fn
    if (use_flow and cfg.flow.flow_up and cfg.flow.flow_up_lazy
            and (raft_fn is None or raft_lazy_up)
            and cfg.runtime.print_freq > 1
            and cfg.flow.alpha1 is not None
            and cfg.flow.alpha2 is not None):
        step_fn_fast = make_train_step(model, tx, flow_telemetry=False,
                                       **step_kwargs)

    # reference-exact full-field mask ratio (`util.py:360-366`) for the
    # logged batch only — the per-step metric is the strided exact-sample
    # estimate (see configs.RuntimeConfig.mask_ratio_exact)
    exact_mask_fn = None
    if (cfg.runtime.mask_ratio_exact and use_flow
            and cfg.flow.alpha1 is not None and cfg.flow.alpha2 is not None):
        from ..ops.flow import compose_and_mask, mask_ratio

        @jax.jit
        def exact_mask_fn(ff, fb):
            _, _, mf, mb = compose_and_mask(
                ff.astype(jnp.float32), fb.astype(jnp.float32),
                flow_up=cfg.flow.flow_up,
                use_flow_frames=cfg.flow.use_flow_frames,
                alpha_1=cfg.flow.alpha1, alpha_2=cfg.flow.alpha2,
                is_norm=cfg.flow.flow_cat_norm)
            return jnp.mean(mask_ratio(mf)), jnp.mean(mask_ratio(mb))

    batch_sharding = (NamedSharding(mesh, P(DATA_AXIS))
                      if mesh is not None else jax.devices()[0])
    max_epoch = cfg.optim.epochs
    if cfg.runtime.debug_epochs:
        max_epoch = min(max_epoch, start_epoch + cfg.runtime.debug_epochs - 1)

    metrics_writer = None
    if jax.process_index() == 0:
        from ..utils.metrics_writer import MetricsWriter
        from ..utils.logger import init_wandb
        metrics_writer = MetricsWriter(cfg.runtime.output_dir,
                                       use_tensorboard=cfg.runtime.tensorboard,
                                       wandb_run=init_wandb(cfg))

    profiling = False
    loss_meter, time_meter = AverageMeter(), AverageMeter()
    # host-side mirror of state.step: fetching the device scalar every
    # iteration would force a device sync per step (costly via tunnels)
    global_step = int(state.step)

    # preemption polling: single-process reads the local flag every step
    # (free); multi-process runs vote by allgather only every
    # preempt_vote_steps batches — ALL ranks at the SAME indices (a rank
    # short-circuiting on its local flag would desynchronize the
    # collective) — plus once at end-of-epoch, bounding both the per-step
    # sync cost and the response latency.
    vote_every = max(1, int(getattr(cfg.runtime, "preempt_vote_steps", 16)))
    multi_process = jax.process_count() > 1

    def poll_preempt(idx):
        if not multi_process:
            return stop_requested.is_set()
        if idx % vote_every:
            return False
        return any_process(stop_requested.is_set())
    try:
      for epoch in range(start_epoch, max_epoch + 1):
        t_end = time.time()
        skip = resume_skip if epoch == resume_skip_epoch else 0
        preempt_idx = None
        preempted = False
        for idx, batch in enumerate(loader.epoch(epoch, skip_batches=skip),
                                    start=skip):
            # preemption is a GLOBAL decision (a lone rank stopping early
            # would strand the others in the next step's collectives);
            # see poll_preempt above for the vote cadence
            if poll_preempt(idx):
                preempted = True
                preempt_idx = idx  # this batch has NOT been stepped
                break
            if cfg.flow.use_flow_frames and cfg.flow.use_flow:
                n_eff = batch.get("n_frames_eff")
            else:
                n_eff = batch.pop("n_frames_eff", None)
            batch.pop("index", None)
            batch.pop("target", None)
            if cfg.runtime.verbose and use_flow:
                # reference cadence: every step on the flow path
                _verbose_dump(batch, cfg.data.n_frames)
            # multi-process: assemble each host's local rows into the
            # global batch array (make_array_from_process_local_data);
            # single-process: plain device_put
            device_batch = make_global_batch(batch, batch_sharding)

            # optional jax profiler window over steps 10..15
            if cfg.runtime.profile_dir and global_step == 10 and not profiling:
                jax.profiler.start_trace(cfg.runtime.profile_dir)
                profiling = True
            logged_step = (idx % cfg.runtime.print_freq == 0
                           or idx == steps_per_epoch - 1)
            fn = step_fn if logged_step else step_fn_fast
            state, metrics = fn(state, device_batch)
            global_step += 1
            if profiling and global_step >= 15:
                jax.profiler.stop_trace()
                profiling = False
                logger.info("profiler trace written to %s",
                            cfg.runtime.profile_dir)

            if logged_step:
                metrics = {k: float(v) for k, v in metrics.items()}
                loss_meter.update(metrics["loss"], global_batch)
                time_meter.update(time.time() - t_end)
                extra = ""
                if "mask_ratio_fwd" in metrics:
                    extra = (f" mask_r {metrics['mask_ratio_fwd']:.3f}/"
                             f"{metrics['mask_ratio_bwd']:.3f}")
                if exact_mask_fn is not None and "flows_fwd" in batch:
                    r_f, r_b = exact_mask_fn(device_batch["flows_fwd"],
                                             device_batch["flows_bwd"])
                    metrics["mask_ratio_exact_fwd"] = float(r_f)
                    metrics["mask_ratio_exact_bwd"] = float(r_b)
                    extra += (f" mask_r_exact {metrics['mask_ratio_exact_fwd']:.3f}/"
                              f"{metrics['mask_ratio_exact_bwd']:.3f}")
                if n_eff is not None:
                    from ..data.datasets import frame_stats
                    mean_f, no_flow_r, _ = frame_stats(n_eff, cfg.data.n_frames)
                    extra += f" frames {mean_f:.2f} (no-flow {no_flow_r:.1%})"
                # peak device memory, the reference's max_memory_allocated
                # log field (`main_pretrain.py:290-292`)
                mem_mb = _peak_memory_mb()
                if mem_mb is not None:
                    extra += f" mem {mem_mb:.0f}MB"
                logger.info(
                    "Train: [%d/%d][%d/%d] time %.3f lr %.4f "
                    "loss %.4f (%.4f) [+4: %.4f] pos_num %.4g pos_mean %.3f%s",
                    epoch, cfg.optim.epochs, idx, steps_per_epoch,
                    time_meter.val, metrics["lr"], metrics["loss"],
                    loss_meter.avg, metrics["loss"] + 4.0,
                    metrics["pos_num"], metrics["pos_mean"], extra)
                if metrics_writer is not None:
                    scalars = dict(metrics)
                    scalars["loss_plus4"] = metrics["loss"] + 4.0
                    scalars["epoch"] = epoch
                    if mem_mb is not None:
                        scalars["peak_memory_mb"] = mem_mb
                    if n_eff is not None:
                        scalars["mean_n_frames"] = mean_f
                        scalars["no_optical_flow_ratio"] = no_flow_r
                    metrics_writer.write(global_step, scalars)
                if cfg.runtime.debug and jax.process_index() == 0:
                    from ..utils.visualize import save_debug_bundle
                    dbg = os.path.join(cfg.runtime.output_dir, "test_imgs")
                    flow_dbg = mask_dbg = None
                    if use_flow and "flows_fwd" in batch:
                        from ..ops.flow import compose_and_mask
                        flow_dbg, _, mask_dbg, _ = compose_and_mask(
                            np.asarray(batch["flows_fwd"][:2], np.float32),
                            np.asarray(batch["flows_bwd"][:2], np.float32),
                            flow_up=cfg.flow.flow_up, use_flow_frames=False,
                            alpha_1=cfg.flow.alpha1, alpha_2=cfg.flow.alpha2,
                            is_norm=cfg.flow.flow_cat_norm)
                    save_debug_bundle(dbg, global_step, batch, flow_dbg,
                                      mask_dbg)
            t_end = time.time()

        if not preempted:
            # TERM that landed after the epoch's last batch: still a global
            # vote, so every rank takes the same branch below
            preempted = any_process(stop_requested.is_set())
        if preempted:
            # step-exact preemption: record (epoch, next batch) so resume
            # fast-forwards the deterministic loader stream — no redone
            # steps, no skipped data, step counter exact. _save_ckpt is
            # collective under orbax: all ranks call it.
            # `is not None` in BOTH predicates: preempt_idx == 0 (TERM
            # caught before the epoch's first batch) must record resume
            # info the same way as any other interrupted index
            extra = ({"resume_epoch": epoch, "resume_idx": preempt_idx}
                     if preempt_idx is not None else None)
            # TERM after the epoch's last batch: the epoch IS complete
            done = epoch if preempt_idx is None else epoch - 1
            path = _save_ckpt(max(done, start_epoch - 1), state, extra)
            if jax.process_index() == 0:
                logger.info("SIGTERM: saved preemption checkpoint %s at "
                            "step %d (resume %s); exiting cleanly",
                            path, int(state.step),
                            f"epoch {epoch} batch {preempt_idx}"
                            if preempt_idx is not None else f"epoch {epoch}")
            break

        if epoch % cfg.runtime.save_freq == 0 or epoch == max_epoch:
            path = _save_ckpt(epoch, state)
            if path is not None and jax.process_index() == 0:
                logger.info("saved checkpoint %s", path)
    finally:
        if prev_handler is not None:
            try:
                signal.signal(signal.SIGTERM, prev_handler)
            except ValueError:
                pass

    if metrics_writer is not None:
        if not cfg.runtime.debug:
            metrics_writer.save_artifacts(cfg.runtime.output_dir)
        metrics_writer.close()
    return state
