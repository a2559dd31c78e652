"""Linear-probe driver (reference `main_linear.py:110-295`): frozen backbone
+ fc, per-epoch train/validate with globally-reduced metrics, best-acc
checkpointing."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import LinearConfig
from ..data import ShardedLoader, VideoFrameDataset, get_transform, list_image_folder
from ..parallel import (host_sum, make_data_mesh, make_global_batch,
                        replicate_tree, DATA_AXIS)
from ..train.schedule import make_lr_schedule
from ..utils import (AverageMeter, latest_checkpoint, load_checkpoint,
                     save_checkpoint, setup_logger)
from ..utils.checkpoint import load_published
from .linear import (build_linear_state, linear_optimizer,
                     load_pretrained_encoder, make_linear_eval_step,
                     make_linear_train_step)


def _loader(cfg: LinearConfig, prefix: str, aug: str, batch: int):
    samples = list_image_folder(os.path.join(cfg.data.data_dir, prefix),
                                dataset=cfg.data.dataset)
    transform = get_transform(aug, cfg.data.crop, cfg.data.image_size,
                              cfg.data.crop_ratio)
    ds = VideoFrameDataset(samples=samples, transform=transform,
                           n_frames=1, two_crop=False,
                           video_mode=cfg.data.dataset == "bdd100k")
    return ShardedLoader(ds, batch, num_hosts=jax.process_count(),
                         host_id=jax.process_index(),
                         shuffle=prefix == "train",
                         num_threads=max(cfg.data.num_workers, 1),
                         seed=cfg.runtime.seed)


def evaluate(state, eval_step, loader, to_device):
    """Validation pass with cross-process metric reduction (the reference
    all-reduces acc1/acc5/loss across ranks, `main_linear.py:248-250`):
    every process sums its local sample-weighted metrics, then the totals
    are summed over processes so the returned numbers are global."""
    sums = {"loss": 0.0, "acc1": 0.0, "acc5": 0.0}
    n = 0
    for batch in loader.epoch(0):
        batch = {"image": batch["im1"], "label": batch["target"]}
        m = eval_step(state, to_device(batch))
        bs = batch["image"].shape[0]
        for k in sums:
            sums[k] += float(m[k]) * bs
        n += bs
    totals = host_sum({**sums, "n": float(n)})
    n_total = max(totals.pop("n"), 1.0)
    return {k: v / n_total for k, v in totals.items()}


def linear_eval(cfg: LinearConfig, pretrained_path: str,
                pretrained_branch: str = "online"):
    logger = setup_logger(cfg.runtime.output_dir, jax.process_index(),
                          name="pixflow-linear")
    mesh_obj = make_data_mesh(cfg.runtime.mesh_shape)
    n_devices = mesh_obj.devices.size
    mesh = mesh_obj if n_devices > 1 else None

    train_loader = _loader(cfg, "train", cfg.data.aug, cfg.total_batch_size)
    val_loader = _loader(cfg, "val", "val", cfg.total_batch_size)
    steps_per_epoch = len(train_loader)

    lr_schedule = make_lr_schedule(
        cfg.optim.lr_scheduler, cfg.optim.base_lr, cfg.optim.epochs,
        cfg.optim.warmup_epoch, steps_per_epoch, cfg.optim.warmup_multiplier,
        cfg.optim.lr_decay_epochs, cfg.optim.lr_decay_rate)

    rng = jax.random.PRNGKey(cfg.runtime.seed)
    dtype = (jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16"
             else jnp.float32)
    tx0 = linear_optimizer(lr_schedule, cfg.optim.momentum,
                           cfg.optim.weight_decay)
    model, state = build_linear_state(rng, cfg.model.arch, cfg.num_classes,
                                      cfg.data.image_size, tx0, dtype)
    tx = linear_optimizer(lr_schedule, cfg.optim.momentum,
                          cfg.optim.weight_decay, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))

    # graft the pretrained encoder
    pub = load_published(pretrained_path)
    from ..utils.checkpoint import select_branch
    pp, ps = select_branch(pub["params"], pub.get("batch_stats") or {},
                           pretrained_branch)
    state = load_pretrained_encoder(state, pp, ps)
    logger.info("loaded pretrained %s encoder from %s (epoch %s)",
                pretrained_branch, pretrained_path, pub.get("epoch"))

    # resume the probe itself (reference main_linear.py:78-107)
    start_epoch, best_acc1 = cfg.optim.start_epoch, 0.0
    resume_path = cfg.runtime.resume
    if cfg.runtime.auto_resume and not resume_path:
        resume_path = latest_checkpoint(cfg.runtime.output_dir) or ""
    if resume_path:
        state, ckpt_epoch, extra = load_checkpoint(resume_path, state)
        start_epoch = ckpt_epoch + 1
        best_acc1 = float(extra.get("best_acc1", 0.0))
        logger.info("resumed linear probe from %s (epoch %d, best %.2f)",
                    resume_path, ckpt_epoch, best_acc1)

    if mesh is not None:
        # replicated global arrays on the mesh (required once the mesh
        # spans processes; a no-op device_put single-process)
        state = replicate_tree(state, mesh)

    def collate(batch):
        return {"image": batch["im1"], "label": batch["target"]}

    # mesh-aware transfer: shard the batch over the data axis (and on
    # multi-process runs assemble each host's rows into the global array);
    # without a mesh, a plain single-device put
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

        def to_device(b):
            return make_global_batch(b, batch_sharding)
    else:
        def to_device(b):
            return jax.device_put(b)

    train_step = make_linear_train_step(model, tx, lr_schedule, mesh)
    eval_step = make_linear_eval_step(model, mesh)

    if cfg.eval_only:
        res = evaluate(state, eval_step, val_loader, to_device)
        logger.info("eval: %s", res)
        return res

    for epoch in range(start_epoch, cfg.optim.epochs + 1):
        meter = AverageMeter()
        for idx, batch in enumerate(train_loader.epoch(epoch)):
            state, m = train_step(state, to_device(collate(batch)))
            if idx % cfg.runtime.print_freq == 0:
                meter.update(float(m["loss"]))
                logger.info("Linear: [%d/%d][%d/%d] lr %.4f loss %.4f acc1 %.2f",
                            epoch, cfg.optim.epochs, idx, steps_per_epoch,
                            float(m["lr"]), float(m["loss"]), float(m["acc1"]))
        res = evaluate(state, eval_step,
                       _loader(cfg, "val", "val", cfg.total_batch_size),
                       to_device)
        best_acc1 = max(best_acc1, res["acc1"])
        logger.info("epoch %d: val %s (best acc1 %.2f)", epoch, res, best_acc1)
        if jax.process_index() == 0 and epoch % cfg.runtime.save_freq == 0:
            save_checkpoint(cfg.runtime.output_dir, epoch, state,
                            cfg.to_json(), extra={"best_acc1": best_acc1})
    return {"best_acc1": best_acc1}
