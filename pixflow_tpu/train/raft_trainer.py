"""RAFT fine-tuning on TPU: gamma-weighted sequence loss, AdamW + one-cycle
LR, gradient clipping, GSPMD data parallelism.

The reference ships RAFT's network + datasets (`contrast/flow/`) but trained
its flow checkpoints out-of-tree with the original RAFT recipe (see
dataset_prepare/raft_bdd100k). This module closes that gap TPU-natively so
the frozen flow oracle used by pretraining can itself be (re)trained here:
one jitted step containing the full 12-iteration unrolled GRU refinement,
the loss over every iteration's full-res prediction, and the optimizer —
the standard RAFT training scheme (sequence loss with gamma=0.8, AdamW with
weight decay 1e-4/1e-5, one-cycle schedule, clip-norm 1.0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS

MAX_FLOW = 400.0  # exclude extreme-motion pixels from the loss (RAFT)


def sequence_loss(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray,
                  valid: jnp.ndarray, gamma: float = 0.8,
                  max_flow: float = MAX_FLOW):
    """Gamma-weighted L1 over every refinement iteration's prediction.

    flow_preds: [N, B, H, W, 2]; flow_gt: [B, H, W, 2]; valid: [B, H, W]
    (1 = supervised pixel). Weight of iteration i is gamma^(N-1-i), so later
    iterations dominate. Pixels with ||gt|| >= max_flow are excluded.
    Returns (loss, metrics) with the standard EPE/1px/3px/5px metrics of the
    final prediction.
    """
    n = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)          # [B, H, W]
    vw = valid.astype(jnp.float32)[None, ..., None]     # [1, B, H, W, 1]

    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.abs(flow_preds - flow_gt[None])            # [N, B, H, W, 2]
    # RAFT's (valid[:, None] * i_loss).mean(): masked L1 averaged over ALL
    # elements (invalid pixels contribute zeros to the mean)
    per_iter = jnp.mean(l1 * vw, axis=(1, 2, 3, 4))
    loss = jnp.sum(weights * per_iter)

    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    epe_v = jnp.where(valid, epe, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    metrics = {
        "epe": jnp.sum(epe_v) / n_valid,
        "1px": jnp.sum((epe_v < 1.0) & valid) / n_valid,
        "3px": jnp.sum((epe_v < 3.0) & valid) / n_valid,
        "5px": jnp.sum((epe_v < 5.0) & valid) / n_valid,
    }
    return loss, metrics


def raft_optimizer(lr_peak: float, total_steps: int, weight_decay: float,
                   clip_norm: float = 1.0, pct_start: float = 0.05,
                   eps: float = 1e-8):
    """AdamW + linear-warmup one-cycle decay + global-norm clipping (the
    original fetch_optimizer: OneCycleLR with anneal_strategy='linear')."""
    warmup = max(int(total_steps * pct_start), 1)
    schedule = optax.join_schedules([
        optax.linear_schedule(lr_peak / 25.0, lr_peak, warmup),
        optax.linear_schedule(lr_peak, lr_peak / 1e4,
                              max(total_steps - warmup, 1)),
    ], [warmup])
    return schedule, optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=eps,
                    weight_decay=weight_decay),
    )


def make_raft_train_step(model, tx, *, iters: int = 12, gamma: float = 0.8,
                         mesh=None, donate: bool = True):
    """Jitted (and, with a mesh, GSPMD-sharded) RAFT train step.

    batch: img1/img2 [B, H, W, 3] float (0..255), flow [B, H, W, 2],
    valid [B, H, W]. state: (params, opt_state, step).
    """

    def step_fn(state, batch):
        params, opt_state, step = state

        def loss_fn(p):
            _, preds = model.apply({"params": p}, batch["img1"],
                                   batch["img2"], iters=iters,
                                   all_iters=True)
            return sequence_loss(preds, batch["flow"], batch["valid"], gamma)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return (new_params, new_opt, step + 1), metrics

    donate_args = (0,) if donate else ()
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        shd = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(step_fn, in_shardings=(rep, shd),
                       out_shardings=(rep, rep), donate_argnums=donate_args)
    return jax.jit(step_fn, donate_argnums=donate_args)
