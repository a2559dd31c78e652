#!/usr/bin/env python
"""1k-step EMA drift study: bf16 compute vs f32 compute, identical run.

The 200-step loss-curve window (tools/compare_loss_curve.py) adjudicates
the instantaneous loss gap of bf16 compute, but the EMA momentum branch is
a long-horizon integrator (cosine-ramped m -> 1.0, reference
`PixPro.py:294-295,321-327`): a per-step rounding bias could accumulate
where a 200-step window hides it. This tool runs OUR train step twice from
IDENTICAL init on IDENTICAL batches — once with `PixPro(dtype=float32)`,
once with `dtype=bfloat16` (params/EMA/optimizer state stay f32 in both;
only layer compute differs) — for DRIFT_STEPS steps and reports, every
DRIFT_EVERY steps:

  - global L2 norm of the EMA (momentum-encoder) params, both arms
  - relative L2 distance between the arms' EMA trees
  - relative L2 distance between the arms' ONLINE trees (for attribution:
    if online distance ~= EMA distance, the drift is the optimizer
    trajectory diverging, not EMA accumulation error)
  - the loss gap at that step

f32-vs-torch parity is already oracle-pinned (tests/test_reference_parity
5-step trajectories + the 200-step curve artifacts), so jax-f32 is a valid
stand-in for the reference here, and jax-vs-jax isolates the dtype effect
exactly (same batches, same rng, same everything).

Env: DRIFT_STEPS (1000), DRIFT_EVERY (100), DRIFT_BATCH (2), DRIFT_HW (64),
DRIFT_FLOW (1), DRIFT_SEED (0). Writes JSONL to stdout.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(os.environ.get("DRIFT_STEPS", "1000"))
    every = int(os.environ.get("DRIFT_EVERY", "100"))
    b = int(os.environ.get("DRIFT_BATCH", "2"))
    hw = int(os.environ.get("DRIFT_HW", "64"))
    with_flow = os.environ.get("DRIFT_FLOW", "1") == "1"
    seed = int(os.environ.get("DRIFT_SEED", "0"))

    import jax
    # default to CPU: this is a long sequential host-driven loop with
    # donate=False (two arms share the batch), and non-donated state
    # re-uploads through the axon tunnel (~20 s/step — CLAUDE.md). Set
    # DRIFT_PLATFORM=tpu only on a locally-attached chip.
    jax.config.update("jax_platforms",
                      os.environ.get("DRIFT_PLATFORM", "cpu"))
    import jax.numpy as jnp
    import numpy as np

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.pixpro import EMA_PAIRS
    from pixflow_tpu.train import (TrainState, create_train_state,
                                   frozen_momentum_branch_mask, lars_sgd,
                                   make_lr_schedule, make_train_step)

    LR, WD, MOM = 0.4, 1e-5, 0.9
    EPOCHS, WARMUP = 10, 1
    spe = max(steps, 10)
    lr_sched = make_lr_schedule("cosine", LR, EPOCHS, WARMUP, spe)

    rng = np.random.default_rng(seed)

    def coords(bn):
        out = np.zeros((bn, 10), np.float32)
        for i in range(bn):
            j, ii = int(rng.integers(0, 600)), int(rng.integers(0, 300))
            w_, h_ = int(rng.integers(150, 600)), int(rng.integers(150, 400))
            out[i] = [j / 1279, ii / 719, (j + w_ - 1) / 1279,
                      (ii + h_ - 1) / 719, j, ii, w_, h_, 1280, 720]
        return out

    def smooth_flows(bn):
        fh, fw = 90, 160
        ys = np.linspace(-1, 1, fh, dtype=np.float32)[None, :, None]
        xs = np.linspace(-1, 1, fw, dtype=np.float32)[None, None, :]
        t = rng.uniform(-3, 3, (bn, 2, 1, 1)).astype(np.float32)
        gx = rng.uniform(-1.5, 1.5, (bn, 2, 1, 1)).astype(np.float32)
        gy = rng.uniform(-1.5, 1.5, (bn, 2, 1, 1)).astype(np.float32)
        base = (t + gx * xs + gy * ys)[:, None]
        fwd = base + 0.2 * rng.standard_normal(
            (bn, 1, 2, fh, fw)).astype(np.float32)
        bwd = -base + 0.2 * rng.standard_normal(
            (bn, 1, 2, fh, fw)).astype(np.float32)
        return (jnp.asarray(fwd.transpose(0, 1, 3, 4, 2)),
                jnp.asarray(bwd.transpose(0, 1, 3, 4, 2)))

    def make_batch():
        bt = {"im1": jnp.asarray(rng.standard_normal(
                  (b, hw, hw, 3)).astype(np.float32)),
              "im2": jnp.asarray(rng.standard_normal(
                  (b, hw, hw, 3)).astype(np.float32)),
              "coord1": jnp.asarray(coords(b)),
              "coord2": jnp.asarray(coords(b))}
        if with_flow:
            bt["flows_fwd"], bt["flows_bwd"] = smooth_flows(b)
        return bt

    def build_arm(dtype, variables):
        model = PixPro(arch="resnet50", pixpro_p=2.0,
                       pixpro_transform_layer=1, pixpro_pos_ratio=0.7,
                       dtype=dtype)
        tx = lars_sgd(lr_sched, momentum=MOM, weight_decay=WD,
                      frozen_mask=frozen_momentum_branch_mask(
                          variables["params"]))
        state = TrainState(
            step=jnp.zeros([], jnp.int32), ema_k=jnp.zeros([], jnp.int32),
            params=jax.tree.map(jnp.copy, variables["params"]),
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(variables["params"]))
        step = make_train_step(
            model, tx, lr_schedule=lr_sched, ema_total_steps=1280,
            ema_base_momentum=0.99, use_flow=with_flow, flow_up=with_flow,
            alpha1=0.01 if with_flow else None,
            alpha2=0.5 if with_flow else None, donate=False)
        return state, step

    ema_names = {k for _, k in EMA_PAIRS}

    def _f64(x):
        # numpy f64 accumulation: jax x64 is disabled, and f32 sums over
        # 25M-param trees would eat the 1e-4-scale signal we measure
        return np.asarray(x, np.float64)

    def split_norms(params):
        ema_sq = online_sq = 0.0
        for name, sub in params.items():
            s = float(sum(np.sum(np.square(_f64(x)))
                          for x in jax.tree.leaves(sub)))
            if name in ema_names:
                ema_sq += s
            else:
                online_sq += s
        return ema_sq, online_sq

    def rel_dist(pa, pb, names):
        num = den = 0.0
        for name in names:
            if name not in pa:
                continue
            la = jax.tree.leaves(pa[name])
            lb = jax.tree.leaves(pb[name])
            num += float(sum(np.sum(np.square(_f64(x) - _f64(y)))
                             for x, y in zip(la, lb)))
            den += float(sum(np.sum(np.square(_f64(x))) for x in la))
        return (num / den) ** 0.5 if den else 0.0

    # one shared init (f32 params, standard initializer path)
    seed_model = PixPro(arch="resnet50", pixpro_p=2.0,
                        pixpro_transform_layer=1, pixpro_pos_ratio=0.7,
                        dtype=jnp.float32)
    tx0 = lars_sgd(lr_sched, weight_decay=WD)
    st0 = create_train_state(jax.random.PRNGKey(seed), seed_model, tx0,
                             {"im1": jnp.zeros((1, hw, hw, 3))})
    variables = {"params": st0.params, "batch_stats": st0.batch_stats}

    st32, step32 = build_arm(jnp.float32, variables)
    st16, step16 = build_arm(jnp.bfloat16, variables)

    online_names = sorted(set(variables["params"]) - ema_names)
    for i in range(steps):
        bt = make_batch()
        st32, m32 = step32(st32, bt)
        st16, m16 = step16(st16, bt)
        if (i + 1) % every == 0 or i == 0:
            e32, o32 = split_norms(st32.params)
            e16, _ = split_norms(st16.params)
            row = {
                "step": i + 1,
                "loss_f32": round(float(m32["loss"]), 6),
                "loss_bf16": round(float(m16["loss"]), 6),
                "ema_norm_f32": round(e32 ** 0.5, 6),
                "ema_norm_bf16": round(e16 ** 0.5, 6),
                "ema_rel_dist": round(rel_dist(
                    st32.params, st16.params, sorted(ema_names)), 8),
                "online_rel_dist": round(rel_dist(
                    st32.params, st16.params, online_names), 8),
            }
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
