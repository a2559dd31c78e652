#!/usr/bin/env python
"""Interleaved f32-vs-bf16 compute-dtype shootout for the headline recipe.

The axon tunnel shows up to 2x run-to-run variance for the SAME compiled
program across sessions (CLAUDE.md), so two separate `bench.py` runs can
never adjudicate a dtype delta. This tool builds BOTH programs (identical
except `PixPro(dtype=...)`), compiles them once, then times them
INTERLEAVED in one process (A,B,A,B,...) and reports per-arm medians plus
the ratio — the only comparison that is meaningful on this host.

Same measured program as bench.py's default mode: batch 64, 224px,
nframe6 lazy flow_up composition, fuse_views, telemetry-free scan of
BENCH_SCAN_STEPS steps, device->host scalar fetch as the timing barrier.

Env: BENCH_BATCH (64), BENCH_SCAN_STEPS (10), BENCH_TRIALS (7 per arm).
Prints ONE JSON line.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pixflow_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.pixpro import ema_update, momentum_schedule
    from pixflow_tpu.ops.flow_points import LazyFlowUp
    from pixflow_tpu.train import (create_train_state, lars_sgd,
                                   frozen_momentum_branch_mask,
                                   warmup_cosine)

    b = int(os.environ.get("BENCH_BATCH", "64"))
    n_scan = int(os.environ.get("BENCH_SCAN_STEPS", "10"))
    trials = int(os.environ.get("BENCH_TRIALS", "7"))
    hw, k, fh, fw = 224, 5, 90, 160

    rng = np.random.default_rng(0)
    coords = np.zeros((b, 10), np.float32)
    for i in range(b):
        j, ii, w, h = (int(rng.integers(0, 600)), int(rng.integers(0, 300)),
                       int(rng.integers(200, 640)), int(rng.integers(150, 400)))
        coords[i] = [j / 1279, ii / 719, (j + w - 1) / 1279,
                     (ii + h - 1) / 719, j, ii, w, h, 1280, 720]
    batch = {
        "im1": jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32)),
        "im2": jnp.asarray(rng.standard_normal((b, hw, hw, 3)).astype(np.float32)),
        "coord1": jnp.asarray(coords),
        "coord2": jnp.asarray(coords),
        "flows_fwd": jnp.asarray(
            2 * rng.standard_normal((b, k, fh, fw, 2)).astype(np.float32)),
        "flows_bwd": jnp.asarray(
            2 * rng.standard_normal((b, k, fh, fw, 2)).astype(np.float32)),
    }
    jax.block_until_ready(batch)

    def build_arm(dtype):
        model = PixPro(arch="resnet50", pixpro_p=2.0,
                       pixpro_transform_layer=1, pixpro_pos_ratio=0.7,
                       dtype=dtype, fuse_views=True)
        lr = warmup_cosine(4.0, epochs=2000, warmup_epoch=5,
                           steps_per_epoch=68)
        tx0 = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                                   {"im1": batch["im1"][:1]})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))

        def body(st, bt):
            m = momentum_schedule(st.ema_k, 2000 * 68, 0.99)
            params = ema_update(st.params, m)
            fwd = jnp.transpose(bt["flows_fwd"], (1, 0, 2, 3, 4))
            bwd = jnp.transpose(bt["flows_bwd"], (1, 0, 2, 3, 4))
            ff = LazyFlowUp(flows=fwd, flows_rev=bwd, alpha1=0.01, alpha2=0.5)
            fb = LazyFlowUp(flows=bwd, flows_rev=fwd, alpha1=0.01, alpha2=0.5)

            def loss_fn(p):
                (loss, _), mut = model.apply(
                    {"params": p, "batch_stats": st.batch_stats},
                    bt["im1"], bt["im2"], bt["coord1"], bt["coord2"],
                    ff, fb, None, None, train=True, mutable=["batch_stats"])
                return loss, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, st.opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return st.replace(step=st.step + 1, ema_k=st.ema_k + 1,
                              params=new_params, batch_stats=new_bs,
                              opt_state=new_opt), loss

        @partial(jax.jit, donate_argnums=(0,))
        def many_steps(st, bt):
            return jax.lax.scan(lambda s, _: body(s, bt), st, None,
                                length=n_scan)

        return state, many_steps

    arms = {}
    for name, dt in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        state, many_steps = build_arm(dt)
        for _ in range(2):  # compile + flush (device->host fetch barrier)
            state, losses = many_steps(state, batch)
            float(losses[-1])
        arms[name] = {"state": state, "fn": many_steps, "times": []}

    for _ in range(trials):  # interleaved: one trial of each per lap
        for name, arm in arms.items():
            t0 = time.perf_counter()
            arm["state"], losses = arm["fn"](arm["state"], batch)
            float(losses[-1])
            arm["times"].append((time.perf_counter() - t0) / n_scan)

    out = {"metric": "dtype_shootout_images_per_sec_per_chip",
           "batch": b, "scan_steps": n_scan, "trials_per_arm": trials}
    for name, arm in arms.items():
        med = sorted(arm["times"])[len(arm["times"]) // 2]
        out[name + "_ms_per_step"] = round(med * 1e3, 2)
        out[name + "_img_per_sec"] = round(b / med, 1)
    out["bf16_speedup"] = round(
        out["float32_ms_per_step"] / out["bfloat16_ms_per_step"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
