#!/usr/bin/env python
"""Multi-span (`use_flow_frames`) cost measurement.

At n_frames=6 the multi-span loss unrolls S = K(K+1)/2 = 15 window pair
losses over per-frame crop stacks (F=5 crops per view), so one "sample"
carries 10 encoder images instead of 2. This tool measures what that costs
on the real train step: compile time, device-memory footprint, compiled
FLOPs, and steady-state samples/sec — the numbers VERDICT round 1 asked for
(multi_span telemetry follow-up).

Usage: python tools/bench_multispan.py
(env: MS_BATCH, MS_FRAMES, MS_STEPS, MS_FUSE=1|0 — unset mirrors the
driver's shipped pairing: multi-span unfused, standard fused; fused
multi-span is supported and semantics-exact but measured neutral at 3.3x
compile, docs/PERF.md)
Prints one JSON line per configuration (multi-span and, for reference, the
standard two-crop step at the same batch).

MS_LIVE=1 instead measures the ON-THE-FLY multi-span step (frozen
RAFT-small inside the compiled step, frames of MS_LIVE_H x MS_LIVE_W,
default 720x1280 — the BDD resolution) in both flow_up regimes, compiled
once each then timed INTERLEAVED per trial block (MS_LIVE_TRIALS, default
3) with per-arm medians — the axon variance rule (CLAUDE.md):
  live_lazy — RAFT emits the coarse 1/8-res stack, LazyFlowUp composes it
              point-domain (the driver's path for --flow_up + RAFT-small)
  live_mat  — RAFT emits upflow8 full-res fields, composed materialized
              (the old path; gather-bound at 720p)
Exact same numbers by construction (test-pinned,
tests/test_flow_frames.py::test_live_raft_small_lazy_flow_up_matches_materializing).
MS_LIVE_ARMS=lazy|mat|both selects which arm(s) to build (a single arm
halves device-memory pressure for fit probes); MS_LIVE_CORR_DTYPE=bfloat16
sets the corr-pyramid HBM storage dtype (the driver's --raft_corr_dtype).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _coords(b, f=None):
    rng = np.random.default_rng(0)
    shape = (b, 10) if f is None else (b, f, 10)
    out = np.zeros(shape, np.float32)
    flat = out.reshape(-1, 10)
    for i in range(flat.shape[0]):
        j, ii, w, h = (int(rng.integers(0, 600)), int(rng.integers(0, 300)),
                       int(rng.integers(200, 640)), int(rng.integers(150, 400)))
        flat[i] = [j / 1279, ii / 719, (j + w - 1) / 1279, (ii + h - 1) / 719,
                   j, ii, w, h, 1280, 720]
    return out


def measure(multi_span: bool, batch_size: int, n_frames: int, n_steps: int):
    import jax
    import jax.numpy as jnp

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.train import (create_train_state, lars_sgd,
                                   frozen_momentum_branch_mask, warmup_cosine,
                                   make_train_step)

    b, hw = batch_size, 224
    k = n_frames - 1
    fh, fw = 90, 160
    rng = np.random.default_rng(1)

    def img(*shape):
        return jnp.asarray(rng.integers(0, 255, shape + (hw, hw, 3)),
                           jnp.uint8)

    batch = {
        "flows_fwd": jnp.asarray(
            2 * rng.standard_normal((b, k, fh, fw, 2)).astype(np.float32)),
        "flows_bwd": jnp.asarray(
            2 * rng.standard_normal((b, k, fh, fw, 2)).astype(np.float32)),
    }
    if multi_span:
        batch.update(
            ims1=img(b, k), ims2=img(b, k),
            coords1=jnp.asarray(_coords(b, k)),
            coords2=jnp.asarray(_coords(b, k)),
            n_frames_eff=jnp.full((b,), n_frames, jnp.float32))
    else:
        batch.update(im1=img(b), im2=img(b),
                     coord1=jnp.asarray(_coords(b)),
                     coord2=jnp.asarray(_coords(b)))

    # default mirrors the driver's shipped pairing (multi-span unfused —
    # measured neutral at 3.3x compile; standard fused); MS_FUSE=1|0
    # overrides both configs for A/Bs
    fuse_env = os.environ.get("MS_FUSE")
    fuse = (fuse_env == "1") if fuse_env is not None else not multi_span
    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7, dtype=jnp.bfloat16,
                   fuse_views=fuse)
    lr = warmup_cosine(1.0, epochs=100, warmup_epoch=5, steps_per_epoch=68)
    tx0 = lars_sgd(lr, weight_decay=1e-5)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx0,
        {"im1": jnp.zeros((1, hw, hw, 3), jnp.float32)})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))

    step = make_train_step(model, tx, lr_schedule=lr,
                           ema_total_steps=100 * 68, ema_base_momentum=0.99,
                           use_flow=True, flow_up=True,
                           use_flow_frames=multi_span,
                           alpha1=0.01, alpha2=0.5, donate=False)

    t0 = time.perf_counter()
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    mem = compiled.memory_analysis()

    state2, metrics = step(state, batch)
    float(metrics["loss"])  # sync (axon: scalar fetch is the only barrier)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state2, metrics = step(state2, batch)
        float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    print(json.dumps({
        "metric": ("multispan" if multi_span else "standard")
        + "_samples_per_sec",
        "value": round(b / dt, 2),
        "unit": "samples/sec/chip",
        "step_ms": round(1000 * dt, 1),
        "compile_s": round(compile_s, 1),
        "flops_per_step": float(ca.get("flops", 0.0)),
        "device_memory_mb": round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / 1e6)
        if mem is not None else None,
        "fuse_views": fuse,
        "batch": b, "n_frames": n_frames,
        "pair_losses": (n_frames - 1) * n_frames // 2 if multi_span else 2,
        "encoder_images_per_sample": 2 * (n_frames - 1) if multi_span else 2,
    }))


def build_live(lazy: bool, batch_size: int, n_frames: int,
               frame_h: int, frame_w: int, iters: int):
    import jax
    import jax.numpy as jnp

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.raft import RAFT, raft_batch_flows
    from pixflow_tpu.train import (create_train_state, lars_sgd,
                                   frozen_momentum_branch_mask, warmup_cosine,
                                   make_train_step)

    b, hw = batch_size, 224
    k = n_frames - 1
    rng = np.random.default_rng(1)

    # corr-pyramid HBM storage dtype, the driver's --raft_corr_dtype knob:
    # 720p live is memory-bound (PERF.md), so bf16 corr is the fit lever
    corr_env = os.environ.get("MS_LIVE_CORR_DTYPE")
    raft = RAFT(small=True,
                corr_dtype=getattr(jnp, corr_env) if corr_env else None)
    frames = jnp.asarray(
        rng.integers(0, 255, (b, n_frames, frame_h, frame_w, 3)), jnp.uint8)
    raft_vars = raft.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, frame_h, frame_w, 3), jnp.float32),
                          jnp.zeros((1, frame_h, frame_w, 3), jnp.float32),
                          iters=1)

    # micro_batch mirrors the recipe's --flow_bs 2: at 720x1280 all
    # b*(n_frames-1) pair corr volumes at once OOM the chip (415 MB/pair
    # at bf16 before pyramid+remat temps)
    flow_bs = int(os.environ.get("MS_LIVE_FLOW_BS", "2"))
    def raft_fn(fr):
        return raft_batch_flows(raft, raft_vars, fr, iters=iters,
                                up=not lazy, micro_batch=flow_bs)

    def img(*shape):
        return jnp.asarray(rng.integers(0, 255, shape + (hw, hw, 3)),
                           jnp.uint8)

    batch = {
        "frames": frames,
        "ims1": img(b, k), "ims2": img(b, k),
        "coords1": jnp.asarray(_coords(b, k)),
        "coords2": jnp.asarray(_coords(b, k)),
        "n_frames_eff": jnp.full((b,), n_frames, jnp.float32),
    }

    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7, dtype=jnp.bfloat16, fuse_views=False)
    lr = warmup_cosine(1.0, epochs=100, warmup_epoch=5, steps_per_epoch=68)
    tx0 = lars_sgd(lr, weight_decay=1e-5)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx0,
        {"im1": jnp.zeros((1, hw, hw, 3), jnp.float32)})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))

    step = make_train_step(model, tx, lr_schedule=lr,
                           ema_total_steps=100 * 68, ema_base_momentum=0.99,
                           use_flow=True, flow_up=lazy,
                           use_flow_frames=True, raft_fn=raft_fn,
                           alpha1=0.01, alpha2=0.5, donate=False)

    t0 = time.perf_counter()
    compiled = step.lower(state, batch).compile()
    compile_s = time.perf_counter() - t0
    mem = compiled.memory_analysis()

    state2, metrics = step(state, batch)
    float(metrics["loss"])  # sync (axon: scalar fetch is the only barrier)
    cell = {"state": state2}

    def run_trial(n_steps: int) -> float:
        """One timed block of n_steps; returns seconds/step."""
        t0 = time.perf_counter()
        st = cell["state"]
        for _ in range(n_steps):
            st, metrics = step(st, batch)
            float(metrics["loss"])
        cell["state"] = st
        return (time.perf_counter() - t0) / n_steps

    return {
        "run_trial": run_trial,
        "meta": {
            "metric": ("live_lazy" if lazy else "live_mat")
            + "_multispan_samples_per_sec",
            "unit": "samples/sec/chip",
            "compile_s": round(compile_s, 1),
            "device_memory_mb": round(
                (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                 + mem.output_size_in_bytes) / 1e6)
            if mem is not None else None,
            "batch": b, "n_frames": n_frames, "raft_iters": iters,
            "frame_hw": [frame_h, frame_w],
            "corr_dtype": corr_env or "follow",
        },
    }


def measure_live_interleaved(batch_size, n_frames, n_steps, fh, fw, iters,
                             trials):
    """CLAUDE.md axon variance rule: the SAME compiled program can vary up
    to 2x between separate timing blocks through the tunnel, so lazy-vs-
    materializing is adjudicated by compiling BOTH arms once and alternating
    per-trial blocks (A,B,A,B,...) in one process, reporting per-arm medians
    (the bench_dtype.py pattern) — never two contiguous blocks minutes
    apart."""
    which = os.environ.get("MS_LIVE_ARMS", "both")  # lazy | mat | both
    arm_keys = {"lazy": (True,), "mat": (False,)}.get(which, (True, False))
    arms = {lazy: build_live(lazy, batch_size, n_frames, fh, fw, iters)
            for lazy in arm_keys}
    times = {lazy: [] for lazy in arm_keys}
    for _ in range(trials):
        for lazy in arm_keys:
            times[lazy].append(arms[lazy]["run_trial"](n_steps))
    for lazy in arm_keys:
        dt = float(np.median(times[lazy]))
        print(json.dumps({
            **arms[lazy]["meta"],
            "value": round(batch_size / dt, 2),
            "step_ms": round(1000 * dt, 1),
            "step_ms_trials": [round(1000 * t, 1) for t in times[lazy]],
            "trials_per_arm": trials, "steps_per_trial": n_steps,
        }))


def main():
    b = int(os.environ.get("MS_BATCH", "8"))
    n_frames = int(os.environ.get("MS_FRAMES", "6"))
    n_steps = int(os.environ.get("MS_STEPS", "5"))
    if os.environ.get("MS_PLATFORM"):
        # smoke runs off-TPU (the axon plugin ignores JAX_PLATFORMS)
        import jax
        jax.config.update("jax_platforms", os.environ["MS_PLATFORM"])
    from pixflow_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    if os.environ.get("MS_LIVE", "0") == "1":
        fh = int(os.environ.get("MS_LIVE_H", "720"))
        fw = int(os.environ.get("MS_LIVE_W", "1280"))
        iters = int(os.environ.get("MS_LIVE_ITERS", "12"))
        b = int(os.environ.get("MS_BATCH", "2"))
        trials = int(os.environ.get("MS_LIVE_TRIALS", "3"))
        measure_live_interleaved(b, n_frames, n_steps, fh, fw, iters, trials)
        return
    measure(True, b, n_frames, n_steps)
    measure(False, b, n_frames, n_steps)


if __name__ == "__main__":
    main()
