#!/usr/bin/env python
"""RAFT inference throughput bench (flow precompute / live-flow oracle).

Sweeps batch size and compute dtype for the RAFT variants at a fixed
resolution and prints one JSON line per configuration, plus a bf16-vs-f32
flow-delta line per variant. Feeds fixed random images through a jitted
`lax.scan` loop and fetches a scalar — the only reliable timing barrier on
the axon tunnel (CLAUDE.md).

Caveats: weights are RANDOM-INIT (no checkpoint needed), so the delta line
overstates what trained weights would show in one sense and understates in
another — random features + 12 chaotic GRU refinements amplify any rounding;
treat it as an upper-bound smell test, not an EPE claim (validate a real
checkpoint with main_raft.py --validate before adopting bf16). Throughput
is unaffected by weight values.

Env: RAFT_VARIANTS=small[,basic], RAFT_BATCHES=4,8,16, RAFT_DTYPES=
float32,bfloat16, RAFT_CORR_DTYPE=follow|float32|bfloat16 (pyramid HBM
storage dtype; 'follow' tracks the compute dtype), RAFT_RES=360x640,
RAFT_ITERS=12, RAFT_STEPS=8, RAFT_TRIALS=3.

The precompute math: BDD100k is 27M frames fwd+bwd (~54M pairs); at P
pairs/s/chip that is 54e6/P/3600 chip-hours (the reference used a 256-GPU
sweep for the same corpus, `dataset_prepare/raft_bdd100k/README.md`).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixflow_tpu.models.raft import RAFT
    from pixflow_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()

    variants = os.environ.get("RAFT_VARIANTS", "small").split(",")
    batches = [int(b) for b in
               os.environ.get("RAFT_BATCHES", "4,8,16").split(",")]
    dtypes = os.environ.get("RAFT_DTYPES", "float32,bfloat16").split(",")
    h, w = (int(x) for x in os.environ.get("RAFT_RES", "360x640").split("x"))
    corr_env = os.environ.get("RAFT_CORR_DTYPE", "follow")
    corr_dtype = None if corr_env == "follow" else getattr(jnp, corr_env)
    iters = int(os.environ.get("RAFT_ITERS", "12"))
    steps = int(os.environ.get("RAFT_STEPS", "8"))
    trials = int(os.environ.get("RAFT_TRIALS", "3"))

    rng = np.random.default_rng(0)
    for variant in variants:
        small = variant == "small"
        # one weight init per variant, shared across dtypes (params are
        # stored f32; dtype only sets the compute/activation precision)
        init_model = RAFT(small=small, dtype=jnp.float32)
        im_init = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = init_model.init(jax.random.PRNGKey(0), im_init, im_init,
                                    iters=1)

        flows = {}
        for dname in dtypes:
            dtype = getattr(jnp, dname)
            model = RAFT(small=small, dtype=dtype, corr_dtype=corr_dtype)
            for batch in batches:
                im1 = jnp.asarray(
                    rng.integers(0, 255, (batch, h, w, 3)), jnp.float32)
                im2 = jnp.asarray(
                    rng.integers(0, 255, (batch, h, w, 3)), jnp.float32)

                def body(carry, _):
                    low, _up = model.apply(variables, im1, im2, iters=iters)
                    return carry + jnp.mean(low.astype(jnp.float32)), None

                def make_run(length):
                    @jax.jit
                    def run():
                        out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                              length=length)
                        return out
                    return run

                # dual-length differencing cancels the constant per-call
                # cost (dispatch + the tunnel's device->host fetch latency):
                # per-step = (t(2N) - t(N)) / N
                run_n, run_2n = make_run(steps), make_run(2 * steps)
                float(run_n())
                float(run_2n())  # compile + warm both
                best = float("inf")
                for _ in range(trials):
                    t0 = time.perf_counter()
                    float(run_n())
                    t1 = time.perf_counter()
                    float(run_2n())
                    t2 = time.perf_counter()
                    best = min(best, ((t2 - t1) - (t1 - t0)) / steps)
                pairs_s = batch / best
                print(json.dumps({
                    "metric": f"raft_{variant}_pairs_per_sec",
                    "value": round(pairs_s, 1), "unit": "pairs/sec/chip",
                    "batch": batch, "dtype": dname, "corr_dtype": corr_env,
                    "iters": iters,
                    "res": [h, w], "ms_per_batch": round(best * 1e3, 2),
                }))
                if batch == batches[0]:
                    low, _ = jax.jit(
                        lambda a, b: model.apply(variables, a, b,
                                                 iters=iters))(im1, im2)
                    flows[dname] = np.asarray(low, np.float32)

        if corr_dtype is not None and "float32" in flows:
            # delta of f32-compute + overridden-corr vs the pure-f32 oracle
            ref_model = RAFT(small=small, dtype=jnp.float32,
                             corr_dtype=jnp.float32)
            im1 = jnp.asarray(
                rng.integers(0, 255, (batches[0], h, w, 3)), jnp.float32)
            im2 = jnp.asarray(
                rng.integers(0, 255, (batches[0], h, w, 3)), jnp.float32)
            # same images as the stored run? rng has advanced — regenerate
            # both flows on one fresh pair for an apples-to-apples delta
            low_ref, _ = jax.jit(lambda a, b: ref_model.apply(
                variables, a, b, iters=iters))(im1, im2)
            ov_model = RAFT(small=small, dtype=jnp.float32,
                            corr_dtype=corr_dtype)
            low_ov, _ = jax.jit(lambda a, b: ov_model.apply(
                variables, a, b, iters=iters))(im1, im2)
            d = np.abs(np.asarray(low_ov, np.float32)
                       - np.asarray(low_ref, np.float32))
            mag = np.abs(np.asarray(low_ref, np.float32)).mean()
            print(json.dumps({
                "metric": f"raft_{variant}_corr_{corr_env}_flow_delta",
                "mean_abs_px": round(float(d.mean()), 4),
                "p99_abs_px": round(float(np.percentile(d, 99)), 4),
                "mean_flow_mag_px": round(float(mag), 3),
            }))
        if "float32" in flows and "bfloat16" in flows:
            d = np.abs(flows["bfloat16"] - flows["float32"])
            mag = np.abs(flows["float32"]).mean()
            print(json.dumps({
                "metric": f"raft_{variant}_bf16_flow_delta",
                "mean_abs_px": round(float(d.mean()), 4),
                "p99_abs_px": round(float(np.percentile(d, 99)), 4),
                "mean_flow_mag_px": round(float(mag), 3),
            }))


if __name__ == "__main__":
    main()
