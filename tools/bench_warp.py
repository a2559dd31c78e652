#!/usr/bin/env python
"""Adjudicate the bilinear-warp implementations on the real chip.

Three implementations of grid_sample(align_corners=True, zeros padding):
    gather  — ops/resample.grid_sample (vectorized gather; scalar-bound on TPU)
    mxu     — ops/resample.grid_sample_mxu (dense tent matmuls, XLA einsum)
    pallas  — ops/pallas/warp.grid_sample_pallas (fused VMEM tent kernel)

at the two shapes the training pipeline actually samples:
    compose  — flow composition warp: field [B,90,160,2], 90*160 points/field
               (one warp per composed flow step, `ops/flow.concat_flow`)
    fullres  — materializing full-res warp: field [B,720,1280,2],
               720*1280 points (the BENCH_FLOW_LAZY=0 / debug path)

Env: BENCH_BATCH (default 8), BENCH_IMPLS=gather,mxu,pallas, BENCH_SHAPES.
Prints one JSON line per (shape, impl). Device-side timing: jitted lax.scan
with a carry-dependent grid + scalar fetch (the only reliable axon barrier).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixflow_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    from pixflow_tpu.ops.resample import grid_sample, grid_sample_mxu
    from pixflow_tpu.ops.pallas.warp import grid_sample_pallas

    impls = {
        "gather": grid_sample,
        "mxu": grid_sample_mxu,
        "pallas": grid_sample_pallas,
    }
    sel = os.environ.get("BENCH_IMPLS", "gather,mxu,pallas").split(",")
    shapes_sel = os.environ.get("BENCH_SHAPES", "compose,fullres").split(",")
    b = int(os.environ.get("BENCH_BATCH", "8"))
    n_scan = int(os.environ.get("BENCH_SCAN_STEPS", "20"))

    shapes = {
        "compose": (b, 90, 160),
        "fullres": (min(b, 2), 720, 1280),
    }

    rng = np.random.default_rng(0)
    for shape_name in shapes_sel:
        bb, h, w = shapes[shape_name]
        field = jnp.asarray(
            rng.standard_normal((bb, h, w, 2)).astype(np.float32))
        grid = jnp.asarray(
            (rng.random((bb, h, w, 2)) * 2 - 1).astype(np.float32) * 0.95)
        for name in sel:
            fn = impls[name]

            @jax.jit
            def many(field=field, grid=grid, fn=fn):
                def body(s, _):
                    g = grid + s * 0  # keep the warp inside the loop
                    out = fn(field, g)
                    return s + jnp.mean(out), None
                return jax.lax.scan(body, jnp.float32(0), None,
                                    length=n_scan)[0]

            try:
                float(many())  # compile + flush
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(many())
                    times.append((time.perf_counter() - t0) / n_scan)
                ms = sorted(times)[1] * 1000
                pts_per_s = bb * h * w / (sorted(times)[1])
                print(json.dumps({
                    "metric": f"warp_{shape_name}_{name}_ms",
                    "value": round(ms, 3),
                    "unit": "ms/warp",
                    "points_per_sec": round(pts_per_s),
                    "batch": bb, "field": [h, w],
                }))
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({
                    "metric": f"warp_{shape_name}_{name}_ms",
                    "value": None, "error": str(e)[:200],
                }))


if __name__ == "__main__":
    main()
