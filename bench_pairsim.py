#!/usr/bin/env python
"""Auxiliary benchmark: pair-similarity step time (BASELINE.json's second
metric) — the PPM cosine-attention + pixel-pair masked loss at recipe shapes
(batch 32, 7x7x256 features, flow-warped positives), measured device-side.

Adjudicates the Pallas fused kernel against the XLA composition:
    BENCH_IMPL=xla|fused   loss implementation (default xla, the default path)
    BENCH_GRAD=1           time value_and_grad wrt (feat, value, k) — the
                           production usage — instead of forward only
    BENCH_BATCH=N          batch (default 32)
Prints ONE JSON line per invocation."""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixflow_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    from pixflow_tpu.ops import pixpro_pair_loss, ppm_attention
    from pixflow_tpu.ops.loss import l2_normalize

    impl = os.environ.get("BENCH_IMPL", "xla")
    with_grad = os.environ.get("BENCH_GRAD", "0") == "1"
    if impl == "fused":
        from pixflow_tpu.ops.pallas.pair_loss import pixpro_pair_loss_fused
        loss_impl = pixpro_pair_loss_fused
    else:
        loss_impl = pixpro_pair_loss

    b, hw, c = int(os.environ.get("BENCH_BATCH", "32")), 7, 256
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((b, hw, hw, c)).astype(np.float32))
    value = jnp.asarray(rng.standard_normal((b, hw, hw, c)).astype(np.float32))
    k = l2_normalize(jnp.asarray(
        rng.standard_normal((b, hw, hw, c)).astype(np.float32)))
    coords = np.zeros((b, 10), np.float32)
    coords[:] = [0.1, 0.1, 0.5, 0.5, 128, 72, 512, 288, 1280, 720]
    coords = jnp.asarray(coords)
    flow = jnp.asarray(2 * rng.standard_normal((b, 90, 160, 2)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, 90, 160)) > 0.3)

    n = 100

    def one(feat_, value_, k_):
        pred = l2_normalize(ppm_attention(feat_, value_, p=2.0))
        loss, _ = loss_impl(pred, k_, coords, coords, 0.7,
                            flow=flow, flow_mask=mask)
        return loss

    @jax.jit
    def many():
        def body(s, _):
            f = feat + s * 0  # carry-dependent input: keeps the body in-loop
            if with_grad:
                loss, grads = jax.value_and_grad(one, argnums=(0, 1, 2))(
                    f, value, k)
                s = s + loss + sum(jnp.sum(g) for g in grads) * 1e-20
            else:
                s = s + one(f, value, k)
            return s, None
        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    r = many()
    float(r)  # compile + flush (fetch is the only reliable axon barrier)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many())
        times.append((time.perf_counter() - t0) / n)
    ms = sorted(times)[1] * 1000
    print(json.dumps({
        "metric": f"pair_similarity_step_ms_b{b}"
                  + ("_grad" if with_grad else "") + f"_{impl}",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
