#!/usr/bin/env python
"""Headline benchmark: pretrain images/sec/chip for the nframe=6 flow recipe
(ResNet-50 PixPro, 224px, precomputed 1/8-res RAFT flows, upflow8 + 5-flow
composition + cycle masks, LARS — the
`tools/pretrain_bdd100k_job_2000ep_nframe6_gpu16.sh` configuration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalizes against an estimated reference throughput of
160 images/sec per V100 (the reference publishes no throughput —
BASELINE.md; estimate: ~33 GFLOPs/image training cost at ~35% fp32 MFU on a
15 TFLOP/s V100 under the O0 recipe)."""

import json
import os
import time

BASELINE_IMG_PER_SEC_PER_CHIP = 160.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.parallel import make_data_mesh, DATA_AXIS
    from pixflow_tpu.train import (create_train_state, make_train_step,
                                   lars_sgd, frozen_momentum_branch_mask,
                                   warmup_cosine)

    n_dev = len(jax.devices())
    # single chip: plain jit (no sharding annotations — the axon platform
    # runs annotated programs through a slow fallback); >1 chip: GSPMD mesh.
    mesh = make_data_mesh(n_dev) if n_dev > 1 else None

    per_chip_batch = int(os.environ.get("BENCH_BATCH", "32"))
    b = per_chip_batch * n_dev
    hw, k, fh, fw = 224, 5, 90, 160  # nframe=6: 5 flows at 1/8 of 720x1280

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

    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7, dtype=jnp.bfloat16)

    lr = warmup_cosine(4.0, epochs=2000, warmup_epoch=5, steps_per_epoch=68)
    tx0 = lars_sgd(lr, weight_decay=1e-5)
    state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                               {"im1": batch["im1"][:1]})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))

    step = make_train_step(model, tx, lr_schedule=lr,
                           ema_total_steps=2000 * 68, ema_base_momentum=0.99,
                           mesh=mesh, use_flow=True, flow_up=True,
                           alpha1=0.01, alpha2=0.5)

    # warmup/compile
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    img_per_sec_per_chip = b / dt / n_dev
    print(json.dumps({
        "metric": "pretrain_images_per_sec_per_chip_r50_nframe6_flow",
        "value": round(img_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
