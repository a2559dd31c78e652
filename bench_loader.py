#!/usr/bin/env python
"""Input-pipeline microbench: images/sec through ShardedLoader on a
synthetic BDD100k-style corpus (real JPEG decode + BYOL augmentation +
flowpack window reads — the exact per-step host work of the nframe=6 flow
recipe).

Proves/paces the host side of the headline bench: the device step consumes
`2 * batch` crops per step, so the loader must sustain
`2 * batch * steps/sec` crop-pairs/sec... i.e. `img/s >= headline img/s`
(one loader sample = one im1+im2 pair = one "image" of the device metric).

Env: LOADER_VIDEOS (default 64), LOADER_FRAMES (6), LOADER_BATCH (64),
LOADER_WORKERS (default: os.cpu_count()), LOADER_MODE (thread|process|both),
LOADER_RES (default 720x1280 frames), LOADER_NATIVE=1 (native ROI decode),
LOADER_DEVICE_AUG=1 (sample aug params; photometric runs on-device),
LOADER_RESTART=1 (restart-transcode the corpus first — crop decodes splice
out just their MCU-row band; tools/transcode_restart.py).
Prints one JSON line per mode.

LOADER_DEVICE_STEP=1 additionally drives the loader's batches through the
real compiled train step (ResNet-50 recipe, bf16, flow composition) on the
default JAX device and reports the COMBINED host->device throughput — the
loader-in-the-loop proof that the pipeline (aug params, uint8 crops, f16
flows) composes with the compiled step. CAVEAT on this axon host: the
device sits behind a tunnel with ~1 s per-transfer latency (measured 0.08
-> 65 MB/s after warmup), so the combined number here measures the TUNNEL,
not the pipeline; on a co-located TPU host the host->device link is PCIe.
LOADER_CPU=1 forces the CPU backend — slower steps, but the composition
proof without tunnel artifacts."""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def make_corpus(root: str, n_videos: int, n_frames: int, res, quality=90):
    from PIL import Image
    h, w = res
    rng = np.random.default_rng(0)
    train = os.path.join(root, "images", "train")
    flow_dir = os.path.join(root, "flow_raw")
    os.makedirs(flow_dir)
    for v in range(n_videos):
        vd = os.path.join(train, f"video{v:04d}")
        os.makedirs(vd)
        # low-frequency noise compresses like natural video (not white noise)
        small = rng.integers(0, 255, (h // 16, w // 16, 3), np.uint8)
        img = np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR))
        for f in range(n_frames):
            arr = np.clip(img.astype(np.int16)
                          + rng.integers(-12, 12, img.shape), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(vd, f"frame{f:04d}.jpg"), quality=quality)
        flows = (4 * rng.standard_normal(
            (n_frames - 1, h // 8, w // 8, 2))).astype(np.float32)
        np.save(os.path.join(flow_dir, f"video{v:04d}.npy"), flows)
    return train, flow_dir


def _combined_bench(ds, batch, workers, mode, device_aug):
    """Real ShardedLoader feeding the real compiled train step."""
    import jax
    if os.environ.get("LOADER_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pixflow_tpu.data.loader import ShardedLoader
    from pixflow_tpu.models import PixPro
    from pixflow_tpu.parallel.mesh import enable_compilation_cache
    from pixflow_tpu.train import (create_train_state, lars_sgd,
                                   frozen_momentum_branch_mask, warmup_cosine,
                                   make_train_step)
    enable_compilation_cache()

    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7, dtype=jnp.bfloat16, fuse_views=True)
    lr = warmup_cosine(4.0, epochs=2000, warmup_epoch=5, steps_per_epoch=68)
    tx0 = lars_sgd(lr, weight_decay=1e-5)
    sample_im = jnp.zeros((2, 224, 224, 3), jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                               {"im1": sample_im})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))
    # donate the state: non-donated large args re-upload through the axon
    # tunnel (~20 s/step — CLAUDE.md)
    step = make_train_step(model, tx, lr_schedule=lr, ema_total_steps=136000,
                           ema_base_momentum=0.99, use_flow=True,
                           flow_up=True, alpha1=0.01, alpha2=0.5,
                           device_aug=device_aug, donate=True)

    wmode = "thread" if mode == "both" else mode
    loader = ShardedLoader(ds, batch, seed=0, num_threads=workers,
                           prefetch=4, worker_mode=wmode)
    keep = {"im1", "im2", "coord1", "coord2", "flows_fwd", "flows_bwd",
            "aug1", "aug2"}
    dev = jax.devices()[0]

    try:
        n_img, steps, epoch, t0 = 0, 0, 0, None
        warm = 1
        min_steps = max(2 * len(loader), 6) + warm
        last = None
        while steps < min_steps:
            for b in loader.epoch(epoch):
                db = jax.device_put(
                    {k: v for k, v in b.items() if k in keep}, dev)
                state, metrics = step(state, db)
                last = metrics["loss"]
                steps += 1
                if steps == warm:
                    float(last)  # compile barrier
                    t0 = time.perf_counter()
                elif steps > warm:
                    n_img += b["im1"].shape[0]
                if steps >= min_steps:
                    break
            epoch += 1
        float(last)  # device fetch: the only reliable axon barrier
        dt = time.perf_counter() - t0
    finally:
        loader.close()

    print(json.dumps({
        "metric": "combined_loader_train_images_per_sec",
        "value": round(n_img / dt, 2),
        "unit": "images/sec (1 host core feeding 1 chip)",
        "workers": workers, "batch": batch, "device_aug": device_aug,
        "backend": jax.default_backend(),
    }))


def main():
    from pixflow_tpu.data.datasets import VideoFrameDataset, list_image_folder
    from pixflow_tpu.data.flowpack import pack_flow_dir
    from pixflow_tpu.data.loader import ShardedLoader
    from pixflow_tpu.data.transforms import get_transform

    n_videos = int(os.environ.get("LOADER_VIDEOS", "64"))
    n_frames = int(os.environ.get("LOADER_FRAMES", "6"))
    batch = int(os.environ.get("LOADER_BATCH", "64"))
    workers = int(os.environ.get("LOADER_WORKERS", str(os.cpu_count())))
    mode = os.environ.get("LOADER_MODE", "both")
    native = os.environ.get("LOADER_NATIVE", "0") == "1"
    restart = os.environ.get("LOADER_RESTART", "0") == "1"
    device_aug = os.environ.get("LOADER_DEVICE_AUG", "0") == "1"
    decode_scale = int(os.environ.get("LOADER_DECODE_SCALE", "1"))
    res = tuple(int(x) for x in
                os.environ.get("LOADER_RES", "720x1280").split("x"))

    root = tempfile.mkdtemp(prefix="pixflow_loaderbench_")
    try:
        train, flow_raw = make_corpus(root, n_videos, n_frames, res)
        if restart:  # splice-compatible corpus (tools/transcode_restart.py)
            import subprocess
            subprocess.run([sys.executable,
                            os.path.join(os.path.dirname(
                                os.path.abspath(__file__)), "tools",
                                "transcode_restart.py"), train],
                           check=True)
        fwd_pack = os.path.join(root, "fwd.fpk")
        bwd_pack = os.path.join(root, "bwd.fpk")
        pack_flow_dir(flow_raw, fwd_pack, "float16")
        pack_flow_dir(flow_raw, bwd_pack, "float16")

        transform = get_transform("BYOL", 0.08, 224, emit_uint8=True,
                                  device_photometric=device_aug)
        ds = VideoFrameDataset(
            samples=list_image_folder(train, "bdd100k"),
            transform=transform, n_frames=n_frames, two_crop=True,
            video_mode=True, flow_fwd_root=fwd_pack, flow_bwd_root=bwd_pack,
            flow_dtype="float16", native_decode=native,
            decode_scale=decode_scale)

        batch = min(batch, len(ds))  # one sample per video per epoch

        if os.environ.get("LOADER_DEVICE_STEP", "0") == "1":
            _combined_bench(ds, batch, workers, mode, device_aug)
            return

        modes = ["thread", "process"] if mode == "both" else [mode]
        for m in modes:
            loader = ShardedLoader(ds, batch, seed=0, num_threads=workers,
                                   prefetch=4, worker_mode=m)
            min_batches = max(len(loader), 1) + 4
            try:
                n_img, n_batches, epoch = 0, -1, 0
                t0 = None
                while n_batches < min_batches:
                    for b in loader.epoch(epoch):
                        if t0 is None:  # warm the pipeline/pool first
                            t0 = time.perf_counter()
                        else:
                            n_img += b["im1"].shape[0]
                        n_batches += 1
                    epoch += 1
                dt = time.perf_counter() - t0
            finally:
                loader.close()
            print(json.dumps({
                "metric": f"loader_images_per_sec_{m}",
                "value": round(n_img / dt, 2),
                "unit": "images/sec/host",
                "workers": workers, "batch": batch,
                "n_frames": n_frames, "res": list(res),
                "native_decode": native, "device_aug": device_aug,
                "restart_transcode": restart,
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
