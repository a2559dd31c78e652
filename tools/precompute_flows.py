#!/usr/bin/env python
"""Precompute per-video RAFT flow files for the use_flow_file training path.

TPU-native replacement for the reference's flow-preparation pipeline (which
required a separate fork of RAFT and a 256-GPU sweep —
`dataset_prepare/raft_bdd100k/README.md`): runs the Flax RAFT over every
consecutive frame pair of every video, forward and backward, and writes one
file per video with all 1/8-resolution flows:

    <out>/forward/<video>.npy   [num_frames-1, h/8, w/8, 2] float32
    <out>/backward/<video>.npy  (pairs reversed, reference file order)

`.npy` is the native format; `--format pth` writes torch tensors in the
reference's layout ([N, 2, h, w]) for drop-in compatibility."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser("precompute RAFT flows")
    p.add_argument("--data-dir", required=True, help="root with <video>/<frames>")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--flow-model", required=True, help="torch RAFT checkpoint")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--batch", type=int, default=4,
                   help="frame pairs per step (4 beats 8 per-pair on v5e — "
                        "the corr volume's HBM footprint; docs/PERF.md)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="RAFT compute dtype (weights stay f32). bfloat16 "
                        "is measured near-neutral on v5e and the iterative "
                        "refinement amplifies rounding — validate flow "
                        "deltas before using (tools/bench_raft.py, "
                        "docs/PERF.md)")
    p.add_argument("--corr-dtype", choices=["follow", "float32", "bfloat16"],
                   default="follow",
                   help="corr-pyramid HBM storage dtype; the pyramid is the "
                        "refinement loop's dominant HBM traffic, so f32 "
                        "compute + bfloat16 storage is the accuracy-cheap "
                        "fast mode (docs/PERF.md)")
    p.add_argument("--format", choices=["npy", "pth"], default="npy")
    p.add_argument("--shard", type=int, nargs=2, default=[0, 1],
                   metavar=("IDX", "N"), help="process every N-th video")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pixflow_tpu.models.raft import load_raft
    from pixflow_tpu.data.datasets import list_image_folder
    from pixflow_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    small = "small" in os.path.basename(a.flow_model)
    model, variables = load_raft(
        a.flow_model, small=small, dtype=getattr(jnp, a.dtype),
        corr_dtype=None if a.corr_dtype == "follow"
        else getattr(jnp, a.corr_dtype))

    @jax.jit
    def flow_pairs(im1, im2):
        low, _ = model.apply(variables, im1, im2, iters=a.iters)
        return low

    os.makedirs(os.path.join(a.out_dir, "forward"), exist_ok=True)
    os.makedirs(os.path.join(a.out_dir, "backward"), exist_ok=True)

    videos = list_image_folder(a.data_dir, dataset="bdd100k")
    for vi, video in enumerate(videos):
        if vi % a.shard[1] != a.shard[0]:
            continue
        name = os.path.basename(os.path.dirname(video[0][0]))
        out_f = os.path.join(a.out_dir, "forward", f"{name}.{a.format}")
        out_b = os.path.join(a.out_dir, "backward", f"{name}.{a.format}")
        if os.path.exists(out_f) and os.path.exists(out_b):
            continue

        # keep the video uint8; cast each chunk at dispatch (a 1000-frame
        # 720p video is 2.7 GB as uint8 — a whole-video float32 copy would
        # quadruple that before any flow is computed)
        frames = np.stack([np.asarray(Image.open(p).convert("RGB"), np.uint8)
                           for p, _ in video])
        n = len(frames)
        fwd, bwd = [], []
        for s in range(0, n - 1, a.batch):
            e = min(s + a.batch, n - 1)
            im_a = jnp.asarray(frames[s:e], jnp.float32)
            im_b = jnp.asarray(frames[s + 1:e + 1], jnp.float32)
            fwd.append(np.asarray(flow_pairs(im_a, im_b)))
            bwd.append(np.asarray(flow_pairs(im_b, im_a)))
        fwd = np.concatenate(fwd)          # [n-1, h, w, 2]
        bwd = np.concatenate(bwd)[::-1]    # reference order: last pair first

        # write-to-temp + rename: the skip-if-exists resume above must never
        # see a truncated file from a killed worker as "done"
        for path, arr in ((out_f, fwd), (out_b, bwd)):
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                if a.format == "npy":
                    np.save(fh, arr)
                else:
                    import torch
                    torch.save(torch.from_numpy(
                        arr.transpose(0, 3, 1, 2).copy()), fh)
            os.replace(tmp, path)
        print(f"[{vi}/{len(videos)}] {name}: {fwd.shape}")


if __name__ == "__main__":
    main()
