"""Optical-flow validation: EPE / Fl metrics on the standard benchmarks.

TPU counterpart of the original RAFT `evaluate.py` (which the reference used
out-of-tree to qualify its frozen flow checkpoints): full-resolution
inference with InputPadder, per-dataset metrics — Chairs/Sintel EPE,
KITTI EPE + Fl-all (the outlier rate: epe > 3px and epe/mag > 5%).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def validate_dataset(model, variables, dataset, iters: int = 24,
                     mode: str = "sintel", sparse: bool = False,
                     max_samples: Optional[int] = None) -> Dict[str, float]:
    """EPE metrics over a FlowDataset (no augmentor). For sparse datasets
    (KITTI-style valid masks) also reports Fl-all, and `epe` follows the
    original evaluate.py's KITTI convention — the mean of per-IMAGE mean
    EPEs (images weigh equally regardless of valid-pixel count) — while the
    px rates and Fl-all stay pixel-pooled, again like the original."""
    import jax
    import jax.numpy as jnp
    from ..models.raft.utils import InputPadder

    @jax.jit  # one compile per padded shape (uniform within a benchmark)
    def flow_fn(i1, i2):
        return model.apply(variables, i1, i2, iters=iters)[1]

    def pair_flow(img1, img2):
        padder = InputPadder(img1.shape[:2], mode=mode)
        i1, i2 = padder.pad(jnp.asarray(img1[None], jnp.float32),
                            jnp.asarray(img2[None], jnp.float32))
        return np.asarray(padder.unpad(flow_fn(i1, i2)[0]))

    epes, fls, img_means = [], [], []
    n = len(dataset) if max_samples is None else min(len(dataset),
                                                     max_samples)
    if n == 0:
        raise ValueError(
            "validation dataset is empty (wrong --*-root, or the split has "
            "no samples) — refusing to report vacuous metrics")
    for i in range(n):
        img1, img2, flow_gt, valid = dataset.__getitem__(i)
        flow = pair_flow(img1, img2)
        epe_map = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1))
        v = np.asarray(valid) >= 0.5
        if sparse:
            mag = np.sqrt(np.sum(flow_gt ** 2, axis=-1))
            epe_v = epe_map[v]
            mag_v = np.maximum(mag[v], 1e-9)
            fls.append(((epe_v > 3.0) & (epe_v / mag_v > 0.05)).astype(
                np.float64))
            epes.append(epe_v)
            if epe_v.size:  # per-image mean: the original KITTI convention
                img_means.append(float(epe_v.mean()))
        else:
            epes.append(epe_map[v].ravel())
    all_epe = np.concatenate(epes) if epes else np.zeros(1)
    out = {
        # dense: pixel-pooled over the whole split; sparse (KITTI): mean of
        # per-image means — both per the original evaluate.py
        "epe": float(np.mean(img_means) if sparse and img_means
                     else np.mean(all_epe)),
        "1px": float(np.mean(all_epe < 1.0)),
        "3px": float(np.mean(all_epe < 3.0)),
        "5px": float(np.mean(all_epe < 5.0)),
        "n_samples": float(n),
    }
    if fls:
        out["fl_all"] = float(100.0 * np.mean(np.concatenate(fls)))
    return out


def _make_flow_fn(model, variables, iters: int):
    import jax

    @jax.jit
    def flow_fn(i1, i2, flow_init):
        return model.apply(variables, i1, i2, iters=iters,
                           flow_init=flow_init)

    return flow_fn


def create_sintel_submission(model, variables, root: str, out_dir: str,
                             iters: int = 32, warm_start: bool = True):
    """Write MPI-Sintel test-set .flo files for upload (counterpart of the
    original RAFT `evaluate.create_sintel_submission`): per scene, frames in
    order, optionally warm-starting each pair from the forward-splat of the
    previous low-res flow (`forward_interpolate`)."""
    import os
    from glob import glob

    import jax.numpy as jnp

    from ..data.flow_io import write_flo
    from ..data.raft_datasets import _load_image
    from ..models.raft.utils import InputPadder, forward_interpolate

    flow_fn = _make_flow_fn(model, variables, iters)
    for dstype in ("clean", "final"):
        img_root = os.path.join(root, "test", dstype)
        scenes = sorted(os.listdir(img_root)) if os.path.isdir(img_root) else []
        for scene in scenes:
            frames = sorted(glob(os.path.join(img_root, scene, "*.png")))
            flow_prev = None
            for i, (f1, f2) in enumerate(zip(frames[:-1], frames[1:])):
                img1 = _load_image(f1)
                img2 = _load_image(f2)
                padder = InputPadder(img1.shape[:2], mode="sintel")
                i1, i2 = padder.pad(jnp.asarray(img1[None], jnp.float32),
                                    jnp.asarray(img2[None], jnp.float32))
                init = (jnp.zeros((1, i1.shape[1] // 8, i1.shape[2] // 8, 2),
                                  jnp.float32)
                        if flow_prev is None else jnp.asarray(flow_prev[None]))
                flow_low, flow_up = flow_fn(i1, i2, init)
                flow = np.asarray(padder.unpad(flow_up[0]))
                if warm_start:
                    flow_prev = forward_interpolate(np.asarray(flow_low[0]))
                out_scene = os.path.join(out_dir, dstype, scene)
                os.makedirs(out_scene, exist_ok=True)
                write_flo(os.path.join(out_scene, f"frame{i + 1:04d}.flo"),
                          flow)


def create_kitti_submission(model, variables, root: str, out_dir: str,
                            iters: int = 24):
    """Write KITTI-2015 test-set flow PNGs for upload (counterpart of the
    original RAFT `evaluate.create_kitti_submission`)."""
    import os
    from glob import glob

    import jax.numpy as jnp

    from ..data.flow_io import write_kitti_png
    from ..data.raft_datasets import _load_image
    from ..models.raft.utils import InputPadder

    flow_fn = _make_flow_fn(model, variables, iters)
    os.makedirs(out_dir, exist_ok=True)
    img1s = sorted(glob(os.path.join(root, "testing", "image_2", "*_10.png")))
    img2s = sorted(glob(os.path.join(root, "testing", "image_2", "*_11.png")))
    for f1, f2 in zip(img1s, img2s):
        img1 = _load_image(f1)
        img2 = _load_image(f2)
        padder = InputPadder(img1.shape[:2], mode="kitti")
        i1, i2 = padder.pad(jnp.asarray(img1[None], jnp.float32),
                            jnp.asarray(img2[None], jnp.float32))
        init = jnp.zeros((1, i1.shape[1] // 8, i1.shape[2] // 8, 2),
                         jnp.float32)
        _, flow_up = flow_fn(i1, i2, init)
        flow = np.asarray(padder.unpad(flow_up[0]))
        write_kitti_png(os.path.join(out_dir, os.path.basename(f1)), flow)


def validate_stage(model, variables, stage: str, roots: dict,
                   iters: Optional[int] = None,
                   max_samples: Optional[int] = None) -> Dict[str, float]:
    """Validation split + conventional iteration counts per benchmark."""
    from ..data.raft_datasets import flying_chairs, kitti, sintel

    if stage == "chairs":
        # held-out split (chairs_split.txt, labels == 2) like the original
        # evaluate.validate_chairs; falls back to all pairs with a warning
        # when the split file is absent
        ds = flying_chairs(roots["chairs"], split="validation")
        return validate_dataset(model, variables, ds, iters or 24,
                                mode="sintel", max_samples=max_samples)
    if stage == "sintel":
        out = {}
        for dstype in ("clean", "final"):
            ds = sintel(roots["sintel"], split="training", dstype=dstype)
            m = validate_dataset(model, variables, ds, iters or 32,
                                 mode="sintel", max_samples=max_samples)
            out.update({f"{dstype}_{k}": v for k, v in m.items()})
        return out
    if stage == "kitti":
        ds = kitti(roots["kitti"], split="training")
        return validate_dataset(model, variables, ds, iters or 24,
                                mode="kitti", sparse=True,
                                max_samples=max_samples)
    raise NotImplementedError(stage)
