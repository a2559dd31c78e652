"""Debug visualization: flow fields, crop geometry, warped grids, masks.

Compact counterpart of the reference's debug tooling
(`contrast/debug_utils.py`, `contrast/flow/utils/flow_viz.py`): everything
needed to eyeball the pipeline's geometry — crop rectangles on the original
frames, the 7x7 bin-center points before/after flow warping, positive-pair
lines between views, Baker-et-al flow-color renders, and cycle-mask
overlays. Enabled by `--debug` in the pretrain driver."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image, ImageDraw


# --------------------------------------------------------------------------
# optical-flow color wheel (Baker et al., "A Database and Evaluation
# Methodology for Optical Flow")
# --------------------------------------------------------------------------

def make_colorwheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3), np.float32)
    col = 0
    for n, (a, b, ramp_up) in (
        (RY, (0, 1, True),) , (YG, (1, 0, False)), (GC, (1, 2, True)),
        (CB, (2, 1, False)), (BM, (2, 0, True)), (MR, (0, 2, False)),
    ):
        wheel[col:col + n, a] = 255
        ramp = np.floor(255 * np.arange(n) / n)
        wheel[col:col + n, b] = ramp if ramp_up else 255 - ramp
        col += n
    return wheel


_WHEEL = make_colorwheel()


def flow_to_image(flow: np.ndarray, clip: Optional[float] = None) -> np.ndarray:
    """flow [H, W, 2] -> RGB uint8 [H, W, 3]."""
    u, v = np.asarray(flow[..., 0], np.float32), np.asarray(flow[..., 1], np.float32)
    if clip is not None:
        u, v = np.clip(u, -clip, clip), np.clip(v, -clip, clip)
    rad = np.sqrt(u * u + v * v)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = rad / rad_max

    n = len(_WHEEL)
    angle = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    fk = (angle + 1) / 2 * (n - 1)
    k0 = np.floor(fk).astype(int) % n
    k1 = (k0 + 1) % n
    f = fk - np.floor(fk)

    img = np.zeros(u.shape + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = 1 - rad * (1 - col)  # saturate with magnitude
        img[..., c] = np.floor(255 * col)
    return img


# --------------------------------------------------------------------------
# geometry renders
# --------------------------------------------------------------------------

def draw_crop_rect(img: np.ndarray, coord: np.ndarray,
                   color=(255, 0, 0)) -> Image.Image:
    """Draw the crop rectangle encoded in a 10-vector coord on the original
    frame (reference `debug_utils.draw_rects`)."""
    pil = Image.fromarray(np.asarray(img, np.uint8))
    d = ImageDraw.Draw(pil)
    j, i, w, h = coord[4:8]
    d.rectangle([j, i, j + w - 1, i + h - 1], outline=color, width=2)
    return pil


def draw_points(img: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                color=(0, 255, 0), radius: int = 2) -> Image.Image:
    """Scatter bin-center points (original-image pixel coords) on a frame
    (reference `debug_utils.draw_points*`)."""
    pil = img if isinstance(img, Image.Image) else Image.fromarray(
        np.asarray(img, np.uint8))
    d = ImageDraw.Draw(pil)
    for x, y in zip(np.asarray(xs).ravel(), np.asarray(ys).ravel()):
        d.ellipse([x - radius, y - radius, x + radius, y + radius], fill=color)
    return pil


def draw_positive_pairs(img1: np.ndarray, img2: np.ndarray,
                        q_x, q_y, k_x, k_y, pos_mask,
                        max_lines: int = 200) -> Image.Image:
    """Side-by-side views with lines joining positive bin pairs (reference
    `debug_utils.draw_point_positive_pair`)."""
    im1 = Image.fromarray(np.asarray(img1, np.uint8))
    im2 = Image.fromarray(np.asarray(img2, np.uint8))
    w1, h = im1.size[0], max(im1.size[1], im2.size[1])
    canvas = Image.new("RGB", (w1 + im2.size[0], h))
    canvas.paste(im1, (0, 0))
    canvas.paste(im2, (w1, 0))
    d = ImageDraw.Draw(canvas)
    qx, qy = np.asarray(q_x).ravel(), np.asarray(q_y).ravel()
    kx, ky = np.asarray(k_x).ravel(), np.asarray(k_y).ravel()
    pairs = np.argwhere(np.asarray(pos_mask))
    for n, (i, j) in enumerate(pairs):
        if n >= max_lines:
            break
        d.line([qx[i], qy[i], kx[j] + w1, ky[j]], fill=(255, 200, 0), width=1)
    return canvas


def warp_image(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Backward-warp an image by a pixel-unit flow (reference
    `debug_utils.warp`). img [H, W, C] uint8, flow [H, W, 2] at image res."""
    import jax.numpy as jnp
    from ..ops.resample import grid_sample, coords_grid, normalize_coords

    h, w = img.shape[:2]
    coords = coords_grid(h, w) + jnp.asarray(flow)
    grid = normalize_coords(coords, h, w)[None]
    out = grid_sample(jnp.asarray(img, jnp.float32)[None], grid)[0]
    return np.clip(np.round(np.asarray(out)), 0, 255).astype(np.uint8)


def mask_to_image(mask: np.ndarray) -> np.ndarray:
    """bool [H, W] -> grayscale uint8 (white = trusted)."""
    return (np.asarray(mask).astype(np.uint8) * 255)


def _frame_canvas(batch, s: int, view: int) -> np.ndarray:
    """Pick a raster to draw on for sample s: the raw video frame when the
    loader shipped them (first frame for view 1, last for view 2), else a
    dark canvas of the original-image size from the coord vector."""
    if "frames" in batch:
        frames = np.asarray(batch["frames"][s])
        return frames[0] if view == 1 else frames[-1]
    coord = np.asarray(batch["coord1"][s])
    w, h = int(coord[8]), int(coord[9])
    return np.full((h, w, 3), 32, np.uint8)


def _scale_pts(xs, ys, coord, frame_hw):
    """Map original-image pixel coords onto a (possibly resized) raster."""
    sw = frame_hw[1] / float(coord[8])
    sh = frame_hw[0] / float(coord[9])
    return np.asarray(xs) * sw, np.asarray(ys) * sh


def save_debug_bundle(out_dir: str, step: int, batch, flow_fwd=None,
                      mask_fwd=None, max_samples: int = 2,
                      feat_hw=(7, 7), pos_ratio: float = 0.7):
    """Dump the standard debug set for a batch: crop rects, flow renders,
    cycle masks, and the in-loss pair geometry — bin-center grids before and
    after the flow warp plus positive-pair lines, exactly what the loss saw
    (reference `debug_utils.py:422-719` hooks inside `PixPro.py:99-104`;
    renders land under output/test_imgs/...)."""
    os.makedirs(out_dir, exist_ok=True)
    coords1 = np.asarray(batch["coord1"])
    n_render = min(max_samples, len(coords1))
    for s in range(n_render):
        if "frames" in batch:
            frame = np.asarray(batch["frames"][s, 0])
            draw_crop_rect(frame, coords1[s]).save(
                os.path.join(out_dir, f"step{step}_s{s}_crop.png"))
        if flow_fwd is not None:
            Image.fromarray(flow_to_image(np.asarray(flow_fwd[s]))).save(
                os.path.join(out_dir, f"step{step}_s{s}_flow.png"))
        if mask_fwd is not None:
            Image.fromarray(mask_to_image(np.asarray(mask_fwd[s]))).save(
                os.path.join(out_dir, f"step{step}_s{s}_mask.png"))

    if "coord2" not in batch:
        return
    import jax.numpy as jnp
    from ..ops.loss import pair_loss_geometry

    coords2 = np.asarray(batch["coord2"])
    geom = pair_loss_geometry(
        jnp.asarray(coords1[:n_render]), jnp.asarray(coords2[:n_render]),
        tuple(feat_hw), pos_ratio,
        flow=None if flow_fwd is None else jnp.asarray(
            np.asarray(flow_fwd[:n_render], np.float32)),
        flow_mask=None if mask_fwd is None else jnp.asarray(
            np.asarray(mask_fwd[:n_render])))
    geom = {k: (None if v is None else np.asarray(v)) for k, v in geom.items()}

    for s in range(n_render):
        f1 = _frame_canvas(batch, s, view=1)
        f2 = _frame_canvas(batch, s, view=2)
        qx0, qy0 = _scale_pts(geom["q_x_pre"][s], geom["q_y_pre"][s],
                              coords1[s], f1.shape[:2])
        qx1, qy1 = _scale_pts(geom["q_x"][s], geom["q_y"][s],
                              coords1[s], f2.shape[:2])
        kx, ky = _scale_pts(geom["k_x"][s], geom["k_y"][s],
                            coords2[s], f2.shape[:2])
        # pre-warp: view-1 grid (green) on the source frame, target grid
        # (red) on the target frame — reference draw_points two-color render
        draw_points(draw_crop_rect(f1, coords1[s]), qx0, qy0,
                    color=(0, 255, 0)).save(
            os.path.join(out_dir, f"step{step}_s{s}_grid_prewarp.png"))
        # post-warp: flow-advected view-1 grid overlaid with the target grid
        # on the target frame (both now live in the same frame)
        img2 = draw_points(draw_crop_rect(f2, coords2[s], color=(0, 0, 255)),
                           kx, ky, color=(255, 0, 0))
        draw_points(img2, qx1, qy1, color=(0, 255, 0)).save(
            os.path.join(out_dir, f"step{step}_s{s}_grid_postwarp.png"))
        # positive pairs: lines between warped q centers and their matched
        # k centers (reference draw_point_positive_pair)
        draw_positive_pairs(f1, f2, qx0, qy0, kx, ky, geom["pos"][s]).save(
            os.path.join(out_dir, f"step{step}_s{s}_pairs.png"))
