"""Optical-flow file formats: Middlebury .flo, PFM, KITTI 16-bit PNG.

Capability of reference `contrast/flow/utils/frame_utils.py` (readers/writers
used by RAFT's training datasets). Pure NumPy/PIL."""

from __future__ import annotations

import os
import re

import numpy as np

_FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> [H, W, 2] float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, 1)[0]
        if magic != _FLO_MAGIC:
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, 1)[0])
        h = int(np.fromfile(f, np.int32, 1)[0])
        data = np.fromfile(f, np.float32, 2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([_FLO_MAGIC], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str):
    """PFM -> (data [H, W] or [H, W, 3] float32, scale)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        color = header == b"PF"
        if header not in (b"PF", b"Pf"):
            raise ValueError("not a PFM file")
        dims = f.readline().decode("ascii")
        m = re.match(r"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError("malformed PFM header")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)), abs(scale)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.asarray(image, np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(image).tofile(f)


def read_kitti_png(path: str):
    """KITTI 16-bit flow PNG -> (flow [H, W, 2], valid [H, W])."""
    import cv2
    arr = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    arr = arr[..., ::-1].astype(np.float32)  # BGR -> RGB = (u, v, valid)
    flow = (arr[..., :2] - 2 ** 15) / 64.0
    valid = arr[..., 2] > 0
    return flow, valid


def write_kitti_png(path: str, flow: np.ndarray, valid=None) -> None:
    import cv2
    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3), np.uint16)
    out[..., :2] = (np.asarray(flow, np.float64) * 64.0 + 2 ** 15).astype(np.uint16)
    out[..., 2] = 1 if valid is None else np.asarray(valid, np.uint16)
    cv2.imwrite(path, out[..., ::-1])  # store as BGR so readback is RGB


def read_flow_auto(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[-1].lower()
    if ext == ".flo":
        return read_flo(path)
    if ext == ".pfm":
        return read_pfm(path)[0][..., :2]
    if ext == ".png":
        return read_kitti_png(path)[0]
    if ext == ".npy":
        return np.load(path)
    raise NotImplementedError(ext)
