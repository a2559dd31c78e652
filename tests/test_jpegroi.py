"""Native ROI JPEG decoder tests (builds native/libjpegroi.so)."""

import os
import random
import shutil

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

RNG = np.random.default_rng(17)


def _smooth_frame(h, w):
    small = RNG.integers(0, 255, (h // 16, w // 16, 3), np.uint8)
    return np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR))


@pytest.fixture(scope="module")
def jpeg_bytes(tmp_path_factory):
    d = tmp_path_factory.mktemp("roi")
    p = str(d / "f.jpg")
    Image.fromarray(_smooth_frame(720, 1280)).save(p, quality=92)
    return open(p, "rb").read()


def test_header_size(jpeg_bytes):
    from pixflow_tpu.data.jpegroi import jpeg_size
    assert jpeg_size(jpeg_bytes) == (1280, 720)
    with pytest.raises(ValueError):
        jpeg_size(b"not a jpeg at all")


def test_decode_crop_resize_matches_pil(jpeg_bytes):
    """max_denom=1 (full-fidelity band decode) reproduces PIL's
    crop+BILINEAR resize exactly up to PIL's fixed-point coefficient
    rounding (|diff| <= 1 count): the decoded band carries the filter's
    support margin, so out-of-box source pixels match PIL's too."""
    import io

    from pixflow_tpu.data.jpegroi import decode_crop_resize
    pil = Image.open(io.BytesIO(jpeg_bytes)).convert("RGB")
    for box in [(100, 50, 600, 400), (0, 0, 1280, 720), (900, 300, 380, 256),
                (13, 7, 223, 223)]:
        x, y, w, h = box
        ref = np.asarray(pil.resize((224, 224), Image.BILINEAR,
                                    box=(x, y, x + w, y + h)), np.int16)
        got = decode_crop_resize(jpeg_bytes, box, (224, 224),
                                 max_denom=1).astype(np.int16)
        mad = np.abs(got - ref).mean()
        assert mad < 0.3 and np.abs(got - ref).max() <= 1, (box, mad)

    # DCT-scaled decode stays visually equivalent on smooth content
    got = decode_crop_resize(jpeg_bytes, (100, 50, 600, 400), (224, 224),
                             max_denom=8).astype(np.int16)
    ref = np.asarray(pil.resize((224, 224), Image.BILINEAR,
                                box=(100, 50, 700, 450)), np.int16)
    assert np.abs(got - ref).mean() < 8.0


def test_upscale_crop(jpeg_bytes):
    """Crops smaller than the target upscale (support clamps at 1)."""
    from pixflow_tpu.data.jpegroi import decode_crop_resize
    out = decode_crop_resize(jpeg_bytes, (40, 40, 100, 80), (224, 224))
    assert out.shape == (224, 224, 3)
    assert out.std() > 0


def test_bad_box_rejected(jpeg_bytes):
    from pixflow_tpu.data.jpegroi import decode_crop_resize
    with pytest.raises(ValueError):
        decode_crop_resize(jpeg_bytes, (1200, 0, 400, 100), (32, 32))


def test_dataset_native_decode_same_coords(tmp_path):
    """native_decode=True consumes the identical rng stream: coordinates are
    bit-identical to the PIL path, pixels near-identical."""
    from pixflow_tpu.data.datasets import VideoFrameDataset, list_image_folder
    from pixflow_tpu.data.transforms import get_transform

    train = tmp_path / "train"
    for v in range(2):
        d = train / f"video{v:03d}"
        d.mkdir(parents=True)
        for f in range(3):
            Image.fromarray(_smooth_frame(360, 640)).save(
                str(d / f"frame{f:04d}.jpg"), quality=92)

    t = get_transform("NULL", 0.2, image_size=64, emit_uint8=True)
    videos = list_image_folder(str(train), "bdd100k")
    ds_pil = VideoFrameDataset(samples=videos, transform=t, n_frames=2,
                               two_crop=True)
    ds_nat = VideoFrameDataset(samples=videos, transform=t, n_frames=2,
                               two_crop=True, native_decode=True)
    for i in range(2):
        a = ds_pil.__getitem__(i, random.Random(7 + i))
        b = ds_nat.__getitem__(i, random.Random(7 + i))
        np.testing.assert_array_equal(a["coord1"], b["coord1"])
        np.testing.assert_array_equal(a["coord2"], b["coord2"])
        assert a["im1"].dtype == np.uint8 and b["im1"].dtype == np.uint8
        diff = np.abs(a["im1"].astype(np.int16) - b["im1"].astype(np.int16))
        assert diff.mean() < 4.0, diff.mean()  # uint8 units


def test_native_decode_with_process_workers(tmp_path):
    """Forked decode workers + the native ROI decoder (ctypes lib handle
    inherited through fork) produce the same batches as thread workers."""
    from pixflow_tpu.data.datasets import VideoFrameDataset, list_image_folder
    from pixflow_tpu.data.loader import ShardedLoader
    from pixflow_tpu.data.transforms import get_transform

    train = tmp_path / "train"
    for v in range(4):
        d = train / f"video{v:03d}"
        d.mkdir(parents=True)
        for f in range(2):
            Image.fromarray(_smooth_frame(90, 160)).save(
                str(d / f"frame{f:04d}.jpg"), quality=92)

    t = get_transform("NULL", 0.2, image_size=32, emit_uint8=True)
    ds = VideoFrameDataset(samples=list_image_folder(str(train), "bdd100k"),
                           transform=t, n_frames=2, two_crop=True,
                           native_decode=True)
    lt = ShardedLoader(ds, 4, seed=2, num_threads=2, worker_mode="thread")
    lp = ShardedLoader(ds, 4, seed=2, num_threads=2, worker_mode="process")
    try:
        for bt, bp in zip(lt.epoch(0), lp.epoch(0)):
            for k in bt:
                np.testing.assert_array_equal(bt[k], bp[k])
    finally:
        lp.close()
