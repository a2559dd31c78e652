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


def test_restart_transcode_lossless(jpeg_bytes):
    """The coefficient-domain restart transcode is pixel-lossless and makes
    the stream splice-compatible (restart_rows > 0)."""
    import io

    from pixflow_tpu.data.jpegroi import restart_rows, transcode_restart
    assert restart_rows(jpeg_bytes) == 0
    rst = transcode_restart(jpeg_bytes)
    assert restart_rows(rst) == 1
    a = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(rst)).convert("RGB"))
    np.testing.assert_array_equal(a, b)
    # modest size cost for row-level random access
    assert len(rst) < len(jpeg_bytes) * 1.05


def test_restart_splice_bit_exact(jpeg_bytes):
    """Crop decodes from a restart-transcoded stream take the splice fast
    path and are BIT-IDENTICAL to the plain band decode, across crop
    positions, sizes, and both max_denom settings."""
    from pixflow_tpu.data.jpegroi import (decode_crop_resize, splice_used,
                                          transcode_restart)
    rst = transcode_restart(jpeg_bytes)
    rng = np.random.default_rng(3)
    boxes = [(100, 50, 600, 400), (0, 0, 1280, 720), (900, 300, 380, 256),
             (13, 7, 223, 223), (0, 490, 224, 224), (600, 0, 224, 224)]
    for _ in range(10):
        x = int(rng.integers(0, 1280 - 300))
        y = int(rng.integers(0, 720 - 300))
        boxes.append((x, y, int(rng.integers(64, 300)),
                      int(rng.integers(64, 300))))
    n_spliced = 0
    for box in boxes:
        for denom in (1, 8):
            plain = decode_crop_resize(jpeg_bytes, box, (224, 224),
                                       max_denom=denom)
            assert not splice_used()  # no DRI: fast path unavailable
            fast = decode_crop_resize(rst, box, (224, 224), max_denom=denom)
            n_spliced += splice_used()
            np.testing.assert_array_equal(plain, fast, err_msg=str(box))
    # every partial-height crop must actually take the fast path
    assert n_spliced >= 2 * (len(boxes) - 1)


def test_restart_splice_corrupt_stream_falls_back(jpeg_bytes):
    """A damaged restart stream (truncated entropy data) still decodes via
    the plain-path fallback rather than erroring."""
    from pixflow_tpu.data.jpegroi import transcode_restart
    rst = bytearray(transcode_restart(jpeg_bytes))
    # overwrite a late RST marker with junk: splice seek fails mid-stream
    for i in range(len(rst) - 2, 2, -1):
        if rst[i] == 0xFF and 0xD0 <= rst[i + 1] <= 0xD7:
            rst[i + 1] = 0xC5  # not a valid in-entropy marker
            break
    from pixflow_tpu.data.jpegroi import decode_crop_resize
    out = decode_crop_resize(bytes(rst), (100, 600, 224, 100), (64, 64))
    assert out.shape == (64, 64, 3)


def test_dataset_restart_transcode_cache(tmp_path):
    """restart_transcode=True at init_cache time yields byte-cached streams
    that decode to identical samples (same rng stream, same pixels)."""
    import random

    from pixflow_tpu.data.datasets import VideoFrameDataset, list_image_folder
    from pixflow_tpu.data.jpegroi import restart_rows
    from pixflow_tpu.data.transforms import get_transform

    train = tmp_path / "train"
    for v in range(2):
        d = train / f"video{v:03d}"
        d.mkdir(parents=True)
        for f in range(2):
            Image.fromarray(_smooth_frame(360, 640)).save(
                str(d / f"frame{f:04d}.jpg"), quality=92)

    t = get_transform("NULL", 0.2, image_size=64, emit_uint8=True)
    videos = list_image_folder(str(train), "bdd100k")
    ds_a = VideoFrameDataset(samples=videos, transform=t, n_frames=2,
                             two_crop=True, native_decode=True)
    ds_b = VideoFrameDataset(samples=videos, transform=t, n_frames=2,
                             two_crop=True, native_decode=True,
                             restart_transcode=True)
    ds_a.init_cache("full")
    ds_b.init_cache("full")
    assert all(restart_rows(v) == 0 for v in ds_a._byte_cache.values())
    assert all(restart_rows(v) == 1 for v in ds_b._byte_cache.values())
    for i in range(2):
        a = ds_a.__getitem__(i, random.Random(11 + i))
        b = ds_b.__getitem__(i, random.Random(11 + i))
        np.testing.assert_array_equal(a["coord1"], b["coord1"])
        np.testing.assert_array_equal(a["im1"], b["im1"])
        np.testing.assert_array_equal(a["im2"], b["im2"])


def test_transcode_restart_tool(tmp_path):
    """tools/transcode_restart.py transcodes a tree in place; decodes are
    unchanged."""
    import subprocess
    import sys

    from pixflow_tpu.data.jpegroi import restart_rows

    d = tmp_path / "corpus" / "video000"
    d.mkdir(parents=True)
    frames = [_smooth_frame(180, 320) for _ in range(3)]
    for i, fr in enumerate(frames):
        Image.fromarray(fr).save(str(d / f"frame{i:04d}.jpg"), quality=90)
    before = {p.name: np.asarray(Image.open(str(p)).convert("RGB"))
              for p in d.iterdir()}
    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "transcode_restart.py")
    subprocess.run([sys.executable, tool, str(tmp_path / "corpus"),
                    "--workers", "1"], check=True, capture_output=True)
    for p in sorted(d.iterdir()):
        assert restart_rows(open(str(p), "rb").read()) == 1, p.name
        after = np.asarray(Image.open(str(p)).convert("RGB"))
        np.testing.assert_array_equal(before[p.name], after)


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
