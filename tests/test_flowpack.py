"""flowpack native reader tests (builds the C++ library with the in-image
toolchain)."""

import os
import shutil

import numpy as np
import pytest

from pixflow_tpu.data.flowpack import (FlowPackReader, write_flowpack,
                                       pack_flow_dir, _load_lib)

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    d = tmp_path_factory.mktemp("fpk")
    videos = {f"video{i:03d}": (10 * RNG.standard_normal(
        (5 + i, 9, 16, 2))).astype(np.float32) for i in range(6)}
    path = str(d / "train_forward.fpk")
    write_flowpack(path, videos.items(), dtype="float32")
    return path, videos


def test_reader_roundtrip_full(pack):
    path, videos = pack
    r = FlowPackReader(path)
    assert len(r) == 6
    assert (r.h, r.w) == (9, 16)
    for name, flows in videos.items():
        got = r.read(name, 0, flows.shape[0])
        np.testing.assert_array_equal(got, flows)


def test_reader_slices(pack):
    path, videos = pack
    r = FlowPackReader(path)
    flows = videos["video003"]
    np.testing.assert_array_equal(r.read("video003", 2, 3), flows[2:5])
    assert r.num_flows(r.find("video003")) == flows.shape[0]


def test_reader_errors(pack):
    path, _ = pack
    r = FlowPackReader(path)
    with pytest.raises(KeyError):
        r.read("nope", 0, 1)
    with pytest.raises(IndexError):
        r.read("video000", 3, 100)


def test_f16_pack_roundtrip(tmp_path):
    flows = (50 * RNG.standard_normal((4, 6, 8, 2))).astype(np.float32)
    path = str(tmp_path / "half.fpk")
    write_flowpack(path, [("v", flows)], dtype="float16")
    r = FlowPackReader(path)
    got = r.read("v", 0, 4)
    # the stored dtype comes back verbatim (no eager f32 upcast: the
    # default pipeline ships f16 to the device, datasets.py:342)
    assert got.dtype == np.float16
    np.testing.assert_allclose(got.astype(np.float32), flows,
                               rtol=1e-3, atol=0.05)
    # f16 shard is about half the size of an f32 one
    path32 = str(tmp_path / "full.fpk")
    write_flowpack(path32, [("v", flows)], dtype="float32")
    assert os.path.getsize(path) < 0.6 * os.path.getsize(path32)


def test_pack_flow_dir_and_dataset_integration(tmp_path):
    import torch
    from PIL import Image
    from pixflow_tpu.data import VideoFrameDataset, get_transform

    # per-video .pth files -> pack
    for d in ("forward", "backward"):
        (tmp_path / "pth" / d).mkdir(parents=True)
    (tmp_path / "train").mkdir()
    for v in range(3):
        vd = tmp_path / "train" / f"vid{v}"
        vd.mkdir()
        for f in range(4):
            Image.fromarray(RNG.integers(0, 255, (24, 32, 3)).astype(
                np.uint8)).save(vd / f"f{f:03d}.jpg")
        for d in ("forward", "backward"):
            torch.save(torch.arange(3 * 2 * 3 * 4, dtype=torch.float32)
                       .reshape(3, 2, 3, 4) + v,
                       tmp_path / "pth" / d / f"vid{v}.pth")
    fwd_pack = str(tmp_path / "fwd.fpk")
    bwd_pack = str(tmp_path / "bwd.fpk")
    pack_flow_dir(str(tmp_path / "pth" / "forward"), fwd_pack, "float32")
    pack_flow_dir(str(tmp_path / "pth" / "backward"), bwd_pack, "float32")

    from pixflow_tpu.data import list_image_folder
    videos = list_image_folder(str(tmp_path / "train"), "bdd100k")
    ds = VideoFrameDataset(
        samples=videos, transform=get_transform("NULL", 0.5, 16),
        n_frames=3, two_crop=True,
        flow_fwd_root=fwd_pack, flow_bwd_root=bwd_pack)
    import random
    s = ds.__getitem__(1, random.Random(0))
    assert s["flows_fwd"].shape == (2, 3, 4, 2)
    # values must match the direct .pth slice
    from pixflow_tpu.data.datasets import load_flow_file, mirrored_window
    full, num = load_flow_file(str(tmp_path / "pth" / "forward" / "vid1.pth"),
                               0, 3)
    start = int(np.where(np.all(full.reshape(3, -1)
                                == s["flows_fwd"][0].reshape(-1),
                                axis=1))[0][0])
    np.testing.assert_array_equal(s["flows_fwd"], full[start:start + 2])


def test_sharded_pack_and_multi_reader(tmp_path, pack):
    """pack_flow_dir(n_shards>1) + MultiPackReader: same data, same
    interface as the single-shard reader."""
    from pixflow_tpu.data.flowpack import MultiPackReader, open_flow_source
    _, videos = pack
    src = tmp_path / "flows"
    src.mkdir()
    for name, flows in videos.items():
        np.save(str(src / f"{name}.npy"), flows)
    out = str(tmp_path / "packs")
    pack_flow_dir(str(src), out, dtype="float32", n_shards=3)
    assert len(os.listdir(out)) == 3

    r = open_flow_source(out)
    assert isinstance(r, MultiPackReader)
    assert len(r) == len(videos)
    for name, flows in videos.items():
        h = r.find(name)
        assert h >= 0
        assert r.num_flows(h) == flows.shape[0]
        np.testing.assert_array_equal(r.read(name, 1, 3), flows[1:4])
    assert r.find("nope") < 0
    # miss sentinel must fail loudly, not index a shard with -1
    with pytest.raises(KeyError):
        r.num_flows(r.find("nope"))
    with pytest.raises(KeyError):
        r.read(r.find("nope"), 0, 1)
    with pytest.raises(KeyError):
        r.read("nope", 0, 1)
