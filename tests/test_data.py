"""Data pipeline tests over a synthetic BDD100k-shaped dataset."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from pixflow_tpu.data import (
    get_transform, VideoFrameDataset, list_image_folder, ShardedLoader,
)
from pixflow_tpu.data.datasets import mirrored_window, frame_stats, load_flow_file
from pixflow_tpu.data.transforms import (
    IMAGENET_MEAN, IMAGENET_STD, RandomResizedCropCoord,
)

N_VIDEOS, N_FRAMES_PER_VIDEO = 4, 8
FRAME_H, FRAME_W = 64, 80


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bdd")
    train = root / "train"
    rng = np.random.default_rng(0)
    for v in range(N_VIDEOS):
        vd = train / f"video{v:03d}"
        vd.mkdir(parents=True)
        for f in range(N_FRAMES_PER_VIDEO):
            arr = rng.integers(0, 255, (FRAME_H, FRAME_W, 3), np.uint8)
            Image.fromarray(arr).save(vd / f"frame{f:04d}.jpg")
    # flow files: [num_flow, 2, h/8, w/8] torch tensors
    import torch
    for d in ("forward", "backward"):
        (root / "flow" / "pth" / "train" / d).mkdir(parents=True)
    for v in range(N_VIDEOS):
        for d in ("forward", "backward"):
            flow = torch.arange(
                (N_FRAMES_PER_VIDEO - 1) * 2 * 8 * 10, dtype=torch.float32
            ).reshape(N_FRAMES_PER_VIDEO - 1, 2, 8, 10)
            torch.save(flow, root / "flow" / "pth" / "train" / d / f"video{v:03d}.pth")
    return str(root)


def test_list_image_folder_video_mode(synth_root):
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    assert len(videos) == N_VIDEOS
    assert len(videos[0]) == N_FRAMES_PER_VIDEO
    # frames sorted within each video
    names = [os.path.basename(p) for p, _ in videos[0]]
    assert names == sorted(names)


def test_crop_coord_contract():
    t = RandomResizedCropCoord(32, scale=(0.2, 1.0))
    img = Image.new("RGB", (FRAME_W, FRAME_H))
    rng = random.Random(0)
    out, coord = t(img, rng)
    assert out.size == (32, 32)
    j, i, w, h, W, H = coord[4:]
    assert W == FRAME_W and H == FRAME_H
    np.testing.assert_allclose(coord[0], j / (W - 1), rtol=1e-6)
    np.testing.assert_allclose(coord[2], (j + w - 1) / (W - 1), rtol=1e-6)
    assert 0 <= coord[0] < coord[2] <= 1.0


def test_hflip_swaps_x_extent():
    from pixflow_tpu.data.transforms import RandomHorizontalFlipCoord
    f = RandomHorizontalFlipCoord(p=1.0)
    img = Image.new("RGB", (16, 16))
    coord = np.array([0.1, 0.2, 0.6, 0.7, 0, 0, 0, 0, 16, 16], np.float32)
    _, c = f(img, coord, random.Random(0))
    assert c[0] == np.float32(0.6) and c[2] == np.float32(0.1)
    assert c[1] == np.float32(0.2)  # y untouched


def test_byol_transform_pair_outputs(synth_root):
    t1, t2 = get_transform("BYOL", 0.2, image_size=32)
    img = Image.open(os.path.join(synth_root, "train", "video000",
                                  "frame0000.jpg")).convert("RGB")
    rng = random.Random(0)
    a1, c1 = t1(img, rng)
    a2, c2 = t2(img, rng)
    assert a1.shape == (32, 32, 3) and a1.dtype == np.float32
    assert c1.shape == (10,)
    # normalized: a plain gray image would sit near -mean/std
    assert np.abs(a1).max() < 5.0


@pytest.mark.parametrize("aug", ["NULL", "InstDisc", "MoCov2", "SimCLR",
                                 "RandAug"])
def test_all_aug_recipes_run(aug, synth_root):
    t = get_transform(aug, 0.2, image_size=32)
    img = Image.open(os.path.join(synth_root, "train", "video000",
                                  "frame0000.jpg")).convert("RGB")
    arr, coord = t(img, random.Random(1))
    assert arr.shape == (32, 32, 3)
    assert coord is not None


def test_val_transform():
    t = get_transform("val", 0.2, image_size=32)
    img = Image.new("RGB", (100, 60))
    arr, coord = t(img)
    assert arr.shape == (32, 32, 3)
    assert coord is None


def test_mirrored_window():
    # reference `calc_bwd_idx`: bwd_n = num - s; bwd_s = bwd_n - span
    assert mirrored_window(0, 5, 7) == (2, 7)
    assert mirrored_window(2, 3, 7) == (4, 5)


def test_video_dataset_flow_slices(synth_root):
    t = get_transform("BYOL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(
        samples=videos, transform=t, n_frames=6, two_crop=True,
        flow_fwd_root=os.path.join(synth_root, "flow/pth/train/forward"),
        flow_bwd_root=os.path.join(synth_root, "flow/pth/train/backward"))
    s = ds.__getitem__(0, random.Random(3))
    assert s["im1"].shape == (32, 32, 3)
    assert s["flows_fwd"].shape == (5, 8, 10, 2)
    assert s["flows_bwd"].shape == (5, 8, 10, 2)
    assert int(s["n_frames_eff"]) == 6
    # flow slice content: fwd window [start, start+5) of the arange tensor
    fwd_full, num = load_flow_file(
        os.path.join(synth_root, "flow/pth/train/forward/video000.pth"), 0, 7)
    assert num == 7
    start = int(np.where(
        np.all(fwd_full.reshape(7, -1) == s["flows_fwd"][0].reshape(-1), axis=1))[0][0])
    bs, bn = mirrored_window(start, start + 5, 7)
    bwd_full, _ = load_flow_file(
        os.path.join(synth_root, "flow/pth/train/backward/video000.pth"), bs, bn)
    np.testing.assert_array_equal(s["flows_bwd"], bwd_full)


def test_short_video_zero_pads_flows(synth_root):
    t = get_transform("BYOL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(
        samples=videos, transform=t, n_frames=12, two_crop=True,  # > 8 frames
        flow_fwd_root=os.path.join(synth_root, "flow/pth/train/forward"),
        flow_bwd_root=os.path.join(synth_root, "flow/pth/train/backward"))
    s = ds.__getitem__(1, random.Random(0))
    assert int(s["n_frames_eff"]) == N_FRAMES_PER_VIDEO
    assert s["flows_fwd"].shape == (11, 8, 10, 2)
    # entries beyond the real 7 flows are identity (zeros)
    np.testing.assert_array_equal(s["flows_fwd"][7:], 0.0)


def test_sharded_loader_partition_and_determinism(synth_root):
    t = get_transform("NULL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(samples=videos, transform=t, n_frames=1,
                           two_crop=True)
    loaders = [ShardedLoader(ds, 4, num_hosts=2, host_id=h, seed=1,
                             num_threads=1) for h in range(2)]
    seen = []
    for ld in loaders:
        for batch in ld.epoch(0):
            assert batch["im1"].shape == (2, 32, 32, 3)
            seen.extend(batch["index"].tolist())
    assert sorted(seen) == list(range(N_VIDEOS))  # disjoint cover

    # same (seed, epoch) -> identical stream
    a = [b["index"].tolist() for b in loaders[0].epoch(5)]
    b = [b["index"].tolist() for b in loaders[0].epoch(5)]
    assert a == b
    c = [b["index"].tolist() for b in loaders[0].epoch(6)]
    assert a != c or N_VIDEOS <= 2


@pytest.mark.parametrize("num_hosts", [2, 4])
def test_sharded_loader_topology_invariance(synth_root, num_hosts):
    """The global batch stream is independent of host count: concatenating
    the H hosts' local batches (in host order) reproduces the 1-host global
    batches bit-for-bit, including augmentation draws. This is what makes an
    N-process run numerically identical to a 1-process N-device run."""
    t = get_transform("BYOL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(samples=videos, transform=t, n_frames=1,
                           two_crop=True)
    single = ShardedLoader(ds, 4, num_hosts=1, host_id=0, seed=7,
                           num_threads=1)
    hosts = [ShardedLoader(ds, 4, num_hosts=num_hosts, host_id=h, seed=7,
                           num_threads=1) for h in range(num_hosts)]
    for epoch in (0, 3):
        ref = list(single.epoch(epoch))
        parts = [list(h.epoch(epoch)) for h in hosts]
        assert all(len(p) == len(ref) for p in parts)
        for bi, b_ref in enumerate(ref):
            for k in b_ref:
                glob = np.concatenate([p[bi][k] for p in parts], axis=0)
                np.testing.assert_array_equal(
                    glob, b_ref[k], err_msg=f"epoch {epoch} key {k}")


@pytest.mark.parametrize("num_hosts", [2, 4])
def test_sharded_loader_ragged_topology_invariance(synth_root, num_hosts):
    """Ragged dataset vs global batch (n=7, G=4): step count AND batch
    contents must still be topology-invariant. DistributedSampler-style
    per-rank ceil-padding would give 2 hosts a phantom extra step here
    (ceil(7/2)=4 rows/host -> 2 local batches) while 1 process does
    7//4=1 — and steps_per_epoch feeds the LR schedule."""
    t = get_transform("NULL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(samples=(videos * 2)[:7], transform=t,
                           n_frames=1, two_crop=True)
    single = ShardedLoader(ds, 4, num_hosts=1, host_id=0, seed=3,
                           num_threads=1)
    hosts = [ShardedLoader(ds, 4, num_hosts=num_hosts, host_id=h, seed=3,
                           num_threads=1) for h in range(num_hosts)]
    assert len(single) == 1 and all(len(h) == 1 for h in hosts)
    ref = list(single.epoch(0))
    parts = [list(h.epoch(0)) for h in hosts]
    assert len(ref) == 1 and all(len(p) == 1 for p in parts)
    for k in ref[0]:
        glob = np.concatenate([p[0][k] for p in parts], axis=0)
        np.testing.assert_array_equal(glob, ref[0][k], err_msg=k)

    # drop_last=False: ceil(7/4)=2 steps, final batch wrap-padded to full
    # static shape — identically across topologies
    single_nd = ShardedLoader(ds, 4, num_hosts=1, host_id=0, seed=3,
                              num_threads=1, drop_last=False)
    hosts_nd = [ShardedLoader(ds, 4, num_hosts=num_hosts, host_id=h, seed=3,
                              num_threads=1, drop_last=False)
                for h in range(num_hosts)]
    ref2 = list(single_nd.epoch(0))
    parts2 = [list(h.epoch(0)) for h in hosts_nd]
    assert len(ref2) == 2 and all(len(p) == 2 for p in parts2)
    assert ref2[1]["im1"].shape[0] == 4  # padded to full global batch
    for bi in range(2):
        for k in ref2[bi]:
            glob = np.concatenate([p[bi][k] for p in parts2], axis=0)
            np.testing.assert_array_equal(glob, ref2[bi][k], err_msg=k)

    # pad larger than the dataset (n=3 < G=8): the wrap tiles the order,
    # still yielding one full static batch on every topology
    tiny = VideoFrameDataset(samples=videos[:3], transform=t,
                             n_frames=1, two_crop=True)
    for hosts_n in (1, 2):
        for h in range(hosts_n):
            ld = ShardedLoader(tiny, 8, num_hosts=hosts_n, host_id=h,
                               seed=3, num_threads=1, drop_last=False)
            (batch,) = list(ld.epoch(0))
            assert batch["im1"].shape[0] == 8 // hosts_n


def test_process_workers_match_thread_workers(synth_root):
    """worker_mode='process' (forked decode workers) yields bit-identical
    batches to the thread pool — same per-index RNG stream."""
    t = get_transform("BYOL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(samples=videos, transform=t, n_frames=1,
                           two_crop=True)
    lt = ShardedLoader(ds, 4, seed=3, num_threads=2, worker_mode="thread")
    lp = ShardedLoader(ds, 4, seed=3, num_threads=2, worker_mode="process")
    try:
        for bt, bp in zip(lt.epoch(2), lp.epoch(2)):
            assert sorted(bt.keys()) == sorted(bp.keys())
            for k in bt:
                np.testing.assert_array_equal(bt[k], bp[k])
    finally:
        lp.close()


def test_process_workers_propagate_errors(synth_root):
    t = get_transform("NULL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(samples=videos, transform=t, n_frames=3,
                           two_crop=True,
                           flow_fwd_root="/nonexistent/fwd",
                           flow_bwd_root="/nonexistent/bwd")
    loader = ShardedLoader(ds, 4, num_threads=2, prefetch=1,
                           worker_mode="process")
    try:
        with pytest.raises(FileNotFoundError):
            for _ in loader.epoch(0):
                pass
    finally:
        loader.close()


def test_loader_propagates_worker_errors(synth_root):
    """A failing sample fetch must raise in the consumer, not hang."""
    t = get_transform("NULL", 0.2, image_size=32)
    videos = list_image_folder(os.path.join(synth_root, "train"), "bdd100k")
    ds = VideoFrameDataset(samples=videos, transform=t, n_frames=1,
                           two_crop=True,
                           flow_fwd_root="/nonexistent/fwd",
                           flow_bwd_root="/nonexistent/bwd")
    ds2 = VideoFrameDataset(samples=videos, transform=t, n_frames=3,
                            two_crop=True,
                            flow_fwd_root="/nonexistent/fwd",
                            flow_bwd_root="/nonexistent/bwd")
    loader = ShardedLoader(ds2, 4, num_threads=2, prefetch=1)
    with pytest.raises(FileNotFoundError):
        for _ in loader.epoch(0):
            pass


def test_frame_stats_definition():
    mean_f, no_flow, per = frame_stats(np.array([1, 6, 6, 6]), 6)
    assert mean_f == pytest.approx(4.75)
    assert no_flow == pytest.approx(0.25)
    assert per[0][1] == 1 and per[5][1] == 3


def test_normalization_constants():
    np.testing.assert_allclose(IMAGENET_MEAN, [0.485, 0.456, 0.406])
    np.testing.assert_allclose(IMAGENET_STD, [0.229, 0.224, 0.225])


def test_load_image_decode_scale(tmp_path):
    from PIL import Image as PILImage
    from pixflow_tpu.data.datasets import load_image
    rng = np.random.default_rng(0)
    p = str(tmp_path / "f.jpg")
    PILImage.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(p)
    assert load_image(p).size == (96, 64)
    assert load_image(p, decode_scale=2).size == (48, 32)
    # non-JPEG formats ignore draft (PNG has no DCT scale)
    p2 = str(tmp_path / "f.png")
    PILImage.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(p2)
    assert load_image(p2, decode_scale=2).size == (96, 64)


def test_loader_skip_batches_bit_exact(tmp_path):
    """epoch(e, skip_batches=n) yields exactly the tail of epoch(e) —
    the foundation of step-exact preemption resume."""
    from PIL import Image
    from pixflow_tpu.data.datasets import VideoFrameDataset, list_image_folder
    from pixflow_tpu.data.loader import ShardedLoader
    from pixflow_tpu.data.transforms import get_transform

    rng = np.random.default_rng(8)
    for v in range(12):
        d = tmp_path / "train" / f"v{v:02d}"
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (40, 56, 3)).astype(
            np.uint8)).save(d / "f00.jpg")
    ds = VideoFrameDataset(
        samples=list_image_folder(str(tmp_path / "train"), "bdd100k"),
        transform=get_transform("BYOL", 0.5, 32, emit_uint8=True),
        n_frames=1, two_crop=True, video_mode=True)
    loader = ShardedLoader(ds, 4, seed=9, num_threads=1)

    full = list(loader.epoch(3))
    tail = list(loader.epoch(3, skip_batches=2))
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_rand_augment_ops_match_reference(monkeypatch):
    """Per-op oracle: every RandAugment op at a fixed magnitude produces the
    exact image the reference's timm-derived AutoAugmentOp produces (sign
    negation pinned off, interpolation pinned BILINEAR, same fill color)."""
    import random as _random
    import sys
    import types

    from PIL import Image

    if "torchvision.transforms.functional" not in sys.modules:
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        tvt = (getattr(tv, "transforms", None)
               or types.ModuleType("torchvision.transforms"))
        tvf = types.ModuleType("torchvision.transforms.functional")
        tvt.functional = tvf
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    if "pycocotools" not in sys.modules:  # contrast.data imports it
        pc = types.ModuleType("pycocotools")
        pcc = types.ModuleType("pycocotools.coco")
        pcc.COCO = object
        pc.coco = pcc
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.coco"] = pcc
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from contrast.data.rand_augment import AutoAugmentOp

    from pixflow_tpu.data.rand_augment import OPS

    class StubRng:
        def random(self):
            return 0.0      # op fires; signed args stay positive

        def choice(self, seq):
            return Image.BILINEAR

        def gauss(self, m, s):
            return m

    monkeypatch.setattr(_random, "random", lambda: 0.0)

    rng = np.random.default_rng(13)
    small = rng.integers(0, 255, (6, 8, 3), np.uint8)
    img = Image.fromarray(small).resize((64, 48), Image.BILINEAR)

    hparams = {"magnitude_std": 0, "interpolation": Image.BILINEAR,
               "img_mean": (124, 116, 104), "translate_const": 100}
    for magnitude in (4, 7, 10):
        for name, fn in OPS:
            ref_op = AutoAugmentOp(name, prob=1.0, magnitude=magnitude,
                                   hparams=hparams)
            want = np.asarray(ref_op(img))
            got = np.asarray(fn(img, float(magnitude), StubRng()))
            np.testing.assert_array_equal(
                got, want, err_msg=f"op {name} at magnitude {magnitude}")
