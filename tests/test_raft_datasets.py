"""RAFT-training dataset/augmentor tests over synthetic fixtures."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from pixflow_tpu.data.flow_io import write_flo, write_kitti_png
from pixflow_tpu.data.raft_datasets import (FlowAugmentor, FlowDataset,
                                            flying_chairs, kitti)

RNG = np.random.default_rng(53)


@pytest.fixture(scope="module")
def chairs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("chairs")
    (root / "data").mkdir()
    for i in range(3):
        for j in (1, 2):
            Image.fromarray(RNG.integers(0, 255, (96, 128, 3)).astype(
                np.uint8)).save(root / "data" / f"{i:05d}_img{j}.ppm")
        write_flo(str(root / "data" / f"{i:05d}_flow.flo"),
                  RNG.standard_normal((96, 128, 2)).astype(np.float32))
    return str(root)


def test_flying_chairs_listing_and_sample(chairs_root):
    ds = flying_chairs(chairs_root)
    assert len(ds) == 3
    img1, img2, flow, valid = ds.__getitem__(0, random.Random(0))
    assert img1.shape == (96, 128, 3)
    assert flow.shape == (96, 128, 2)
    assert valid.shape == (96, 128)


def test_flying_chairs_split_file(chairs_root):
    """chairs_split.txt (original RAFT convention: 1=train, 2=val) filters
    the pairs; a requested split without the file falls back to all pairs
    with a warning (not silently — validation on trained pairs is not
    comparable to the original evaluate.py)."""
    split_path = os.path.join(chairs_root, "chairs_split.txt")
    with open(split_path, "w") as f:
        f.write("1\n2\n1\n")
    try:
        assert len(flying_chairs(chairs_root, split="training")) == 2
        val = flying_chairs(chairs_root, split="validation")
        assert len(val) == 1
        assert "00001" in os.path.basename(val.image_pairs[0][0])
        assert len(flying_chairs(chairs_root)) == 3  # 'all' ignores the file
    finally:
        os.remove(split_path)
    with pytest.warns(UserWarning, match="chairs_split.txt not found"):
        assert len(flying_chairs(chairs_root, split="validation")) == 3


def test_augmentor_crops_and_scales(chairs_root):
    ds = flying_chairs(chairs_root, FlowAugmentor((64, 64)))
    img1, img2, flow, valid = ds.__getitem__(1, random.Random(1))
    assert img1.shape == (64, 64, 3)
    assert img2.shape == (64, 64, 3)
    assert flow.shape == (64, 64, 2)
    assert valid.shape == (64, 64)
    assert np.isfinite(flow).all()


def test_kitti_sparse_pipeline(tmp_path):
    for d in ("image_2", "flow_occ"):
        (tmp_path / "training" / d).mkdir(parents=True)
    for i in range(2):
        for suff in ("10", "11"):
            Image.fromarray(RNG.integers(0, 255, (60, 80, 3)).astype(
                np.uint8)).save(
                tmp_path / "training" / "image_2" / f"{i:06d}_{suff}.png")
        flow = (5 * RNG.standard_normal((60, 80, 2))).astype(np.float32)
        write_kitti_png(str(tmp_path / "training" / "flow_occ" /
                            f"{i:06d}_10.png"), flow)
    ds = kitti(str(tmp_path), augmentor=FlowAugmentor(
        (48, 48), do_flip=False, sparse=True))
    assert len(ds) == 2
    img1, img2, flow, valid = ds.__getitem__(0, random.Random(2))
    assert img1.shape == (48, 48, 3)
    assert valid.shape == (48, 48)
    assert 0.0 <= valid.mean() <= 1.0
