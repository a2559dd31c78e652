"""Grain loader backend (data/grain_loader.py): interface parity with
ShardedLoader, determinism, host-sharding disjointness, and the driver
end-to-end with --loader-backend grain."""

import os

import numpy as np
import pytest
from PIL import Image

pytest.importorskip("grain")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain_data")
    rng = np.random.default_rng(2)
    for v in range(16):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        for f in range(3):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(vd / f"f{f:02d}.jpg")
    return str(root)


def _dataset(corpus):
    from pixflow_tpu.data.datasets import VideoFrameDataset, list_image_folder
    from pixflow_tpu.data.transforms import get_transform
    return VideoFrameDataset(
        samples=list_image_folder(os.path.join(corpus, "train"), "bdd100k"),
        transform=get_transform("NULL", 0.5, 32, emit_uint8=True),
        n_frames=2, two_crop=True, video_mode=True)


def test_epoch_shapes_and_determinism(corpus):
    from pixflow_tpu.data.grain_loader import GrainLoader
    ds = _dataset(corpus)
    loader = GrainLoader(ds, 8, seed=3, num_threads=0)
    assert len(loader) == 2  # 16 videos / batch 8

    b0 = list(loader.epoch(0))
    assert len(b0) == 2
    for b in b0:
        assert b["im1"].shape == (8, 32, 32, 3)
        assert b["coord1"].shape == (8, 10)

    # same epoch twice: bit-identical stream
    b0_again = list(loader.epoch(0))
    np.testing.assert_array_equal(b0[0]["im1"], b0_again[0]["im1"])
    np.testing.assert_array_equal(b0[0]["index"], b0_again[0]["index"])
    # different epoch: different order
    b1 = list(loader.epoch(1))
    assert not np.array_equal(b0[0]["index"], b1[0]["index"])


def test_host_sharding_disjoint(corpus):
    from pixflow_tpu.data.grain_loader import GrainLoader
    ds = _dataset(corpus)
    seen = []
    for host in range(2):
        loader = GrainLoader(ds, 8, num_hosts=2, host_id=host, seed=5,
                             num_threads=0)
        assert len(loader) == 2  # 8 per host / local batch 4
        idx = np.concatenate([b["index"] for b in loader.epoch(0)])
        seen.append(set(int(i) for i in idx))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 16


def test_driver_end_to_end_grain(corpus, tmp_path):
    from pixflow_tpu.configs import PretrainConfig
    from pixflow_tpu.train.driver import train
    cfg = PretrainConfig()
    cfg.data.data_dir = corpus
    cfg.data.dataset = "bdd100k"
    cfg.data.aug = "NULL"
    cfg.data.crop = 0.5
    cfg.data.image_size = 64
    cfg.data.n_frames = 2
    cfg.data.batch_size = 1
    cfg.data.num_workers = 0  # in-process grain (test environment)
    cfg.data.loader_backend = "grain"
    cfg.model.arch = "resnet18"
    cfg.model.pixpro_transform_layer = 1
    cfg.optim.epochs = 1
    cfg.optim.warmup_epoch = 0
    cfg.runtime.output_dir = str(tmp_path / "out")
    cfg.runtime.compute_dtype = "float32"
    cfg.runtime.print_freq = 1
    cfg.runtime.save_freq = 1
    state = train(cfg)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(str(tmp_path / "out"),
                                       "current.msgpack"))


def test_len_matches_yield_all_shapes():
    """`__len__` must equal the number of yielded batches for every
    (n, hosts, batch, drop_last) combination: grain shards with
    drop_remainder=True (floor per host), and `__len__` floors to match —
    the driver's steps_per_epoch/end-of-epoch accounting depends on it."""
    from pixflow_tpu.data.grain_loader import GrainLoader

    class _TinyDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i, rng):
            return {"x": np.float32(i)}

    for n, hosts, bs, drop in [(10, 8, 1, True), (10, 8, 1, False),
                               (13, 2, 3, True), (13, 2, 3, False),
                               (8, 1, 3, True), (8, 1, 3, False)]:
        for host in range(min(hosts, 2)):
            ld = GrainLoader(_TinyDS(n), bs * hosts, num_hosts=hosts,
                             host_id=host, seed=0, drop_last=drop,
                             num_threads=0)
            got = sum(1 for _ in ld.epoch(0))
            assert got == len(ld), (n, hosts, bs, drop, host, got, len(ld))
