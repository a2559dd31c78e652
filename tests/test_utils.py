"""Utility-layer tests: checkpointing, meters, visualization, flow IO."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pixflow_tpu.utils import (AverageMeter, topk_accuracy, save_checkpoint,
                               load_checkpoint, latest_checkpoint,
                               publish_checkpoint)
from pixflow_tpu.utils.checkpoint import load_published
from pixflow_tpu.utils.visualize import (flow_to_image, make_colorwheel,
                                         draw_crop_rect, warp_image,
                                         draw_positive_pairs, mask_to_image)
from pixflow_tpu.data.flow_io import (read_flo, write_flo, read_pfm,
                                      write_pfm, read_kitti_png,
                                      write_kitti_png)
from pixflow_tpu.train.state import TrainState

RNG = np.random.default_rng(13)


def _state():
    return TrainState(
        step=jnp.asarray(7, jnp.int32), ema_k=jnp.asarray(9, jnp.int32),
        params={"encoder": {"w": jnp.arange(6.0).reshape(2, 3)}},
        batch_stats={"encoder": {"mean": jnp.zeros(3)}},
        opt_state={"momentum": {"encoder": {"w": jnp.ones((2, 3))}}})


def test_checkpoint_roundtrip(tmp_path):
    st = _state()
    path = save_checkpoint(str(tmp_path), 3, st, config_json='{"a": 1}',
                           extra={"note": "x"})
    assert os.path.basename(path) == "ckpt_epoch_3.msgpack"
    assert latest_checkpoint(str(tmp_path)).endswith("current.msgpack")

    st2, epoch, extra = load_checkpoint(path, _state())
    assert epoch == 3 and extra["note"] == "x"
    assert int(st2.step) == 7 and int(st2.ema_k) == 9
    np.testing.assert_array_equal(np.asarray(st2.params["encoder"]["w"]),
                                  np.arange(6.0).reshape(2, 3))


def test_publish_strips_training_state(tmp_path):
    path = save_checkpoint(str(tmp_path), 5, _state())
    out = publish_checkpoint(path, str(tmp_path / "release.msgpack"))
    pub = load_published(out)
    assert "params" in pub and "batch_stats" in pub
    assert "opt_state" not in pub
    assert pub["epoch"] == 5
    assert "-" in os.path.basename(out)  # hash suffix


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(3.0, n=2)
    assert m.avg == 2.0 and m.val == 3.0 and m.count == 4


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    targets = np.array([1, 2])
    acc1, acc2 = topk_accuracy(logits, targets, topk=(1, 2))
    assert acc1 == 50.0
    assert acc2 == 50.0


def test_colorwheel_and_flow_image():
    assert make_colorwheel().shape == (55, 3)
    flow = RNG.standard_normal((8, 10, 2)).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8
    # zero flow renders (near-)white
    white = flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert (white > 240).all()


def test_draw_helpers():
    frame = RNG.integers(0, 255, (72, 128, 3)).astype(np.uint8)
    coord = np.array([0.1, 0.1, 0.5, 0.5, 12, 7, 50, 40, 128, 72], np.float32)
    img = draw_crop_rect(frame, coord)
    assert img.size == (128, 72)
    canvas = draw_positive_pairs(frame, frame,
                                 np.array([10.0]), np.array([10.0]),
                                 np.array([20.0]), np.array([20.0]),
                                 np.array([[True]]))
    assert canvas.size == (256, 72)
    assert mask_to_image(np.array([[True, False]])).tolist() == [[255, 0]]


def test_warp_image_identity():
    frame = RNG.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    out = warp_image(frame, np.zeros((16, 16, 2), np.float32))
    np.testing.assert_array_equal(out, frame)


def test_save_debug_bundle(tmp_path):
    from pixflow_tpu.utils.visualize import save_debug_bundle
    rng = np.random.default_rng(3)
    batch = {
        "im1": rng.standard_normal((2, 32, 32, 3)).astype(np.float32),
        "coord1": np.tile(np.array([0.1, 0.1, 0.4, 0.4, 12, 7, 50, 40,
                                    128, 72], np.float32), (2, 1)),
        "frames": rng.integers(0, 255, (2, 3, 72, 128, 3)).astype(np.uint8),
    }
    flow = rng.standard_normal((2, 9, 16, 2)).astype(np.float32)
    mask = rng.random((2, 9, 16)) > 0.5
    save_debug_bundle(str(tmp_path), step=7, batch=batch,
                      flow_fwd=flow, mask_fwd=mask)
    files = sorted(os.listdir(tmp_path))
    assert "step7_s0_crop.png" in files
    assert "step7_s0_flow.png" in files
    assert "step7_s1_mask.png" in files


def test_flo_roundtrip(tmp_path):
    flow = RNG.standard_normal((6, 8, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_allclose(read_flo(p), flow)


def test_pfm_roundtrip(tmp_path):
    img = RNG.standard_normal((5, 7)).astype(np.float32)
    p = str(tmp_path / "a.pfm")
    write_pfm(p, img)
    out, scale = read_pfm(p)
    np.testing.assert_allclose(out, img)


def test_kitti_png_roundtrip(tmp_path):
    flow = (RNG.standard_normal((4, 6, 2)) * 10).astype(np.float32)
    p = str(tmp_path / "a.png")
    write_kitti_png(p, flow)
    out, valid = read_kitti_png(p)
    np.testing.assert_allclose(out, flow, atol=1 / 64)
    assert valid.all()
