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
    # both files land via rename — no .tmp residue, current is complete
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    st_cur, epoch_cur, _ = load_checkpoint(latest_checkpoint(str(tmp_path)),
                                           _state())
    assert epoch_cur == 3 and int(st_cur.step) == 7

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
    batch["coord2"] = np.tile(np.array([0.2, 0.15, 0.5, 0.5, 25, 11, 40, 36,
                                        128, 72], np.float32), (2, 1))
    flow = rng.standard_normal((2, 9, 16, 2)).astype(np.float32)
    mask = rng.random((2, 9, 16)) > 0.5
    save_debug_bundle(str(tmp_path), step=7, batch=batch,
                      flow_fwd=flow, mask_fwd=mask)
    files = sorted(os.listdir(tmp_path))
    assert "step7_s0_crop.png" in files
    assert "step7_s0_flow.png" in files
    assert "step7_s1_mask.png" in files
    # in-loss geometry renders (pre/post-warp grids + positive-pair lines)
    assert "step7_s0_grid_prewarp.png" in files
    assert "step7_s0_grid_postwarp.png" in files
    assert "step7_s1_pairs.png" in files


def test_save_debug_bundle_no_frames_no_flow(tmp_path):
    """Geometry renders fall back to a synthetic canvas and no warp."""
    from pixflow_tpu.utils.visualize import save_debug_bundle
    batch = {
        "im1": np.zeros((1, 8, 8, 3), np.float32),
        "coord1": np.array([[0.1, 0.1, 0.4, 0.4, 12, 7, 50, 40, 128, 72]],
                           np.float32),
        "coord2": np.array([[0.2, 0.2, 0.6, 0.6, 25, 14, 52, 29, 128, 72]],
                           np.float32),
    }
    save_debug_bundle(str(tmp_path), step=1, batch=batch)
    files = sorted(os.listdir(tmp_path))
    assert "step1_s0_grid_prewarp.png" in files
    assert "step1_s0_pairs.png" in files


def test_pair_loss_geometry_matches_loss_mask():
    """The exposed geometry is exactly the loss's positive mask: a loss
    computed from geom['pos'] by hand reproduces pixpro_pair_loss."""
    import jax.numpy as jnp
    from pixflow_tpu.ops.loss import (pair_loss_geometry, pixpro_pair_loss,
                                      l2_normalize)
    rng = np.random.default_rng(11)
    b, h, w, c = 2, 7, 7, 8
    q = l2_normalize(jnp.asarray(rng.standard_normal((b, h, w, c)),
                                 jnp.float32))
    k = l2_normalize(jnp.asarray(rng.standard_normal((b, h, w, c)),
                                 jnp.float32))
    cq = jnp.asarray(np.tile(np.array(
        [0.1, 0.1, 0.6, 0.6, 128, 72, 640, 360, 1280, 720], np.float32),
        (b, 1)))
    ck = jnp.asarray(np.tile(np.array(
        [0.2, 0.2, 0.7, 0.7, 256, 144, 640, 360, 1280, 720], np.float32),
        (b, 1)))
    flow = jnp.asarray(3 * rng.standard_normal((b, 90, 160, 2)), jnp.float32)

    geom = pair_loss_geometry(cq, ck, (h, w), 0.7, flow=flow)
    pos = geom["pos"].astype(jnp.float32)
    n = h * w
    logit = jnp.einsum("bxc,byc->bxy", q.reshape(b, n, c), k.reshape(b, n, c))
    by_hand = -2.0 * jnp.mean(
        jnp.sum(logit * pos, axis=(1, 2)) / (jnp.sum(pos, axis=(1, 2)) + 1e-6))
    loss, (pos_num, _) = pixpro_pair_loss(q, k, cq, ck, 0.7, flow=flow)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(by_hand),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pos_num),
                               np.asarray(jnp.sum(pos, axis=(1, 2))))


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


def test_metrics_writer_jsonl_and_artifacts(tmp_path):
    """JSONL sink + end-of-run wandb artifact upload (config, loss curve,
    TB events) — reference main_pretrain.py:397-400."""
    import json as _json
    from pixflow_tpu.utils.metrics_writer import MetricsWriter

    class FakeRun:
        def __init__(self):
            self.logged, self.saved = [], []
        def log(self, rec, step=None):
            self.logged.append((step, rec))
        def save(self, path, base_path=None):
            self.saved.append(os.path.basename(path))

    run = FakeRun()
    out = str(tmp_path)
    with open(os.path.join(out, "config.json"), "w") as f:
        f.write("{}")
    w = MetricsWriter(out, use_tensorboard=False, wandb_run=run)
    w.write(3, {"loss": -1.5, "lr": 0.1})
    w.save_artifacts(out)
    w.close()

    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert _json.loads(lines[0]) == {"step": 3, "loss": -1.5, "lr": 0.1}
    assert run.logged[0][0] == 3
    assert "config.json" in run.saved and "metrics.jsonl" in run.saved


def test_select_branch_momentum_swaps_ema_subtrees():
    from pixflow_tpu.utils.checkpoint import select_branch
    params = {"encoder": {"w": jnp.zeros(2)}, "encoder_k": {"w": jnp.ones(2)},
              "projector": {"w": jnp.zeros(1)},
              "projector_k": {"w": jnp.full((1,), 2.0)},
              "predictor": {"w": jnp.full((1,), 3.0)}}
    stats = {"encoder": {"m": jnp.zeros(2)}, "encoder_k": {"m": jnp.ones(2)}}
    p_on, s_on = select_branch(params, stats, "online")
    assert p_on is params and s_on is stats
    p_m, s_m = select_branch(params, stats, "momentum")
    np.testing.assert_array_equal(np.asarray(p_m["encoder"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p_m["projector"]["w"]), 2.0)
    np.testing.assert_array_equal(np.asarray(p_m["predictor"]["w"]), 3.0)
    np.testing.assert_array_equal(np.asarray(s_m["encoder"]["m"]), 1.0)
    # originals untouched
    np.testing.assert_array_equal(np.asarray(params["encoder"]["w"]), 0.0)


def test_publish_momentum_branch(tmp_path):
    st = TrainState(
        step=jnp.asarray(1, jnp.int32), ema_k=jnp.asarray(1, jnp.int32),
        params={"encoder": {"w": jnp.zeros(3)},
                "encoder_k": {"w": jnp.full((3,), 5.0)}},
        batch_stats={"encoder": {"mean": jnp.zeros(3)},
                     "encoder_k": {"mean": jnp.full((3,), 7.0)}},
        opt_state={})
    path = save_checkpoint(str(tmp_path), 2, st)
    out = publish_checkpoint(path, str(tmp_path / "ema.msgpack"),
                             branch="momentum")
    pub = load_published(out)
    np.testing.assert_array_equal(np.asarray(pub["params"]["encoder"]["w"]),
                                  5.0)
    np.testing.assert_array_equal(
        np.asarray(pub["batch_stats"]["encoder"]["mean"]), 7.0)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend: save/latest/load roundtrip preserves the TrainState
    tree (incl. the EMA ramp counter) and the metadata."""
    pytest.importorskip("orbax.checkpoint")
    import jax.numpy as jnp
    from pixflow_tpu.train.state import TrainState
    from pixflow_tpu.utils.checkpoint_orbax import (
        latest_checkpoint_orbax, load_checkpoint_orbax, save_checkpoint_orbax)

    state = TrainState(
        step=jnp.asarray(7, jnp.int32), ema_k=jnp.asarray(5, jnp.int32),
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        batch_stats={"m": jnp.ones((3,))},
        opt_state={"mom": jnp.full((2, 3), 0.5)})
    out = str(tmp_path / "run")
    assert latest_checkpoint_orbax(out) is None
    save_checkpoint_orbax(out, epoch=3, state=state, config_json="{}",
                          extra={"k": 1})
    assert latest_checkpoint_orbax(out) == 7

    template = TrainState(
        step=jnp.zeros([], jnp.int32), ema_k=jnp.zeros([], jnp.int32),
        params={"w": jnp.zeros((2, 3))}, batch_stats={"m": jnp.zeros((3,))},
        opt_state={"mom": jnp.zeros((2, 3))})
    got, epoch, extra = load_checkpoint_orbax(out, template)
    assert epoch == 3 and extra == {"k": 1}
    assert int(got.step) == 7 and int(got.ema_k) == 5
    np.testing.assert_array_equal(np.asarray(got.params["w"]),
                                  np.arange(6.0).reshape(2, 3))


def test_orbax_save_same_step_twice_is_noop(tmp_path):
    """A preemption save can target a step that already has a checkpoint
    (SIGTERM on the first vote after a periodic save: zero train steps in
    between). Orbax forbids overwriting a step, so the save must SKIP — the
    existing checkpoint implies the identical resume position — instead of
    raising StepAlreadyExistsError out of the clean-exit path."""
    pytest.importorskip("orbax.checkpoint")
    import jax.numpy as jnp
    from pixflow_tpu.train.state import TrainState
    from pixflow_tpu.utils.checkpoint_orbax import (
        load_checkpoint_orbax, save_checkpoint_orbax)

    state = TrainState(
        step=jnp.asarray(4, jnp.int32), ema_k=jnp.asarray(4, jnp.int32),
        params={"w": jnp.ones((2,))}, batch_stats={},
        opt_state={})
    out = str(tmp_path / "run")
    p1 = save_checkpoint_orbax(out, epoch=2, state=state, config_json="{}")
    # second save at the SAME step (what the preemption path does): no
    # raise, same path, first save's metadata preserved
    p2 = save_checkpoint_orbax(out, epoch=3, state=state, config_json="{}",
                               extra={"resume_epoch": 3, "resume_idx": 0})
    assert p1 == p2
    template = state.replace(step=jnp.zeros([], jnp.int32),
                             ema_k=jnp.zeros([], jnp.int32),
                             params={"w": jnp.zeros((2,))})
    got, epoch, extra = load_checkpoint_orbax(out, template)
    assert int(got.step) == 4 and epoch == 2 and extra == {}
