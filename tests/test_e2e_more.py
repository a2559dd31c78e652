"""Additional end-to-end driver coverage: ImageNet (non-video) pretraining,
zip-archive datasets, and the multi-span flow-frames mode through the full
driver."""

import io
import os
import zipfile

import numpy as np
import pytest
from PIL import Image


def _tiny_cfg(data_dir, out_dir):
    from pixflow_tpu.configs import PretrainConfig
    cfg = PretrainConfig()
    cfg.data.data_dir = data_dir
    cfg.data.aug = "NULL"
    cfg.data.crop = 0.5
    cfg.data.image_size = 64
    cfg.data.batch_size = 1
    cfg.data.num_workers = 1
    cfg.model.arch = "resnet18"
    cfg.model.pixpro_transform_layer = 1
    cfg.optim.epochs = 1
    cfg.optim.warmup_epoch = 0
    cfg.runtime.output_dir = out_dir
    cfg.runtime.compute_dtype = "float32"
    cfg.runtime.print_freq = 1
    cfg.runtime.save_freq = 1
    return cfg


def test_imagenet_mode_pretrain(tmp_path):
    """Flat image dataset (dataset='ImageNet'): two crops of the SAME image
    per sample, n_frames=1 — the original PixPro protocol."""
    rng = np.random.default_rng(3)
    for cls in ("a", "b"):
        d = tmp_path / "data" / "train" / cls
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (72, 96, 3)).astype(
                np.uint8)).save(d / f"{i}.jpg")

    from pixflow_tpu.train.driver import train
    cfg = _tiny_cfg(str(tmp_path / "data"), str(tmp_path / "out"))
    cfg.data.dataset = "ImageNet"
    state = train(cfg)
    assert int(state.step) == 1  # 8 images / global batch 8


def test_zip_mode_pretrain(tmp_path):
    """zip-archive dataset with an annotation file (reference --zip
    --cache-mode part protocol)."""
    rng = np.random.default_rng(4)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    names, lines = [], []
    with zipfile.ZipFile(data_dir / "train.zip", "w") as zf:
        for v in range(8):
            for f in range(2):
                arr = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                inner = f"video{v:02d}/frame{f:02d}.jpg"
                zf.writestr(inner, buf.getvalue())
                lines.append(f"{inner}\t{v}")
    (data_dir / "train_map.txt").write_text("\n".join(lines) + "\n")

    from pixflow_tpu.train.driver import train
    cfg = _tiny_cfg(str(data_dir), str(tmp_path / "out"))
    cfg.data.dataset = "bdd100k"
    cfg.data.zip_mode = True
    cfg.data.ann_file = "train_map.txt"
    cfg.data.cache_mode = "part"
    cfg.data.n_frames = 2
    state = train(cfg)
    assert int(state.step) == 1


def test_flow_frames_mode_through_driver(tmp_path):
    """use_flow_frames end-to-end: driver builds the multi-span step."""
    import torch
    rng = np.random.default_rng(5)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        for f in range(4):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(vd / f"f{f:02d}.jpg")
    for d in ("forward", "backward"):
        (root / "flow" / d).mkdir(parents=True)
        for v in range(8):
            torch.save(torch.randn(3, 2, 6, 8),
                       root / "flow" / d / f"v{v:02d}.pth")

    from pixflow_tpu.train.driver import train
    cfg = _tiny_cfg(str(root), str(tmp_path / "out"))
    cfg.data.dataset = "bdd100k"
    cfg.data.n_frames = 4
    cfg.flow.use_flow = True
    cfg.flow.use_flow_file = True
    cfg.flow.use_flow_frames = True
    cfg.flow.flow_root = str(root / "flow")
    cfg.flow.fwd_name = "forward"
    cfg.flow.bwd_name = "backward"
    cfg.flow.alpha1 = 0.01
    cfg.flow.alpha2 = 0.5
    # flow_root/<prefix> layout: point the roots directly
    cfg.flow.flow_root = str(root / "flow_prefixed")
    os.makedirs(root / "flow_prefixed")
    os.symlink(root / "flow", root / "flow_prefixed" / "train")

    state = train(cfg)
    assert int(state.step) == 1


def test_live_raft_flow_through_driver(tmp_path):
    """On-the-fly RAFT end-to-end (reference `use_flow` without
    `use_flow_file`, `main_pretrain.py:42-57` + `contrast/util.py:201-204`):
    the driver loads a torch RAFT-small checkpoint, the loader emits raw
    uint8 frames, and the compiled step runs frames -> RAFT -> compose ->
    cycle masks -> loss in one program."""
    import argparse
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from contrast.flow import RAFT as RefRAFT

    torch.manual_seed(13)
    targs = argparse.Namespace(small=True, dropout=0.0, alternate_corr=False,
                               mixed_precision=False)
    ckpt = str(tmp_path / "raft-small.pth")
    # DataParallel-prefixed keys, like the released checkpoints
    torch.save(torch.nn.DataParallel(RefRAFT(targs)).state_dict(), ckpt)

    rng = np.random.default_rng(7)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        for f in range(3):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(vd / f"f{f:02d}.jpg")

    from pixflow_tpu.train.driver import train
    cfg = _tiny_cfg(str(root), str(tmp_path / "out"))
    cfg.data.dataset = "bdd100k"
    cfg.data.n_frames = 3
    cfg.flow.use_flow = True
    cfg.flow.use_flow_file = False
    cfg.flow.flow_model = ckpt
    cfg.flow.small = True
    cfg.flow.raft_iters = 2
    cfg.flow.flow_bs = None
    cfg.flow.alpha1 = 0.01
    cfg.flow.alpha2 = 0.5

    state = train(cfg)
    assert int(state.step) == 1
    assert os.path.exists(os.path.join(str(tmp_path / "out"),
                                       "current.msgpack"))


def test_live_raft_multi_span_through_driver(tmp_path):
    """On-the-fly RAFT + use_flow_frames end-to-end (the reference composes
    every (span,start) window from live flows too, `contrast/util.py:129-171`):
    the loader emits per-frame crop stacks AND raw frames; the compiled step
    runs frames -> RAFT -> per-span compose -> multi-span loss."""
    import argparse
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from contrast.flow import RAFT as RefRAFT

    torch.manual_seed(17)
    targs = argparse.Namespace(small=True, dropout=0.0, alternate_corr=False,
                               mixed_precision=False)
    ckpt = str(tmp_path / "raft-small.pth")
    torch.save(torch.nn.DataParallel(RefRAFT(targs)).state_dict(), ckpt)

    rng = np.random.default_rng(21)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        for f in range(4):  # one 2-frame video exercises n_frames_eff padding
            if v == 0 and f >= 2:
                continue
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(vd / f"f{f:02d}.jpg")

    from pixflow_tpu.train.driver import train
    cfg = _tiny_cfg(str(root), str(tmp_path / "out"))
    cfg.data.dataset = "bdd100k"
    cfg.data.n_frames = 3
    cfg.flow.use_flow = True
    cfg.flow.use_flow_file = False
    cfg.flow.use_flow_frames = True
    cfg.flow.flow_model = ckpt
    cfg.flow.small = True
    cfg.flow.raft_iters = 2
    cfg.flow.flow_bs = None
    cfg.flow.alpha1 = 0.01
    cfg.flow.alpha2 = 0.5

    state = train(cfg)
    assert int(state.step) == 1
    assert os.path.exists(os.path.join(str(tmp_path / "out"),
                                       "current.msgpack"))


def test_device_aug_through_driver(tmp_path):
    """--device-aug end-to-end: loader emits uint8 crops + aug params, the
    compiled step applies the photometric stack on-device."""
    rng = np.random.default_rng(9)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        for f in range(2):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(vd / f"f{f:02d}.jpg")

    from pixflow_tpu.train.driver import train
    cfg = _tiny_cfg(str(root), str(tmp_path / "out"))
    cfg.data.dataset = "bdd100k"
    cfg.data.aug = "BYOL"
    cfg.data.n_frames = 2
    cfg.data.device_aug = True
    state = train(cfg)
    assert int(state.step) == 1


def test_sigterm_preemption_checkpoint(tmp_path):
    """Preemption safety: SIGTERM mid-training finishes the in-flight step,
    saves a checkpoint recording (epoch, next batch), and returns cleanly;
    --auto-resume then continues STEP-EXACTLY (no redone steps, no skipped
    data — the loader stream is deterministic and fast-forwardable)."""
    import signal
    import threading
    import time as _time

    rng = np.random.default_rng(11)
    root = tmp_path / "data"
    for v in range(16):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
            np.uint8)).save(vd / "f00.jpg")

    from pixflow_tpu.train.driver import train
    out = str(tmp_path / "out")
    cfg = _tiny_cfg(str(root), out)
    cfg.data.dataset = "bdd100k"
    cfg.data.batch_size = 1  # 16 videos / global batch 8 -> 2 steps/epoch
    cfg.optim.epochs = 500   # far more than we let run
    cfg.runtime.save_freq = 10**6  # only the preemption save can happen

    def fire():
        # wait until at least one step has completed (metrics.jsonl written
        # at print_freq=1), then preempt
        marker = os.path.join(out, "metrics.jsonl")
        deadline = _time.time() + 900
        while _time.time() < deadline:
            if os.path.exists(marker) and os.path.getsize(marker) > 0:
                signal.raise_signal(signal.SIGTERM)
                return
            _time.sleep(0.5)

    t = threading.Thread(target=fire, daemon=True)
    t.start()
    state = train(cfg)  # must return, not die
    t.join(timeout=5)
    steps_done = int(state.step)
    assert 0 < steps_done < 1000
    assert os.path.exists(os.path.join(out, "current.msgpack"))

    # resume to a small fixed horizon: total steps must be EXACTLY
    # epochs * steps_per_epoch — nothing redone, nothing skipped
    cfg2 = _tiny_cfg(str(root), out)
    cfg2.data.dataset = "bdd100k"
    cfg2.data.batch_size = 1
    cfg2.optim.epochs = 3
    cfg2.runtime.auto_resume = True
    state2 = train(cfg2)
    assert int(state2.step) == 3 * 2, (steps_done, int(state2.step))


def test_orbax_backend_through_driver(tmp_path):
    """--checkpoint-backend orbax: driver saves via CheckpointManager and
    auto-resumes from the newest step."""
    import pytest as _pytest
    _pytest.importorskip("orbax.checkpoint")
    rng = np.random.default_rng(21)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
            np.uint8)).save(vd / "f00.jpg")

    from pixflow_tpu.train.driver import train
    out = str(tmp_path / "out")
    cfg = _tiny_cfg(str(root), out)
    cfg.data.dataset = "bdd100k"
    cfg.runtime.checkpoint_backend = "orbax"
    state1 = train(cfg)
    assert os.path.isdir(os.path.join(out, "orbax"))

    cfg2 = _tiny_cfg(str(root), out)
    cfg2.data.dataset = "bdd100k"
    cfg2.runtime.checkpoint_backend = "orbax"
    cfg2.runtime.auto_resume = True
    cfg2.optim.epochs = 2
    state2 = train(cfg2)
    assert int(state2.step) == int(state1.step) + 1


def test_orbax_preemption_save_at_existing_step(tmp_path):
    """SIGTERM landing on the FIRST preemption vote after a resume (zero
    train steps since the last orbax save) makes the preemption save target
    a step that already has a checkpoint. Orbax forbids overwriting a step,
    so the save must skip (the existing checkpoint implies the identical
    resume position) and the clean-exit path must stay clean — previously
    this raised StepAlreadyExistsError out of train()."""
    import pytest as _pytest
    _pytest.importorskip("orbax.checkpoint")
    import signal
    import threading
    import time as _time

    rng = np.random.default_rng(23)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
            np.uint8)).save(vd / "f00.jpg")

    from pixflow_tpu.train.driver import train
    from pixflow_tpu.utils.checkpoint_orbax import latest_checkpoint_orbax
    out = str(tmp_path / "out")
    cfg = _tiny_cfg(str(root), out)
    cfg.data.dataset = "bdd100k"
    cfg.runtime.checkpoint_backend = "orbax"
    state1 = train(cfg)  # completes epoch 1, periodic orbax save at step 1
    step1 = int(state1.step)
    assert latest_checkpoint_orbax(out) == step1

    # resume with SIGTERM hammered from the start: the preemption vote at
    # the resumed epoch's first batch fires with ZERO new steps taken, so
    # the preemption save targets the already-saved step
    prev = signal.signal(signal.SIGTERM, lambda *_: None)
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            signal.raise_signal(signal.SIGTERM)
            _time.sleep(0.03)

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    try:
        cfg2 = _tiny_cfg(str(root), out)
        cfg2.data.dataset = "bdd100k"
        cfg2.runtime.checkpoint_backend = "orbax"
        cfg2.runtime.auto_resume = True
        cfg2.optim.epochs = 500
        state2 = train(cfg2)  # must RETURN cleanly, not raise
    finally:
        stop.set()
        t.join(timeout=5)
        signal.signal(signal.SIGTERM, prev)
    assert int(state2.step) >= step1
    assert latest_checkpoint_orbax(out) is not None

    # step-exact continuation still holds after the skipped save
    cfg3 = _tiny_cfg(str(root), out)
    cfg3.data.dataset = "bdd100k"
    cfg3.runtime.checkpoint_backend = "orbax"
    cfg3.runtime.auto_resume = True
    cfg3.optim.epochs = 2
    state3 = train(cfg3)
    assert int(state3.step) == 2  # 2 epochs x 1 step/epoch, nothing redone


def test_orbax_explicit_resume_and_backend_migration(tmp_path):
    """Round-3 review fixes: (a) an EXPLICIT --resume pointing at an orbax
    run dir (or its orbax/ subdir) loads via orbax instead of crashing in
    the msgpack unpacker; (b) switching --checkpoint-backend msgpack ->
    orbax with --auto-resume falls back to the msgpack history instead of
    silently restarting from scratch."""
    import pytest as _pytest
    _pytest.importorskip("orbax.checkpoint")
    rng = np.random.default_rng(23)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
            np.uint8)).save(vd / "f00.jpg")

    from pixflow_tpu.train.driver import train

    # (a) explicit orbax dir resume
    out_a = str(tmp_path / "out_a")
    cfg = _tiny_cfg(str(root), out_a)
    cfg.data.dataset = "bdd100k"
    cfg.runtime.checkpoint_backend = "orbax"
    state1 = train(cfg)

    out_a2 = str(tmp_path / "out_a2")
    cfg2 = _tiny_cfg(str(root), out_a2)
    cfg2.data.dataset = "bdd100k"
    cfg2.runtime.checkpoint_backend = "orbax"
    cfg2.runtime.resume = os.path.join(out_a, "orbax")  # the subdir form
    cfg2.optim.epochs = 2
    state2 = train(cfg2)
    assert int(state2.step) == int(state1.step) + 1

    # the exact step-dir path the driver logs at save time also works
    out_a3 = str(tmp_path / "out_a3")
    cfg3 = _tiny_cfg(str(root), out_a3)
    cfg3.data.dataset = "bdd100k"
    cfg3.runtime.checkpoint_backend = "orbax"
    cfg3.runtime.resume = os.path.join(out_a, "orbax", str(int(state1.step)))
    cfg3.optim.epochs = 2
    state3 = train(cfg3)
    assert int(state3.step) == int(state1.step) + 1

    # (b) msgpack history, orbax backend, auto-resume -> migrates
    out_b = str(tmp_path / "out_b")
    cfg3 = _tiny_cfg(str(root), out_b)
    cfg3.data.dataset = "bdd100k"
    state3 = train(cfg3)  # msgpack checkpoints
    cfg4 = _tiny_cfg(str(root), out_b)
    cfg4.data.dataset = "bdd100k"
    cfg4.runtime.checkpoint_backend = "orbax"
    cfg4.runtime.auto_resume = True
    cfg4.optim.epochs = 2
    state4 = train(cfg4)
    assert int(state4.step) == int(state3.step) + 1  # resumed, not restarted
    assert os.path.isdir(os.path.join(out_b, "orbax"))  # saved new format
