"""Multi-span (use_flow_frames) training mode tests."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.models import PixPro
from pixflow_tpu.ops.flow import span_windows, all_concat_flow
from pixflow_tpu.train import (create_train_state, make_train_step, lars_sgd,
                               frozen_momentum_branch_mask, warmup_cosine)

RNG = np.random.default_rng(41)


def test_span_windows_matches_all_concat_order():
    spans = span_windows(3)
    assert spans == [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
    # window i of all_concat_flow composes exactly flows [s, s+l)
    flows = RNG.standard_normal((3, 1, 6, 6, 2)).astype(np.float32)
    stacked, _ = all_concat_flow(jnp.asarray(flows), jnp.asarray(flows),
                                 use_flow_frames=True)
    assert stacked.shape[0] == len(spans)
    for i, (l, s) in enumerate(spans):
        if l == 1:
            np.testing.assert_allclose(np.asarray(stacked[i]), flows[s])


def _coords(b, f):
    out = np.zeros((b, f, 10), np.float32)
    for i in range(b):
        for j in range(f):
            x, y, w, h = (RNG.integers(0, 400), RNG.integers(0, 200),
                          RNG.integers(200, 600), RNG.integers(150, 400))
            out[i, j] = [x / 1279, y / 719, (x + w - 1) / 1279,
                         (y + h - 1) / 719, x, y, w, h, 1280, 720]
    return out


def test_multi_span_train_step_runs_and_learns():
    n_frames, b, hw = 4, 4, 64
    f = n_frames - 1
    k = n_frames - 1
    batch = {
        "ims1": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3)).astype(np.float32)),
        "ims2": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3)).astype(np.float32)),
        "coords1": jnp.asarray(_coords(b, f)),
        "coords2": jnp.asarray(_coords(b, f)),
        "flows_fwd": jnp.asarray(RNG.standard_normal((b, k, 16, 16, 2)).astype(np.float32)),
        "flows_bwd": jnp.asarray(RNG.standard_normal((b, k, 16, 16, 2)).astype(np.float32)),
        "n_frames_eff": jnp.asarray([4, 4, 3, 2], jnp.int32),  # ragged videos
    }
    model = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32)
    lr = warmup_cosine(0.1, 10, 1, 5)
    tx0 = lars_sgd(lr, weight_decay=1e-5)
    state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                               {"im1": batch["ims1"][:1, 0]})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, lr_schedule=lr, ema_total_steps=50,
                           ema_base_momentum=0.99, use_flow=True,
                           use_flow_frames=True, alpha1=0.01, alpha2=0.5,
                           donate=False)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_multi_span_fused_views_equivalence():
    """fuse_views=True for multi-span: the 2BF fused pass (ViewBatchNorm
    group 0 = view-1 crops) must reproduce the unfused 4-call trajectory —
    losses and batch statistics — to f32 tolerance over several steps."""
    n_frames, b, hw = 4, 4, 32
    f = k = n_frames - 1
    batch = {
        "ims1": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3)).astype(np.float32)),
        "ims2": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3)).astype(np.float32)),
        "coords1": jnp.asarray(_coords(b, f)),
        "coords2": jnp.asarray(_coords(b, f)),
        "flows_fwd": jnp.asarray(RNG.standard_normal((b, k, 4, 4, 2)).astype(np.float32)),
        "flows_bwd": jnp.asarray(RNG.standard_normal((b, k, 4, 4, 2)).astype(np.float32)),
        "n_frames_eff": jnp.asarray([4, 4, 3, 2], jnp.int32),
    }
    kw = dict(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
              proj_inner_dim=64, proj_out_dim=32)
    lr = warmup_cosine(0.1, 10, 1, 5)

    losses = {}
    finals = {}
    for fuse in (False, True):
        model = PixPro(fuse_views=fuse, **kw)
        tx0 = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                                   {"im1": batch["ims1"][:1, 0]})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))
        step = make_train_step(model, tx, lr_schedule=lr, ema_total_steps=50,
                               ema_base_momentum=0.99, use_flow=True,
                               use_flow_frames=True, alpha1=0.01, alpha2=0.5,
                               donate=False)
        ls = []
        for _ in range(3):
            state, metrics = step(state, batch)
            ls.append(float(metrics["loss"]))
        losses[fuse] = ls
        finals[fuse] = state

    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-4, atol=2e-5)
    # BN feedback: running stats after 3 steps must agree too
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a),
                                                 np.asarray(b_),
                                                 rtol=2e-4, atol=2e-5),
        finals[True].batch_stats, finals[False].batch_stats)


def test_live_raft_train_step():
    """On-the-fly flow path: frozen RAFT inside the compiled train step
    (reference `util.calc_optical_flow`/`mem_reduce_calc_optical_flow`)."""
    from pixflow_tpu.models.raft import RAFT, raft_batch_flows

    b, n, hw = 2, 2, 32
    raft = RAFT(small=True)
    frames = jnp.asarray(RNG.integers(0, 255, (b, n, hw, hw, 3)).astype(np.float32))
    raft_vars = raft.init(jax.random.PRNGKey(1), frames[:, 0], frames[:, 1],
                          iters=1)

    def raft_fn(fr):
        return raft_batch_flows(raft, raft_vars, fr, iters=1)

    coords = _coords(b, 1)[:, 0]
    batch = {
        "im1": jnp.asarray(RNG.standard_normal((b, hw, hw, 3)).astype(np.float32)),
        "im2": jnp.asarray(RNG.standard_normal((b, hw, hw, 3)).astype(np.float32)),
        "coord1": jnp.asarray(coords), "coord2": jnp.asarray(coords),
        "frames": frames,
    }
    model = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32)
    lr = warmup_cosine(0.1, 10, 1, 5)
    tx0 = lars_sgd(lr, weight_decay=1e-5)
    state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                               {"im1": batch["im1"][:1]})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, lr_schedule=lr, ema_total_steps=50,
                           ema_base_momentum=0.99, use_flow=True,
                           alpha1=0.01, alpha2=0.5, raft_fn=raft_fn,
                           donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "mask_ratio_fwd" in metrics


def test_live_raft_multi_span_matches_file_path():
    """Live RAFT + multi-span (reference on-the-fly branch,
    `contrast/util.py:129-171`: freshly computed flows feed the same
    all_concat_flow per-(span,start) composition as precomputed files):
    the in-step raft_fn wiring must reproduce the file path exactly when
    the 'files' contain the very flows raft_fn computes."""
    from pixflow_tpu.models.raft import RAFT, raft_batch_flows

    n_frames, b, hw = 3, 2, 32
    f = k = n_frames - 1
    raft = RAFT(small=True)
    frames = jnp.asarray(RNG.integers(0, 255, (b, n_frames, hw, hw, 3))
                         .astype(np.float32))
    raft_vars = raft.init(jax.random.PRNGKey(2), frames[:, 0], frames[:, 1],
                          iters=1)

    def raft_fn(fr):
        return raft_batch_flows(raft, raft_vars, fr, iters=1)

    common = {
        "ims1": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3))
                            .astype(np.float32)),
        "ims2": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3))
                            .astype(np.float32)),
        "coords1": jnp.asarray(_coords(b, f)),
        "coords2": jnp.asarray(_coords(b, f)),
        "n_frames_eff": jnp.asarray([3, 2], jnp.int32),
    }
    flows_fwd, flows_bwd = raft_fn(frames)
    assert flows_fwd.shape == (b, k, hw // 8, hw // 8, 2)
    batches = {
        "live": {**common, "frames": frames},
        "file": {**common, "flows_fwd": flows_fwd, "flows_bwd": flows_bwd},
    }

    model = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32)
    lr = warmup_cosine(0.1, 10, 1, 5)
    results = {}
    for mode, batch in batches.items():
        tx0 = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                                   {"im1": batch["ims1"][:1, 0]})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))
        step = make_train_step(
            model, tx, lr_schedule=lr, ema_total_steps=50,
            ema_base_momentum=0.99, use_flow=True, use_flow_frames=True,
            alpha1=0.01, alpha2=0.5,
            raft_fn=raft_fn if mode == "live" else None, donate=False)
        state, metrics = step(state, batch)
        results[mode] = (state, {kk: float(v) for kk, v in metrics.items()})

    m_live, m_file = results["live"][1], results["file"][1]
    # discrete pair counts exact; continuous values to f32 fusion noise
    assert m_live["pos_num"] == m_file["pos_num"]
    assert m_live["pos_num_1"] == m_file["pos_num_1"]
    np.testing.assert_allclose(m_live["loss"], m_file["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_live["mask_ratio_fwd"],
                               m_file["mask_ratio_fwd"], rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6),
        results["live"][0].params, results["file"][0].params)


@pytest.mark.parametrize("multi_span", [False, True])
def test_live_raft_small_lazy_flow_up_matches_materializing(multi_span):
    """Live RAFT-small + --flow_up: the lazy point-domain path (RAFT emits
    the coarse stack, LazyFlowUp composes it — `driver._make_raft_fn`) must
    match the materializing path (RAFT emits `upflow8(flow_low)` full-res
    fields, composed at full res). Exact for the small model because its
    full-res output IS `upflow8(flow_low)` (reference
    `contrast/flow/raft.py:152-160` — no convex upsampling head)."""
    from pixflow_tpu.models.raft import RAFT, raft_batch_flows

    n_frames, b, hw = (3, 2, 32) if multi_span else (2, 2, 32)
    f = n_frames - 1
    raft = RAFT(small=True)
    frames = jnp.asarray(RNG.integers(0, 255, (b, n_frames, hw, hw, 3))
                         .astype(np.float32))
    raft_vars = raft.init(jax.random.PRNGKey(3), frames[:, 0], frames[:, 1],
                          iters=1)

    def make_raft_fn(up):
        def raft_fn(fr):
            return raft_batch_flows(raft, raft_vars, fr, iters=2, up=up)
        return raft_fn

    if multi_span:
        batch = {
            "ims1": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3))
                                .astype(np.float32)),
            "ims2": jnp.asarray(RNG.standard_normal((b, f, hw, hw, 3))
                                .astype(np.float32)),
            "coords1": jnp.asarray(_coords(b, f)),
            "coords2": jnp.asarray(_coords(b, f)),
            "n_frames_eff": jnp.asarray([3, 2], jnp.int32),
            "frames": frames,
        }
        sample = batch["ims1"][:1, 0]
    else:
        coords = _coords(b, 1)[:, 0]
        batch = {
            "im1": jnp.asarray(RNG.standard_normal((b, hw, hw, 3))
                               .astype(np.float32)),
            "im2": jnp.asarray(RNG.standard_normal((b, hw, hw, 3))
                               .astype(np.float32)),
            "coord1": jnp.asarray(coords), "coord2": jnp.asarray(coords),
            "frames": frames,
        }
        sample = batch["im1"][:1]

    model = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32)
    lr = warmup_cosine(0.1, 10, 1, 5)
    results = {}
    # lazy: coarse stack + LazyFlowUp (flow_up=True in the step);
    # materializing: full-res upflow8 fields composed at full res
    # (flow_up=False in the step — they are already upsampled)
    for mode, (up, step_flow_up) in {"lazy": (False, True),
                                     "mat": (True, False)}.items():
        tx0 = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                                   {"im1": sample})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))
        step = make_train_step(
            model, tx, lr_schedule=lr, ema_total_steps=50,
            ema_base_momentum=0.99, use_flow=True,
            use_flow_frames=multi_span, flow_up=step_flow_up,
            alpha1=0.01, alpha2=0.5, raft_fn=make_raft_fn(up), donate=False)
        state, metrics = step(state, batch)
        results[mode] = (state, {kk: float(v) for kk, v in metrics.items()})

    m_lazy, m_mat = results["lazy"][1], results["mat"][1]
    assert m_lazy["pos_num"] == m_mat["pos_num"]
    assert m_lazy["pos_num_1"] == m_mat["pos_num_1"]
    np.testing.assert_allclose(m_lazy["loss"], m_mat["loss"], rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6),
        results["lazy"][0].params, results["mat"][0].params)


def test_dataset_emits_frame_crop_stacks(tmp_path):
    from PIL import Image
    import torch
    from pixflow_tpu.data import VideoFrameDataset, get_transform, list_image_folder

    for v in range(2):
        vd = tmp_path / "train" / f"v{v}"
        vd.mkdir(parents=True)
        for fr in range(5):
            Image.fromarray(RNG.integers(0, 255, (36, 64, 3)).astype(
                np.uint8)).save(vd / f"f{fr:02d}.jpg")
    for d in ("fw", "bw"):
        (tmp_path / d).mkdir()
        for v in range(2):
            torch.save(torch.randn(4, 2, 5, 8), tmp_path / d / f"v{v}.pth")

    ds = VideoFrameDataset(
        samples=list_image_folder(str(tmp_path / "train"), "bdd100k"),
        transform=get_transform("BYOL", 0.5, 24),
        n_frames=4, two_crop=True, use_flow_frames=True,
        flow_fwd_root=str(tmp_path / "fw"), flow_bwd_root=str(tmp_path / "bw"))
    s = ds.__getitem__(0, random.Random(0))
    assert s["ims1"].shape == (3, 24, 24, 3)
    assert s["ims2"].shape == (3, 24, 24, 3)
    assert s["coords1"].shape == (3, 10)
    assert s["flows_fwd"].shape == (3, 5, 8, 2)
    assert int(s["n_frames_eff"]) == 4


@pytest.mark.slow
def test_multispan_ablation_selfcheck_and_monotonicity():
    """The synthetic multi-span ablation (tools/ablate_multispan.py,
    docs/DESIGN.md §12): exact flows reproduce the ground-truth masks
    exactly, and under RAFT-like noise the short-span windows (which only
    multi-span mode trains on) have better positive-mask precision than
    the full-span window."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "tools"))
    from ablate_multispan import run

    rows = run(k=5, sigmas=(0.0, 4.0), seed=0, n_scenes=4)
    clean = {r["span"]: r for r in rows if r["sigma_px"] == 0.0}
    noisy = {r["span"]: r for r in rows if r["sigma_px"] == 4.0}
    for span, r in clean.items():
        assert r["precision"] == 1.0 and r["recall"] == 1.0, (span, r)
    assert noisy[1]["precision"] > noisy[5]["precision"]
    assert noisy[1]["recall"] > noisy[5]["recall"]
    # multi-span adds strictly more positives than the single-span pair
    extra = sum(noisy[s]["pred_pos"] for s in (1, 2, 3, 4))
    assert extra > 3 * noisy[5]["pred_pos"]


def test_multispan_device_aug_through_driver(tmp_path):
    """Multi-span + --device-aug: per-frame crop stacks carry per-frame aug
    params; the step applies the photometric stack to the [B,F,...] stacks
    on-device."""
    import os
    import torch
    from PIL import Image

    rng = np.random.default_rng(15)
    root = tmp_path / "data"
    for v in range(8):
        vd = root / "train" / f"v{v:02d}"
        vd.mkdir(parents=True)
        for f in range(4):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(vd / f"f{f:02d}.jpg")
    for d in ("forward", "backward"):
        (root / "flow" / "train" / d).mkdir(parents=True)
        for v in range(8):
            torch.save(torch.randn(3, 2, 6, 8),
                       root / "flow" / "train" / d / f"v{v:02d}.pth")

    from pixflow_tpu.configs import PretrainConfig
    from pixflow_tpu.train.driver import train
    cfg = PretrainConfig()
    cfg.data.data_dir = str(root)
    cfg.data.dataset = "bdd100k"
    cfg.data.aug = "BYOL"
    cfg.data.crop = 0.5
    cfg.data.image_size = 64
    cfg.data.n_frames = 4
    cfg.data.batch_size = 1
    cfg.data.num_workers = 1
    cfg.data.device_aug = True
    cfg.model.arch = "resnet18"
    cfg.model.pixpro_transform_layer = 1
    cfg.flow.use_flow = True
    cfg.flow.use_flow_file = True
    cfg.flow.use_flow_frames = True
    cfg.flow.flow_root = str(root / "flow")
    cfg.flow.alpha1 = 0.01
    cfg.flow.alpha2 = 0.5
    cfg.optim.epochs = 1
    cfg.optim.warmup_epoch = 0
    cfg.runtime.output_dir = str(tmp_path / "out")
    cfg.runtime.compute_dtype = "float32"
    cfg.runtime.print_freq = 1
    cfg.runtime.save_freq = 1
    state = train(cfg)
    assert int(state.step) == 1
