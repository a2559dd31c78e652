"""Multi-process equivalence for the FLOW recipe (the flagship
nframe>1 configuration, reference
`tools/pretrain_bdd100k_job_2000ep_nframe6_gpu16.sh`).

tests/test_multiprocess.py pins the no-flow driver; this job adds what the
flow path uniquely sends through the multi-process machinery: per-sample
precomputed flow stacks ([B,K,h,w,2] float arrays assembled into global
batches by `make_array_from_process_local_data`), the in-step
compose-and-mask chain under a mesh that spans processes, and the
mask-ratio telemetry. Same contract as the no-flow test: a 2-process run
reproduces the 1-process 2-device run — discrete pair statistics exact,
continuous metrics to float32 ulp noise (see test_multiprocess.py's module
docstring for why CPU cross-topology bitwise equality is unattainable)."""

import os

import numpy as np
import pytest
from PIL import Image

from test_multiprocess import _pretrain_cfg, _read_metrics, _run_job


@pytest.fixture(scope="module")
def synth_flow_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bdd_mp_flow")
    rng = np.random.default_rng(23)
    import torch
    for d in ("forward", "backward"):
        (root / "flow" / "pth" / "train" / d).mkdir(parents=True)
    for v in range(8):
        vd = root / "train" / f"video{v:03d}"
        vd.mkdir(parents=True)
        for f in range(4):
            arr = rng.integers(0, 255, (72, 128, 3), np.uint8)
            Image.fromarray(arr).save(vd / f"frame{f:04d}.jpg")
        for d in ("forward", "backward"):
            flow = torch.from_numpy(
                rng.standard_normal((3, 2, 9, 16)).astype(np.float32))
            torch.save(flow,
                       root / "flow" / "pth" / "train" / d / f"video{v:03d}.pth")
    return str(root)


def _flow_cfg(synth_flow_root, out_dir):
    cfg = _pretrain_cfg(synth_flow_root, out_dir)
    cfg.data.n_frames = 3
    cfg.optim.epochs = 1  # 8 videos / global batch 4 = 2 steps
    cfg.flow.use_flow = True
    cfg.flow.use_flow_file = True
    cfg.flow.flow_root = os.path.join(synth_flow_root, "flow", "pth")
    cfg.flow.alpha1 = 0.01
    cfg.flow.alpha2 = 0.5
    return cfg


def test_two_process_flow_pretrain_matches_single_process(
        synth_flow_root, tmp_path_factory, tmp_path):
    work = str(tmp_path_factory.mktemp("mp_flow"))
    out_mp = os.path.join(work, "out")
    results = _run_job("pretrain", _flow_cfg(synth_flow_root,
                                             out_mp).to_json(), work)
    assert [r["step"] for r in results] == [2, 2]

    from pixflow_tpu.train.driver import train
    out_sp = str(tmp_path / "sp_out")
    cfg_sp = _flow_cfg(synth_flow_root, out_sp)
    cfg_sp.runtime.mesh_shape = 2
    train(cfg_sp)

    mp_recs, sp_recs = _read_metrics(out_mp), _read_metrics(out_sp)
    assert len(mp_recs) == len(sp_recs) == 2
    for mp_r, sp_r in zip(mp_recs, sp_recs):
        assert mp_r["step"] == sp_r["step"]
        # identical global batches + identical flow-warped geometry =>
        # the discrete pair statistics (and their per-direction splits)
        # must be exact
        for key in ("pos_num", "pos_num_1", "pos_num_2", "lr",
                    "ema_momentum"):
            assert mp_r[key] == sp_r[key], (
                f"step {mp_r['step']} {key}: "
                f"{mp_r[key]!r} != {sp_r[key]!r}")
        for key in ("loss", "pos_mean", "mask_ratio_fwd", "mask_ratio_bwd"):
            assert mp_r[key] == pytest.approx(sp_r[key], rel=2e-5), (
                f"step {mp_r['step']} {key}")
