"""Numerical parity against the *actual reference implementation*.

The reference repo (mounted read-only at /root/reference) runs fine on CPU
torch; these tests execute its loss/flow functions as an oracle on the same
inputs as our JAX ops and require agreement to float tolerance. This pins
the exact behaviors that silently drift otherwise: bin-center geometry,
flow-warped positive masks, long-range composition, cycle consistency."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def oracle():
    # the reference's debug_utils imports torchvision (not installed);
    # stub it — the functions under test never touch it.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    # contrast.models/__init__ re-exports the PixPro *class*; grab the module
    ref_pixpro = importlib.import_module("contrast.models.PixPro")
    ref_util = importlib.import_module("contrast.util")
    return ref_pixpro, ref_util


SIZE = (720, 1280)  # H, W


def _rng(seed):
    return np.random.default_rng(seed)


def _coords(b, seed=0):
    r = np.random.default_rng(seed)
    out = np.zeros((b, 10), np.float32)
    for i in range(b):
        j, ii = int(r.integers(0, 600)), int(r.integers(0, 300))
        w, h = int(r.integers(150, 600)), int(r.integers(150, 400))
        out[i] = [j / 1279, ii / 719, (j + w - 1) / 1279, (ii + h - 1) / 719,
                  j, ii, w, h, 1280, 720]
    return out


def _feat(b, c=16, hw=7, seed=100):
    x = _rng(seed).standard_normal((b, c, hw, hw)).astype(np.float32)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x


def test_regression_loss_no_flow_matches_reference(oracle):
    ref_pixpro, _ = oracle
    from pixflow_tpu.ops import pixpro_pair_loss

    b = 4
    q, k = _feat(b, seed=101), _feat(b, seed=102)
    cq, ck = _coords(b, 1), _coords(b, 2)

    ref_loss, (ref_pn, ref_pm) = ref_pixpro.regression_loss(
        torch.from_numpy(q), torch.from_numpy(k),
        torch.from_numpy(cq), torch.from_numpy(ck), pos_ratio=0.7)

    loss, (pn, pm) = pixpro_pair_loss(
        jnp.asarray(q.transpose(0, 2, 3, 1)),
        jnp.asarray(k.transpose(0, 2, 3, 1)),
        jnp.asarray(cq), jnp.asarray(ck), 0.7)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pn), ref_pn.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pm), ref_pm.numpy(), rtol=1e-5)


@pytest.mark.parametrize("flow_res", [(90, 160), (720, 1280)])
def test_regression_loss_with_flow_matches_reference(oracle, flow_res):
    """Flow-warped loss: both the 1/8-res (ratio-rescaled) and full-res
    paths of add_optical_flow (`PixPro.py:46-89`)."""
    ref_pixpro, _ = oracle
    from pixflow_tpu.ops import pixpro_pair_loss

    b = 3
    fh, fw = flow_res
    q, k = _feat(b, seed=103), _feat(b, seed=104)
    cq, ck = _coords(b, 3), _coords(b, 4)
    flow = (20 * _rng(105).standard_normal((b, 2, fh, fw))).astype(np.float32)
    mask = _rng(106).random((b, fh, fw)) > 0.3

    size = torch.tensor([SIZE[0], SIZE[1]])
    coord_q_ref = [torch.from_numpy(cq),
                   [torch.from_numpy(flow), size, torch.from_numpy(mask)]]
    coord_k_ref = [torch.from_numpy(ck),
                   [torch.from_numpy(flow), size, torch.from_numpy(mask)]]
    ref_loss, (ref_pn, ref_pm) = ref_pixpro.regression_loss(
        torch.from_numpy(q), torch.from_numpy(k),
        coord_q_ref, coord_k_ref, pos_ratio=0.7)

    loss, (pn, pm) = pixpro_pair_loss(
        jnp.asarray(q.transpose(0, 2, 3, 1)),
        jnp.asarray(k.transpose(0, 2, 3, 1)),
        jnp.asarray(cq), jnp.asarray(ck), 0.7,
        flow=jnp.asarray(flow.transpose(0, 2, 3, 1)),
        flow_mask=jnp.asarray(mask))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pn), ref_pn.numpy(), rtol=1e-6)


@pytest.mark.parametrize("k", [2, 4])
def test_concat_flow_matches_reference(oracle, k):
    _, ref_util = oracle
    from pixflow_tpu.ops import concat_flow

    flows = (5 * _rng(200 + k).standard_normal((k, 2, 2, 24, 32))).astype(np.float32)
    ref = ref_util.concat_flow(torch.from_numpy(flows)).numpy()
    ours = np.asarray(concat_flow(jnp.asarray(flows.transpose(0, 1, 3, 4, 2))))
    # coords1 - coords0 cancellation leaves ~1e-3 px f32 noise
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-2)


def test_concat_flow_norm_mode_matches_reference(oracle):
    _, ref_util = oracle
    from pixflow_tpu.ops import concat_flow

    flows = (5 * _rng(210).standard_normal((3, 2, 2, 16, 20))).astype(np.float32)
    ref = ref_util.concat_flow(torch.from_numpy(flows), is_norm=True).numpy()
    ours = np.asarray(concat_flow(jnp.asarray(flows.transpose(0, 1, 3, 4, 2)),
                                  is_norm=True))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_all_concat_flow_matches_reference(oracle):
    _, ref_util = oracle
    from pixflow_tpu.ops import all_concat_flow

    kf = 3
    fwd = (3 * _rng(220).standard_normal((kf, 2, 2, 16, 20))).astype(np.float32)
    bwd = (3 * _rng(221).standard_normal((kf, 2, 2, 16, 20))).astype(np.float32)
    ref_f, ref_b = ref_util.all_concat_flow(
        torch.from_numpy(fwd), torch.from_numpy(bwd), use_flow_frames=True)
    ours_f, ours_b = all_concat_flow(
        jnp.asarray(fwd.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(bwd.transpose(0, 1, 3, 4, 2)), use_flow_frames=True)
    np.testing.assert_allclose(np.asarray(ours_f),
                               ref_f.numpy().transpose(0, 1, 3, 4, 2),
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ours_b),
                               ref_b.numpy().transpose(0, 1, 3, 4, 2),
                               rtol=1e-3, atol=2e-2)


def test_cycle_consistency_matches_reference(oracle):
    _, ref_util = oracle
    from pixflow_tpu.ops import forward_backward_consistency

    fwd = (4 * _rng(230).standard_normal((2, 2, 24, 32))).astype(np.float32)
    bwd = (4 * _rng(231).standard_normal((2, 2, 24, 32))).astype(np.float32)
    _, _, (ref_mask, _) = ref_util.forward_backward_consistency(
        torch.from_numpy(fwd), torch.from_numpy(bwd),
        alpha_1=0.01, alpha_2=0.5)
    ours = forward_backward_consistency(
        jnp.asarray(fwd.transpose(0, 2, 3, 1)),
        jnp.asarray(bwd.transpose(0, 2, 3, 1)), 0.01, 0.5)
    agree = np.mean(np.asarray(ours) == ref_mask.numpy())
    # boundary-of-threshold pixels may flip either way in f32; demand
    # near-total agreement
    assert agree > 0.999, f"mask agreement only {agree:.4f}"


def test_lars_matches_reference(oracle):
    """Our optax LARS vs the reference's optimizer wrapper + torch SGD."""
    sys.path.insert(0, REF)
    from contrast.lars import LARS as RefLARS, add_weight_decay

    from pixflow_tpu.train import lars_sgd

    torch.manual_seed(0)
    model = torch.nn.Sequential(torch.nn.Linear(8, 4), torch.nn.Linear(4, 2))
    params_np = {f"p{i}": p.detach().numpy().copy()
                 for i, p in enumerate(model.parameters())}

    opt = torch.optim.SGD(add_weight_decay(model, 1e-3), lr=0.1, momentum=0.9)
    opt = RefLARS(opt)

    grads = [torch.randn_like(p) for p in model.parameters()]
    for _ in range(3):
        opt.zero_grad()
        for p, g in zip(model.parameters(), grads):
            p.grad = g.clone()
        opt.step()
    want = {f"p{i}": p.detach().numpy() for i, p in enumerate(model.parameters())}

    tx = lars_sgd(0.1, momentum=0.9, weight_decay=1e-3)
    jp = {k: jnp.asarray(v) for k, v in params_np.items()}
    jg = {f"p{i}": jnp.asarray(g.numpy()) for i, g in enumerate(grads)}
    st = tx.init(jp)
    for _ in range(3):
        upd, st = tx.update(jg, st, jp)
        jp = {k: jp[k] + upd[k] for k in jp}

    for k in jp:
        np.testing.assert_allclose(np.asarray(jp[k]), want[k],
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("small,iters,res", [
    (True, 8, (128, 160)),
    (False, 8, (128, 160)),
    # recipe iteration count: tolerance must not blow up with GRU depth
    (True, 12, (128, 160)),
    (False, 12, (128, 160)),
    # recipe inference resolution (flow precompute / live path, 360x640)
    (True, 12, (360, 640)),
])
def test_raft_numerical_parity(oracle, small, iters, res):
    """Full RAFT network vs the reference's torch implementation
    (`contrast/flow/raft.py:100-160`): random-init torch weights exported
    through models/raft/convert.py, identical frame pairs, full GRU loop,
    test_mode (flow_low, flow_up) outputs."""
    import argparse

    from contrast.flow import RAFT as RefRAFT

    from pixflow_tpu.models.raft import RAFT
    from pixflow_tpu.models.raft.convert import torch_state_dict_to_flax

    torch.manual_seed(3 if small else 4)
    args = argparse.Namespace(small=small, dropout=0.0, alternate_corr=False,
                              mixed_precision=False)
    ref = RefRAFT(args)
    ref.eval()

    variables = torch_state_dict_to_flax(ref.state_dict(), small=small)
    model = RAFT(small=small)

    r = np.random.default_rng(7)
    # H, W >= 128: below that the 4-level corr pyramid bottoms out at a 1x1
    # map and the reference's bilinear_sampler divides by (W-1)=0 -> NaN
    h, w = res
    im1 = r.integers(0, 255, (1, h, w, 3)).astype(np.float32)
    im2 = np.clip(im1 + 8.0 * r.standard_normal((1, h, w, 3)), 0, 255
                  ).astype(np.float32)

    with torch.no_grad():
        low_t, up_t = ref(torch.from_numpy(im1.transpose(0, 3, 1, 2)),
                          torch.from_numpy(im2.transpose(0, 3, 1, 2)),
                          iters=iters, test_mode=True)
    low_ref = low_t.numpy().transpose(0, 2, 3, 1)
    up_ref = up_t.numpy().transpose(0, 2, 3, 1)

    low_j, up_j = model.apply(variables, jnp.asarray(im1), jnp.asarray(im2),
                              iters=iters)

    np.testing.assert_allclose(np.asarray(low_j), low_ref,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(up_j), up_ref,
                               rtol=1e-3, atol=1e-3)


def _desync_batchnorm(module):
    """SyncBatchNorm -> BatchNorm2d so the reference runs on CPU (shared
    with tools/compare_loss_curve.py via tools/ref_loop.py)."""
    from tools.ref_loop import desync_batchnorm
    desync_batchnorm(module, torch)


@pytest.fixture(scope="module")
def dist_oracle(oracle):
    """The full-model oracle additionally needs a (world-1, gloo) process
    group: reference PixPro.__init__ calls get_world_size()."""
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29572", rank=0, world_size=1)
    return oracle


@pytest.mark.slow
@pytest.mark.parametrize("with_flow", [False, True])
def test_composed_train_step_trajectory_parity(dist_oracle, with_flow):
    """The last composition gap: run the reference's *actual* training loop —
    torch PixPro (in-forward cosine-ramped EMA, `PixPro.py:398-399,321-337`)
    + add_weight_decay + SGD+LARS (`main_pretrain.py:66-71`) +
    GradualWarmupScheduler stepped per iteration (`main_pretrain.py:268-269`,
    `lr_scheduler.py:6-62`) — for 5 steps on fixed synthetic batches, then
    replay identical init weights/batches through our jitted
    `make_train_step` and require the per-step loss sequence, per-step lr,
    and the final parameter tree to agree.

    This is where a silent composition bug (wd-inside-LARS interaction,
    EMA/BN-update ordering, lr off-by-one) would hide; every piece is
    already unit-oracle-pinned separately."""
    ref_pixpro_mod, ref_util = dist_oracle
    import contrast.resnet as ref_resnet
    from contrast.lars import LARS as RefLARS, add_weight_decay
    from contrast.lr_scheduler import get_scheduler
    from contrast.flow import upflow8

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax
    from pixflow_tpu.train import (
        TrainState, frozen_momentum_branch_mask, lars_sgd, make_lr_schedule,
        make_train_step,
    )

    STEPS, B, HW = 5, 2, 64
    LR, WD, MOM = 0.4, 1e-5, 0.9
    EPOCHS, WARMUP_EPOCH, STEPS_PER_EPOCH = 10, 1, 10  # stays in warmup
    EMA_BASE, EMA_K = 0.99, 1280  # K = num_instances/world/batch*epochs

    from tools.ref_loop import make_ref_args, make_ref_flow_args_fn
    args = make_ref_args(pixpro_momentum=EMA_BASE, epochs=EPOCHS,
                         warmup_epoch=WARMUP_EPOCH)
    torch.manual_seed(21 if with_flow else 20)
    ref_model = ref_pixpro_mod.PixPro(ref_resnet.resnet50, args)
    _desync_batchnorm(ref_model)
    ref_model.train()
    init_sd = {"module." + k: v.detach().clone()
               for k, v in ref_model.state_dict().items()}

    rng = np.random.default_rng(31 if with_flow else 30)
    batches = []
    for _ in range(STEPS):
        batches.append(dict(
            im1=rng.standard_normal((B, 3, HW, HW)).astype(np.float32),
            im2=rng.standard_normal((B, 3, HW, HW)).astype(np.float32),
            coord1=_coords(B, int(rng.integers(1 << 30))),
            coord2=_coords(B, int(rng.integers(1 << 30))),
            flows_fwd=(8 * rng.standard_normal((B, 1, 2, 90, 160))
                       ).astype(np.float32),
            flows_bwd=(8 * rng.standard_normal((B, 1, 2, 90, 160))
                       ).astype(np.float32)))

    alpha1, alpha2 = 0.01, 0.5
    # apply_optical_flow's use_flow_file+flow_up branch on CPU
    # (`util.py:181-248`); shared with tools/compare_loss_curve.py
    ref_flow_args = make_ref_flow_args_fn(torch, ref_util, upflow8,
                                          alpha1, alpha2)

    opt = torch.optim.SGD(add_weight_decay(ref_model, WD), lr=LR, momentum=MOM)
    opt = RefLARS(opt)
    scheduler = get_scheduler(opt, STEPS_PER_EPOCH, args)

    ref_losses, ref_lrs = [], []
    for b in batches:
        if with_flow:
            c1, c2 = ref_flow_args(b)
        else:
            c1, c2 = torch.from_numpy(b["coord1"]), torch.from_numpy(b["coord2"])
        loss, _ = ref_model(torch.from_numpy(b["im1"]),
                            torch.from_numpy(b["im2"]), c1, c2)
        opt.zero_grad()
        loss.backward()
        ref_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        scheduler.step()
        ref_losses.append(float(loss.detach()))

    final_sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    want = torch_pixpro_to_flax(final_sd)

    # --- our side: identical init weights, jitted composed step ---
    variables = torch_pixpro_to_flax(init_sd)
    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7)
    lr_sched = make_lr_schedule("cosine", LR, EPOCHS, WARMUP_EPOCH,
                                STEPS_PER_EPOCH)
    tx = lars_sgd(lr_sched, momentum=MOM, weight_decay=WD,
                  frozen_mask=frozen_momentum_branch_mask(variables["params"]))
    state = TrainState(
        step=jnp.zeros([], jnp.int32), ema_k=jnp.zeros([], jnp.int32),
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]))
    step = make_train_step(
        model, tx, lr_schedule=lr_sched, ema_total_steps=EMA_K,
        ema_base_momentum=EMA_BASE, use_flow=with_flow, flow_up=with_flow,
        alpha1=alpha1 if with_flow else None,
        alpha2=alpha2 if with_flow else None, donate=False)

    losses, lrs = [], []
    for b in batches:
        jb = {"im1": jnp.asarray(b["im1"].transpose(0, 2, 3, 1)),
              "im2": jnp.asarray(b["im2"].transpose(0, 2, 3, 1)),
              "coord1": jnp.asarray(b["coord1"]),
              "coord2": jnp.asarray(b["coord2"])}
        if with_flow:
            jb["flows_fwd"] = jnp.asarray(b["flows_fwd"].transpose(0, 1, 3, 4, 2))
            jb["flows_bwd"] = jnp.asarray(b["flows_bwd"].transpose(0, 1, 3, 4, 2))
        state, metrics = step(state, jb)
        losses.append(float(metrics["loss"]))
        lrs.append(float(metrics["lr"]))

    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-6)
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-3, atol=2e-4)

    flat_ours = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_want = dict(jax.tree_util.tree_flatten_with_path(want["params"])[0])
    assert len(flat_ours) == len(flat_want)
    for path, leaf in flat_ours:
        ref_leaf = np.asarray(flat_want[path])
        got = np.asarray(leaf)
        # norm-relative per leaf: 5 steps of f32 accumulation leave
        # per-element noise (single BN-bias elements reach ~2% rel at 1e-4
        # magnitude) but a composition bug (wrong lr/wd/momentum/EMA step)
        # shifts the whole leaf. The per-step loss/lr sequences above stay
        # elementwise-pinned. Floor handles zero-init leaves (biases,
        # zero-gamma BN) whose reference norm is itself noise-scale.
        err = np.linalg.norm(got - ref_leaf)
        floor = 1e-4 * np.sqrt(got.size)
        limit = 5e-3 * max(np.linalg.norm(ref_leaf), floor)
        assert err < limit, (
            f"param {jax.tree_util.keystr(path)} diverged after {STEPS} "
            f"composed steps: ||diff||={err:.3e} > {limit:.3e}")


@pytest.mark.slow
def test_linear_probe_trajectory_matches_reference(oracle):
    """Linear-eval oracle: the reference's probe semantics — frozen backbone
    with LIVE train-mode BN, SGD on fc only, per-iteration warmup scheduler,
    cross-entropy (`main_linear.py:27-48,169-210`) — run for 5 steps on a
    tiny torch ResNet-18, then replayed through our
    `eval/linear.make_linear_train_step` from identical weights/batches.
    Loss sequence and final fc parameters must agree."""
    import contrast.resnet as ref_resnet
    from contrast.lr_scheduler import get_scheduler

    from pixflow_tpu.eval.linear import (
        linear_optimizer, make_linear_train_step)
    from pixflow_tpu.models import make_resnet
    from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax
    from pixflow_tpu.train import TrainState, make_lr_schedule

    import types as _types
    import torch.nn.functional as F

    # 224 input: the reference 'reduce' head is AvgPool2d(7) over a 7x7 c5
    STEPS, B, HW, C = 5, 2, 224, 10
    LR, MOM = 0.3, 0.9
    EPOCHS, WARMUP, SPE = 10, 1, 10

    torch.manual_seed(40)
    ref = ref_resnet.resnet18(low_dim=C, head_type="reduce")
    ref.train()
    for name, p in ref.named_parameters():
        if "fc" not in name:
            p.requires_grad = False
    init_sd = {"module.encoder." + k: v.detach().clone()
               for k, v in ref.state_dict().items()}

    opt = torch.optim.SGD(ref.fc.parameters(), lr=LR, momentum=MOM,
                          weight_decay=0.0)
    sched_args = _types.SimpleNamespace(
        lr_scheduler="cosine", epochs=EPOCHS, warmup_epoch=WARMUP,
        warmup_multiplier=100)
    scheduler = get_scheduler(opt, SPE, sched_args)

    rng = np.random.default_rng(41)
    batches = [(rng.standard_normal((B, 3, HW, HW)).astype(np.float32),
                rng.integers(0, C, B).astype(np.int64))
               for _ in range(STEPS)]

    ref_losses = []
    for x, y in batches:
        out = ref(torch.from_numpy(x))
        loss = F.cross_entropy(out, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        scheduler.step()
        ref_losses.append(float(loss.detach()))
    ref_fc_w = ref.fc.weight.detach().numpy()
    ref_fc_b = ref.fc.bias.detach().numpy()

    # ours, from identical init
    variables = torch_pixpro_to_flax(init_sd)
    model = make_resnet("resnet18", head_type="reduce", low_dim=C)
    lr_sched = make_lr_schedule("cosine", LR, EPOCHS, WARMUP, SPE)
    tx = linear_optimizer(lr_sched, momentum=MOM, weight_decay=0.0,
                          params=variables["params"]["encoder"])
    state = TrainState(
        step=jnp.zeros([], jnp.int32), ema_k=jnp.zeros([], jnp.int32),
        params=variables["params"]["encoder"],
        batch_stats=variables["batch_stats"]["encoder"],
        opt_state=tx.init(variables["params"]["encoder"]))
    step = make_linear_train_step(model, tx, lr_sched, donate=False)

    losses = []
    for x, y in batches:
        state, metrics = step(state, {
            "image": jnp.asarray(x.transpose(0, 2, 3, 1)),
            "label": jnp.asarray(y)})
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(state.params["fc"]["kernel"]), ref_fc_w.T,
        rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.params["fc"]["bias"]), ref_fc_b,
        rtol=5e-3, atol=1e-5)
    # frozen trunk must not have moved
    np.testing.assert_array_equal(
        np.asarray(state.params["conv1"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["conv1"]["kernel"]))


@pytest.mark.slow
@pytest.mark.parametrize("flow_up", [False, True])
def test_live_raft_chain_matches_reference(oracle, monkeypatch, flow_up):
    """The on-the-fly flow branch end-to-end: our frames -> RAFT ->
    composition -> cycle-mask chain vs the reference's
    `mem_reduce_calc_optical_flow` -> `all_concat_flow` ->
    `forward_backward_consistency` (`contrast/util.py:129-171,105-126,
    252-297`) with identical (random-init, converter-imported) RAFT-small
    weights. flow_up=True is the live-RAFT full-resolution recipe where
    RAFT's own upsampled output feeds the composition directly."""
    import argparse

    from contrast.flow import RAFT as RefRAFT

    from pixflow_tpu.models.raft import RAFT
    from pixflow_tpu.models.raft.convert import torch_state_dict_to_flax
    from pixflow_tpu.models.raft.raft import raft_batch_flows
    from pixflow_tpu.ops.flow import compose_and_mask

    _, ref_util = oracle
    # the reference chain hard-codes .cuda(); run it in place on CPU
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    torch.manual_seed(6)
    targs = argparse.Namespace(small=True, dropout=0.0, alternate_corr=False,
                               mixed_precision=False)
    ref_raft = RefRAFT(targs)
    ref_raft.eval()
    variables = torch_state_dict_to_flax(ref_raft.state_dict(), small=True)
    model = RAFT(small=True)

    B, n, H, W = 2, 3, 128, 160
    r = np.random.default_rng(9)
    frames = np.empty((B, n, H, W, 3), np.float32)
    frames[:, 0] = r.integers(0, 255, (B, H, W, 3))
    for i in range(1, n):  # consecutive frames: small photometric drift
        frames[:, i] = np.clip(
            frames[:, i - 1] + 6.0 * r.standard_normal((B, H, W, 3)), 0, 255)
    frames = frames.round()

    alpha1, alpha2 = 0.01, 0.5
    args = argparse.Namespace(use_flow_frames=False, flow_up=flow_up,
                              flow_cat_norm=False, verbose=False, flow_bs=1,
                              alpha1=alpha1, alpha2=alpha2)
    orig_imgs = [torch.from_numpy(frames[:, i].transpose(0, 3, 1, 2))
                 for i in range(n)]
    with torch.no_grad():
        flow_f, flow_b = ref_util.mem_reduce_calc_optical_flow(
            orig_imgs, ref_raft, args)  # [1, B, 2, h, w]
    _, _, (mask_f, _) = ref_util.forward_backward_consistency(
        flow_f[0], flow_b[0], alpha_1=alpha1, alpha_2=alpha2)
    _, _, (mask_b, _) = ref_util.forward_backward_consistency(
        flow_b[0], flow_f[0], alpha_1=alpha1, alpha_2=alpha2)

    # ours: the exact train-step path (driver.py:74-87 + train_step)
    flows_fwd, flows_bwd = raft_batch_flows(
        model, variables, jnp.asarray(frames), iters=12, up=flow_up,
        micro_batch=1)
    ours_f, ours_b, ours_mf, ours_mb = compose_and_mask(
        flows_fwd, flows_bwd, flow_up=False, use_flow_frames=False,
        alpha_1=alpha1, alpha_2=alpha2)

    ref_f = flow_f[0].numpy().transpose(0, 2, 3, 1)
    ref_b = flow_b[0].numpy().transpose(0, 2, 3, 1)
    scale = np.abs(ref_f).max()
    np.testing.assert_allclose(np.asarray(ours_f), ref_f,
                               atol=max(2e-2, 2e-3 * scale), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(ours_b), ref_b,
                               atol=max(2e-2, 2e-3 * scale), rtol=2e-2)
    agree_f = np.mean(np.asarray(ours_mf) == mask_f.numpy())
    agree_b = np.mean(np.asarray(ours_mb) == mask_b.numpy())
    assert agree_f > 0.99 and agree_b > 0.99, (agree_f, agree_b)


@pytest.mark.slow
def test_precompute_flows_tool_e2e(oracle, tmp_path):
    """tools/precompute_flows.py end-to-end: a reference-format torch
    RAFT-small checkpoint (module.-prefixed DataParallel keys, like the
    released files) + synthetic videos -> per-video flow .npy files the
    training loader consumes."""
    import argparse
    import subprocess
    import sys as _sys

    from contrast.flow import RAFT as RefRAFT
    from PIL import Image

    torch.manual_seed(11)
    args = argparse.Namespace(small=True, dropout=0.0, alternate_corr=False,
                              mixed_precision=False)
    ref = torch.nn.DataParallel(RefRAFT(args))
    ckpt = str(tmp_path / "raft-small.pth")
    torch.save(ref.state_dict(), ckpt)

    data = tmp_path / "frames"
    rng = np.random.default_rng(0)
    for v in range(2):
        d = data / f"video{v:03d}"
        d.mkdir(parents=True)
        for f in range(3):
            Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(
                str(d / f"frame{f:04d}.jpg"))

    out = tmp_path / "flows"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [_sys.executable, "tools/precompute_flows.py", "--data-dir",
         str(data), "--out-dir", str(out), "--flow-model", ckpt,
         "--iters", "2", "--batch", "2"],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    fwd = np.load(out / "forward" / "video000.npy")
    bwd = np.load(out / "backward" / "video000.npy")
    assert fwd.shape == (2, 8, 12, 2) and bwd.shape == (2, 8, 12, 2)
    assert np.isfinite(fwd).all() and np.isfinite(bwd).all()
