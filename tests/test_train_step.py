"""End-to-end train-step tests on an 8-virtual-device CPU mesh: the full
compiled program (flow composition + cycle masks + EMA + 4 encoder passes +
loss + pmean'd grads + LARS) runs, the loss moves, SyncBN stats sync."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.models import PixPro
from pixflow_tpu.parallel import make_data_mesh, DATA_AXIS
from pixflow_tpu.train import (
    create_train_state, make_train_step, lars_sgd,
    frozen_momentum_branch_mask, warmup_cosine,
)

RNG = np.random.default_rng(5)
B, HW = 8, 64  # global batch 8 over 8 devices


def _coords(b):
    out = np.zeros((b, 10), np.float32)
    for i in range(b):
        j, ii, w, h = (RNG.integers(0, 400), RNG.integers(0, 200),
                       RNG.integers(200, 600), RNG.integers(150, 400))
        out[i] = [j / 1279, ii / 719, (j + w - 1) / 1279, (ii + h - 1) / 719,
                  j, ii, w, h, 1280, 720]
    return out


def _batch(with_flow: bool):
    batch = {
        "im1": RNG.standard_normal((B, HW, HW, 3)).astype(np.float32),
        "im2": RNG.standard_normal((B, HW, HW, 3)).astype(np.float32),
        "coord1": _coords(B),
        "coord2": _coords(B),
    }
    if with_flow:
        batch["flows_fwd"] = 2 * RNG.standard_normal((B, 2, 16, 16, 2)).astype(np.float32)
        batch["flows_bwd"] = 2 * RNG.standard_normal((B, 2, 16, 16, 2)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_data_mesh(8)


def _setup(mesh, use_flow: bool):
    kw = dict(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
              pixpro_pos_ratio=0.7, proj_inner_dim=64, proj_out_dim=32)
    # GSPMD step: axis_name stays None; BN stats become global through the
    # sharded batch axis (SyncBN parity is asserted below).
    model = PixPro(**kw)
    batch = _batch(use_flow)

    lr = warmup_cosine(0.1, epochs=10, warmup_epoch=1, steps_per_epoch=5)
    dummy_tx = lars_sgd(lr, weight_decay=1e-5)
    state = create_train_state(jax.random.PRNGKey(0), model, dummy_tx,
                               {"im1": batch["im1"][:1]})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state.params))
    state = state.replace(opt_state=tx.init(state.params))

    step = make_train_step(
        model, tx, lr_schedule=lr, ema_total_steps=50,
        ema_base_momentum=0.99, mesh=mesh,
        use_flow=use_flow, flow_up=use_flow, alpha1=0.01 if use_flow else None,
        alpha2=0.5 if use_flow else None, donate=False)
    return state, step, batch


def test_train_step_no_flow_runs_and_learns(mesh):
    state, step, batch = _setup(mesh, use_flow=False)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert -4.0 <= losses[0] <= 0.5
    # same batch repeated: loss must decrease
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
    assert int(state.ema_k) == 4


def test_train_step_flow_path_runs(mesh):
    state, step, batch = _setup(mesh, use_flow=True)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["mask_ratio_fwd"]) <= 1.0
    assert float(metrics["pos_num"]) >= 0.0


def test_momentum_branch_follows_ema(mesh):
    state, step, batch = _setup(mesh, use_flow=False)
    q0 = np.asarray(state.params["encoder"]["conv1"]["kernel"]).copy()
    state, _ = step(state, batch)
    q1 = np.asarray(state.params["encoder"]["conv1"]["kernel"])
    k1 = np.asarray(state.params["encoder_k"]["conv1"]["kernel"])
    # EMA ran with pre-step online params at m=0.99: k stays at init copy
    np.testing.assert_allclose(k1, q0, atol=1e-7)
    assert np.abs(q1 - q0).sum() > 0  # online moved


def test_syncbn_stats_are_cross_replica(mesh):
    """Batch stats after one step must equal the global-batch statistics,
    not per-shard ones (SyncBN parity)."""
    state, step, batch = _setup(mesh, use_flow=False)
    state, _ = step(state, batch)
    # run the same step WITHOUT a mesh on the full batch: stats must agree
    model = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32)
    lr = warmup_cosine(0.1, epochs=10, warmup_epoch=1, steps_per_epoch=5)
    tx = lars_sgd(lr, weight_decay=1e-5)
    state2 = create_train_state(jax.random.PRNGKey(0), model, tx,
                                {"im1": batch["im1"][:1]})
    tx = lars_sgd(lr, weight_decay=1e-5,
                  frozen_mask=frozen_momentum_branch_mask(state2.params))
    state2 = state2.replace(opt_state=tx.init(state2.params))
    step2 = make_train_step(model, tx, lr_schedule=lr, ema_total_steps=50,
                            ema_base_momentum=0.99, mesh=None, donate=False)
    state2, _ = step2(state2, batch)

    m1 = np.asarray(state.batch_stats["encoder"]["bn1"]["mean"])
    m2 = np.asarray(state2.batch_stats["encoder"]["bn1"]["mean"])
    np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)


def test_flow_up_lazy_matches_materialized_step(mesh):
    """The lazy point-domain flow_up path and the materializing full-res
    path must produce the same compiled-step loss/pos_num (they are the
    same math; parity of the underlying ops is pinned in
    tests/test_flow_points.py)."""
    kw = dict(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
              pixpro_pos_ratio=0.7, proj_inner_dim=64, proj_out_dim=32)
    batch = _batch(True)
    lr = warmup_cosine(0.1, epochs=10, warmup_epoch=1, steps_per_epoch=5)

    results = {}
    for lazy in (False, True):
        model = PixPro(**kw)
        tx0 = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                                   {"im1": batch["im1"][:1]})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))
        step = make_train_step(
            model, tx, lr_schedule=lr, ema_total_steps=50,
            ema_base_momentum=0.99, mesh=mesh, use_flow=True, flow_up=True,
            flow_up_lazy=lazy, alpha1=0.01, alpha2=0.5, donate=False)
        _, metrics = step(state, batch)
        results[lazy] = metrics

    np.testing.assert_allclose(float(results[True]["loss"]),
                               float(results[False]["loss"]),
                               rtol=1e-4, atol=1e-5)
    assert (float(results[True]["pos_num"])
            == float(results[False]["pos_num"]))
    # mask telemetry: strided estimate vs full-field mean
    np.testing.assert_allclose(float(results[True]["mask_ratio_fwd"]),
                               float(results[False]["mask_ratio_fwd"]),
                               atol=0.05)


def test_fused_views_match_on_mesh(mesh):
    """Fused two-view passes under GSPMD: the sharded [2B]->[2,B] per-view
    BN reshape must give the same loss/metrics as the unfused model on the
    8-device mesh (same params, same batch)."""
    kw = dict(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
              pixpro_pos_ratio=0.7, proj_inner_dim=64, proj_out_dim=32)
    batch = _batch(True)
    lr = warmup_cosine(0.1, epochs=10, warmup_epoch=1, steps_per_epoch=5)

    def one_step(fuse):
        model = PixPro(fuse_views=fuse, **kw)
        dummy_tx = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, dummy_tx,
                                   {"im1": batch["im1"][:1]})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))
        step = make_train_step(model, tx, lr_schedule=lr, ema_total_steps=50,
                               ema_base_momentum=0.99, mesh=mesh,
                               use_flow=True, flow_up=True, alpha1=0.01,
                               alpha2=0.5, donate=False)
        state, metrics = step(state, batch)
        return state, metrics

    su, mu = one_step(False)
    sf, mf = one_step(True)
    np.testing.assert_allclose(float(mf["loss"]), float(mu["loss"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(mf["pos_num"]), float(mu["pos_num"]))
    # BN running stats agree across the whole tree
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        su.batch_stats, sf.batch_stats)


def test_flow_telemetry_off_variant(mesh):
    """The telemetry-free step (what the driver runs between logged steps)
    must produce the same loss/pos_num as the telemetry variant and simply
    omit the mask-ratio metrics."""
    kw = dict(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
              pixpro_pos_ratio=0.7, proj_inner_dim=64, proj_out_dim=32)
    batch = _batch(True)
    lr = warmup_cosine(0.1, epochs=10, warmup_epoch=1, steps_per_epoch=5)

    results = {}
    for telemetry in (True, False):
        model = PixPro(**kw)
        tx0 = lars_sgd(lr, weight_decay=1e-5)
        state = create_train_state(jax.random.PRNGKey(0), model, tx0,
                                   {"im1": batch["im1"][:1]})
        tx = lars_sgd(lr, weight_decay=1e-5,
                      frozen_mask=frozen_momentum_branch_mask(state.params))
        state = state.replace(opt_state=tx.init(state.params))
        step = make_train_step(
            model, tx, lr_schedule=lr, ema_total_steps=50,
            ema_base_momentum=0.99, mesh=mesh, use_flow=True, flow_up=True,
            flow_telemetry=telemetry, alpha1=0.01, alpha2=0.5, donate=False)
        _, metrics = step(state, batch)
        results[telemetry] = metrics

    assert "mask_ratio_fwd" in results[True]
    assert "mask_ratio_fwd" not in results[False]
    np.testing.assert_allclose(float(results[False]["loss"]),
                               float(results[True]["loss"]),
                               rtol=1e-6, atol=1e-6)
    assert (float(results[False]["pos_num"])
            == float(results[True]["pos_num"]))
