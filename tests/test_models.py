"""Model zoo shape/behavior tests (reference had none — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.models import (
    make_resnet, MODEL_REGISTRY, MLP2d, PixPro,
    init_momentum_from_online, ema_update, momentum_schedule,
)

RNG = np.random.default_rng(3)


def test_registry_covers_reference_zoo():
    for name in ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
                 "resnet18_d", "resnet34_d", "resnet50_d", "resnet101_d",
                 "resnet152_d", "resnet50_16s", "resnet50_w2x",
                 "resnext101_32x8d", "resnext152_32x8d"]:
        assert name in MODEL_REGISTRY


def _init_and_run(model, x, train=True):
    vars_ = model.init(jax.random.PRNGKey(0), x, train)
    out, mut = model.apply(vars_, x, train, mutable=["batch_stats"])
    return vars_, out


def test_resnet18_early_return_shape():
    m = make_resnet("resnet18", head_type="early_return")
    x = jnp.zeros((2, 64, 64, 3))
    _, out = _init_and_run(m, x)
    assert out.shape == (2, 2, 2, 512)  # stride 32


def test_resnet18_multi_layer_shapes():
    m = make_resnet("resnet18", head_type="multi_layer")
    x = jnp.zeros((1, 64, 64, 3))
    _, (c2, c3, c4, c5) = _init_and_run(m, x)
    assert c2.shape == (1, 16, 16, 64)
    assert c3.shape == (1, 8, 8, 128)
    assert c4.shape == (1, 4, 4, 256)
    assert c5.shape == (1, 2, 2, 512)


def test_resnet50_16s_keeps_stride16():
    m = make_resnet("resnet50_16s", head_type="early_return")
    x = jnp.zeros((1, 64, 64, 3))
    _, out = _init_and_run(m, x)
    assert out.shape == (1, 4, 4, 2048)  # layer4 dilated, stride 16


def test_resnet18_reduce_head():
    m = make_resnet("resnet18", head_type="reduce", low_dim=10)
    x = jnp.zeros((2, 224, 224, 3))
    _, out = _init_and_run(m, x)
    assert out.shape == (2, 10)


def test_zero_gamma_init():
    m = make_resnet("resnet18", head_type="early_return")
    vars_ = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), True)
    # each block's last BN scale must start at zero (bag-of-tricks init)
    scale = vars_["params"]["layer1_0"]["cell2"]["bn"]["scale"]
    assert np.allclose(np.asarray(scale), 0.0)
    scale1 = vars_["params"]["layer1_0"]["cell1"]["bn"]["scale"]
    assert np.allclose(np.asarray(scale1), 1.0)


def test_mlp2d_shape():
    m = MLP2d(inner_dim=64, out_dim=16)
    x = jnp.zeros((2, 7, 7, 32))
    vars_ = m.init(jax.random.PRNGKey(0), x, True)
    out, _ = m.apply(vars_, x, True, mutable=["batch_stats"])
    assert out.shape == (2, 7, 7, 16)


@pytest.fixture(scope="module")
def tiny_pixpro():
    model = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32)
    im = jnp.asarray(RNG.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v_on = model.init(jax.random.PRNGKey(0), im, method=model.online, train=True)
    v_k = model.init(jax.random.PRNGKey(0), im, method=model.momentum_branch,
                     train=True)
    params = init_momentum_from_online(
        {**dict(v_on["params"]), **dict(v_k["params"])})
    batch_stats = {**dict(v_on["batch_stats"]), **dict(v_k["batch_stats"])}
    return model, params, batch_stats, im


def test_pixpro_momentum_init_copies_online(tiny_pixpro):
    model, params, _, _ = tiny_pixpro
    q = params["encoder"]["conv1"]["kernel"]
    k = params["encoder_k"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(q), np.asarray(k))


def test_pixpro_forward_loss_initial_scale(tiny_pixpro):
    model, params, batch_stats, im = tiny_pixpro
    coord = np.tile(np.array([0.1, 0.1, 0.4, 0.4, 128, 72, 384, 216,
                              1280, 720], np.float32), (2, 1))
    (loss, stats), _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        im, im, jnp.asarray(coord), jnp.asarray(coord),
        train=True, mutable=["batch_stats"])
    # loss in [-4, 0]: the reference monitors loss+4 in [0, 4]
    assert -4.0 <= float(loss) <= 0.5
    assert stats["pos_num_1"].shape == (2,)


def test_pixpro_gradients_skip_momentum_branch(tiny_pixpro):
    model, params, batch_stats, im = tiny_pixpro
    coord = jnp.asarray(np.tile(np.array([0.1, 0.1, 0.4, 0.4, 128, 72, 384,
                                          216, 1280, 720], np.float32), (2, 1)))

    def loss_fn(p):
        (l, _), _ = model.apply({"params": p, "batch_stats": batch_stats},
                                im, im, coord, coord, train=True,
                                mutable=["batch_stats"])
        return l

    grads = jax.grad(loss_fn)(params)
    gk = np.asarray(grads["encoder_k"]["conv1"]["kernel"])
    gq = np.asarray(grads["encoder"]["conv1"]["kernel"])
    assert np.allclose(gk, 0.0)
    assert np.abs(gq).sum() > 0.0


def test_fuse_views_runs_and_matches_structure(tiny_pixpro):
    """fuse_views=True (single 2B-batch pass per branch) must produce the
    same loss up to BN-statistics differences (joint vs per-view stats)."""
    model, params, batch_stats, im = tiny_pixpro
    fused = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32, fuse_views=True)
    coord = jnp.asarray(np.tile(np.array([0.1, 0.1, 0.4, 0.4, 128, 72, 384,
                                          216, 1280, 720], np.float32), (2, 1)))
    (loss, stats), _ = fused.apply(
        {"params": params, "batch_stats": batch_stats},
        im, im, coord, coord, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    # identical views through identical branches: both views' stats agree
    np.testing.assert_allclose(np.asarray(stats["pos_num_1"]),
                               np.asarray(stats["pos_num_2"]))


def test_ema_update_math():
    params = {"encoder": {"w": jnp.ones((2, 2))},
              "encoder_k": {"w": jnp.zeros((2, 2))}}
    out = ema_update(params, momentum=0.75)
    np.testing.assert_allclose(np.asarray(out["encoder_k"]["w"]), 0.25)
    np.testing.assert_allclose(np.asarray(out["encoder"]["w"]), 1.0)


def test_momentum_schedule_cosine_ramp():
    m0 = float(momentum_schedule(0, 1000, 0.99))
    m_half = float(momentum_schedule(500, 1000, 0.99))
    m_end = float(momentum_schedule(1000, 1000, 0.99))
    np.testing.assert_allclose(m0, 0.99, atol=1e-7)
    np.testing.assert_allclose(m_half, 0.995, atol=1e-7)
    np.testing.assert_allclose(m_end, 1.0, atol=1e-7)
