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


def test_fuse_views_exact_equivalence(tiny_pixpro):
    """fuse_views=True (single 2B-batch pass per branch, per-view BN stats
    via ViewBatchNorm) must reproduce the unfused model's loss, gradients,
    and running BN statistics on the SAME parameter tree — the fused layout
    is a pure execution-schedule change, not a semantic one."""
    model, params, batch_stats, im = tiny_pixpro
    fused = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32, fuse_views=True)
    rng = np.random.default_rng(5)
    im2 = jnp.asarray(rng.standard_normal(im.shape), jnp.float32)
    coord1 = jnp.asarray(np.tile(np.array([0.1, 0.1, 0.4, 0.4, 128, 72, 384,
                                           216, 1280, 720], np.float32), (2, 1)))
    coord2 = jnp.asarray(np.tile(np.array([0.2, 0.15, 0.55, 0.5, 256, 108,
                                           448, 252, 1280, 720], np.float32),
                                 (2, 1)))

    def run(m, p):
        (l, _), mut = m.apply({"params": p, "batch_stats": batch_stats},
                              im, im2, coord1, coord2, train=True,
                              mutable=["batch_stats"])
        return l, mut["batch_stats"]

    loss_u, bs_u = run(model, params)
    loss_f, bs_f = run(fused, params)
    np.testing.assert_allclose(float(loss_f), float(loss_u),
                               rtol=2e-5, atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5), bs_u, bs_f)

    gu = jax.grad(lambda p: run(model, p)[0])(params)
    gf = jax.grad(lambda p: run(fused, p)[0])(params)
    flat_u = jax.tree.leaves(gu)
    flat_f = jax.tree.leaves(gf)
    for a, b in zip(flat_u, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_view_batch_norm_matches_sequential_bn():
    """ViewBatchNorm over [2B, H, W, C] == two sequential nn.BatchNorm calls
    on the halves: same outputs, same running statistics (sequential EMA
    order, view 0 first)."""
    from flax import linen as nn
    from pixflow_tpu.models.norm import ViewBatchNorm
    rng = np.random.default_rng(9)
    x1 = jnp.asarray(rng.standard_normal((3, 4, 4, 6)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((3, 4, 4, 6)), jnp.float32)

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vbn = ViewBatchNorm(view_groups=2, use_running_average=False,
                        momentum=0.9, epsilon=1e-5)
    variables = ref.init(jax.random.PRNGKey(0), x1)
    # non-trivial affine + running state
    variables = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype), variables)

    y1, m1 = ref.apply(variables, x1, mutable=["batch_stats"])
    v2 = {"params": variables["params"], "batch_stats": m1["batch_stats"]}
    y2, m2 = ref.apply(v2, x2, mutable=["batch_stats"])

    yf, mf = vbn.apply(variables, jnp.concatenate([x1, x2], axis=0),
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf[:3]), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yf[3:]), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        m2["batch_stats"], mf["batch_stats"])


def test_view_batch_norm_eval_matches_bn():
    from flax import linen as nn
    from pixflow_tpu.models.norm import batch_norm, ViewBatchNorm
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 3, 3, 5)), jnp.float32)
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = ref.init(jax.random.PRNGKey(1), x)
    variables = jax.tree.map(lambda a: a + 0.25, variables)
    y_ref = ref.apply(variables, x)
    # the factory picks stock BN in eval mode regardless of view_groups
    mod = batch_norm(view_groups=2, use_running_average=True, momentum=0.9)
    np.testing.assert_allclose(np.asarray(mod.apply(variables, x)),
                               np.asarray(y_ref), rtol=1e-6, atol=1e-7)
    # and the ViewBatchNorm eval path agrees too
    vbn = ViewBatchNorm(view_groups=2, use_running_average=True, momentum=0.9)
    np.testing.assert_allclose(np.asarray(vbn.apply(variables, x)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-6)


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


def test_fuse_views_trajectory_equivalence(tiny_pixpro):
    """Five full update steps (EMA + BN running stats feeding back): the
    fused and unfused models stay on the same trajectory."""
    import optax
    from pixflow_tpu.models.pixpro import ema_update
    model, params, batch_stats, im = tiny_pixpro
    fused = PixPro(arch="resnet18", pixpro_p=2.0, pixpro_transform_layer=1,
                   proj_inner_dim=64, proj_out_dim=32, fuse_views=True)
    rng = np.random.default_rng(21)
    coord = jnp.asarray(np.tile(np.array([0.1, 0.1, 0.4, 0.4, 128, 72, 384,
                                          216, 1280, 720], np.float32), (2, 1)))
    tx = optax.sgd(1e-2)

    def run(m):
        p, bs = params, batch_stats
        opt = tx.init(p)
        losses = []
        for s in range(5):
            p = ema_update(p, 0.99)
            im1 = jnp.asarray(rng_imgs[s][0])
            im2 = jnp.asarray(rng_imgs[s][1])

            def loss_fn(pp):
                (l, _), mut = m.apply({"params": pp, "batch_stats": bs},
                                      im1, im2, coord, coord, train=True,
                                      mutable=["batch_stats"])
                return l, mut["batch_stats"]

            (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            up, opt = tx.update(g, opt, p)
            p = optax.apply_updates(p, up)
            bs = new_bs
            losses.append(float(l))
        return losses

    rng_imgs = [(rng.standard_normal(im.shape).astype(np.float32),
                 rng.standard_normal(im.shape).astype(np.float32))
                for _ in range(5)]
    lu = run(model)
    lf = run(fused)
    np.testing.assert_allclose(lf, lu, rtol=1e-4, atol=1e-4)
