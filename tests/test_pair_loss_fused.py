"""Fused Pallas pair-loss parity: values AND gradients must match the XLA
composition exactly (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.ops import pixpro_pair_loss
from pixflow_tpu.ops.loss import l2_normalize
from pixflow_tpu.ops.pallas.pair_loss import pixpro_pair_loss_fused

RNG = np.random.default_rng(61)


def _coords(b, seed):
    r = np.random.default_rng(seed)
    out = np.zeros((b, 10), np.float32)
    for i in range(b):
        x, y = int(r.integers(0, 600)), int(r.integers(0, 300))
        w, h = int(r.integers(150, 600)), int(r.integers(150, 400))
        out[i] = [x / 1279, y / 719, (x + w - 1) / 1279, (y + h - 1) / 719,
                  x, y, w, h, 1280, 720]
    return out


@pytest.mark.parametrize("with_flow", [False, True])
def test_fused_matches_reference_composition(with_flow):
    b, hw, c = 3, 7, 16
    q = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((b, hw, hw, c)).astype(np.float32))))
    k = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((b, hw, hw, c)).astype(np.float32))))
    cq, ck = _coords(b, 1), _coords(b, 2)
    flow = mask = None
    if with_flow:
        flow = jnp.asarray(
            (15 * RNG.standard_normal((b, 90, 160, 2))).astype(np.float32))
        mask = jnp.asarray(RNG.random((b, 90, 160)) > 0.3)

    want_loss, (want_pn, _) = pixpro_pair_loss(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(cq), jnp.asarray(ck),
        0.7, flow=flow, flow_mask=mask)
    got_loss, (got_pn, _) = pixpro_pair_loss_fused(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(cq), jnp.asarray(ck),
        0.7, flow=flow, flow_mask=mask, interpret=True)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_pn), np.asarray(want_pn),
                               rtol=1e-6)


def test_fused_gradients_match():
    b, hw, c = 2, 7, 8
    q = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((b, hw, hw, c)).astype(np.float32))))
    k = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((b, hw, hw, c)).astype(np.float32))))
    cq, ck = _coords(b, 3), _coords(b, 4)

    def loss_ref(q_, k_):
        return pixpro_pair_loss(q_, k_, jnp.asarray(cq), jnp.asarray(ck),
                                0.7)[0]

    def loss_fused(q_, k_):
        return pixpro_pair_loss_fused(q_, k_, jnp.asarray(cq),
                                      jnp.asarray(ck), 0.7,
                                      interpret=True)[0]

    gq_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(q),
                                                        jnp.asarray(k))
    gq, gk = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(q),
                                                  jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-7)
