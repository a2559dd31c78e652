"""Pallas kernel parity (interpret mode on CPU; compiled on TPU runs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pixflow_tpu.ops import grid_sample
from pixflow_tpu.ops.pallas.warp import grid_sample_pallas, tent_warp_pallas

RNG = np.random.default_rng(23)


def test_tent_warp_matches_gather_grid_sample():
    b, h, w, c = 2, 18, 24, 2
    img = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    grid = RNG.uniform(-1.3, 1.3, size=(b, 20, 30, 2)).astype(np.float32)
    want = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    got = np.asarray(grid_sample_pallas(jnp.asarray(img), jnp.asarray(grid),
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tent_warp_point_api_and_padding():
    b, h, w, c = 1, 10, 12, 2
    img = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    # 7 points: exercises chunk padding; includes out-of-bounds (-> 0)
    pts = np.array([[[0, 0], [11, 9], [5.5, 4.5], [-3, 2], [20, 5],
                     [2.25, 7.75], [11, 0]]], np.float32)
    out = np.asarray(tent_warp_pallas(jnp.asarray(img), jnp.asarray(pts),
                                      chunk=4, interpret=True))
    assert out.shape == (1, 7, 2)
    np.testing.assert_allclose(out[0, 0], img[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], img[0, 9, 11], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], 0.0, atol=1e-7)  # out of bounds
    np.testing.assert_allclose(out[0, 4], 0.0, atol=1e-7)
    # bilinear interior point
    want = (img[0, 4, 5] + img[0, 4, 6] + img[0, 5, 5] + img[0, 5, 6]) / 4
    np.testing.assert_allclose(out[0, 2], want, rtol=1e-5)
