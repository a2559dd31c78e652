"""Pin grid_sample / resize semantics against PyTorch (the reference's
substrate): align_corners=True, padding_mode='zeros', bilinear + nearest."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from pixflow_tpu.ops import (
    grid_sample,
    grid_sample_nearest,
    resize_align_corners,
    upflow8,
    coords_grid,
    normalize_coords,
    normalize_flow,
    denormalize_flow,
)

RNG = np.random.default_rng(0)


def _torch_grid_sample(img_nhwc, grid, mode):
    t_img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))
    t_grid = torch.from_numpy(grid)
    out = tF.grid_sample(t_img, t_grid, mode=mode, padding_mode="zeros",
                         align_corners=True)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("shape", [(2, 5, 7, 3), (1, 16, 16, 2), (3, 9, 4, 1)])
def test_grid_sample_matches_torch(mode, shape):
    b, h, w, c = shape
    img = RNG.standard_normal(shape).astype(np.float32)
    # grid spanning inside and outside the image (out-of-bounds must be zero)
    grid = (RNG.uniform(-1.4, 1.4, size=(b, 6, 8, 2))).astype(np.float32)

    want = _torch_grid_sample(img, grid, mode)
    if mode == "bilinear":
        got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    else:
        got = np.asarray(grid_sample_nearest(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_exact_corners():
    # -1/-1 must hit pixel (0, 0) and +1/+1 pixel (H-1, W-1) exactly.
    img = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    grid = np.array([[[[-1.0, -1.0], [1.0, 1.0]]]], dtype=np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    assert out[0, 0, 0, 0] == img[0, 0, 0, 0]
    assert out[0, 0, 1, 0] == img[0, 2, 3, 0]


@pytest.mark.parametrize("hw,size", [((6, 8), (12, 16)), ((5, 5), (7, 3)),
                                     ((4, 6), (32, 48)), ((3, 3), (3, 3))])
def test_resize_align_corners_matches_torch(hw, size):
    b, c = 2, 3
    img = RNG.standard_normal((b, *hw, c)).astype(np.float32)
    t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    want = tF.interpolate(t, size=size, mode="bilinear", align_corners=True)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    got = np.asarray(resize_align_corners(jnp.asarray(img), size))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upflow8_matches_torch():
    flow = RNG.standard_normal((2, 4, 5, 2)).astype(np.float32)
    t = torch.from_numpy(np.transpose(flow, (0, 3, 1, 2)))
    want = 8 * tF.interpolate(t, size=(32, 40), mode="bilinear", align_corners=True)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    got = np.asarray(upflow8(jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_grid_sample_mxu_matches_gather_path():
    from pixflow_tpu.ops import grid_sample_mxu
    b, h, w, c = 2, 18, 24, 2
    img = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    grid = RNG.uniform(-1.3, 1.3, size=(b, 40, 52, 2)).astype(np.float32)
    want = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    got = np.asarray(grid_sample_mxu(jnp.asarray(img), jnp.asarray(grid),
                                     chunk=512))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_mxu_exact_integer_coords():
    from pixflow_tpu.ops import grid_sample_mxu
    img = np.arange(24, dtype=np.float32).reshape(1, 4, 6, 1)
    # normalized coords hitting integer pixels exactly
    grid = np.array([[[[-1.0, -1.0], [1.0, 1.0],
                       [2 * 2 / 5 - 1, 2 * 1 / 3 - 1]]]], np.float32)
    out = np.asarray(grid_sample_mxu(jnp.asarray(img), jnp.asarray(grid)))
    assert out[0, 0, 0, 0] == 0.0
    assert out[0, 0, 1, 0] == 23.0
    np.testing.assert_allclose(out[0, 0, 2, 0], img[0, 1, 2, 0], rtol=1e-6)


def test_coords_grid_and_normalize_roundtrip():
    g = np.asarray(coords_grid(3, 5))
    assert g.shape == (3, 5, 2)
    assert g[2, 4, 0] == 4 and g[2, 4, 1] == 2  # (x, y)

    n = normalize_coords(jnp.asarray(g), 3, 5)
    assert np.isclose(np.asarray(n)[0, 0], [-1, -1]).all()
    assert np.isclose(np.asarray(n)[2, 4], [1, 1]).all()

    f = RNG.standard_normal((1, 3, 5, 2)).astype(np.float32)
    back = denormalize_flow(normalize_flow(jnp.asarray(f), 3, 5), 3, 5)
    np.testing.assert_allclose(np.asarray(back), f, rtol=1e-6)
