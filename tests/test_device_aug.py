"""Device-side photometric augmentation (ops/augment.py + the parameter
sampling in data/transforms.py): exactness of the composed affine segments,
bounded parity with the host PIL path, and geometry preservation."""

import random

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from pixflow_tpu.data import transforms as T
from pixflow_tpu.ops.augment import PARAM_DIM, apply_photometric

RNG = np.random.default_rng(42)


def _mk_frame(h=240, w=320):
    small = RNG.integers(40, 215, (h // 16, w // 16, 3), np.uint8)
    return Image.fromarray(small).resize((w, h), Image.BILINEAR)


def _seq_reference(x, tags, grayscale=False):
    """Float reference: apply jitter ops sequentially in the given order
    with the exact PIL/torchvision formulas, no clipping/rounding."""
    luma = T.LUMA
    x = x.astype(np.float64)
    for kind, f in tags:
        if kind == "b":
            x = x * f
        elif kind == "c":
            m = float(luma @ x.mean(axis=(0, 1)))
            x = x * f + (1 - f) * m
        elif kind == "s":
            g = x @ luma
            x = x * f + (1 - f) * g[..., None]
        elif kind == "h":
            x = _np_hue(x, f)
    if grayscale:
        x = np.repeat((x @ luma)[..., None], 3, axis=-1)
    return x


def _np_hue(x, delta):
    """Float HSV hue rotation (same formulas as ops/augment._hue_shift)."""
    mx = x.max(-1)
    mn = x.min(-1)
    c = mx - mn
    safe = np.where(c > 0, c, 1.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = np.where(mx == r, (g - b) / safe,
                 np.where(mx == g, (b - r) / safe + 2.0,
                          (r - g) / safe + 4.0))
    h = np.where(c > 0, h, 0.0) % 6.0
    h = (h + delta * 6.0) % 6.0
    sec = h % 2.0
    xs = c * (1.0 - np.abs(sec - 1.0))
    k = np.floor(h).astype(int)
    zero = np.zeros_like(c)
    r1 = np.select([k == 0, k == 1, k == 2, k == 3, k == 4], [c, xs, zero, zero, xs], c)
    g1 = np.select([k == 0, k == 1, k == 2, k == 3, k == 4], [xs, c, c, xs, zero], zero)
    b1 = np.select([k == 0, k == 1, k == 2, k == 3, k == 4], [zero, zero, xs, c, c], xs)
    return np.stack([r1, g1, b1], -1) + (mx - c)[..., None]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_segment_composition_matches_sequential(seed):
    """The packed two-segment affine+hue program reproduces the sampled
    random-order jitter exactly (mid-range pixels: no clipping involved)."""
    r = random.Random(seed)
    jitter = T.ColorJitter(0.4, 0.4, 0.2, 0.1)
    gray = T.RandomGrayscale(1.0 if seed % 2 else 0.0)
    ops = [T.RandomApply(jitter, 1.0), gray]

    # replay the identical stream to learn the tag order for the reference
    r2 = random.Random(seed)
    r2.random()  # RandomApply draw
    tags = [("b", jitter._factor(r2, 0.4)), ("c", jitter._factor(r2, 0.4)),
            ("s", jitter._factor(r2, 0.2)), ("h", r2.uniform(-0.1, 0.1))]
    r2.shuffle(tags)
    grayscale = (r2.random() < gray.p)

    params = T.sample_photometric_params(ops, r)
    assert params.shape == (PARAM_DIM,)

    x = RNG.integers(70, 190, (1, 48, 64, 3)).astype(np.uint8)
    got = np.asarray(apply_photometric(jnp.asarray(x),
                                       jnp.asarray(params[None])))[0]
    want = _seq_reference(x[0], tags, grayscale)
    diff = np.abs(got - want)
    # f32-vs-f64 hue-sector ties flip a handful of near-gray pixels by ~1
    # count; everything else must match to float precision
    assert diff.mean() < 0.05, diff.mean()
    assert (diff > 0.5).mean() < 0.01, (diff > 0.5).mean()
    assert np.median(diff) < 1e-3


def test_hue_shift_close_to_pil():
    """Device float hue rotation vs the host path's uint8 PIL HSV
    roundtrip: agreement to a few counts (PIL quantizes H to 256 levels)."""
    img = _mk_frame(96, 128)
    delta = 0.07
    pil = np.asarray(T._shift_hue(img, delta), np.float32)

    params = np.zeros(PARAM_DIM, np.float32)
    params[0:9] = np.eye(3).reshape(-1)   # identity segments
    params[20:29] = np.eye(3).reshape(-1)
    params[19] = delta
    got = np.asarray(apply_photometric(
        jnp.asarray(np.asarray(img, np.uint8)[None]),
        jnp.asarray(params[None])))[0]
    mad = np.abs(got - pil).mean()
    assert mad < 4.0, mad


def test_blur_identity_and_gaussian():
    params = np.zeros((2, PARAM_DIM), np.float32)
    params[:, 0:9] = np.eye(3).reshape(-1)
    params[:, 20:29] = np.eye(3).reshape(-1)
    params[1, 39] = 1.5  # sigma
    x = RNG.integers(0, 255, (2, 40, 56, 3)).astype(np.uint8)
    out = np.asarray(apply_photometric(jnp.asarray(x), jnp.asarray(params)))
    # sigma=0 row: identity up to the hue roundtrip's f32 noise (~1e-5)
    np.testing.assert_allclose(out[0], x[0].astype(np.float32), atol=1e-3)

    # sigma=1.5 row: interior matches a direct numpy separable Gaussian
    r = 6
    i = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (i / 1.5) ** 2)
    k /= k.sum()
    ref = x[1].astype(np.float64)
    ref = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, ref)
    ref = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 1, ref)
    np.testing.assert_allclose(out[1, r:-r, r:-r], ref[r:-r, r:-r],
                               rtol=1e-3, atol=1e-2)


def test_solarize_matches_pil():
    from PIL import ImageOps
    img = _mk_frame(64, 64)
    want = np.asarray(ImageOps.solarize(img), np.float32)
    params = np.zeros(PARAM_DIM, np.float32)
    params[0:9] = np.eye(3).reshape(-1)
    params[20:29] = np.eye(3).reshape(-1)
    params[40] = 1.0
    got = np.asarray(apply_photometric(
        jnp.asarray(np.asarray(img, np.uint8)[None]),
        jnp.asarray(params[None])))[0]
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_byol_device_mode_parity_with_host(seed):
    """Same rng seed through both modes: crop/flip geometry bit-identical
    (same coords, same uint8 crop), full photometric output within a few
    counts of the host PIL path (per-op uint8 rounding + box-blur
    approximation are the only differences)."""
    frame = _mk_frame()
    host_t1, host_t2 = T.get_transform("BYOL", 0.3, 96, emit_uint8=True)
    dev_t1, dev_t2 = T.get_transform("BYOL", 0.3, 96, emit_uint8=True,
                                     device_photometric=True)

    for host_t, dev_t in ((host_t1, dev_t1), (host_t2, dev_t2)):
        img_host, coord_host = host_t(frame, random.Random(seed))
        crop_dev, coord_dev, params = dev_t(frame, random.Random(seed))
        np.testing.assert_array_equal(coord_host, coord_dev)

        out = np.asarray(apply_photometric(
            jnp.asarray(crop_dev[None]), jnp.asarray(params[None])))[0]
        mad = np.abs(out - img_host.astype(np.float32)).mean()
        assert mad < 6.0, mad


def test_randaug_device_mode_rejected():
    with pytest.raises(NotImplementedError):
        T.get_transform("RandAug", 0.3, 96, device_photometric=True)
