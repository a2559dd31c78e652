"""PixPro loss-geometry behavior pins: bin centers, positive masks, the
masked pair loss, PPM attention. Expectations computed independently in
NumPy from the published definitions."""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from pixflow_tpu.ops import (
    bin_centers,
    warp_points_with_flow,
    pixpro_pair_loss,
    ppm_attention,
    instance_loss,
)
from pixflow_tpu.ops.loss import l2_normalize

RNG = np.random.default_rng(2)


def make_coord(j, i, w, h, W, H):
    """10-vector crop coordinate (matches the data-pipeline contract)."""
    return np.array([j / (W - 1), i / (H - 1), (j + w - 1) / (W - 1),
                     (i + h - 1) / (H - 1), j, i, w, h, W, H], np.float32)


def np_centers(coord, fh, fw):
    x0, y0, x1, y1 = coord[0], coord[1], coord[2], coord[3]
    W, H = coord[8], coord[9]
    bw, bh = (x1 - x0) / fw, (y1 - y0) / fh
    xs = (np.arange(fw) + 0.5) * bw + x0
    ys = (np.arange(fh) + 0.5) * bh + y0
    cx = np.broadcast_to(xs[None, :], (fh, fw)) * (W - 1)
    cy = np.broadcast_to(ys[:, None], (fh, fw)) * (H - 1)
    return cx, cy


def test_bin_centers_match_numpy():
    coords = np.stack([make_coord(10, 20, 100, 80, 1280, 720),
                       make_coord(0, 0, 1280, 720, 1280, 720)])
    x, y = bin_centers(jnp.asarray(coords), (7, 7))
    for b in range(2):
        cx, cy = np_centers(coords[b], 7, 7)
        np.testing.assert_allclose(np.asarray(x[b]), cx, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y[b]), cy, rtol=1e-5)


def test_full_image_crop_centers_are_uniform_grid():
    # the whole image as crop -> bin centers at (i+0.5)/7 * (N-1)
    coord = make_coord(0, 0, 1280, 720, 1280, 720)[None]
    x, y = bin_centers(jnp.asarray(coord), (7, 7))
    want_x = (np.arange(7) + 0.5) / 7 * 1279
    np.testing.assert_allclose(np.asarray(x)[0, 0], want_x, rtol=1e-5)


def _np_pair_loss(q, k, cq, ck, pos_ratio):
    b, h, w, c = q.shape
    n = h * w
    loss_terms, masks = [], []
    for i in range(b):
        qx, qy = np_centers(cq[i], h, w)
        kx, ky = np_centers(ck[i], h, w)
        W, H = cq[i][8], cq[i][9]
        qd = np.hypot((cq[i][2] - cq[i][0]) / w * (W - 1),
                      (cq[i][3] - cq[i][1]) / h * (H - 1))
        kd = np.hypot((ck[i][2] - ck[i][0]) / w * (W - 1),
                      (ck[i][3] - ck[i][1]) / h * (H - 1))
        md = max(qd, kd)
        dist = np.hypot(qx.reshape(n, 1) - kx.reshape(1, n),
                        qy.reshape(n, 1) - ky.reshape(1, n)) / md
        mask = (dist < pos_ratio).astype(np.float32)
        logit = q[i].reshape(n, c) @ k[i].reshape(n, c).T
        loss_terms.append((logit * mask).sum() / (mask.sum() + 1e-6))
        masks.append(mask)
    return -2 * np.mean(loss_terms), np.stack(masks)


def test_pair_loss_matches_numpy_no_flow():
    b, h, w, c = 3, 7, 7, 8
    q = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    k = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    q = np.asarray(l2_normalize(jnp.asarray(q)))
    k = np.asarray(l2_normalize(jnp.asarray(k)))
    cq = np.stack([make_coord(10, 20, 300, 200, 1280, 720),
                   make_coord(50, 60, 400, 350, 1280, 720),
                   make_coord(0, 0, 128, 128, 1280, 720)])
    ck = np.stack([make_coord(40, 30, 250, 260, 1280, 720),
                   make_coord(100, 90, 300, 300, 1280, 720),
                   make_coord(900, 500, 200, 180, 1280, 720)])

    want, want_masks = _np_pair_loss(q, k, cq, ck, 0.7)
    loss, (pos_num, pos_mean) = pixpro_pair_loss(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(cq), jnp.asarray(ck), 0.7)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pos_num),
                               want_masks.sum(axis=(1, 2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pos_mean),
                               want_masks.mean(axis=(1, 2)), rtol=1e-6)


def test_identical_crops_mask_is_diagonal_dominant():
    # same crop for q and k -> each bin's nearest partner is itself
    coord = make_coord(100, 100, 280, 280, 1280, 720)[None]
    q = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((1, 7, 7, 4)).astype(np.float32))))
    loss, (pos_num, _) = pixpro_pair_loss(
        jnp.asarray(q), jnp.asarray(q),
        jnp.asarray(coord), jnp.asarray(coord), pos_ratio=0.5)
    # with pos_ratio 0.5 and equal bins, only the diagonal qualifies
    assert int(pos_num[0]) == 49
    np.testing.assert_allclose(float(loss), -2.0, atol=1e-5)


def test_disjoint_crops_produce_empty_mask_and_zero_loss():
    cq = make_coord(0, 0, 100, 100, 1280, 720)[None]
    ck = make_coord(1100, 600, 100, 100, 1280, 720)[None]
    q = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((1, 7, 7, 4)).astype(np.float32))))
    loss, (pos_num, _) = pixpro_pair_loss(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(cq), jnp.asarray(ck), 0.7)
    assert int(pos_num[0]) == 0
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_warp_points_with_flow_constant_translation():
    # constant +8px flow at full res: every center moves 8px right
    b, h, w = 1, 7, 7
    H_orig, W_orig = 720, 1280
    flow = np.zeros((b, H_orig // 8, W_orig // 8, 2), np.float32)
    flow[..., 0] = 1.0  # 1 px at 1/8 res -> 8 px at full res after ratio scale
    coord = make_coord(100, 100, 400, 300, W_orig, H_orig)[None]
    x, y = bin_centers(jnp.asarray(coord), (h, w))
    hx = jnp.full((b,), float(H_orig))
    wx = jnp.full((b,), float(W_orig))
    ox, oy, m = warp_points_with_flow(jnp.asarray(flow), x, y, (hx, wx))
    np.testing.assert_allclose(np.asarray(ox), np.asarray(x) + 8.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(oy), np.asarray(y), atol=1e-4)
    assert m is None


def test_warp_points_matches_torch_grid_sample():
    b, h, w = 2, 7, 7
    H_orig, W_orig = 720, 1280
    hf, wf = 90, 160
    flow = 3 * RNG.standard_normal((b, hf, wf, 2)).astype(np.float32)
    coord = np.stack([make_coord(64, 32, 512, 384, W_orig, H_orig),
                      make_coord(300, 200, 600, 400, W_orig, H_orig)])
    x, y = bin_centers(jnp.asarray(coord), (h, w))

    # torch expectation
    gx = 2 * np.asarray(x) / (W_orig - 1) - 1
    gy = 2 * np.asarray(y) / (H_orig - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))
    tflow = torch.from_numpy(np.transpose(flow, (0, 3, 1, 2)))
    f = tF.grid_sample(tflow, grid, align_corners=True).numpy()
    want_x = np.asarray(x) + f[:, 0] / (wf / W_orig)
    want_y = np.asarray(y) + f[:, 1] / (hf / H_orig)

    hx = jnp.full((b,), float(H_orig))
    wx = jnp.full((b,), float(W_orig))
    ox, oy, _ = warp_points_with_flow(jnp.asarray(flow), x, y, (hx, wx))
    np.testing.assert_allclose(np.asarray(ox), want_x, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(oy), want_y, rtol=1e-4, atol=1e-3)


def test_flow_mask_gates_positives():
    coord = make_coord(100, 100, 280, 280, 1280, 720)[None]
    q = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((1, 7, 7, 4)).astype(np.float32))))
    flow = np.zeros((1, 90, 160, 2), np.float32)
    mask_none = np.ones((1, 90, 160), bool)
    mask_all_bad = np.zeros((1, 90, 160), bool)

    _, (num_open, _) = pixpro_pair_loss(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(coord), jnp.asarray(coord),
        0.5, flow=jnp.asarray(flow), flow_mask=jnp.asarray(mask_none))
    loss_closed, (num_closed, _) = pixpro_pair_loss(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(coord), jnp.asarray(coord),
        0.5, flow=jnp.asarray(flow), flow_mask=jnp.asarray(mask_all_bad))
    assert int(num_open[0]) == 49
    assert int(num_closed[0]) == 0
    np.testing.assert_allclose(float(loss_closed), 0.0, atol=1e-6)


def test_ppm_attention_numpy_reference():
    b, h, w, c = 2, 4, 4, 6
    feat = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    value = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    p, clamp = 2.0, 0.0

    fn = feat / np.maximum(np.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
    vn = value / np.maximum(np.linalg.norm(value, axis=-1, keepdims=True), 1e-12)
    n = h * w
    want = np.empty((b, n, c), np.float32)
    for i in range(b):
        a = fn[i].reshape(n, c) @ fn[i].reshape(n, c).T
        a = np.maximum(a, clamp) ** p
        want[i] = a @ vn[i].reshape(n, c)

    got = np.asarray(ppm_attention(jnp.asarray(feat), jnp.asarray(value),
                                   p=p, clamp_value=clamp))
    np.testing.assert_allclose(got.reshape(b, n, c), want, rtol=1e-4, atol=1e-5)


def test_ppm_p1_identity_value():
    # p=1, clamp -inf-equivalent: attention is plain cosine similarity
    b, h, w, c = 1, 2, 2, 3
    feat = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    out = ppm_attention(jnp.asarray(feat), jnp.asarray(feat), p=1.0,
                        clamp_value=0.0)
    assert out.shape == (b, h, w, c)


def test_instance_loss_aligned_vectors():
    x = np.asarray(l2_normalize(jnp.asarray(
        RNG.standard_normal((4, 16)).astype(np.float32))))
    np.testing.assert_allclose(float(instance_loss(jnp.asarray(x),
                                                   jnp.asarray(x))),
                               -2.0, atol=1e-5)


def test_pair_geometry_scale_invariance():
    """The positive-pair mask is identical whether the crop coordinates are
    expressed against the full-resolution raster or a uniformly downscaled
    one (decode_scale): bin centers, diagonals, and flow displacements all
    scale together. This is what makes JPEG draft decode geometry-exact."""
    from pixflow_tpu.ops.loss import pair_loss_geometry
    rng = np.random.default_rng(8)
    b, h, w = 3, 7, 7
    flow = jnp.asarray(4 * rng.standard_normal((b, 90, 160, 2)), jnp.float32)

    def coords(scale):
        out = np.zeros((b, 10), np.float32)
        W, H = 1280 // scale, 720 // scale
        for i in range(b):
            j, ii = 100 // scale * (i + 1), 50 // scale * (i + 1)
            cw, ch = 400 // scale, 300 // scale
            out[i] = [j / (W - 1), ii / (H - 1), (j + cw - 1) / (W - 1),
                      (ii + ch - 1) / (H - 1), j, ii, cw, ch, W, H]
        return jnp.asarray(out)

    g1 = pair_loss_geometry(coords(1), coords(1), (h, w), 0.7, flow=flow)
    g2 = pair_loss_geometry(coords(2), coords(2), (h, w), 0.7, flow=flow)
    # masks agree except at the pos_ratio decision boundary: the (W-1)
    # half-pixel normalization shifts borderline distances by O(1/W), so a
    # small fraction of threshold-straddling pairs flips (~0.25% here)
    agree = np.mean(np.asarray(g1["pos"]) == np.asarray(g2["pos"]))
    assert agree > 0.99, agree
    # warped centers scale by exactly 2 (up to the (W-1) half-pixel term)
    np.testing.assert_allclose(np.asarray(g1["q_x"]) / 2.0,
                               np.asarray(g2["q_x"]), rtol=0.02, atol=0.5)
