"""RAFT tests: correlation-volume numerics, convex upsampling, end-to-end
shapes for small/basic variants, torch-checkpoint conversion round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.models.raft import RAFT, torch_state_dict_to_flax
from pixflow_tpu.models.raft.corr import build_corr_pyramid, lookup_corr
from pixflow_tpu.models.raft.raft import convex_upsample_flow, raft_batch_flows

RNG = np.random.default_rng(7)


def test_corr_pyramid_numerics():
    b, h, w, c = 2, 4, 4, 8
    f1 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    assert pyr[0].shape == (b * h * w, h, w, 1)
    assert pyr[1].shape == (b * h * w, 2, 2, 1)
    # corr[b, i, j] = <f1[b, i], f2[b, j]> / sqrt(c)
    want = np.einsum("bxc,byc->bxy", f1.reshape(b, -1, c),
                     f2.reshape(b, -1, c)) / np.sqrt(c)
    got = np.asarray(pyr[0]).reshape(b, h * w, h * w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_corr_lookup_at_identity_coords():
    """Looking up with coords = identity grid must return the self-pair
    correlation at the window center."""
    b, h, w, c = 1, 6, 6, 4
    f1 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=1)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([xs, ys], -1)[None].astype(np.float32)
    r = 1
    out = np.asarray(lookup_corr(pyr, jnp.asarray(coords), radius=r))
    assert out.shape == (b, h, w, (2 * r + 1) ** 2)
    # center channel (offset 0,0) = index r*(2r+1)+r
    center = out[0, :, :, r * (2 * r + 1) + r]
    want = np.einsum("xc,xc->x", f1.reshape(-1, c), f2.reshape(-1, c)
                     ).reshape(h, w)[..., None] * 0  # placeholder
    want = (np.einsum("ic,jc->ij", f1.reshape(-1, c), f2.reshape(-1, c))
            / np.sqrt(c)).reshape(h, w, h, w)
    diag = np.array([[want[i, j, i, j] for j in range(w)] for i in range(h)])
    np.testing.assert_allclose(center, diag, rtol=1e-4, atol=1e-5)


def test_convex_upsample_uniform_mask_equals_selected_tap():
    """With a one-hot mask on the center tap, convex upsampling replicates
    8x the flow value into each 8x8 cell."""
    b, h, w = 1, 2, 3
    flow = RNG.standard_normal((b, h, w, 2)).astype(np.float32)
    mask = np.full((b, h, w, 9, 8, 8), -1e9, np.float32)
    mask[:, :, :, 4] = 0.0  # center of the 3x3 window (dy=dx=0)
    out = np.asarray(convex_upsample_flow(
        jnp.asarray(flow), jnp.asarray(mask.reshape(b, h, w, 576))))
    assert out.shape == (b, 8 * h, 8 * w, 2)
    for i in range(h):
        for j in range(w):
            np.testing.assert_allclose(
                out[0, 8 * i:8 * (i + 1), 8 * j:8 * (j + 1)],
                np.broadcast_to(8 * flow[0, i, j], (8, 8, 2)), rtol=1e-5)


@pytest.mark.parametrize("small", [True, False])
def test_raft_end_to_end_shapes(small):
    b, H, W = 1, 64, 64
    model = RAFT(small=small)
    im1 = jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), im1, im2, iters=1)
    flow_low, flow_up = model.apply(variables, im1, im2, iters=2)
    assert flow_low.shape == (b, H // 8, W // 8, 2)
    assert flow_up.shape == (b, H, W, 2)
    assert np.isfinite(np.asarray(flow_up)).all()


def test_raft_batch_flows_shapes_and_reversal():
    b, n, H, W = 2, 3, 32, 32
    model = RAFT(small=True)
    frames = jnp.asarray(RNG.integers(0, 255, (b, n, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames[:, 0], frames[:, 1],
                           iters=1)
    fwd, bwd = raft_batch_flows(model, variables, frames, iters=1)
    assert fwd.shape == (b, n - 1, H // 8, W // 8, 2)
    assert bwd.shape == (b, n - 1, H // 8, W // 8, 2)
    # bwd[0] is the flow for the LAST pair reversed (reference ordering):
    # pair (frame2 -> frame1) comes first in file order after reversal
    direct_low, _ = model.apply(variables, frames[:, n - 1], frames[:, n - 2],
                                iters=1)
    np.testing.assert_allclose(np.asarray(bwd[:, 0]), np.asarray(direct_low),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _flax_to_torch_keys(tree, prefix, small, is_stats=False):
    """Inverse of the converter's mapping, used to fabricate a synthetic
    torch state dict with authentic RAFT key names."""
    import re
    out = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                parts = []
                for p in path + [k]:
                    p = re.sub(r"^layer(\d)_(\d)$", r"layer\1.\2", p)
                    p = p.replace("downsample_conv", "downsample.0")
                    p = p.replace("mask_conv1", "mask.0")
                    p = p.replace("mask_conv2", "mask.2")
                    parts.append(p)
                ds_norm = "norm4" if small else "norm3"
                key = ".".join(parts)
                key = key.replace("." + ds_norm + ".", ".downsample.1.")
                leaf = parts[-1]
                arr = np.asarray(v)
                if leaf == "kernel":
                    key = key.replace(".kernel", ".weight")
                    arr = arr.transpose(3, 2, 0, 1)
                elif leaf == "scale":
                    key = key.replace(".scale", ".weight")
                elif leaf == "mean":
                    key = key.replace(".mean", ".running_mean")
                elif leaf == "var":
                    key = key.replace(".var", ".running_var")
                out["module." + key] = arr

    walk(tree, [])
    return out


@pytest.mark.parametrize("small", [True, False])
def test_torch_conversion_roundtrip(small):
    model = RAFT(small=small)
    im = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), im, im, iters=1)

    fake_sd = _flax_to_torch_keys(
        jax.tree.map(np.asarray, dict(variables["params"])), "", small)
    if "batch_stats" in variables:
        fake_sd.update(_flax_to_torch_keys(
            jax.tree.map(np.asarray, dict(variables["batch_stats"])), "",
            small, is_stats=True))

    converted = torch_state_dict_to_flax(fake_sd, small=small)

    flat_orig = jax.tree_util.tree_flatten_with_path(
        dict(variables["params"]))[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(converted["params"])[0]
    assert len(flat_orig) == len(flat_conv)
    orig_map = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat_orig}
    for k, v in flat_conv:
        ks = jax.tree_util.keystr(k)
        assert ks in orig_map, f"converted path {ks} missing from model"
        np.testing.assert_array_equal(np.asarray(v), orig_map[ks])


def test_canonical_torch_keys_map_into_model():
    """Spot-check authentic upstream RAFT key names (public checkpoint
    layout) against the flax module tree."""
    model = RAFT(small=False)
    im = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), im, im, iters=1)
    params = dict(variables["params"])

    canonical = {
        "module.fnet.conv1.weight": (7, 7, 3, 64),
        "module.fnet.layer1.0.conv1.weight": (3, 3, 64, 64),
        "module.fnet.layer2.0.downsample.0.weight": (1, 1, 64, 96),
        "module.fnet.conv2.weight": (1, 1, 128, 256),
        "module.cnet.norm1.weight": (64,),
        "module.update_block.encoder.convc1.weight": (1, 1, 324, 256),
        "module.update_block.gru.convz1.weight": (1, 5, 384, 128),
        "module.update_block.flow_head.conv1.weight": (3, 3, 128, 256),
        "module.update_block.mask.0.weight": (3, 3, 128, 256),
        "module.update_block.mask.2.weight": (1, 1, 256, 576),
    }
    fake = {}
    for key, flax_shape in canonical.items():
        if key.endswith("norm1.weight"):
            fake[key] = np.zeros(flax_shape, np.float32)
        else:
            o, i, kh, kw = (flax_shape[3], flax_shape[2],
                            flax_shape[0], flax_shape[1])
            fake[key] = np.zeros((o, i, kh, kw), np.float32)
    converted = torch_state_dict_to_flax(fake, small=False)

    def get(tree, dotted):
        node = tree
        for p in dotted:
            assert p in node, f"missing {dotted} at {p}"
            node = node[p]
        return node

    assert get(converted["params"], ("fnet", "conv1", "kernel")).shape == (7, 7, 3, 64)
    assert get(converted["params"], ("fnet", "layer2_0", "downsample_conv", "kernel")).shape == (1, 1, 64, 96)
    assert get(converted["params"], ("update_block", "gru", "convz1", "kernel")).shape == (1, 5, 384, 128)
    assert get(converted["params"], ("update_block", "mask_conv2", "kernel")).shape == (1, 1, 256, 576)
    # every converted path must exist in the real model tree with equal shape
    flat_model = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(converted["params"])[0]:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_model, f"{ks} not in model"
        assert flat_model[ks] == np.asarray(v).shape, f"shape mismatch at {ks}"
