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


def test_raft_batch_flows_micro_batch_snaps_to_divisor():
    """flow_bs that doesn't divide the batch snaps to the largest divisor
    (static shapes under jit need equal chunks) and returns the same values
    as the unchunked path — the driver defaults live-flow flow_bs to 4
    (`driver.py:_make_raft_fn`), which must not crash odd batches."""
    b, n, H, W = 6, 2, 32, 32
    model = RAFT(small=True)
    frames = jnp.asarray(
        RNG.integers(0, 255, (b, n, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames[:, 0], frames[:, 1],
                           iters=1)
    full = raft_batch_flows(model, variables, frames, iters=1)
    chunked = raft_batch_flows(model, variables, frames, iters=1,
                               micro_batch=4)  # snaps to 3
    np.testing.assert_allclose(np.asarray(chunked[0]), np.asarray(full[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked[1]), np.asarray(full[1]),
                               rtol=1e-5, atol=1e-5)

    # prime batch vs flow_bs: the only divisor is 1, so the chunk size
    # snaps all the way down and every (pair, sample) runs as its own
    # lax.map step — slow but correct, and the smallest possible HBM peak
    frames7 = jnp.asarray(
        RNG.integers(0, 255, (7, n, H, W, 3)).astype(np.float32))
    full7 = raft_batch_flows(model, variables, frames7, iters=1)
    chunked7 = raft_batch_flows(model, variables, frames7, iters=1,
                                micro_batch=4)
    np.testing.assert_allclose(np.asarray(chunked7[0]),
                               np.asarray(full7[0]), rtol=1e-5, atol=1e-5)


def test_raft_reduced_precision_outputs_f32_and_close():
    """`--raft_dtype bfloat16` / `--raft_corr_dtype bfloat16`: flow outputs
    must stay float32 (coords accumulate in f32, `raft.py:127`) and track
    the f32 result. The f32-compute + bf16-corr-storage mode (the
    accuracy-cheap fast path, docs/PERF.md) must track much tighter than
    full bf16 compute — only the corr values are rounded."""
    b, H, W = 1, 64, 64
    im1 = jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)).astype(np.float32))
    variables = RAFT(small=True).init(jax.random.PRNGKey(0), im1, im2,
                                      iters=1)
    outs = {}
    for key, kw in (("f32", {}),
                    ("bf16", dict(dtype=jnp.bfloat16)),
                    ("f32+bf16corr", dict(corr_dtype=jnp.bfloat16))):
        low, up = RAFT(small=True, **kw).apply(variables, im1, im2, iters=4)
        assert low.dtype == jnp.float32 and up.dtype == jnp.float32
        assert np.isfinite(np.asarray(up)).all()
        outs[key] = np.asarray(low)
    # random-init flows are tiny; loose relative bounds pin that the reduced
    # modes stay *sane* (iterative refinement amplifies rounding, so exact
    # closeness is not expected — docs/PERF.md delta measurements)
    scale = np.abs(outs["f32"]).max() + 1e-6
    d_bf16 = np.abs(outs["bf16"] - outs["f32"]).max()
    d_corr = np.abs(outs["f32+bf16corr"] - outs["f32"]).max()
    assert d_bf16 <= 0.15 * scale + 0.05, (d_bf16, scale)
    assert d_corr <= 0.05 * scale + 0.02, (d_corr, scale)


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


# --------------------------------------------------------------------------
# training: all-iteration outputs, sequence loss, one optimizer step
# --------------------------------------------------------------------------

def test_raft_all_iters_consistent_with_test_mode():
    """all_iters=True returns every iteration's full-res prediction and its
    last slice equals the test-mode flow_up (identical params/inputs)."""
    model = RAFT(small=True)
    b, H, W, iters = 1, 32, 48, 3
    im1 = jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), im1, im2, iters=1)

    low, preds = model.apply(variables, im1, im2, iters=iters, all_iters=True)
    low2, up = model.apply(variables, im1, im2, iters=iters)
    assert preds.shape == (iters, b, H, W, 2)
    np.testing.assert_allclose(np.asarray(low), np.asarray(low2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(preds[-1]), np.asarray(up),
                               atol=1e-5)


def test_sequence_loss_math():
    """Hand-checkable case: constant unit error at every iteration ->
    loss = sum_i gamma^(N-1-i) * mean(valid); EPE = sqrt(2) on valid px."""
    from pixflow_tpu.train.raft_trainer import sequence_loss
    n, b, h, w = 3, 1, 4, 4
    gt = jnp.zeros((b, h, w, 2))
    preds = jnp.ones((n, b, h, w, 2))
    valid = np.ones((b, h, w), np.float32)
    valid[0, 0, 0] = 0.0  # one unsupervised pixel
    loss, metrics = sequence_loss(preds, gt, jnp.asarray(valid), gamma=0.5)
    frac = 15.0 / 16.0
    expect = (0.25 + 0.5 + 1.0) * frac
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)
    np.testing.assert_allclose(float(metrics["epe"]), np.sqrt(2.0), rtol=1e-6)
    assert float(metrics["1px"]) == 0.0
    assert float(metrics["3px"]) == 1.0


def test_sequence_loss_excludes_extreme_flow():
    from pixflow_tpu.train.raft_trainer import sequence_loss
    gt = jnp.full((1, 2, 2, 2), 500.0)  # beyond MAX_FLOW -> excluded
    preds = jnp.zeros((2, 1, 2, 2, 2))
    loss, metrics = sequence_loss(preds, gt, jnp.ones((1, 2, 2)))
    assert float(loss) == 0.0
    assert float(metrics["epe"]) == 0.0


def test_raft_train_step_updates_params():
    """One jitted fine-tuning step: finite loss/metrics, parameters move,
    gradient actually flows through the unrolled GRU."""
    from pixflow_tpu.train.raft_trainer import (make_raft_train_step,
                                                raft_optimizer)
    model = RAFT(small=True)
    b, H, W = 2, 32, 48
    img1 = np.asarray(RNG.integers(0, 255, (b, H, W, 3)), np.float32)
    img2 = np.asarray(RNG.integers(0, 255, (b, H, W, 3)), np.float32)
    batch = {
        "img1": jnp.asarray(img1), "img2": jnp.asarray(img2),
        "flow": jnp.asarray(RNG.standard_normal((b, H, W, 2)), jnp.float32),
        "valid": jnp.ones((b, H, W), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["img1"],
                           batch["img2"], iters=1)
    params = variables["params"]
    _, tx = raft_optimizer(1e-4, total_steps=10, weight_decay=1e-5)
    step = make_raft_train_step(model, tx, iters=2, donate=False)
    state = (params, tx.init(params), jnp.zeros((), jnp.int32))

    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["epe"]))
    k0 = np.asarray(params["fnet"]["conv1"]["kernel"])
    k1 = np.asarray(new_state[0]["fnet"]["conv1"]["kernel"])
    assert np.abs(k1 - k0).max() > 0.0
    assert int(new_state[2]) == 1


def test_raft_train_step_on_mesh_matches_single_device():
    """GSPMD fine-tuning (raft_trainer.py mesh path): one sharded step on
    the 8-device data mesh must reproduce the single-device step — the
    global loss mean over the sharded batch IS DDP gradient averaging."""
    from pixflow_tpu.parallel import make_data_mesh
    from pixflow_tpu.train.raft_trainer import (make_raft_train_step,
                                                raft_optimizer)
    model = RAFT(small=True)
    b, H, W = 8, 32, 48
    batch = {
        "img1": jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)),
                            jnp.float32),
        "img2": jnp.asarray(RNG.integers(0, 255, (b, H, W, 3)),
                            jnp.float32),
        "flow": jnp.asarray(RNG.standard_normal((b, H, W, 2)), jnp.float32),
        "valid": jnp.ones((b, H, W), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["img1"],
                           batch["img2"], iters=1)
    params = variables["params"]
    _, tx = raft_optimizer(1e-4, total_steps=10, weight_decay=1e-5)

    outs = {}
    for name, mesh in (("single", None), ("mesh", make_data_mesh(8))):
        step = make_raft_train_step(model, tx, iters=2, donate=False,
                                    mesh=mesh)
        state = (params, tx.init(params), jnp.zeros((), jnp.int32))
        new_state, metrics = step(state, batch)
        outs[name] = (float(metrics["loss"]),
                      np.asarray(new_state[0]["fnet"]["conv1"]["kernel"]))

    np.testing.assert_allclose(outs["mesh"][0], outs["single"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["mesh"][1], outs["single"][1],
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_main_raft_cli_smoke(tmp_path):
    """main_raft.py end-to-end on a synthetic FlyingChairs-style corpus:
    two steps, metrics JSONL written, checkpoint saved."""
    import subprocess, sys, os, json
    from pixflow_tpu.data.flow_io import write_flo
    from PIL import Image

    root = tmp_path / "chairs"
    (root / "data").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(1, 4):
        for k in (1, 2):
            Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(
                str(root / "data" / f"{i:05d}_img{k}.ppm"))
        write_flo(str(root / "data" / f"{i:05d}_flow.flo"),
                  rng.standard_normal((64, 96, 2)).astype(np.float32))

    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "main_raft.py", "--stage", "chairs",
         "--chairs-root", str(root), "--small", "--iters", "2",
         "--crop-size", "32", "64", "--batch-size", "2", "--num-steps", "2",
         "--lr", "1e-4", "--print-freq", "1", "--save-freq", "2",
         "--output-dir", str(out)],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = open(out / "raft_metrics.jsonl").read().splitlines()
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss"]) and np.isfinite(rec["epe"])
    assert (out / "raft_chairs_2.msgpack").exists()
    assert (out / "raft_state.msgpack").exists()  # resumable full state

    # resume the full train state (params + Adam moments + step) and run
    # two more steps: continues at step 3, not a re-warm-up from step 1
    r2 = subprocess.run(
        [sys.executable, "main_raft.py", "--stage", "chairs",
         "--chairs-root", str(root), "--small", "--iters", "2",
         "--crop-size", "32", "64", "--batch-size", "2", "--num-steps", "4",
         "--lr", "1e-4", "--print-freq", "1", "--save-freq", "4",
         "--resume", "auto", "--output-dir", str(out)],
        capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed full train state" in r2.stdout
    steps = [json.loads(l)["step"]
             for l in open(out / "raft_metrics.jsonl").read().splitlines()]
    assert steps[-2:] == [3, 4]  # no redone steps
    assert (out / "raft_chairs_4.msgpack").exists()


def test_validate_dataset_metrics_math():
    """Metric math with a stub predictor: constant-offset error -> exact
    EPE/px-rate/Fl values (original evaluate.py definitions)."""
    from pixflow_tpu.eval.flow_eval import validate_dataset

    class StubModel:
        def apply(self, variables, i1, i2, iters=0):
            z = jnp.zeros(i1.shape[:3] + (2,), jnp.float32)
            return z, z  # predicts zero flow at full res

    class StubDataset:
        def __len__(self):
            return 2
        def __getitem__(self, i):
            img = np.zeros((16, 24, 3), np.float32)
            flow = np.full((16, 24, 2), 0.0, np.float32)
            flow[..., 0] = 1.0  # gt = (1, 0) everywhere -> epe 1.0
            return img, img, flow, np.ones((16, 24), np.float32)

    m = validate_dataset(StubModel(), {}, StubDataset(), iters=1)
    np.testing.assert_allclose(m["epe"], 1.0, rtol=1e-6)
    assert m["1px"] == 0.0 and m["3px"] == 1.0 and m["n_samples"] == 2.0

    class SparseDataset(StubDataset):
        def __getitem__(self, i):
            img = np.zeros((16, 24, 3), np.float32)
            flow = np.zeros((16, 24, 2), np.float32)
            flow[..., 0], flow[..., 1] = 4.0, 3.0  # mag 5, epe 5 -> outlier
            valid = np.zeros((16, 24), np.float32)
            valid[:8] = 1.0
            return img, img, flow, valid

    m = validate_dataset(StubModel(), {}, SparseDataset(), iters=1,
                         sparse=True)
    np.testing.assert_allclose(m["epe"], 5.0, rtol=1e-6)
    np.testing.assert_allclose(m["fl_all"], 100.0, rtol=1e-6)


def test_validate_dataset_empty_raises():
    """An empty/missing validation set must raise — not report a vacuous
    epe 0.0 / 1px 1.0 'perfect' score."""
    from pixflow_tpu.eval.flow_eval import validate_dataset

    class Empty:
        def __len__(self):
            return 0

    with pytest.raises(ValueError, match="empty"):
        validate_dataset(object(), {}, Empty(), iters=1)


def test_validate_dataset_sparse_epe_is_mean_of_image_means():
    """KITTI convention (original validate_kitti): epe is the mean of
    per-image mean EPEs — an image with few valid pixels weighs the same as
    a dense one; px rates stay pixel-pooled."""
    from pixflow_tpu.eval.flow_eval import validate_dataset

    class StubModel:
        def apply(self, variables, i1, i2, iters=0):
            z = jnp.zeros(i1.shape[:3] + (2,), jnp.float32)
            return z, z

    class TwoImages:
        def __len__(self):
            return 2
        def __getitem__(self, i):
            img = np.zeros((16, 24, 3), np.float32)
            flow = np.zeros((16, 24, 2), np.float32)
            valid = np.zeros((16, 24), np.float32)
            if i == 0:                      # 1 valid pixel, epe 10
                flow[0, 0, 0] = 10.0
                valid[0, 0] = 1.0
            else:                           # all 384 pixels valid, epe 1
                flow[..., 0] = 1.0
                valid[:] = 1.0
            return img, img, flow, valid

    m = validate_dataset(StubModel(), {}, TwoImages(), iters=1, sparse=True)
    np.testing.assert_allclose(m["epe"], (10.0 + 1.0) / 2, rtol=1e-6)
    # pixel-pooled 3px rate: 384 of 385 valid pixels are under 3px
    np.testing.assert_allclose(m["3px"], 384.0 / 385.0, rtol=1e-6)


def test_validate_dataset_real_raft_padding():
    """End-to-end through a real (tiny) RAFT with non-multiple-of-8 frames:
    InputPadder pad/unpad preserves the gt resolution."""
    from pixflow_tpu.eval.flow_eval import validate_dataset
    model = RAFT(small=True)
    h, w = 20, 28  # deliberately not /8
    im = jnp.zeros((1, 24, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im, im, iters=1)

    class OnePair:
        def __len__(self):
            return 1
        def __getitem__(self, i):
            rng = np.random.default_rng(4)
            img = np.asarray(rng.integers(0, 255, (h, w, 3)), np.float32)
            return (img, img, np.zeros((h, w, 2), np.float32),
                    np.ones((h, w), np.float32))

    m = validate_dataset(model, variables, OnePair(), iters=2)
    assert np.isfinite(m["epe"])


def test_lookup_corr_mxu_matches_gather():
    """The separable tent-matmul lookup is numerically the gather lookup
    (same zeros-padded bilinear taps), including out-of-range windows."""
    from pixflow_tpu.models.raft.corr import (lookup_corr_gather,
                                              lookup_corr_mxu)
    b, h, w, c = 2, 6, 9, 8
    f1 = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, 3)
    # coords wandering well outside the field to exercise zero padding
    coords = jnp.asarray(
        RNG.uniform(-4, 12, (b, h, w, 2)).astype(np.float32))
    a = lookup_corr_gather(pyr, coords, radius=3)
    m = lookup_corr_mxu(pyr, coords, radius=3)
    np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                               rtol=1e-4, atol=1e-5)

    # gradients agree too (the lookup sits inside the training loss)
    def s_gather(f):
        return jnp.sum(lookup_corr_gather(build_corr_pyramid(f, f2, 3),
                                          coords, 3) ** 2)
    def s_mxu(f):
        return jnp.sum(lookup_corr_mxu(build_corr_pyramid(f, f2, 3),
                                       coords, 3) ** 2)
    ga = jax.grad(s_gather)(f1)
    gm = jax.grad(s_mxu)(f1)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(ga),
                               rtol=2e-3, atol=2e-4)


def test_submission_writers(tmp_path):
    """Sintel/KITTI test-set submission files round-trip through the real
    (tiny) RAFT with warm-start and padding."""
    import os
    from PIL import Image
    from pixflow_tpu.eval.flow_eval import (create_kitti_submission,
                                            create_sintel_submission)
    from pixflow_tpu.data.flow_io import read_flo, read_kitti_png
    rng = np.random.default_rng(1)

    sintel = tmp_path / "sintel"
    for f in range(3):
        d = sintel / "test" / "clean" / "scene_1"
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (20, 28, 3), np.uint8)).save(
            str(d / f"frame_{f:04d}.png"))
        (sintel / "test" / "final" / "empty_scene").mkdir(parents=True,
                                                          exist_ok=True)
    kitti = tmp_path / "kitti"
    (kitti / "testing" / "image_2").mkdir(parents=True)
    for k in (10, 11):
        Image.fromarray(rng.integers(0, 255, (20, 28, 3), np.uint8)).save(
            str(kitti / "testing" / "image_2" / f"000000_{k}.png"))

    model = RAFT(small=True)
    im = jnp.zeros((1, 24, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im, im, iters=1)

    out_s = str(tmp_path / "out_sintel")
    create_sintel_submission(model, variables, str(sintel), out_s, iters=2)
    flo = read_flo(os.path.join(out_s, "clean", "scene_1", "frame0001.flo"))
    assert flo.shape == (20, 28, 2) and np.isfinite(flo).all()
    assert os.path.exists(os.path.join(out_s, "clean", "scene_1",
                                       "frame0002.flo"))

    out_k = str(tmp_path / "out_kitti")
    create_kitti_submission(model, variables, str(kitti), out_k, iters=2)
    flow, valid = read_kitti_png(os.path.join(out_k, "000000_10.png"))
    assert flow.shape == (20, 28, 2) and valid.all()
