"""StableHLO serving export (pixflow_tpu/utils/export_hlo.py).

Pins: (a) a deserialized artifact reproduces the live model to float32 ulp
noise (the artifact compiles through the symbolic-batch StableHLO pipeline,
whose fusion schedule differs from the live jit's — measured max 2e-5
relative on CPU, so bitwise equality is unattainable by construction),
(b) the symbolic batch dimension accepts any batch at call time, (c) baked-
in preprocessing (ImageNet normalization, RAFT /8 padding) matches what the
training/eval stack applies, (d) the CLI writes a working artifact from
real checkpoint files."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _normalize(im_u8):
    import jax.numpy as jnp
    from pixflow_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    x = jnp.asarray(im_u8).astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


@pytest.fixture(scope="module")
def backbone_setup():
    import jax
    import jax.numpy as jnp
    from pixflow_tpu.models import make_resnet
    model = make_resnet("resnet18", head_type="early_return")
    im = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), im, False)
    return model, variables


def test_backbone_roundtrip_and_symbolic_batch(backbone_setup):
    from pixflow_tpu.utils.export_hlo import export_backbone, load_serving
    model, variables = backbone_setup
    blob = export_backbone("resnet18", dict(variables["params"]),
                           dict(variables.get("batch_stats", {})),
                           image_size=32, platforms=("cpu",))
    fn = load_serving(blob)

    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: one export serves every batch size
        im = rng.integers(0, 255, (b, 32, 32, 3), np.uint8)
        got = np.asarray(fn(im))
        want = np.asarray(model.apply(variables, _normalize(im), False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_backbone_export_includes_tpu_lowering(backbone_setup):
    """The default artifact must carry the tpu lowering (exported from a
    CPU host — cross-platform lowering is the point of jax.export)."""
    from pixflow_tpu.utils.export_hlo import export_backbone, load_serving
    _, variables = backbone_setup
    blob = export_backbone("resnet18", dict(variables["params"]),
                           dict(variables.get("batch_stats", {})),
                           image_size=32, platforms=("cpu", "tpu"))
    fn = load_serving(blob)
    assert set(fn.platforms) == {"cpu", "tpu"}
    im = np.zeros((2, 32, 32, 3), np.uint8)
    assert np.asarray(fn(im)).shape[0] == 2  # still runs on the cpu host


def test_classifier_roundtrip():
    import jax
    import jax.numpy as jnp
    from pixflow_tpu.models import make_resnet
    from pixflow_tpu.utils.export_hlo import export_classifier, load_serving
    model = make_resnet("resnet18", head_type="reduce", low_dim=5)
    im = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), im, False)
    blob = export_classifier("resnet18", dict(variables["params"]),
                             dict(variables.get("batch_stats", {})),
                             num_classes=5, image_size=32,
                             platforms=("cpu",))
    fn = load_serving(blob)
    imgs = np.random.default_rng(1).integers(0, 255, (2, 32, 32, 3),
                                             np.uint8)
    got = np.asarray(fn(imgs))
    want = np.asarray(model.apply(variables, _normalize(imgs), False))
    assert got.shape == (2, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_backbone_export_rejects_uncovered_trunk(backbone_setup):
    """A checkpoint tree that does not cover the model trunk (e.g. an outer
    container like the whole PixPro params passed where the encoder subtree
    belongs) must FAIL the export — not silently trace random-init weights
    into the artifact."""
    from pixflow_tpu.utils.export_hlo import export_backbone
    _, variables = backbone_setup
    wrong = {"encoder": dict(variables["params"])}  # outer container
    with pytest.raises(ValueError, match="trunk"):
        export_backbone("resnet18", wrong,
                        dict(variables.get("batch_stats", {})),
                        image_size=32, platforms=("cpu",))


def test_raft_roundtrip_with_padding():
    """Frame size NOT divisible by 8: the baked-in InputPadder must pad and
    un-pad exactly like eval does (eval/flow_eval.py pattern)."""
    import jax
    import jax.numpy as jnp
    from pixflow_tpu.models.raft.raft import RAFT
    from pixflow_tpu.models.raft.utils import InputPadder
    from pixflow_tpu.utils.export_hlo import export_raft, load_serving

    h, w = 36, 52
    model = RAFT(small=True)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), dummy, dummy, iters=1)
    blob = export_raft(dict(variables), h, w, small=True, iters=2,
                       platforms=("cpu",))
    fn = load_serving(blob)

    rng = np.random.default_rng(2)
    im1 = rng.integers(0, 255, (1, h, w, 3), np.uint8)
    im2 = rng.integers(0, 255, (1, h, w, 3), np.uint8)
    got = np.asarray(fn(im1, im2))
    assert got.shape == (1, h, w, 2)

    padder = InputPadder((h, w))
    p1, p2 = padder.pad(jnp.asarray(im1, jnp.float32),
                        jnp.asarray(im2, jnp.float32))
    _, flow_up = model.apply(variables, p1, p2, iters=2)
    want = np.asarray(padder.unpad(flow_up))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_export_cli_backbone(tmp_path):
    """End to end through real files: publish a pretrain checkpoint, export
    it with tools/export_serving.py, load + run the artifact."""
    import jax
    import jax.numpy as jnp
    from pixflow_tpu.models import PixPro, init_momentum_from_online
    from pixflow_tpu.train.state import TrainState
    from pixflow_tpu.utils import publish_checkpoint, save_checkpoint
    from pixflow_tpu.utils.export_hlo import load_serving

    model = PixPro(arch="resnet18", pixpro_transform_layer=1,
                   proj_inner_dim=16, proj_out_dim=8)
    im = jnp.zeros((1, 32, 32, 3))
    v_on = model.init(jax.random.PRNGKey(0), im, method=model.online,
                      train=True)
    v_k = model.init(jax.random.PRNGKey(0), im,
                     method=model.momentum_branch, train=True)
    params = init_momentum_from_online(
        {**dict(v_on["params"]), **dict(v_k["params"])})
    stats = {**dict(v_on["batch_stats"]), **dict(v_k["batch_stats"])}
    state = TrainState(step=jnp.asarray(1), ema_k=jnp.asarray(1),
                       params=params, batch_stats=stats, opt_state={})
    ckpt = save_checkpoint(str(tmp_path), 1, state, "{}")
    published = publish_checkpoint(ckpt, str(tmp_path / "pub.msgpack"))

    out = str(tmp_path / "backbone.stablehlo")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_serving.py"),
         "backbone", "--ckpt", published, "--arch", "resnet18",
         "--image-size", "32", "--out", out, "--platforms", "cpu"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    fn = load_serving(open(out, "rb").read())
    feats = fn(np.zeros((2, 32, 32, 3), np.uint8))
    assert np.asarray(feats).shape[0] == 2
