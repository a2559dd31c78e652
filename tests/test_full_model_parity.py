"""Full-model forward parity: the reference PixPro (torch CPU, identical
weights imported through our converter) vs our Flax PixPro on the same batch
must produce the same loss. This transitively pins the ResNet conv/BN
numerics, MLP2d heads, value transform, PPM attention, normalizations, the
coordinate/loss geometry, and the checkpoint importer."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_env():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29571", rank=0, world_size=1)
    import importlib
    return importlib.import_module("contrast.models.PixPro")


def _desync_batchnorm(module):
    """SyncBatchNorm -> BatchNorm2d so the reference runs on CPU (shared
    with tools/compare_loss_curve.py via tools/ref_loop.py)."""
    from tools.ref_loop import desync_batchnorm
    desync_batchnorm(module, torch)


@pytest.mark.slow
def test_full_forward_loss_parity(ref_env):
    ref_pixpro_mod = ref_env
    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax
    import contrast.resnet as ref_resnet

    args = types.SimpleNamespace(
        pixpro_p=2.0, pixpro_momentum=0.99, pixpro_pos_ratio=0.7,
        pixpro_clamp_value=0.0, pixpro_transform_layer=1,
        pixpro_ins_loss_weight=0.0, num_instances=1024, batch_size=8,
        epochs=10, start_epoch=1, output_dir="/tmp/refout",
        feature_dim=256, head_type="early_return")
    torch.manual_seed(0)
    ref_model = ref_pixpro_mod.PixPro(ref_resnet.resnet50, args)
    _desync_batchnorm(ref_model)
    ref_model.train()

    # identical weights through our importer ('module.'-prefixed like DDP)
    sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    variables = torch_pixpro_to_flax(sd)

    rng = np.random.default_rng(7)
    b, hw = 2, 64
    im1 = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    im2 = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    coords = np.zeros((b, 10), np.float32)
    coords[0] = [0.10, 0.15, 0.45, 0.55, 128, 108, 462, 296, 1280, 720]
    coords[1] = [0.30, 0.20, 0.70, 0.60, 384, 144, 525, 296, 1280, 720]
    coords2 = np.zeros((b, 10), np.float32)
    coords2[0] = [0.20, 0.10, 0.55, 0.50, 256, 72, 462, 296, 1280, 720]
    coords2[1] = [0.25, 0.30, 0.65, 0.70, 320, 216, 525, 296, 1280, 720]

    with torch.no_grad():
        ref_loss, _ = ref_model(
            torch.from_numpy(im1), torch.from_numpy(im2),
            torch.from_numpy(coords), torch.from_numpy(coords2),
            is_update_momentum=False)

    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7)
    (loss, _), _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(im1.transpose(0, 2, 3, 1)),
        jnp.asarray(im2.transpose(0, 2, 3, 1)),
        jnp.asarray(coords), jnp.asarray(coords2),
        train=True, mutable=["batch_stats"])

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_full_backward_gradient_parity(ref_env):
    """dLoss/d(stem conv) through the full model must match torch autograd:
    pins BN-backward, PPM backward, normalization backward, stop-gradient
    placement, and the loss VJP in one shot."""
    ref_pixpro_mod = ref_env
    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax
    import contrast.resnet as ref_resnet

    args = types.SimpleNamespace(
        pixpro_p=2.0, pixpro_momentum=0.99, pixpro_pos_ratio=0.7,
        pixpro_clamp_value=0.0, pixpro_transform_layer=1,
        pixpro_ins_loss_weight=0.0, num_instances=1024, batch_size=8,
        epochs=10, start_epoch=1, output_dir="/tmp/refout",
        feature_dim=256, head_type="early_return")
    torch.manual_seed(1)
    ref_model = ref_pixpro_mod.PixPro(ref_resnet.resnet50, args)
    _desync_batchnorm(ref_model)
    ref_model.train()

    sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    variables = torch_pixpro_to_flax(sd)

    rng = np.random.default_rng(11)
    b, hw = 2, 64
    im1 = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    im2 = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    coords = np.array([[0.1, 0.15, 0.45, 0.55, 128, 108, 462, 296, 1280, 720],
                       [0.3, 0.2, 0.7, 0.6, 384, 144, 525, 296, 1280, 720]],
                      np.float32)
    coords2 = np.array([[0.2, 0.1, 0.55, 0.5, 256, 72, 462, 296, 1280, 720],
                        [0.25, 0.3, 0.65, 0.7, 320, 216, 525, 296, 1280, 720]],
                       np.float32)

    ref_loss, _ = ref_model(
        torch.from_numpy(im1), torch.from_numpy(im2),
        torch.from_numpy(coords), torch.from_numpy(coords2),
        is_update_momentum=False)
    ref_loss.backward()
    ref_grad = ref_model.encoder.conv1.weight.grad.numpy()  # OIHW
    ref_grad_proj = None
    for name, p in ref_model.named_parameters():
        if name == "projector.linear1.weight" and p.grad is not None:
            ref_grad_proj = p.grad.numpy()

    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7)

    def loss_fn(params):
        (l, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(im1.transpose(0, 2, 3, 1)),
            jnp.asarray(im2.transpose(0, 2, 3, 1)),
            jnp.asarray(coords), jnp.asarray(coords2),
            train=True, mutable=["batch_stats"])
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    got = np.asarray(grads["encoder"]["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    scale = np.abs(ref_grad).max()
    np.testing.assert_allclose(got, ref_grad, rtol=2e-3, atol=2e-3 * scale)

    if ref_grad_proj is not None:
        got_proj = np.asarray(grads["projector"]["linear1"]["kernel"]).T
        scale_p = np.abs(ref_grad_proj).max()
        np.testing.assert_allclose(got_proj, ref_grad_proj[:, :, 0, 0]
                                   if ref_grad_proj.ndim == 4 else ref_grad_proj,
                                   rtol=2e-3, atol=2e-3 * scale_p)
    # momentum branch must receive no gradient
    assert np.allclose(np.asarray(grads["encoder_k"]["conv1"]["kernel"]), 0.0)


@pytest.mark.slow
def test_instance_branch_forward_parity(ref_env):
    """Full-model forward with the BYOL instance branch enabled
    (--pixpro-ins-loss-weight > 0; reference `PixPro.py:306-319,387-394,
    409-416,434-437`): identical imported weights must produce the same
    combined loss. 224px input: the reference's AvgPool2d(7) over a 7x7 c5
    equals our global mean exactly."""
    ref_pixpro_mod = ref_env
    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax
    import contrast.resnet as ref_resnet

    args = types.SimpleNamespace(
        pixpro_p=2.0, pixpro_momentum=0.99, pixpro_pos_ratio=0.7,
        pixpro_clamp_value=0.0, pixpro_transform_layer=1,
        pixpro_ins_loss_weight=1.0, num_instances=1024, batch_size=8,
        epochs=10, start_epoch=1, output_dir="/tmp/refout",
        feature_dim=256, head_type="early_return")
    torch.manual_seed(2)
    ref_model = ref_pixpro_mod.PixPro(ref_resnet.resnet50, args)
    _desync_batchnorm(ref_model)
    ref_model.train()

    sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    variables = torch_pixpro_to_flax(sd)

    rng = np.random.default_rng(17)
    b, hw = 2, 224
    im1 = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    im2 = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    coords = np.array([[0.1, 0.15, 0.45, 0.55, 128, 108, 462, 296, 1280, 720],
                       [0.3, 0.2, 0.7, 0.6, 384, 144, 525, 296, 1280, 720]],
                      np.float32)
    coords2 = np.array([[0.2, 0.1, 0.55, 0.5, 256, 72, 462, 296, 1280, 720],
                        [0.25, 0.3, 0.65, 0.7, 320, 216, 525, 296, 1280, 720]],
                       np.float32)

    with torch.no_grad():
        ref_loss, _ = ref_model(
            torch.from_numpy(im1), torch.from_numpy(im2),
            torch.from_numpy(coords), torch.from_numpy(coords2),
            is_update_momentum=False)

    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7, pixpro_ins_loss_weight=1.0)
    (loss, stats), _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(im1.transpose(0, 2, 3, 1)),
        jnp.asarray(im2.transpose(0, 2, 3, 1)),
        jnp.asarray(coords), jnp.asarray(coords2),
        train=True, mutable=["batch_stats"])

    assert "loss_instance" in stats
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=5e-4, atol=5e-4)
