"""Linear-probe driver end-to-end: publish a pretrain checkpoint, graft it,
train the probe, validate — the full main_linear.py path on synthetic data."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def imagenet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_imagenet")
    rng = np.random.default_rng(2)
    for split, n in (("train", 4), ("val", 2)):
        for cls in ("cat", "dog"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                base = 40 if cls == "cat" else 200  # separable by brightness
                arr = np.clip(base + rng.integers(0, 40, (64, 64, 3)),
                              0, 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def published_ckpt(tmp_path_factory):
    """A published pretrain checkpoint for a tiny PixPro."""
    from pixflow_tpu.models import PixPro, init_momentum_from_online
    from pixflow_tpu.train.state import TrainState
    from pixflow_tpu.utils import save_checkpoint, publish_checkpoint

    model = PixPro(arch="resnet18", pixpro_transform_layer=1,
                   proj_inner_dim=32, proj_out_dim=16)
    im = jnp.zeros((1, 64, 64, 3))
    v_on = model.init(jax.random.PRNGKey(0), im, method=model.online,
                      train=True)
    v_k = model.init(jax.random.PRNGKey(0), im,
                     method=model.momentum_branch, train=True)
    params = init_momentum_from_online(
        {**dict(v_on["params"]), **dict(v_k["params"])})
    stats = {**dict(v_on["batch_stats"]), **dict(v_k["batch_stats"])}
    state = TrainState(step=jnp.asarray(5), ema_k=jnp.asarray(5),
                       params=params, batch_stats=stats, opt_state={})
    d = tmp_path_factory.mktemp("ckpt")
    path = save_checkpoint(str(d), 5, state, "{}")
    return publish_checkpoint(path, str(d / "published.msgpack"))


def test_linear_eval_driver(imagenet_root, published_ckpt, tmp_path):
    from pixflow_tpu.configs import LinearConfig
    from pixflow_tpu.eval.driver import linear_eval

    cfg = LinearConfig()
    cfg.data.data_dir = imagenet_root
    cfg.data.dataset = "ImageNet"
    cfg.data.aug = "NULL"
    cfg.data.crop = 0.5
    cfg.data.image_size = 64
    cfg.data.num_workers = 1
    cfg.total_batch_size = 8
    cfg.num_classes = 2
    cfg.model.arch = "resnet18"
    cfg.optim.base_lr = 1.0
    cfg.optim.epochs = 2
    cfg.optim.warmup_epoch = 0
    cfg.runtime.output_dir = str(tmp_path / "linear_out")
    cfg.runtime.print_freq = 1
    cfg.runtime.save_freq = 2
    cfg.runtime.compute_dtype = "float32"
    cfg.runtime.mesh_shape = 1  # plain jit path

    res = linear_eval(cfg, published_ckpt)
    assert 0.0 <= res["best_acc1"] <= 100.0
    assert os.path.exists(os.path.join(cfg.runtime.output_dir,
                                       "ckpt_epoch_2.msgpack"))


def test_linear_eval_only(imagenet_root, published_ckpt, tmp_path):
    from pixflow_tpu.configs import LinearConfig
    from pixflow_tpu.eval.driver import linear_eval

    cfg = LinearConfig()
    cfg.data.data_dir = imagenet_root
    cfg.data.dataset = "ImageNet"
    cfg.data.image_size = 64
    cfg.data.num_workers = 1
    cfg.total_batch_size = 4
    cfg.num_classes = 2
    cfg.model.arch = "resnet18"
    cfg.eval_only = True
    cfg.runtime.output_dir = str(tmp_path / "linear_eval_only")
    cfg.runtime.compute_dtype = "float32"
    cfg.runtime.mesh_shape = 1

    res = linear_eval(cfg, published_ckpt)
    assert set(res) == {"loss", "acc1", "acc5"}
