"""Linear-probe + detectron2-export tests."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.eval import (build_linear_state, make_linear_train_step,
                              make_linear_eval_step, load_pretrained_encoder,
                              flax_resnet_to_d2)
from pixflow_tpu.eval.linear import linear_optimizer, frozen_backbone_mask
from pixflow_tpu.models import make_resnet
from pixflow_tpu.train.schedule import warmup_cosine

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def linear_setup():
    lr = warmup_cosine(0.5, epochs=5, warmup_epoch=0, steps_per_epoch=3)
    tx0 = linear_optimizer(lr)
    model, state = build_linear_state(jax.random.PRNGKey(0), "resnet18",
                                      num_classes=4, image_size=32, tx=tx0)
    tx = linear_optimizer(lr, params=state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_linear_train_step(model, tx, lr, mesh=None, donate=False)
    return model, state, step, lr


def test_linear_probe_trains_only_fc(linear_setup):
    model, state, step, _ = linear_setup
    batch = {"image": jnp.asarray(RNG.standard_normal((8, 32, 32, 3))
                                  .astype(np.float32)),
             "label": jnp.asarray(RNG.integers(0, 4, (8,)))}
    w_backbone0 = np.asarray(state.params["conv1"]["kernel"]).copy()
    w_fc0 = np.asarray(state.params["fc"]["kernel"]).copy()
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(
        np.asarray(state.params["conv1"]["kernel"]), w_backbone0)
    assert np.abs(np.asarray(state.params["fc"]["kernel"]) - w_fc0).sum() > 0


def test_linear_probe_learns_separable_data(linear_setup):
    model, state, step, _ = linear_setup
    # class = sign pattern in channel means: trivially separable
    images = np.zeros((8, 32, 32, 3), np.float32)
    labels = np.arange(8) % 4
    for i, lab in enumerate(labels):
        images[i, :, :, 0] = (lab % 2) * 2 - 1
        images[i, :, :, 1] = (lab // 2) * 2 - 1
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_eval_step_metrics(linear_setup):
    model, state, _, _ = linear_setup
    eval_step = make_linear_eval_step(model)
    batch = {"image": jnp.asarray(RNG.standard_normal((8, 32, 32, 3))
                                  .astype(np.float32)),
             "label": jnp.asarray(RNG.integers(0, 4, (8,)))}
    m = eval_step(state, batch)
    assert 0.0 <= float(m["acc1"]) <= 100.0
    assert float(m["acc5"]) == 100.0  # 4 classes -> top5 always right


def test_load_pretrained_encoder_grafts_trunk(linear_setup):
    model, state, _, _ = linear_setup
    fake = {"encoder": {"conv1": {"kernel": np.full_like(
        np.asarray(state.params["conv1"]["kernel"]), 0.123)}}}
    state2 = load_pretrained_encoder(state, fake)
    np.testing.assert_allclose(
        np.asarray(state2.params["conv1"]["kernel"]), 0.123)
    # fc untouched
    np.testing.assert_array_equal(np.asarray(state2.params["fc"]["kernel"]),
                                  np.asarray(state.params["fc"]["kernel"]))


def test_frozen_backbone_mask(linear_setup):
    _, state, _, _ = linear_setup
    mask = frozen_backbone_mask(state.params)
    assert mask["conv1"]["kernel"] is True
    assert mask["fc"]["kernel"] is False


def test_d2_export_layout(tmp_path):
    model = make_resnet("resnet18", head_type="early_return")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           True)
    out_path = str(tmp_path / "d2.pkl")
    weights = flax_resnet_to_d2(dict(variables["params"]),
                                dict(variables["batch_stats"]), out_path)

    assert weights["stem.conv1.weight"].shape == (64, 3, 7, 7)  # OIHW
    assert "stem.conv1.norm.weight" in weights
    assert "stem.conv1.norm.running_mean" in weights
    assert "res2.0.conv1.weight" in weights
    assert "res3.0.shortcut.weight" in weights
    assert "res5.1.conv2.norm.running_var" in weights
    assert "res6.0.conv1.weight" not in weights  # only res2..res5

    with open(out_path, "rb") as f:
        payload = pickle.load(f)
    assert payload["matching_heuristics"] is True
    assert set(payload["model"]) == set(weights)

    # kernel transpose correctness
    k = np.asarray(variables["params"]["conv1"]["kernel"])  # HWIO
    np.testing.assert_array_equal(weights["stem.conv1.weight"],
                                  k.transpose(3, 2, 0, 1))


def test_d2_config_set_complete():
    """All 8 reference detectron2 configs exist with a consistent
    inheritance chain and the SSL-protocol settings (reference
    transfer/detection/configs/*.yaml)."""
    import os
    import re

    cfg_dir = os.path.join(os.path.dirname(__file__), "..",
                           "transfer", "detection", "configs")
    names = ["Base-RCNN-C4-BN.yaml", "Base-RCNN-FPN.yaml",
             "COCO_R_50_C4_1x.yaml", "COCO_R_50_C4_1x_PixPro.yaml",
             "COCO_R_50_FPN_1x.yaml", "COCO_R_50_FPN_1x_PixPro.yaml",
             "Pascal_VOC_R_50_C4_24k.yaml",
             "Pascal_VOC_R_50_C4_24k_PixPro.yaml"]
    text = {}
    for n in names:
        p = os.path.join(cfg_dir, n)
        assert os.path.exists(p), f"missing d2 config {n}"
        text[n] = open(p).read()

    # inheritance chain matches the reference's
    assert '_BASE_: "Base-RCNN-C4-BN.yaml"' in text["COCO_R_50_C4_1x.yaml"]
    assert '_BASE_: "COCO_R_50_C4_1x.yaml"' in text["COCO_R_50_C4_1x_PixPro.yaml"]
    assert '_BASE_: "Base-RCNN-FPN.yaml"' in text["COCO_R_50_FPN_1x.yaml"]
    assert '_BASE_: "COCO_R_50_FPN_1x.yaml"' in text["COCO_R_50_FPN_1x_PixPro.yaml"]
    assert '_BASE_: "Base-RCNN-C4-BN.yaml"' in text["Pascal_VOC_R_50_C4_24k.yaml"]
    assert ('_BASE_: "Pascal_VOC_R_50_C4_24k.yaml"'
            in text["Pascal_VOC_R_50_C4_24k_PixPro.yaml"])

    # SSL protocol pins: no freezing, SyncBN, precise BN in the bases;
    # RGB stats + torch-style stride in every PixPro variant
    assert "FREEZE_AT: 0" in text["Base-RCNN-C4-BN.yaml"]
    assert 'NORM: "SyncBN"' in text["Base-RCNN-C4-BN.yaml"]
    assert "PRECISE_BN" in text["Base-RCNN-C4-BN.yaml"]
    assert "FREEZE_AT: 0" in text["COCO_R_50_FPN_1x.yaml"]
    for n in names:
        if n.endswith("_PixPro.yaml"):
            assert "STRIDE_IN_1X1: False" in text[n], n
            assert "PIXEL_MEAN: [123.675, 116.280, 103.530]" in text[n], n
            assert 'FORMAT: "RGB"' in text[n], n
    # VOC is detection-only with 20 classes
    assert "MASK_ON: False" in text["Pascal_VOC_R_50_C4_24k.yaml"]
    assert "NUM_CLASSES: 20" in text["Pascal_VOC_R_50_C4_24k.yaml"]
