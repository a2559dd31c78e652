"""Reference-PixPro-checkpoint importer tests: fabricate a torch-layout
state dict from our flax init (inverse mapping) and check the importer
reproduces the exact trees."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixflow_tpu.models import PixPro, init_momentum_from_online
from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax


def _to_torch_key(path):
    """our flax path -> reference torch key (inverse of the importer)."""
    parts = []
    for p in path:
        p = re.sub(r"^layer(\d)_(\d+)$", r"layer\1.\2", p)
        parts.append(p)
    key = ".".join(parts)
    key = key.replace(".shortcut.conv", ".downsample.0")
    key = key.replace(".shortcut.bn", ".downsample.1")
    key = re.sub(r"\.cell(\d)\.conv", r".conv\1", key)
    key = re.sub(r"\.cell(\d)\.bn", r".bn\1", key)
    return key


def _fabricate_state_dict(params, stats, model):
    sd = {}

    def walk(tree, path, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k], is_stats)
                continue
            arr = np.asarray(v)
            key = _to_torch_key(path)
            leaf = k
            branch = path[0]
            in_head = branch not in ("encoder", "encoder_k")
            if leaf == "kernel":
                if arr.ndim == 4:
                    sd["module." + key + ".weight"] = arr.transpose(3, 2, 0, 1)
                elif in_head:
                    # Dense in an MLP2d head was a 1x1 conv in torch
                    sd["module." + key + ".weight"] = arr.T[:, :, None, None]
            elif leaf == "scale":
                sd["module." + key + ".weight"] = arr
            elif leaf == "bias":
                sd["module." + key + ".bias"] = arr
            elif leaf == "mean":
                sd["module." + key + ".running_mean"] = arr
            elif leaf == "var":
                sd["module." + key + ".running_var"] = arr

    walk(params, [], False)
    walk(stats, [], True)
    return sd


@pytest.mark.parametrize("transform_layer", [1, 2])
def test_importer_roundtrip(transform_layer):
    model = PixPro(arch="resnet18", pixpro_transform_layer=transform_layer,
                   proj_inner_dim=32, proj_out_dim=16)
    im = jnp.zeros((1, 64, 64, 3))
    v_on = model.init(jax.random.PRNGKey(0), im, method=model.online,
                      train=True)
    v_k = model.init(jax.random.PRNGKey(0), im, method=model.momentum_branch,
                     train=True)
    params = init_momentum_from_online(
        {**dict(v_on["params"]), **dict(v_k["params"])})
    stats = {**dict(v_on["batch_stats"]), **dict(v_k["batch_stats"])}

    sd = _fabricate_state_dict(jax.tree.map(np.asarray, params),
                               jax.tree.map(np.asarray, stats), model)
    imported = torch_pixpro_to_flax(sd)

    flat_want = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_got = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                jax.tree_util.tree_flatten_with_path(imported["params"])[0]}
    # every imported leaf matches the original exactly
    assert flat_got, "importer produced an empty tree"
    for k, v in flat_got.items():
        assert k in flat_want, f"unexpected path {k}"
        np.testing.assert_array_equal(v, flat_want[k], err_msg=k)
    # dense 1x1 conversions present (projector) and conv transposes (encoder)
    assert imported["params"]["projector"]["linear1"]["kernel"].ndim == 2
    assert imported["params"]["encoder"]["conv1"]["kernel"].shape[:2] == (7, 7)
    # batch stats carried over
    assert "mean" in imported["batch_stats"]["encoder"]["bn1"]


def test_importer_canonical_reference_keys():
    """Spot-check authentic reference key names map to existing paths."""
    fake = {
        "module.encoder.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "module.encoder.layer1.0.conv2.weight": np.zeros((64, 64, 3, 3), np.float32),
        "module.encoder.layer2.0.downsample.0.weight": np.zeros((128, 64, 1, 1), np.float32),
        "module.encoder.layer2.0.downsample.1.running_var": np.ones(128, np.float32),
        "module.projector.linear1.weight": np.zeros((32, 512, 1, 1), np.float32),
        "module.projector.bn1.weight": np.ones(32, np.float32),
        "module.value_transform.weight": np.zeros((16, 16, 1, 1), np.float32),
        "module.value_transform.bias": np.zeros(16, np.float32),
        "module.encoder_k.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
    }
    out = torch_pixpro_to_flax(fake)
    p = out["params"]
    assert p["encoder"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert p["encoder"]["layer1_0"]["cell2"]["conv"]["kernel"].shape == (3, 3, 64, 64)
    assert p["encoder"]["layer2_0"]["shortcut"]["conv"]["kernel"].shape == (1, 1, 64, 128)
    assert out["batch_stats"]["encoder"]["layer2_0"]["shortcut"]["bn"]["var"].shape == (128,)
    assert p["projector"]["linear1"]["kernel"].shape == (512, 32)
    assert p["value_transform"]["kernel"].shape == (16, 16)
    assert "encoder_k" in p
