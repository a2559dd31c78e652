"""Import reference PixPro PyTorch checkpoints (the published Google-Drive
weights, `README.md:56-60` of the reference) into this framework's parameter
trees — so reference-pretrained backbones can be linear-probed, transferred,
or resumed here.

Reference checkpoint layout: {'model': DDP state dict} with keys like
    module.encoder.conv1.weight            (ResNet trunk, OIHW convs)
    module.encoder.layer2.0.downsample.0.weight
    module.projector.linear1.weight        (1x1 convs [out, in, 1, 1])
    module.value_transform.weight
    module.encoder_k... / module.projector_k...
Our layout: params[encoder][layer2_0][shortcut][conv][kernel] (HWIO),
MLP2d Dense kernels [in, out], BN running stats in batch_stats."""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _resnet_path(parts):
    """encoder-relative torch path -> our flax path prefix."""
    out = []
    i = 0
    while i < len(parts):
        tok = parts[i]
        m = re.fullmatch(r"layer(\d)", tok)
        if m and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"layer{m.group(1)}_{parts[i + 1]}")
            i += 2
            continue
        if tok == "downsample":
            # downsample.0 = conv, downsample.1 = bn
            sub = "conv" if parts[i + 1] == "0" else "bn"
            out.extend(["shortcut", sub])
            i += 2
            continue
        m = re.fullmatch(r"conv(\d)", tok)
        if m and out and out[-1].startswith("layer"):
            out.extend([f"cell{m.group(1)}", "conv"])
            i += 1
            continue
        m = re.fullmatch(r"bn(\d)", tok)
        if m and out and out[-1].startswith("layer"):
            out.extend([f"cell{m.group(1)}", "bn"])
            i += 1
            continue
        out.append(tok)  # conv1 / bn1 stem, fc...
        i += 1
    return out


def torch_pixpro_to_flax(state_dict) -> dict:
    """-> {'params': ..., 'batch_stats': ...} matching models.PixPro trees.
    Accepts the raw ckpt dict (with 'model') or a bare state dict."""
    if "model" in state_dict and not hasattr(state_dict["model"], "shape"):
        state_dict = state_dict["model"]

    params: dict = {}
    stats: dict = {}

    for key, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        key = key.removeprefix("module.")
        parts = key.split(".")
        branch = parts[0]
        leaf = parts[-1]
        mid = parts[1:-1]

        if branch in ("encoder", "encoder_k"):
            path = tuple([branch] + _resnet_path(mid))
        elif branch in ("projector", "projector_k", "projector_instance",
                        "projector_instance_k", "predictor"):
            path = tuple([branch] + mid)
        elif branch == "value_transform":
            path = tuple(["value_transform"] + mid)
        else:
            continue  # optimizer buffers etc.

        is_norm = path[-1].startswith("bn") or path[-1] == "bn"
        if leaf == "weight":
            if arr.ndim == 4:
                if arr.shape[2] == arr.shape[3] == 1 and branch not in (
                        "encoder", "encoder_k"):
                    # 1x1 conv in an MLP2d head -> Dense kernel [in, out]
                    _set(params, path + ("kernel",), arr[:, :, 0, 0].T)
                else:
                    _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                _set(params, path + ("kernel",), arr.T)
            else:
                _set(params, path + ("scale",), arr)
        elif leaf == "bias":
            _set(params, path + ("bias",), arr)
        elif leaf == "running_mean":
            _set(stats, path + ("mean",), arr)
        elif leaf == "running_var":
            _set(stats, path + ("var",), arr)
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized leaf in checkpoint: {key}")

    return {"params": params, "batch_stats": stats}


def load_torch_pixpro(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return torch_pixpro_to_flax(ckpt.get("model", ckpt))
