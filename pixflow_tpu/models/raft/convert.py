"""Import upstream RAFT PyTorch checkpoints into the Flax modules.

The published flow models (raft-small.pth / raft-things.pth etc., saved
through DataParallel so keys carry a `module.` prefix — reference
`main_pretrain.py:48-51`) are plain conv/norm stacks; conversion is a
mechanical key-path mapping plus the OIHW -> HWIO kernel transpose."""

from __future__ import annotations

from typing import Tuple

import numpy as np

# torch module path fragment -> flax module name (only where they differ)
_RENAMES = {
    "downsample.0": "downsample_conv",
    # torch wraps the strided-block norm inside the downsample Sequential;
    # flax names it at block level ("norm3"/"norm4" handled generically below)
    "mask.0": "mask_conv1",
    "mask.2": "mask_conv2",
}


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict, small: bool):
    """Returns {'params': ..., 'batch_stats': ...} for RAFT(small=small)."""
    params: dict = {}
    batch_stats: dict = {}

    # residual-block downsample norm index: ResidualBlock -> norm3,
    # BottleneckBlock -> norm4 (reference extractor.py:48-49,109-110)
    ds_norm = "norm4" if small else "norm3"

    for key, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                         else tensor)
        key = key.removeprefix("module.")
        key = key.replace("downsample.1", ds_norm)
        for old, new in _RENAMES.items():
            key = key.replace(old, new)
        # stage lists: layer1.0.conv1 -> layer1_0.conv1
        parts = []
        toks = key.split(".")
        i = 0
        while i < len(toks):
            if (toks[i].startswith("layer") and i + 1 < len(toks)
                    and toks[i + 1].isdigit()):
                parts.append(f"{toks[i]}_{toks[i + 1]}")
                i += 2
            else:
                parts.append(toks[i])
                i += 1

        leaf = parts[-1]
        path = tuple(parts[:-1])
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            else:  # norm scale
                _set(params, path + ("scale",), arr)
        elif leaf == "bias":
            _set(params, path + ("bias",), arr)
        elif leaf == "running_mean":
            _set(batch_stats, path + ("mean",), arr)
        elif leaf == "running_var":
            _set(batch_stats, path + ("var",), arr)
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized checkpoint leaf: {key}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_raft(ckpt_path: str, small: bool = False, dtype=None,
              corr_dtype=None):
    """Load a torch RAFT checkpoint -> (RAFT module, flax variables).

    `dtype` sets the compute/activation precision (weights stay f32);
    `corr_dtype` the corr-pyramid HBM storage dtype (None follows `dtype`
    — see `corr.py:build_corr_pyramid`)."""
    import torch

    import jax.numpy as jnp
    from .raft import RAFT

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    variables = torch_state_dict_to_flax(sd, small=small)
    model = RAFT(small=small, dtype=dtype or jnp.float32,
                 corr_dtype=corr_dtype)
    return model, variables
