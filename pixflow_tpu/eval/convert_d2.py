"""Export a pretrained backbone to detectron2's ResNet layout.

Capability of reference `transfer/detection/convert_pretrain_to_d2.py`: the
encoder's weights are renamed to d2's `stem.conv1` / `res2..res5` scheme
(BN folded as `conv.norm`, downsample as `shortcut`) and pickled in the
format d2's checkpointer accepts, enabling the CityScapes/COCO/VOC transfer
evaluations. Here the source is our flax parameter tree (NHWC kernels are
transposed back to OIHW)."""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np


def _conv(params) -> np.ndarray:
    return np.ascontiguousarray(
        np.asarray(params["kernel"]).transpose(3, 2, 0, 1))


def _bn(params, stats) -> Dict[str, np.ndarray]:
    return {
        "weight": np.asarray(params["scale"]),
        "bias": np.asarray(params["bias"]),
        "running_mean": np.asarray(stats["mean"]),
        "running_var": np.asarray(stats["var"]),
    }


def flax_resnet_to_d2(params: dict, batch_stats: dict,
                      out_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """params/batch_stats: the ResNet trunk subtrees (e.g. the pretrain
    checkpoint's params['encoder']). Returns the d2 weight dict; writes the
    pickle when out_path is given."""
    out: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        for k, v in _bn(p, s).items():
            out[f"{prefix}.norm.{k}"] = v

    # stem
    out["stem.conv1.weight"] = _conv(params["conv1"])
    put_bn("stem.conv1", params["bn1"], batch_stats["bn1"])

    # stages: layer{s}_{b} -> res{s+1}.{b}
    stage = 1
    while f"layer{stage}_0" in params:
        b = 0
        while f"layer{stage}_{b}" in params:
            blk = params[f"layer{stage}_{b}"]
            blk_s = batch_stats[f"layer{stage}_{b}"]
            d2p = f"res{stage + 1}.{b}"
            cell = 1
            while f"cell{cell}" in blk:
                out[f"{d2p}.conv{cell}.weight"] = _conv(blk[f"cell{cell}"]["conv"])
                put_bn(f"{d2p}.conv{cell}", blk[f"cell{cell}"]["bn"],
                       blk_s[f"cell{cell}"]["bn"])
                cell += 1
            if "shortcut" in blk:
                out[f"{d2p}.shortcut.weight"] = _conv(blk["shortcut"]["conv"])
                put_bn(f"{d2p}.shortcut", blk["shortcut"]["bn"],
                       blk_s["shortcut"]["bn"])
            b += 1
        stage += 1

    if out_path:
        payload = {"model": out, "__author__": "pixflow-tpu",
                   "matching_heuristics": True}
        with open(out_path, "wb") as fh:
            pickle.dump(payload, fh)
    return out
