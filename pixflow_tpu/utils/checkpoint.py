"""Checkpoint / auto-resume / publish.

Replaces the reference's torch.save dict protocol (`main_pretrain.py:96-127`)
with flax msgpack serialization. Contents: full TrainState (params incl.
momentum branch, batch stats, optimizer state, step, **and the EMA ramp
counter** — which the reference forgets to checkpoint, SURVEY.md §5), the
epoch, and the config JSON.

Files: `ckpt_epoch_N.msgpack` + a `current.msgpack` copy for `--auto-resume`.
`publish_checkpoint` strips training state and prefixes the filename with the
weight hash (capability of reference `publish_model.py`)."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import shutil
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(output_dir: str, epoch: int, state, config_json: str = "",
                    extra: Optional[dict] = None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "config": config_json,
        "state": serialization.to_bytes(_to_numpy(state)),
        "extra": json.dumps(extra or {}),
    }
    blob = serialization.msgpack_serialize(payload)
    path = os.path.join(output_dir, f"ckpt_epoch_{epoch}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    # current.msgpack must also land atomically: auto-resume prefers it, so a
    # preemption mid-copy would otherwise leave a truncated file that breaks
    # the next launch instead of falling back to the epoch files.
    cur = os.path.join(output_dir, "current.msgpack")
    shutil.copyfile(path, cur + ".tmp")
    os.replace(cur + ".tmp", cur)
    return path


def load_checkpoint(path: str, state_template) -> Tuple[object, int, dict]:
    """Restore (state, epoch, extra) from a checkpoint file. state_template
    provides the pytree structure (a freshly-initialized TrainState)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_bytes(state_template, payload["state"])
    return state, int(payload["epoch"]), json.loads(payload.get("extra", "{}"))


def latest_checkpoint(output_dir: str) -> Optional[str]:
    cur = os.path.join(output_dir, "current.msgpack")
    if os.path.exists(cur):
        return cur
    cands = glob.glob(os.path.join(output_dir, "ckpt_epoch_*.msgpack"))
    if not cands:
        return None
    def epoch_of(p):
        m = re.search(r"ckpt_epoch_(\d+)", p)
        return int(m.group(1)) if m else -1
    return max(cands, key=epoch_of)


def select_branch(params: dict, batch_stats: dict, branch: str = "online"):
    """Pick which branch's weights downstream consumers see under the
    online names: 'online' (the reference's choice — its publisher keeps
    `encoder.`) or 'momentum' (the EMA twins `*_k`, often slightly stronger
    for evaluation in BYOL-family methods). Returns (params, batch_stats)
    with `encoder`/`projector`/... holding the selected branch."""
    assert branch in ("online", "momentum")
    if branch == "online":
        return params, batch_stats

    def swap(tree):
        if not isinstance(tree, dict):
            return tree
        out = dict(tree)
        for name in list(out):
            if name.endswith("_k") and name[:-2] in out:
                out[name[:-2]] = out[name]
        return out

    return swap(params), swap(batch_stats)


def publish_checkpoint(ckpt_path: str, out_path: str,
                       branch: str = "online") -> str:
    """Strip optimizer/schedule state, keep only model params + batch stats,
    and add the content hash to the filename (reference `publish_model.py`).
    `branch='momentum'` publishes the EMA encoder under the online names."""
    with open(ckpt_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.msgpack_restore(payload["state"])
    params, stats = select_branch(state["params"],
                                  state.get("batch_stats", {}), branch)
    published = {
        "params": params,
        "batch_stats": stats,
        "epoch": payload["epoch"],
        "config": payload.get("config", ""),
    }
    blob = serialization.msgpack_serialize(published)
    digest = hashlib.md5(blob).hexdigest()[:8]
    root, ext = os.path.splitext(out_path)
    final = f"{root}-{digest}{ext or '.msgpack'}"
    with open(final, "wb") as f:
        f.write(blob)
    return final


def load_published(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
