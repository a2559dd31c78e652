"""Cross-replica reduction helpers (reference `contrast/util.py:50-68`).

Under GSPMD most reductions happen implicitly through sharding propagation;
these helpers cover the explicit cases (metric averaging in eval loops,
gathering per-replica tensors) both inside shard_map bodies (axis-based) and
outside (device-averaged host values)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import DATA_AXIS


def reduce_mean(x, axis_name: str = DATA_AXIS):
    """all-reduce mean across the data axis (reference `reduce_tensor`).
    Use inside shard_map/pmap bodies."""
    return jax.lax.pmean(x, axis_name)


def reduce_sum(x, axis_name: str = DATA_AXIS):
    return jax.lax.psum(x, axis_name)


def all_gather_batch(x, axis_name: str = DATA_AXIS):
    """Gather per-replica batches into the full cross-replica batch along
    axis 0 (reference `dist_collect`). Use inside shard_map/pmap bodies."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def host_mean(values) -> float:
    """Average a per-host metric across processes (multi-host eval loops)."""
    if jax.process_count() == 1:
        return float(values)
    arr = jnp.asarray([values], jnp.float32)
    return float(jax.experimental.multihost_utils.process_allgather(arr).mean())
