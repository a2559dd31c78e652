"""Device mesh + SPMD wiring.

The reference's entire distribution story is pure data parallelism: one
process per GPU, NCCL all-reduce for gradients, SyncBN for statistics,
DistributedSampler for sharding (SURVEY.md §2.9). On TPU this collapses into
a single 1-D mesh over the `data` axis:

  * batch sharded over `data`;
  * parameters/optimizer state replicated;
  * gradient `pmean` + BatchNorm-statistic `pmean` as XLA collectives over
    ICI (replacing DDP bucketed all-reduce and SyncBN hooks);
  * multi-host rendezvous via `jax.distributed.initialize` (replacing the
    Open MPI env-var setup in `main_pretrain_mpirun.py:17-35`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

DATA_AXIS = "data"


def enable_compilation_cache(path: str = "~/.cache/pixflow_jax_cache") -> None:
    """Persistent XLA compilation cache (big programs on a slow frontend
    host recompile in minutes without it)."""
    import os

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def make_data_mesh(n_devices: Optional[int] = None,
                   devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_map_fn(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map with this package's conventions (no rep checking so that
    replicated outputs of collectives type-check across jax versions)."""
    try:
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older kwarg name
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


def replicated_spec() -> P:
    return P()


def batch_spec() -> P:
    return P(DATA_AXIS)
