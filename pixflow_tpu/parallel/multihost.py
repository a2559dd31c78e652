"""Multi-process (multi-host) array plumbing for the GSPMD drivers.

The reference's multi-node story is one NCCL process group per GPU plus a
DistributedSampler (`main_pretrain_mpirun.py:17-35`,
`contrast/data/__init__.py:70-75`). Under GSPMD the compiled step is
identical on one process or many — what changes is how HOST data becomes
GLOBAL `jax.Array`s when the mesh spans devices this process cannot
address:

  * batches: each process holds its loader's local rows; they must be
    assembled into one global array whose shards line up with
    `NamedSharding(mesh, P("data"))` (`jax.make_array_from_process_local_data`).
    `ShardedLoader` feeds host h the contiguous rows [h*bs, (h+1)*bs) of
    every global batch — exactly the slice that sharding places on host
    h's devices — so an N-process run is bit-identical to a 1-process
    N-device run (pinned by tests/test_multiprocess.py).
  * train state: replicated P() arrays built from a host value that is
    identical on every process (deterministic same-seed init, or a
    checkpoint read from the job's shared filesystem).
  * control flow: per-step decisions (SIGTERM preemption) must be global,
    or processes diverge into different collective programs and deadlock.

Every helper degrades to the plain single-process path when
`jax.process_count() == 1`, so the single-chip driver behavior (plain
`device_put`, no collectives) is unchanged.
"""

from __future__ import annotations

import jax
import numpy as np


def make_global_batch(batch, sharding):
    """Assemble this process's local batch rows into global arrays laid out
    by `sharding` (leaf-wise over a pytree). Single-process: device_put."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def replicate_tree(tree, mesh):
    """Turn a host-local pytree (identical on every process) into fully
    replicated global arrays on `mesh`. Leaves that already carry the
    target sharding (e.g. restored by orbax) pass through untouched."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def rep(x):
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree.map(rep, tree)


def any_process(flag: bool) -> bool:
    """Global OR of a per-process bool (preemption votes): every process
    must agree on whether this step runs, or ranks that keep stepping wait
    forever on collectives the stopped ranks never join."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    votes = multihost_utils.process_allgather(
        np.asarray([flag], dtype=np.bool_))
    return bool(np.any(votes))


def host_sum(values: dict) -> dict:
    """Sum a dict of per-process float metrics across processes (the eval
    loop's cross-host reduction; reference all-reduces acc1/acc5/loss at
    `main_linear.py:248-250`).

    Transport precision: process_allgather canonicalizes float64 to
    float32 when jax_enable_x64 is off (the default), which would round
    each host's partial sum to ~7 digits — enough to flip a cross-topology
    best_acc1 equality on large val sets. Each f64 value therefore travels
    BIT-EXACTLY as its two int32 halves (int32 is not canonicalized) and
    is reinterpreted back to f64 on the host before the final sum."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in values.items()}
    from jax.experimental import multihost_utils
    keys = sorted(values)
    vec = np.asarray([float(values[k]) for k in keys], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(
        vec.view(np.int32)), dtype=np.int32)
    per_host = gathered.reshape(jax.process_count(),
                                2 * len(keys)).view(np.float64)
    summed = per_host.sum(axis=0)
    return dict(zip(keys, summed.tolist()))
