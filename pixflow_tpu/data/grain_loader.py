"""Grain-backed loader: an alternative input backend for multi-host pods.

`ShardedLoader` (loader.py) is the default host pipeline — a small,
dependency-free thread/fork pool. On large multi-host topologies Google's
Grain gives battle-tested worker orchestration (process isolation,
per-worker prefetch buffers, back-pressure) for the same dataset object;
this wrapper exposes it behind the exact `ShardedLoader` interface the
driver uses (`__len__`, `epoch(epoch)`, `close`), so
`--loader-backend grain` is a drop-in swap (the reference's counterpart is
the torch DataLoader worker model, `contrast/data/__init__.py:77-85`).

Determinism contract: per-epoch reshuffle and per-sample augmentation
draws are deterministic in (seed, epoch, host) — same guarantee as
`ShardedLoader`, though the two backends' streams are not bit-identical
(Grain owns the shuffle order and the per-record rng derivation).

Epoch-length semantics: Grain shards with drop_remainder=True (each host
gets exactly len(dataset)//num_hosts records — `__len__` floors to match,
and `epoch()` yields exactly `len(self)` batches for every (n, hosts,
batch, drop_last) combination; test-pinned). Under drop_last=True this
equals the default backend's global floor(n / global_batch) for every
host count (floor(floor(n/H)/(G/H)) == floor(n/G)), so switching backends
no longer shifts steps_per_epoch (it did when ShardedLoader padded
per-host, DistributedSampler-style). drop_last=False still differs: grain
drops the global remainder; ShardedLoader wrap-pads it to a full batch.

Topology invariance: NOT provided by this backend — grain's ShardOptions
interleave records per host, so an N-process run draws different (equally
valid) global batches than a 1-process N-device run. The bit-identical
N-process == 1-process guarantee (loader.py module docstring,
tests/test_multiprocess.py) holds for the default ShardedLoader only.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator

import numpy as np


class _IndexSource:
    """Random-access source over dataset indices (records are ints; the
    decode/augment work happens in the map transform so it runs in Grain's
    worker processes)."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int) -> int:
        return int(idx)


class GrainLoader:
    def __init__(self, dataset, global_batch_size: int, *,
                 num_hosts: int = 1, host_id: int = 0, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True,
                 num_threads: int = 4, prefetch: int = 2,
                 worker_mode: str = "process"):
        import grain.python as pg  # lazy: grain is an optional backend
        self._pg = pg
        assert global_batch_size % num_hosts == 0
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // num_hosts
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        # grain worker_count=0 runs in-process (needed for tiny tests and
        # debugging); >0 forks worker processes
        self.worker_count = max(num_threads, 0)
        self.prefetch = prefetch

    def __len__(self) -> int:
        per_host = len(self.dataset) // self.num_hosts
        if self.drop_last:
            return per_host // self.local_batch_size
        return int(np.ceil(per_host / self.local_batch_size))

    def _make_map(self):
        dataset = self.dataset
        pg = self._pg

        class _Fetch(pg.RandomMapTransform):
            def random_map(self, idx, rng: np.random.Generator):
                # the dataset draws through python's Random; derive it from
                # grain's per-record generator (deterministic in
                # (seed, epoch, record))
                r = random.Random(int(rng.integers(0, 2**63 - 1)))
                return dataset.__getitem__(int(idx), r)

        return _Fetch()

    def epoch(self, epoch: int,
              skip_batches: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        pg = self._pg
        sampler = pg.IndexSampler(
            num_records=len(self.dataset),
            shard_options=pg.ShardOptions(
                shard_index=self.host_id, shard_count=self.num_hosts,
                drop_remainder=True),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=(self.seed * 104729 + epoch) % (2**31),
        )
        loader = pg.DataLoader(
            data_source=_IndexSource(len(self.dataset)),
            sampler=sampler,
            operations=[self._make_map(),
                        pg.Batch(self.local_batch_size,
                                 drop_remainder=self.drop_last)],
            worker_count=self.worker_count,
            worker_buffer_size=max(self.prefetch, 1),
        )
        n_batches = len(self)
        for i, batch in enumerate(loader):
            if i >= n_batches:
                break
            if i < skip_batches:  # step-exact resume (decode-and-drop;
                continue          # grain owns its iterator state)
            yield {k: np.asarray(v) for k, v in batch.items()
                   if v is not None}

    def close(self):  # interface parity with ShardedLoader
        pass
