#!/usr/bin/env python
"""Multi-host pretraining entry (counterpart of reference
`main_pretrain_mpirun.py`): initializes the JAX distributed runtime from the
cluster environment (TPU pod metadata, or explicit coordinator flags /
`JAX_COORDINATOR_ADDRESS`+`JAX_PROCESS_ID`+`JAX_NUM_PROCESSES` env vars —
replacing the OMPI_COMM_WORLD_* rendezvous), then runs the same driver."""

from __future__ import annotations

import os
import sys


def main():
    import jax

    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:  # explicit env-var rendezvous (the mpirun-style path)
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)

    import main_pretrain
    cfg = main_pretrain.parse_args()
    from pixflow_tpu.train.driver import train
    train(cfg)


if __name__ == "__main__":
    sys.exit(main())
