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
        missing = [v for v in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            sys.exit("JAX_COORDINATOR_ADDRESS is set but "
                     f"{', '.join(missing)} is not — all three rendezvous "
                     "variables are required on every host")
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
            # bounded rendezvous: a host that never shows up (preempted /
            # misconfigured) fails the job loudly instead of hanging the
            # whole pod forever
            initialization_timeout=int(
                os.environ.get("JAX_INIT_TIMEOUT_SECS", "300")),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # surface which host failed rendezvous
        sys.exit(f"jax.distributed.initialize failed on host "
                 f"{os.environ.get('JAX_PROCESS_ID', '?')} "
                 f"(coordinator {addr or 'auto'}): {e}")

    import main_pretrain
    cfg = main_pretrain.parse_args()
    from pixflow_tpu.train.driver import train
    train(cfg)


if __name__ == "__main__":
    sys.exit(main())
