"""Orbax checkpoint backend (optional, multi-host production saves).

The default backend (`utils/checkpoint.py`) writes one atomic msgpack file
per save — simple, single-host, whole-tree-in-memory. On pods, Orbax is
the standard: every host writes its shard of the (possibly sharded) arrays
concurrently, saves are atomic at the directory level, retention is
managed, and restore reproduces the original shardings. This module
exposes the same (save/load/latest) surface over
`orbax.checkpoint.CheckpointManager`, storing the same logical payload:
the TrainState pytree plus {epoch, config, extra} metadata.

Select with `PretrainConfig.runtime.checkpoint_backend = "orbax"` (CLI
`--checkpoint-backend orbax`). Checkpoints live under
`<output_dir>/orbax/<step>/`; `latest_checkpoint_orbax` resolves the
newest step for auto-resume. The two backends are independent — a run
resumes from whichever backend wrote its checkpoints."""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

ORBAX_DIR = "orbax"


def _resume_position(epoch: int, extra: dict) -> Tuple[int, int]:
    """(epoch, batch) a checkpoint's metadata resumes at: a step-exact
    preemption save records (resume_epoch, resume_idx); a periodic save of
    epoch E resumes at (E+1, 0)."""
    if extra.get("resume_idx") is not None:
        return (int(extra["resume_epoch"]), int(extra["resume_idx"]))
    return (epoch + 1, 0)


def _manager(output_dir: str, create: bool = True):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(output_dir), ORBAX_DIR)
    if create:
        os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(create=create)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint_orbax(output_dir: str, epoch: int, state,
                          config_json: str = "",
                          extra: Optional[dict] = None) -> str:
    import orbax.checkpoint as ocp

    mgr = _manager(output_dir)
    step = int(state.step)
    path = os.path.join(output_dir, ORBAX_DIR, str(step))
    if step in (mgr.all_steps() or ()):
        # Zero train steps since the last save (e.g. SIGTERM lands on the
        # first preemption vote after a periodic epoch-end save, or a second
        # SIGTERM after a step-exact resume before any new step). Orbax
        # forbids re-saving an existing step (StepAlreadyExistsError even
        # with force=True), and the existing checkpoint is equivalent: the
        # state is byte-identical, and the resume position it implies —
        # periodic save of epoch E resumes at (E+1, batch 0); preemption
        # save re-records the same (resume_epoch, resume_idx) it voted at —
        # matches what this save would record. That equivalence is
        # load-bearing (resume would otherwise use stale metadata), so
        # CHECK it instead of assuming: the existing step's meta must imply
        # the same resume position this save would record.
        old = mgr.restore(step, args=ocp.args.Composite(
            meta=ocp.args.JsonRestore()))["meta"]
        old_pos = _resume_position(int(old["epoch"]),
                                   json.loads(old.get("extra", "{}")))
        new_pos = _resume_position(int(epoch), extra or {})
        mgr.close()
        if old_pos != new_pos:
            raise RuntimeError(
                f"orbax step {step} already saved with resume position "
                f"{old_pos}, but this save implies {new_pos} — a path "
                "advanced epoch/extra with zero train steps; refusing to "
                "silently keep the stale metadata")
        return path
    meta = {"epoch": int(epoch), "config": config_json,
            "extra": json.dumps(extra or {})}
    mgr.save(step, args=ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        meta=ocp.args.JsonSave(meta)))
    mgr.wait_until_finished()
    mgr.close()
    return path


def latest_checkpoint_orbax(output_dir: str) -> Optional[int]:
    """Newest saved step, or None."""
    path = os.path.join(os.path.abspath(output_dir), ORBAX_DIR)
    if not os.path.isdir(path):
        return None
    mgr = _manager(output_dir, create=False)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint_orbax(output_dir: str, state_template,
                          step: Optional[int] = None, mesh=None
                          ) -> Tuple[object, int, dict]:
    """Restore (state, epoch, extra); step=None loads the newest.

    With `mesh` (required when the run spans processes), arrays restore
    straight into fully replicated global shardings on that mesh — every
    process calls this collectively and reads its shards from the shared
    checkpoint directory."""
    import jax
    import orbax.checkpoint as ocp

    if mesh is not None and jax.process_count() > 1:
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P())
        state_template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), np.asarray(x).dtype, sharding=sharding),
            state_template)
    mgr = _manager(output_dir, create=False)
    step = mgr.latest_step() if step is None else step
    assert step is not None, f"no orbax checkpoints under {output_dir}"
    restored = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(state_template),
        meta=ocp.args.JsonRestore()))
    mgr.close()
    meta = restored["meta"]
    return (restored["state"], int(meta["epoch"]),
            json.loads(meta.get("extra", "{}")))
