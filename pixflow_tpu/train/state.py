"""Train state pytree + constructor.

Unlike the reference (which reconstructs the EMA step counter from
start_epoch at model build and *loses* it on resume — `PixPro.py:294-295`,
SURVEY.md §5), the counter is part of the checkpointed state here."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from ..models.pixpro import init_momentum_from_online


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray          # global optimizer step (drives LR schedule)
    ema_k: jnp.ndarray         # EMA momentum-ramp counter (reference self.k)
    params: Any
    batch_stats: Any
    opt_state: Any

    def replace_params(self, **kw):
        return self.replace(**kw)


def create_train_state(rng, model, tx, sample_batch, ema_k0: int = 0) -> TrainState:
    """Initialize params (momentum branch copied from online), batch stats,
    and optimizer state.

    sample_batch: dict with 'im1' (and optionally 'im2', 'coord1', 'coord2')
    used only for shape inference; init runs the online+momentum branches.
    """
    im1 = sample_batch["im1"]
    variables = model.init({"params": rng}, im1, method=model.online,
                           train=True)
    # momentum branch variables
    variables_k = model.init({"params": rng}, im1,
                             method=model.momentum_branch, train=True)

    params = {**dict(variables["params"]), **dict(variables_k["params"])}
    params = init_momentum_from_online(params)
    batch_stats = {**dict(variables.get("batch_stats", {})),
                   **dict(variables_k.get("batch_stats", {}))}

    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        ema_k=jnp.asarray(ema_k0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
