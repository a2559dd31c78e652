"""LARS (layer-wise adaptive rate scaling) + momentum-SGD as optax
transformations.

Matches the reference's optimizer stack bit-for-bit in math while staying a
pure pytree transform:

  * reference `contrast/lars.py:109-150` — LARS is a *gradient rewrite* ahead
    of SGD: add weight decay into the gradient, scale by
    trust_coef * ||p|| / (||g + wd*p|| + eps) (only when both norms are
    positive), then run vanilla momentum SGD with decay zeroed;
  * reference `contrast/lars.py:7-31` — 1-D parameters (biases, BN scales)
    are routed to a no-decay group that also skips the LARS rescale;
  * frozen momentum-branch (`*_k`) parameters receive no update at all — the
    torch version achieves this via requires_grad=False + None grads
    (`PixPro.py:283,287`); here it is an explicit mask so that decoupled
    weight decay can never leak into EMA-managed weights.

The learning rate may be a scalar or an optax schedule (step -> lr).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class LarsSgdState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    momentum: optax.Updates  # SGD momentum buffers


def frozen_momentum_branch_mask(params) -> dict:
    """True for leaves that must NOT be touched by the optimizer (the EMA
    momentum branch: top-level subtrees whose name ends with `_k`)."""
    def mark(tree, frozen):
        return jax.tree.map(lambda _: frozen, tree)

    return {name: mark(sub, str(name).endswith("_k"))
            for name, sub in params.items()}


def _global_norm(x):
    return jnp.sqrt(jnp.sum(jnp.square(x)))


def lars_sgd(
    learning_rate: Union[float, Callable],
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    trust_coef: float = 1e-3,
    eps: float = 1e-8,
    frozen_mask=None,
) -> optax.GradientTransformation:
    """LARS-wrapped momentum SGD (reference `--optimizer lars` path)."""

    def init(params):
        return LarsSgdState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        def rewrite(g, p):
            if p.ndim <= 1:
                return g  # no-decay group: raw grad, no LARS scaling
            g = g + weight_decay * p
            p_norm = _global_norm(p)
            g_norm = _global_norm(g)
            adaptive = jnp.where(
                (p_norm > 0.0) & (g_norm > 0.0),
                trust_coef * p_norm / (g_norm + eps),
                1.0,
            )
            return g * adaptive

        rewritten = jax.tree.map(rewrite, grads, params)
        new_momentum = jax.tree.map(
            lambda b, g: momentum * b + g, state.momentum, rewritten)
        updates = jax.tree.map(lambda b: -lr * b, new_momentum)

        if frozen_mask is not None:
            updates = jax.tree.map(
                lambda u, f: jnp.zeros_like(u) if f else u, updates, frozen_mask)
            new_momentum = jax.tree.map(
                lambda b, f: jnp.zeros_like(b) if f else b, new_momentum, frozen_mask)

        return updates, LarsSgdState(state.count + 1, new_momentum)

    return optax.GradientTransformation(init, update)


def sgd(
    learning_rate: Union[float, Callable],
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    frozen_mask=None,
) -> optax.GradientTransformation:
    """Plain momentum SGD with coupled weight decay on every parameter
    (torch.optim.SGD semantics, the reference `--optimizer sgd` path)."""

    def init(params):
        return LarsSgdState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        decayed = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        new_momentum = jax.tree.map(
            lambda b, g: momentum * b + g, state.momentum, decayed)
        updates = jax.tree.map(lambda b: -lr * b, new_momentum)

        if frozen_mask is not None:
            updates = jax.tree.map(
                lambda u, f: jnp.zeros_like(u) if f else u, updates, frozen_mask)
            new_momentum = jax.tree.map(
                lambda b, f: jnp.zeros_like(b) if f else b, new_momentum, frozen_mask)

        return updates, LarsSgdState(state.count + 1, new_momentum)

    return optax.GradientTransformation(init, update)
