"""Per-view-group BatchNorm for fused multi-view passes.

The PixPro step runs each branch on both augmented views. The reference
calls the branch twice (once per view, `contrast/models/PixPro.py:368-439`),
so BatchNorm normalizes each view with that view's own batch statistics. The
TPU-efficient layout concatenates the views into ONE 2B-batch pass per
branch (`PixPro(fuse_views=True)`) so every convolution hits the MXU at
double the batch — but stock BatchNorm over the fused batch would pool the
two views' statistics jointly, a semantic deviation.

`ViewBatchNorm` removes the deviation: over a fused ``[G*B, ..., C]`` batch
it computes statistics per view group (group g = rows ``[g*B, (g+1)*B)``),
normalizes each group with its own statistics, and applies the running-
average update **sequentially** (group 0 first, then group 1, ...), which is
bit-for-bit the composition of G sequential BatchNorm calls:

    ra' = ra * m**G + (1-m) * sum_g m**(G-1-g) * stats_g

Statistics are computed in float32 with flax's fast-variance formula
(``max(E[x^2] - E[x]^2, 0)``) and, under GSPMD, become global per-view means
through sharding propagation exactly like the unfused path (SyncBN,
reference `PixPro.py:289-292`). Variable names/shapes match
``flax.linen.BatchNorm`` (`batch_stats: {mean, var}`, `params: {scale,
bias}`) so parameter trees, checkpoints, and the torch importer are
unaffected by the fused/unfused choice.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class ViewBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics are per view group.

    Exact equivalent of ``view_groups`` sequential ``nn.BatchNorm`` calls on
    the G equal slices of the leading batch axis. Eval mode (running
    averages) is identical to stock BatchNorm.
    """

    view_groups: int = 2
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        g = self.view_groups
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)

        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
            y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + self.epsilon)
            y = y * scale + bias
            return y.astype(out_dtype)

        if self.is_initializing():
            g = 1  # shape-only init (e.g. batch-of-1 exemplars)
        assert x.shape[0] % g == 0, (
            f"fused batch {x.shape[0]} not divisible by view_groups={g}")
        xg = x.reshape((g, x.shape[0] // g) + x.shape[1:]).astype(jnp.float32)
        red = tuple(range(1, xg.ndim - 1))  # batch + spatial, per group
        mu = jnp.mean(xg, axis=red)                    # [G, C]
        mu2 = jnp.mean(jnp.square(xg), axis=red)       # [G, C]
        if self.axis_name is not None:
            mu, mu2 = lax.pmean(jnp.stack([mu, mu2]), self.axis_name)
        var = jnp.maximum(0.0, mu2 - jnp.square(mu))   # fast variance, flax

        shape = (g,) + (1,) * (xg.ndim - 2) + (c,)
        y = (xg - mu.reshape(shape)) * lax.rsqrt(var.reshape(shape)
                                                 + self.epsilon)
        y = y.reshape(x.shape) * scale + bias

        if not self.is_initializing():
            m = self.momentum
            new_mean, new_var = ra_mean.value, ra_var.value
            for i in range(g):  # sequential, view 0 first (reference order)
                new_mean = new_mean * m + mu[i] * (1.0 - m)
                new_var = new_var * m + var[i] * (1.0 - m)
            ra_mean.value, ra_var.value = new_mean, new_var

        return y.astype(out_dtype)


def batch_norm(*, view_groups: int = 1, use_running_average: bool,
               momentum: float, epsilon: float = 1e-5,
               axis_name: Optional[str] = None, dtype: Any = None,
               name: Optional[str] = None,
               scale_init: Callable = nn.initializers.ones):
    """BatchNorm factory: stock ``nn.BatchNorm`` for a single view group,
    ``ViewBatchNorm`` for fused multi-view batches (train mode only — eval
    semantics are group-free). Parameter layout is identical either way."""
    if view_groups <= 1 or use_running_average:
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=momentum, epsilon=epsilon,
                            scale_init=scale_init, axis_name=axis_name,
                            dtype=dtype, name=name)
    return ViewBatchNorm(view_groups=view_groups,
                         use_running_average=use_running_average,
                         momentum=momentum, epsilon=epsilon,
                         scale_init=scale_init, axis_name=axis_name,
                         dtype=dtype, name=name)
