"""Projection / prediction heads.

`MLP2d` is the reference's 1x1-conv MLP (`contrast/models/PixPro.py:26-43`):
linear -> BN -> ReLU -> linear over the channel axis of a feature map. In
channels-last JAX a 1x1 convolution *is* a Dense over the last axis, which is
exactly how the MXU wants it."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm


class MLP2d(nn.Module):
    inner_dim: int = 4096
    out_dim: int = 256
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9
    view_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.inner_dim, dtype=self.dtype, name="linear1")(x)
        x = batch_norm(view_groups=self.view_groups,
                       use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear2")(x)
        return x


def proj_head(inner_dim: int = 4096, out_dim: int = 256, **kw) -> MLP2d:
    """Projection head 2048 -> 4096 -> 256 (`PixPro.py:250-251`)."""
    return MLP2d(inner_dim=inner_dim, out_dim=out_dim, **kw)


def pred_head(inner_dim: int = 4096, out_dim: int = 256, **kw) -> MLP2d:
    """BYOL predictor 256 -> 4096 -> 256 (`PixPro.py:254-255`)."""
    return MLP2d(inner_dim=inner_dim, out_dim=out_dim, **kw)
