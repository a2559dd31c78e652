"""RAFT feature/context encoders in Flax (NHWC).

Same topology as the reference's vendored RAFT encoders
(`contrast/flow/extractor.py`): a 7x7/2 stem, three 2-block residual stages,
and a 1x1 output conv; 'basic' uses plain residual blocks (64/96/128),
'small' bottleneck blocks (32/64/96). Norm choices: instance / batch / group
/ none. Inference-only in this framework (the flow model is frozen —
reference `main_pretrain.py:55-57`), so BatchNorm always uses running
statistics."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def _norm(kind: str, channels: int, dtype, name: str):
    if kind == "instance":
        # torch InstanceNorm2d(affine=False): per-sample per-channel over HW
        return nn.GroupNorm(num_groups=channels, use_bias=False,
                            use_scale=False, epsilon=1e-5, dtype=dtype,
                            name=name)
    if kind == "group":
        return nn.GroupNorm(num_groups=max(channels // 8, 1), epsilon=1e-5,
                            dtype=dtype, name=name)
    if kind == "batch":
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, dtype=dtype, name=name)
    if kind == "none":
        return None
    raise ValueError(kind)


def _apply_norm(norm, x):
    return x if norm is None else norm(x)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_apply_norm(_norm(self.norm_fn, self.planes, self.dtype,
                                      "norm1"), y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(_apply_norm(_norm(self.norm_fn, self.planes, self.dtype,
                                      "norm2"), y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample_conv")(x)
            x = _apply_norm(_norm(self.norm_fn, self.planes, self.dtype,
                                  "norm3"), x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = self.planes // 4
        y = nn.Conv(q, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_apply_norm(_norm(self.norm_fn, q, self.dtype, "norm1"), y))
        y = nn.Conv(q, (3, 3), strides=(self.stride, self.stride), padding=1,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_apply_norm(_norm(self.norm_fn, q, self.dtype, "norm2"), y))
        y = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = nn.relu(_apply_norm(_norm(self.norm_fn, self.planes, self.dtype,
                                      "norm3"), y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample_conv")(x)
            x = _apply_norm(_norm(self.norm_fn, self.planes, self.dtype,
                                  "norm4"), x)
        return nn.relu(x + y)


class Encoder(nn.Module):
    """Unified basic/small encoder; `small` picks bottleneck blocks and the
    narrower channel plan."""

    output_dim: int = 128
    norm_fn: str = "batch"
    small: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stem = 32 if self.small else 64
        plan = (32, 64, 96) if self.small else (64, 96, 128)
        block = BottleneckBlock if self.small else ResidualBlock

        x = nn.Conv(stem, (7, 7), strides=(2, 2), padding=3,
                    dtype=self.dtype, name="conv1")(x)
        x = _apply_norm(_norm(self.norm_fn, stem, self.dtype, "norm1"), x)
        x = nn.relu(x)

        for i, planes in enumerate(plan):
            stride = 1 if i == 0 else 2
            x = block(planes, self.norm_fn, stride, self.dtype,
                      name=f"layer{i + 1}_0")(x)
            x = block(planes, self.norm_fn, 1, self.dtype,
                      name=f"layer{i + 1}_1")(x)

        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)
