"""RAFT update blocks: motion encoders, Conv/SepConv GRUs, flow head,
convex-upsampling mask head (reference `contrast/flow/update.py`)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                            dtype=self.dtype, name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="conv2")(x)


class ConvGRU(nn.Module):
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                               dtype=self.dtype, name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                               dtype=self.dtype, name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                            dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        def gate(name, inp, kernel, pad):
            return nn.Conv(self.hidden_dim, kernel, padding=pad,
                           dtype=self.dtype, name=name)(inp)

        # horizontal 1x5
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(gate("convz1", hx, (1, 5), ((0, 0), (2, 2))))
        r = nn.sigmoid(gate("convr1", hx, (1, 5), ((0, 0), (2, 2))))
        q = nn.tanh(gate("convq1", jnp.concatenate([r * h, x], axis=-1),
                         (1, 5), ((0, 0), (2, 2))))
        h = (1 - z) * h + z * q

        # vertical 5x1
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(gate("convz2", hx, (5, 1), ((2, 2), (0, 0))))
        r = nn.sigmoid(gate("convr2", hx, (5, 1), ((2, 2), (0, 0))))
        q = nn.tanh(gate("convq2", jnp.concatenate([r * h, x], axis=-1),
                         (5, 1), ((2, 2), (0, 0))))
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    corr_channels: int  # corr_levels * (2r+1)^2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(96, (1, 1), dtype=self.dtype,
                              name="convc1")(corr))
        flo = nn.relu(nn.Conv(64, (7, 7), padding=3, dtype=self.dtype,
                              name="convf1")(flow))
        flo = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                              name="convf2")(flo))
        out = nn.relu(nn.Conv(80, (3, 3), padding=1, dtype=self.dtype,
                              name="conv")(jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], axis=-1)  # 82 channels


class BasicMotionEncoder(nn.Module):
    corr_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype,
                              name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                              name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                              name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                              name="convf2")(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=self.dtype,
                              name="conv")(jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SmallUpdateBlock(nn.Module):
    corr_channels: int
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(self.corr_channels, self.dtype,
                                    name="encoder")(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, self.dtype, name="gru")(net, inp)
        delta = FlowHead(128, self.dtype, name="flow_head")(net)
        return net, None, delta


class BasicUpdateBlock(nn.Module):
    corr_channels: int
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_channels, self.dtype,
                                    name="encoder")(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, self.dtype, name="gru")(net, inp)
        delta = FlowHead(256, self.dtype, name="flow_head")(net)

        # upsample-mask head, x0.25 to balance gradients (reference
        # `update.py:139-152`)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="mask_conv1")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype,
                              name="mask_conv2")(m)
        return net, mask, delta
