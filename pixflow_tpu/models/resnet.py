"""ResNet / ResNeXt backbone zoo as Flax modules, NHWC + bf16-ready.

Capability parity with reference `contrast/resnet.py` (same architectures,
width/group/dilation knobs, head types, He fan-out init, zero-gamma on each
block's final BatchNorm) but built TPU-first:

  * channels-last layout so convolutions tile straight onto the MXU;
  * a `dtype` knob for bfloat16 compute with float32 params;
  * cross-replica ("Sync") BatchNorm expressed as `axis_name` handed to
    `flax.linen.BatchNorm` — batch statistics are `pmean`ed over the data
    mesh axis inside the compiled step instead of NCCL SyncBN hooks
    (reference `contrast/models/PixPro.py:289-292`).

Head types (reference `contrast/resnet.py:139-154,199-236`):
    'early_return' -> c5 feature map [B, H/32, W/32, C] (PixPro encoder)
    'multi_layer'  -> (c2, c3, c4, c5)
    'pass'         -> pooled+flattened c5
    'mlp_head'     -> fc1-relu-fc2 embedding
    'reduce'       -> single fc (linear eval)
    'conv_head'    -> 1x1 conv + BN + relu, pool, fc
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm

# He fan-out normal: matches the reference's Conv2d init
# (normal(0, sqrt(2/n)), n = k*k*out_channels — `contrast/resnet.py:156-159`).
he_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    """conv -> BN (-> relu), the repeated cell of every ResNet stage."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    zero_gamma: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9
    view_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=he_fan_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = batch_norm(
            view_groups=self.view_groups,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            scale_init=nn.initializers.zeros if self.zero_gamma
            else nn.initializers.ones,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9
    view_groups: int = 1

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        common = dict(dtype=self.dtype, axis_name=self.axis_name,
                      bn_momentum=self.bn_momentum,
                      view_groups=self.view_groups)
        out_ch = self.planes * self.expansion

        y = ConvBN(self.planes, 3, self.stride, name="cell1", **common)(x, train)
        y = ConvBN(self.planes, 3, 1, relu=False, zero_gamma=True,
                   name="cell2", **common)(y, train)

        if self.stride != 1 or x.shape[-1] != out_ch:
            x = _shortcut(x, out_ch, self.stride, self.avg_down, common, train)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    avg_down: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9
    view_groups: int = 1

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        common = dict(dtype=self.dtype, axis_name=self.axis_name,
                      bn_momentum=self.bn_momentum,
                      view_groups=self.view_groups)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion

        y = ConvBN(width, 1, 1, name="cell1", **common)(x, train)
        y = ConvBN(width, 3, self.stride, dilation=self.dilation,
                   groups=self.groups, name="cell2", **common)(y, train)
        y = ConvBN(out_ch, 1, 1, relu=False, zero_gamma=True,
                   name="cell3", **common)(y, train)

        if self.stride != 1 or x.shape[-1] != out_ch:
            x = _shortcut(x, out_ch, self.stride, self.avg_down, common, train)
        return nn.relu(x + y)


def _shortcut(x, out_ch, stride, avg_down, common, train):
    if avg_down and stride != 1:
        x = nn.avg_pool(x, (stride, stride), (stride, stride))
        stride = 1
    return ConvBN(out_ch, 1, stride, relu=False, name="shortcut",
                  **common)(x, train)


class ResNet(nn.Module):
    """Configurable ResNet trunk; see module docstring for head types."""

    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 1
    groups: int = 1
    width_per_group: int = 64
    in_channel: int = 3
    low_dim: int = 128
    avg_down: bool = False
    deep_stem: bool = False
    head_type: str = "early_return"
    layer4_dilation: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9
    view_groups: int = 1
    # rematerialize each residual block in the backward pass: trades ~30%
    # extra forward FLOPs for a much smaller live-activation footprint,
    # unlocking larger per-chip batches (docs/PERF.md)
    remat: bool = False

    @property
    def feature_dim(self) -> int:
        exp = 4 if self.block == "bottleneck" else 1
        return 64 * self.width * 8 * exp

    @nn.compact
    def __call__(self, x, train: bool = True):
        common = dict(dtype=self.dtype, axis_name=self.axis_name,
                      bn_momentum=self.bn_momentum,
                      view_groups=self.view_groups)
        base = 64 * self.width
        x = x.astype(self.dtype)

        # stem
        if self.deep_stem:
            x = ConvBN(32, 3, 2, name="stem1", **common)(x, train)
            x = ConvBN(32, 3, 1, name="stem2", **common)(x, train)
            x = nn.Conv(base, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=he_fan_out, dtype=self.dtype,
                        name="stem3")(x)
        else:
            x = nn.Conv(base, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, kernel_init=he_fan_out,
                        dtype=self.dtype, name="conv1")(x)
        x = batch_norm(view_groups=self.view_groups,
                       use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-5,
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        # stages
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        stage_planes = (base, base * 2, base * 4, base * 8)
        stage_strides = (1, 2, 2, 2 if self.layer4_dilation == 1 else 1)
        stage_dilations = (1, 1, 1, self.layer4_dilation)

        feats = []
        for s, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            for b in range(n_blocks):
                kwargs = dict(planes=planes,
                              stride=stage_strides[s] if b == 0 else 1,
                              dilation=stage_dilations[s],
                              avg_down=self.avg_down,
                              name=f"layer{s + 1}_{b}", **common)
                if block_cls is Bottleneck:
                    kwargs.update(groups=self.groups,
                                  base_width=self.width_per_group)
                x = block_cls(**kwargs)(x, train)
            feats.append(x)

        c2, c3, c4, c5 = feats
        if self.head_type == "multi_layer":
            return c2, c3, c4, c5
        if self.head_type == "early_return":
            return c5

        # global average pool: identical to the reference's AvgPool2d(7) on
        # the canonical 224px input (c5 is exactly 7x7 there) and well-defined
        # for any input size, unlike the fixed 7x7 window.
        mid_dim = self.feature_dim
        if self.head_type != "conv_head":
            c5 = jnp.mean(c5, axis=(1, 2))

        if self.head_type == "mlp_head":
            out = nn.Dense(mid_dim, dtype=self.dtype, name="fc1")(c5)
            out = nn.relu(out)
            out = nn.Dense(self.low_dim, dtype=self.dtype, name="fc2")(out)
        elif self.head_type == "reduce":
            out = nn.Dense(self.low_dim, dtype=self.dtype, name="fc")(c5)
        elif self.head_type == "conv_head":
            out = nn.Conv(mid_dim, (1, 1), use_bias=False,
                          kernel_init=he_fan_out, dtype=self.dtype,
                          name="fc1")(c5)
            out = batch_norm(view_groups=self.view_groups,
                             use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=1e-5,
                             axis_name=self.axis_name, dtype=self.dtype,
                             name="bn2")(out)
            out = nn.relu(out)
            out = nn.avg_pool(out, (7, 7), (1, 1))
            out = out.reshape(out.shape[0], -1)
            out = nn.Dense(self.low_dim, dtype=self.dtype, name="fc2")(out)
        elif self.head_type == "pass":
            return c5
        else:
            raise NotImplementedError(self.head_type)
        return out


# Factory registry, mirroring the reference's `resnet.__dict__[arch]` lookup
# (`contrast/resnet.py:239-292`, `main_pretrain.py:39`).
MODEL_REGISTRY = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2)),
    "resnet18_d": dict(block="basic", layers=(2, 2, 2, 2), deep_stem=True, avg_down=True),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3)),
    "resnet34_d": dict(block="basic", layers=(3, 4, 6, 3), deep_stem=True, avg_down=True),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet50_w2x": dict(block="bottleneck", layers=(3, 4, 6, 3), width=2),
    "resnet50_16s": dict(block="bottleneck", layers=(3, 4, 6, 3), layer4_dilation=2),
    "resnet50_d": dict(block="bottleneck", layers=(3, 4, 6, 3), deep_stem=True, avg_down=True),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3)),
    "resnet101_d": dict(block="bottleneck", layers=(3, 4, 23, 3), deep_stem=True, avg_down=True),
    "resnext101_32x8d": dict(block="bottleneck", layers=(3, 4, 23, 3), groups=32, width_per_group=8),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3)),
    "resnet152_d": dict(block="bottleneck", layers=(3, 8, 36, 3), deep_stem=True, avg_down=True),
    "resnext152_32x8d": dict(block="bottleneck", layers=(3, 8, 36, 3), groups=32, width_per_group=8),
}


def make_resnet(arch: str, **overrides) -> ResNet:
    if arch not in MODEL_REGISTRY:
        raise ValueError(f"unknown arch '{arch}'; choose from {sorted(MODEL_REGISTRY)}")
    cfg = dict(MODEL_REGISTRY[arch])
    cfg.update(overrides)
    return ResNet(**cfg)
