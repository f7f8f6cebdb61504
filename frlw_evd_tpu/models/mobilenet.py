"""MobileNetV2 with coordinate attention (reference:
core/yolox/models/mobilenet.py — the unused spare backbone MBV2_CA)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import SpmdBatchNorm


def h_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


def _make_divisible(v, divisor, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBN(nn.Module):
    out: int
    ksize: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "relu6"  # relu6 | hswish | none

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.out, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        if self.act == "relu6":
            return jax.nn.relu6(x)
        if self.act == "hswish":
            return h_swish(x)
        return x


class CoordAtt(nn.Module):
    """Coordinate attention (mobilenet.py:37-71): pooled H- and W-profiles
    gate the feature map separately along each axis."""

    oup: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        mip = max(8, c // self.groups)
        x_h = jnp.mean(x, axis=2, keepdims=True)            # (N, H, 1, C)
        x_w = jnp.mean(x, axis=1, keepdims=True)            # (N, 1, W, C)
        x_w_t = jnp.transpose(x_w, (0, 2, 1, 3))            # (N, W, 1, C)
        y = jnp.concatenate([x_h, x_w_t], axis=1)           # (N, H+W, 1, C)
        y = nn.Conv(mip, (1, 1), name="conv1")(y)
        y = SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = h_swish(y)
        y_h, y_w = y[:, :h], y[:, h:]
        y_w = jnp.transpose(y_w, (0, 2, 1, 3))
        a_h = jax.nn.sigmoid(nn.Conv(self.oup, (1, 1), name="conv2")(y_h))
        a_w = jax.nn.sigmoid(nn.Conv(self.oup, (1, 1), name="conv3")(y_w))
        return x * a_w * a_h


class InvertedResidual(nn.Module):
    """MBV2 inverted residual with CoordAtt in the expanded branch
    (mobilenet.py:108-148)."""

    oup: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = round(inp * self.expand_ratio)
        identity = self.stride == 1 and inp == self.oup
        y = x
        if self.expand_ratio != 1:
            y = _ConvBN(hidden, 1, name="pw")(y, train)
        y = _ConvBN(hidden, 3, self.stride, groups=hidden, name="dw")(y, train)
        if self.expand_ratio != 1:
            y = CoordAtt(hidden, name="ca")(y, train)
        y = _ConvBN(self.oup, 1, act="none", name="pw_linear")(y, train)
        return x + y if identity else y


class MBV2CA(nn.Module):
    """Full MBV2-CA (classification head included, mobilenet.py:150-195)."""

    num_classes: int = 1000
    width_mult: float = 1.0

    CFGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        div = 4 if self.width_mult == 0.1 else 8
        ch = _make_divisible(32 * self.width_mult, div)
        x = _ConvBN(ch, 3, 2, act="hswish", name="stem")(x, train)
        li = 0
        for t, c, n, s in self.CFGS:
            out = _make_divisible(c * self.width_mult, div)
            for i in range(n):
                x = InvertedResidual(out, s if i == 0 else 1, t,
                                     name=f"block_{li}")(x, train)
                li += 1
        out = _make_divisible(1280 * self.width_mult, div) \
            if self.width_mult > 1.0 else 1280
        x = _ConvBN(out, 1, act="hswish", name="head_conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="classifier")(x)
