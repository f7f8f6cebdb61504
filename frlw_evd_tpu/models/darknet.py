"""Darknet backbones (reference: core/yolox/models/darknet.py).

`Darknet` (depth 21/53) is the AED backbone: pluggable stem (Focus or the TAF
BFM), four ResLayer groups, SPP block in dark5. `CSPDarknet` is the standard
YOLOX backbone. Both return the (dark3, dark4, dark5) pyramid, NHWC.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, Focus, ResLayer, SPPBottleneck

DEPTH2BLOCKS = {21: [1, 2, 2, 1], 53: [2, 8, 8, 4]}


class _GroupLayer(nn.Module):
    """Stride-2 conv followed by num_blocks ResLayers (darknet.py:76-81)."""

    out_channels: int
    num_blocks: int
    stride: int = 2
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BaseConv(self.out_channels, 3, self.stride, act=self.act,
                     name="conv")(x, train)
        for i in range(self.num_blocks):
            x = ResLayer(self.out_channels, act=self.act, name=f"res_{i}")(x, train)
        return x


class _SPPBlock(nn.Module):
    """conv1x1 → conv3x3 → SPP → conv3x3 → conv1x1 (darknet.py:83-97)."""

    filters: Sequence[int]  # [out, mid]
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        f0, f1 = self.filters
        x = BaseConv(f0, 1, 1, act=self.act, name="conv1")(x, train)
        x = BaseConv(f1, 3, 1, act=self.act, name="conv2")(x, train)
        x = SPPBottleneck(f0, act=self.act, name="spp")(x, train)
        x = BaseConv(f1, 3, 1, act=self.act, name="conv3")(x, train)
        x = BaseConv(f0, 1, 1, act=self.act, name="conv4")(x, train)
        return x


class Darknet(nn.Module):
    """Darknet-21/53 with uniform AED channels (darknet.py:14-116).

    stem: a flax Module class taking (out_channels, ksize, act); instantiated
    with stem_out_channels. AED config: depth=21, out_channels=[256,256,256].
    """

    depth: int = 21
    stem: Any = Focus
    stem_out_channels: int = 64
    out_channels: Sequence[int] = (256, 256, 256)
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = DEPTH2BLOCKS[self.depth]
        base = self.stem_out_channels
        outputs = {}
        x = self.stem(base, ksize=3, act=self.act, name="stem")(x, train)
        outputs["stem"] = x
        x = _GroupLayer(base * 2, blocks[0], act=self.act, name="dark2")(x, train)
        outputs["dark2"] = x
        x = _GroupLayer(self.out_channels[0], blocks[1], act=self.act,
                        name="dark3")(x, train)
        outputs["dark3"] = x
        x = _GroupLayer(self.out_channels[1], blocks[2], act=self.act,
                        name="dark4")(x, train)
        outputs["dark4"] = x
        x = _GroupLayer(self.out_channels[2], blocks[3], act=self.act,
                        name="dark5_group")(x, train)
        x = _SPPBlock([self.out_channels[2], self.out_channels[2]],
                      act=self.act, name="dark5_spp")(x, train)
        outputs["dark5"] = x
        return [outputs[k] for k in self.out_features]


class CSPDarknet(nn.Module):
    """Standard YOLOX CSPDarknet (darknet.py:270-355); yolox exp uses
    dep_mul=0.33, wid_mul=0.5 (core/exp.py:582)."""

    dep_mul: float = 0.33
    wid_mul: float = 0.5
    stem: Any = Focus
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        Conv = DWConv if self.depthwise else BaseConv
        base_ch = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        outputs = {}
        x = self.stem(base_ch, ksize=3, act=self.act, name="stem")(x, train)
        outputs["stem"] = x
        x = Conv(base_ch * 2, 3, 2, act=self.act, name="dark2_conv")(x, train)
        x = CSPLayer(base_ch * 2, n=base_depth, depthwise=self.depthwise,
                     act=self.act, name="dark2_csp")(x, train)
        outputs["dark2"] = x
        x = Conv(base_ch * 4, 3, 2, act=self.act, name="dark3_conv")(x, train)
        x = CSPLayer(base_ch * 4, n=base_depth * 3, depthwise=self.depthwise,
                     act=self.act, name="dark3_csp")(x, train)
        outputs["dark3"] = x
        x = Conv(base_ch * 8, 3, 2, act=self.act, name="dark4_conv")(x, train)
        x = CSPLayer(base_ch * 8, n=base_depth * 3, depthwise=self.depthwise,
                     act=self.act, name="dark4_csp")(x, train)
        outputs["dark4"] = x
        x = Conv(base_ch * 16, 3, 2, act=self.act, name="dark5_conv")(x, train)
        x = SPPBottleneck(base_ch * 16, act=self.act, name="dark5_spp")(x, train)
        x = CSPLayer(base_ch * 16, n=base_depth, shortcut=False,
                     depthwise=self.depthwise, act=self.act,
                     name="dark5_csp")(x, train)
        outputs["dark5"] = x
        return [outputs[k] for k in self.out_features]


class SEAttention(nn.Module):
    """Squeeze-excite channel gate + 1x1 projection (darknet.py:119-154).

    The reference's forward references a `self.conv` that its __init__ never
    creates (commented out), so SwinDarknet is unrunnable as committed; here
    the gate operates on the input directly — the evident intent.
    """

    out_channels: int
    reduction: int = 16
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))                      # (N, C)
        y = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, name="fc2")(y)
        y = jax.nn.sigmoid(y)[:, None, None, :]
        return BaseConv(self.out_channels, 1, 1, act=self.act,
                        name="conv2")(x * y, train)


class SwinDarknet(nn.Module):
    """Darknet-21/53 with a parallel Temporal_Active_Focus_3D stem2 fused by
    squeeze-excite (darknet.py:157-268); selectable via the experimental
    tafSyn exp class in the reference (commented at core/exp.py:478-480)."""

    depth: int = 21
    stem: Any = Focus
    stem_out_channels: int = 64
    out_channels: Sequence[int] = (256, 256, 256)
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .stems import TemporalActiveFocus3D

        blocks = DEPTH2BLOCKS[self.depth]
        base = self.stem_out_channels
        outputs = {}
        h1 = self.stem(base, ksize=3, act=self.act, name="stem")(x, train)
        h2 = TemporalActiveFocus3D(base, act=self.act, name="stem2")(x, train)
        h = jnp.concatenate([h1, h2], axis=-1)
        h = SEAttention(base * 2, reduction=4, act=self.act, name="se")(h, train)
        outputs["stem"] = h
        # NB reference SwinDarknet narrows dark2 to `base` channels (:204-206)
        h = _GroupLayer(base, blocks[0], act=self.act, name="dark2")(h, train)
        outputs["dark2"] = h
        h = _GroupLayer(self.out_channels[0], blocks[1], act=self.act,
                        name="dark3")(h, train)
        outputs["dark3"] = h
        h = _GroupLayer(self.out_channels[1], blocks[2], act=self.act,
                        name="dark4")(h, train)
        outputs["dark4"] = h
        h = _GroupLayer(self.out_channels[2], blocks[3], act=self.act,
                        name="dark5_group")(h, train)
        h = _SPPBlock([self.out_channels[2], self.out_channels[2]],
                      act=self.act, name="dark5_spp")(h, train)
        outputs["dark5"] = h
        return [outputs[k] for k in self.out_features]
