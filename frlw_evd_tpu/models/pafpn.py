"""Necks: YOLO PAN-FPN and the plain YOLOv3-style FPN
(reference: core/yolox/models/yolo_pafpn.py, yolo_fpn.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest 2x upsample (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class YOLOPAFPN(nn.Module):
    """PAN-FPN over (dark3, dark4, dark5) (yolo_pafpn.py:11-113).
    AED: depth=0.33, in_channels=[256,256,256]."""

    depth: float = 0.33
    in_channels: Sequence[int] = (256, 256, 256)
    depthwise: bool = False
    act: str = "silu"

    @nn.compact
    def __call__(self, features, train: bool = False):
        x2, x1, x0 = features  # dark3, dark4, dark5
        Conv = DWConv if self.depthwise else BaseConv
        n = round(3 * self.depth)
        c0, c1, c2 = [int(c) for c in self.in_channels]

        fpn_out0 = BaseConv(c1, 1, 1, act=self.act, name="lateral_conv0")(x0, train)
        f_out0 = upsample_nearest_2x(fpn_out0)
        f_out0 = jnp.concatenate([f_out0, x1], axis=-1)
        f_out0 = CSPLayer(c1, n=n, shortcut=False, depthwise=self.depthwise,
                          act=self.act, name="C3_p4")(f_out0, train)

        fpn_out1 = BaseConv(c0, 1, 1, act=self.act, name="reduce_conv1")(f_out0, train)
        f_out1 = upsample_nearest_2x(fpn_out1)
        f_out1 = jnp.concatenate([f_out1, x2], axis=-1)
        pan_out2 = CSPLayer(c0, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, name="C3_p3")(f_out1, train)

        p_out1 = Conv(c0, 3, 2, act=self.act, name="bu_conv2")(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(c1, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, name="C3_n3")(p_out1, train)

        p_out0 = Conv(c1, 3, 2, act=self.act, name="bu_conv1")(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(c2, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, name="C3_n4")(p_out0, train)

        return [pan_out2, pan_out1, pan_out0]


class _ConvSet(nn.Module):
    """YOLOv3 embedding block: 5 alternating 1x1/3x3 convs (yolo_fpn.py)."""

    in_filters: int
    filters: int
    act: str = "lrelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = BaseConv(f, 1, 1, act=self.act, name="conv0")(x, train)
        x = BaseConv(f * 2, 3, 1, act=self.act, name="conv1")(x, train)
        x = BaseConv(f, 1, 1, act=self.act, name="conv2")(x, train)
        x = BaseConv(f * 2, 3, 1, act=self.act, name="conv3")(x, train)
        x = BaseConv(f, 1, 1, act=self.act, name="conv4")(x, train)
        return x


class YOLOFPN(nn.Module):
    """Plain YOLOv3-style FPN (yolo_fpn.py:12-84)."""

    act: str = "lrelu"

    @nn.compact
    def __call__(self, features, train: bool = False):
        x2, x1, x0 = features
        out0 = _ConvSet(x0.shape[-1], 512, act=self.act, name="out0_embed")(x0, train)
        branch0 = BaseConv(256, 1, 1, act=self.act, name="out1_cbl")(out0, train)
        up0 = upsample_nearest_2x(branch0)
        x1_in = jnp.concatenate([up0, x1], axis=-1)
        out1 = _ConvSet(x1_in.shape[-1], 256, act=self.act, name="out1_embed")(x1_in, train)
        branch1 = BaseConv(128, 1, 1, act=self.act, name="out2_cbl")(out1, train)
        up1 = upsample_nearest_2x(branch1)
        x2_in = jnp.concatenate([up1, x2], axis=-1)
        out2 = _ConvSet(x2_in.shape[-1], 128, act=self.act, name="out2_embed")(x2_in, train)
        return [out2, out1, out0]
