"""Recurrent feature memory (reference: core/Others/memory_blocks.py).

The reference mutates per-module hidden state across forward calls and resets
it with `clean_memory()` at sequence end (core/model.py:30-32, :63-64). The
TPU-native formulation is functional: each cell maps (carry, x) → (carry, y)
so a window sequence threads state through `jax.lax.scan` inside one jit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, SpmdBatchNorm, get_activation


class ConvLSTMCell(nn.Module):
    """Input-conv + rnn-conv ConvLSTM (memory_blocks.py:82-156)."""

    hidden_dim: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, carry, x):
        pad = self.kernel_size // 2
        x_conv = nn.Conv(4 * self.hidden_dim,
                         (self.kernel_size, self.kernel_size),
                         strides=(self.stride, self.stride),
                         padding=[(pad, pad), (pad, pad)], use_bias=True,
                         name="input_conv")(x)
        if carry is None:
            n, hh, ww, _ = x_conv.shape
            carry = (jnp.zeros((n, hh, ww, self.hidden_dim), x.dtype),
                     jnp.zeros((n, hh, ww, self.hidden_dim), x.dtype))
        h_cur, c_cur = carry
        h_conv = nn.Conv(4 * self.hidden_dim,
                         (self.kernel_size, self.kernel_size),
                         padding=[(pad, pad), (pad, pad)], use_bias=True,
                         name="rnn_conv")(h_cur)
        x_i, x_f, x_c, x_o = jnp.split(x_conv, 4, axis=-1)
        h_i, h_f, h_c, h_o = jnp.split(h_conv, 4, axis=-1)
        f = jax.nn.sigmoid(x_f + h_f)
        i = jax.nn.sigmoid(x_i + h_i)
        g = jnp.tanh(x_c + h_c)
        c_next = f * c_cur + i * g
        o = jax.nn.sigmoid(x_o + h_o)
        h_next = o * jnp.tanh(c_next)
        return (h_next, c_next), h_next

    def init_carry(self, n, h, w, dtype=jnp.float32):
        hh, ww = h // self.stride, w // self.stride
        return (jnp.zeros((n, hh, ww, self.hidden_dim), dtype),
                jnp.zeros((n, hh, ww, self.hidden_dim), dtype))


class _BottleneckPostAct(nn.Module):
    """Bottleneck with activation AFTER the residual add
    (memory_blocks.py:181-204)."""

    out_channels: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.out_channels
        y = BaseConv(hidden, 1, 1, act=self.act, name="conv1")(x, train)
        y = BaseConv(hidden, 3, 1, act=self.act, name="conv2")(y, train)
        # conv3: conv+bn, no activation
        pad = 0
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv3_conv")(y)
        y = SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="conv3_bn")(y)
        if x.shape[-1] == self.out_channels:
            y = y + x
        return get_activation(self.act)(y)


class ConvGRUCell(nn.Module):
    """recConvCell: ConvGRU built from post-act Bottlenecks + depthwise gate
    convs (memory_blocks.py:206-243)."""

    hidden_dim: int
    act: str = "relu"

    @nn.compact
    def __call__(self, carry, x, train: bool = False):
        if carry is None:
            carry = jnp.zeros(x.shape[:-1] + (self.hidden_dim,), x.dtype)
        h1 = carry
        mh1 = _BottleneckPostAct(self.hidden_dim, self.act, name="bconv1")(
            jnp.concatenate([h1, x], -1), train)
        r = jax.nn.sigmoid(BaseConv(self.hidden_dim, 3, 1,
                                    groups=self.hidden_dim, act=self.act,
                                    name="wr")(mh1, train))
        z = jax.nn.sigmoid(BaseConv(self.hidden_dim, 3, 1,
                                    groups=self.hidden_dim, act=self.act,
                                    name="wz")(mh1, train))
        mr = _BottleneckPostAct(self.hidden_dim, self.act, name="bconv2")(
            jnp.concatenate([h1 * r, x], -1), train)
        H = jax.nn.sigmoid(BaseConv(self.hidden_dim, 3, 1,
                                    groups=self.hidden_dim, act=self.act,
                                    name="wH")(mr, train))
        h = z * H + (1 - z) * h1
        return h, h

    def init_carry(self, n, h, w, dtype=jnp.float32):
        return jnp.zeros((n, h, w, self.hidden_dim), dtype)


class MemoryModel(nn.Module):
    """Per-FPN-level memory cells (memoryModel, memory_blocks.py:8-27):
    applies cell i to feature level i, threading a tuple of carries."""

    cell_type: str = "convlstm"          # convlstm | convgru
    hidden_dims: Sequence[int] = (256, 256, 256)
    kernel_sizes: Sequence[int] = (3, 3, 3)
    act: str = "relu"

    def setup(self):
        if self.cell_type == "convlstm":
            self.cells = [ConvLSTMCell(d, k, name=f"lstms_{i}")
                          for i, (d, k) in enumerate(
                              zip(self.hidden_dims, self.kernel_sizes))]
        else:
            self.cells = [ConvGRUCell(d, self.act, name=f"lstms_{i}")
                          for i, d in enumerate(self.hidden_dims)]

    def __call__(self, carries, features, train: bool = False):
        new_carries, outs = [], []
        for cell, carry, feat in zip(self.cells, carries, features):
            if self.cell_type == "convlstm":
                c, y = cell(carry, feat)
            else:
                c, y = cell(carry, feat, train)
            new_carries.append(c)
            outs.append(y)
        return tuple(new_carries), outs

    def init_carries(self, feature_shapes, dtype=jnp.float32):
        """feature_shapes: [(n, h, w, c)] per level."""
        out = []
        for cell, (n, h, w, _) in zip(self.cells, feature_shapes):
            out.append(cell.init_carry(n, h, w, dtype))
        return tuple(out)
