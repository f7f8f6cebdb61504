"""Input stems for TAF representations (reference: core/Others/Temporal_Active_Focus.py).

`BinsFusionModule` (the paper's BFM, class Temporal_Active_Focus_connect:62)
is the production stem for `taf_bfm` exp types: a cascade of grouped 1x1
weight-normalised convs that halves the number of time bins each step while
collecting `embed_dim` channels per level, an MLP channel mixer with residual,
then the Focus patchify+conv.

The reference's grouped conv groups pairs of adjacent TIME BINS: its input
channel layout is (bin, polarity) interleaved — c = 2*bin + p — with groups =
time_channels/2, so group g sees bins (2g, 2g+1) with both polarities.
"""

from __future__ import annotations

from math import log2

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, get_activation, space_to_depth_patches


class WeightNormConv1x1(nn.Module):
    """1x1 grouped conv with weight normalisation (torch nn.utils.weight_norm:
    w = g * v / ||v||, norm over all dims except the output-channel dim)."""

    out_channels: int
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        import jax

        in_ch = x.shape[-1]
        v = self.param("v", nn.initializers.normal(0.01),
                       (1, 1, in_ch // self.groups, self.out_channels))
        g = self.param("g", nn.initializers.ones, (self.out_channels,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12)
        kernel = (v * (g / norm)).astype(x.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return y + b.astype(y.dtype)


class BinsFusionModule(nn.Module):
    """BFM stem (Temporal_Active_Focus_connect, reference :62-127).

    in_channels must be 2*K (K TAF bins, interleaved (bin, polarity)).
    """

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 4
    dropout_rate: float = 0.1
    fused: bool = True       # patchify+conv as one 6x6 s2 conv (blocks.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        time_channels = in_channels // 2
        reduce_times = int(log2(time_channels))

        xout = []
        tc = time_channels
        h = x
        for i in range(reduce_times):
            groups = int(tc / 2)
            out_ch = int(self.embed_dim * tc / 2)
            h = WeightNormConv1x1(out_ch, groups=groups, name=f"convs_{i}")(h)
            h = nn.relu(h)
            xout.append(h[..., : self.embed_dim])
            tc = tc / 2
        h = jnp.concatenate(xout, axis=-1)  # (N, H, W, embed_dim*reduce_times)

        mixer_dim = self.embed_dim * reduce_times
        y = nn.Conv(mixer_dim * 4, (1, 1), name="trans_up")(h)
        y = get_activation(self.act)(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Conv(mixer_dim, (1, 1), name="trans_down")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        h = h + y

        if self.fused and self.ksize == 3:
            return BaseConv(self.out_channels, 3, 1, act=self.act,
                            patchify_fused=True, name="conv")(h, train)
        h = space_to_depth_patches(h)
        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(h, train)


class TemporalActiveFocus(nn.Module):
    """Temporal_Active_Focus stem (reference :12-60): log2(K) grouped
    weight-norm convs keeping full width, then patchify+conv."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        time_channels = in_channels // 2
        reduce_times = int(log2(time_channels))
        h = x
        for i in range(reduce_times - 1):
            groups = int(time_channels / (2 ** (i + 1)))
            h = WeightNormConv1x1(in_channels, groups=groups, name=f"convs_{i}")(h)
            h = nn.relu(h)
        h = WeightNormConv1x1(in_channels, groups=1,
                              name=f"convs_{reduce_times - 1}")(h)
        h = nn.relu(h)
        h = space_to_depth_patches(h)
        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(h, train)


class TemporalActiveFocus3D(nn.Module):
    """Temporal_Active_Focus_3D stem (reference Temporal_Active_Focus.py:339):
    a cascade of grouped 3x3 BaseConvs — the first at stride 2 — halving the
    number of time groups each step, collecting the first `embed_dim` channels
    per level, fused by a 1x1 BaseConv with dropout 0.25. Used as SwinDarknet's
    parallel stem2."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from math import log2

        from .blocks import BaseConv

        in_channels = x.shape[-1]
        time_channels = in_channels // 2
        reduce_times = int(log2(time_channels))
        ed = self.embed_dim

        h = BaseConv(int(time_channels / 2 * ed), 3, 2,
                     groups=time_channels // 2, use_bias=True, act=self.act,
                     name="convs_0")(x, train)
        outs = [h[..., :ed]]
        for i in range(1, reduce_times):
            h = BaseConv(int(time_channels / (2 ** (i + 1)) * ed), 3, 1,
                         groups=int(time_channels / (2 ** (i + 1))),
                         use_bias=True, act=self.act,
                         name=f"convs_{i}")(h, train)
            outs.append(h[..., :ed])
        h = jnp.concatenate(outs, axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dropout=0.25,
                        name="conv2")(h, train)
