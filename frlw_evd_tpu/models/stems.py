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

from .blocks import (BaseConv, SpmdBatchNorm, get_activation,
                     space_to_depth_patches)


class WeightNormConv1x1(nn.Module):
    """1x1 grouped conv with weight normalisation (torch nn.utils.weight_norm:
    w = g * v / ||v||, norm over all dims except the output-channel dim).

    tile=T applies the SAME canonical conv independently to T consecutive
    channel blocks (input T*in_ch, s-major), with canonical parameter shapes
    — used by the patchified-input stems, where the 2x2 subpixels become 4
    channel blocks sharing the stem weights."""

    out_channels: int
    groups: int = 1
    tile: int = 1

    @nn.compact
    def __call__(self, x):
        import jax

        in_ch = x.shape[-1] // self.tile
        v = self.param("v", nn.initializers.normal(0.01),
                       (1, 1, in_ch // self.groups, self.out_channels))
        g = self.param("g", nn.initializers.ones, (self.out_channels,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12)
        kernel = (v * (g / norm)).astype(x.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if self.tile > 1:
            kernel = jnp.tile(kernel, (1, 1, 1, self.tile))
            b = jnp.tile(b, self.tile)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups * self.tile,
        )
        return y + b.astype(y.dtype)


class TiledConv1x1(nn.Module):
    """Dense 1x1 conv with canonical (1,1,cin,cout) parameters, applied
    block-diagonally to `tile` consecutive channel blocks (shared weights).
    Parameter names match nn.Conv so the canonical and patched stems share
    one variables tree."""

    features: int
    tile: int = 1

    @nn.compact
    def __call__(self, x):
        import jax

        cin = x.shape[-1] // self.tile
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(x.dtype)
        b = bias
        if self.tile > 1:
            k = jnp.tile(k, (1, 1, 1, self.tile))
            b = jnp.tile(b, self.tile)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.tile,
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


class BinsFusionModulePatched(nn.Module):
    """BFM stem for PRE-PATCHIFIED input (B, H/2, W/2, 4*2K).

    The reference BFM's channel ops are all 1x1 (per-pixel), so they commute
    with the 2x2 space-to-depth: applying them per 2K-channel subpixel block
    (shared weights, s-major block order [tl, bl, tr, br]) then running the
    final 3x3 conv directly is mathematically identical to the canonical
    BFM on the un-patchified grid — but the full-resolution 16-channel-minor
    tensors (12.5%% TPU lane occupancy) never exist. Parameter tree is
    IDENTICAL to BinsFusionModule: one checkpoint serves both.

    Pair with the patchified TAF state layout
    (encode/pallas_update.taf_stream_step_kernel_p64).
    """

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 4
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        S = 4
        in_channels = x.shape[-1] // S
        time_channels = in_channels // 2
        reduce_times = int(log2(time_channels))

        xout = []
        tc = time_channels
        h = x
        for i in range(reduce_times):
            groups = int(tc / 2)
            out_ch = int(self.embed_dim * tc / 2)
            h = WeightNormConv1x1(out_ch, groups=groups, tile=S,
                                  name=f"convs_{i}")(h)
            h = nn.relu(h)
            hs = h.reshape(*h.shape[:-1], S, out_ch)
            xout.append(hs[..., : self.embed_dim])
            tc = tc / 2
        h = jnp.concatenate(xout, axis=-1)           # (..., S, mixer_dim)
        mixer_dim = self.embed_dim * reduce_times
        h = h.reshape(*h.shape[:-2], S * mixer_dim)

        y = TiledConv1x1(mixer_dim * 4, tile=S, name="trans_up")(h)
        y = get_activation(self.act)(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = TiledConv1x1(mixer_dim, tile=S, name="trans_down")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        h = h + y

        # already patchified: the canonical BFM's patch() output channel
        # order [tl, bl, tr, br] equals the s-major block order here
        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(h, train)


class _WNParams(nn.Module):
    """Declares WeightNormConv1x1's parameters without applying them (the
    Pallas stem kernel consumes the raw tensors)."""

    in_per_group: int
    out_channels: int

    @nn.compact
    def __call__(self):
        v = self.param("v", nn.initializers.normal(0.01),
                       (1, 1, self.in_per_group, self.out_channels))
        g = self.param("g", nn.initializers.ones, (self.out_channels,))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return {"v": v, "g": g, "bias": b}


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible (kernel, bias) parameters."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_channels, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return {"kernel": k, "bias": b}


class BinsFusionModulePatchedKernel(nn.Module):
    """BinsFusionModulePatched with the channel chain + MLP fused into one
    Pallas pass (models/pallas_stem.py). Inference-only (dropout ignored —
    eval semantics); parameter tree identical to BinsFusionModule."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 4
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .pallas_stem import bfm_chain_apply

        S = 4
        in_channels = x.shape[-1] // S
        tc = in_channels // 2
        n_lvl = int(log2(tc))
        mixer = self.embed_dim * n_lvl
        params = {}
        t = tc
        cin = in_channels
        for i in range(n_lvl):
            groups = int(t / 2)
            out_ch = int(self.embed_dim * t / 2)
            params[f"convs_{i}"] = _WNParams(cin // groups, out_ch,
                                             name=f"convs_{i}")()
            cin = out_ch
            t //= 2
        params["trans_up"] = _ConvParams(mixer, mixer * 4,
                                         name="trans_up")()
        params["trans_down"] = _ConvParams(mixer * 4, mixer,
                                           name="trans_down")()
        h = bfm_chain_apply(x.astype(jnp.bfloat16), params, act=self.act)
        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(h, train)


class BinsFusionModuleFolded(nn.Module):
    """BFM stem for FOLDED pre-patchified input (B, H/2, (W/2)*4*2K).

    The channel chain + MLP run in the pair-packed Pallas kernel
    (models/pallas_stem.bfm_chain_apply_folded) over full-lane folded
    blocks; the final 3x3 conv applies the canonical (3,3,48,64) kernel
    zero-padded to 64 input channels (the kernel emits 48 real + 16 zero
    channels per pixel so the folded→NHWC reshape stays tile-aligned).
    Inference-only (dropout ignored); parameter tree identical to
    BinsFusionModule."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 4
    dropout_rate: float = 0.1
    pixel_channels: int = 64     # S * 2K

    @nn.compact
    def __call__(self, x_f, train: bool = False):
        from .pallas_stem import bfm_chain_apply_folded

        S = 4
        B, H2, WF = x_f.shape
        W2 = WF // self.pixel_channels
        in_channels = self.pixel_channels // S
        tc = in_channels // 2
        n_lvl = int(log2(tc))
        mixer = self.embed_dim * n_lvl
        params = {}
        t = tc
        cin = in_channels
        for i in range(n_lvl):
            groups = int(t / 2)
            out_ch = int(self.embed_dim * t / 2)
            params[f"convs_{i}"] = _WNParams(cin // groups, out_ch,
                                             name=f"convs_{i}")()
            cin = out_ch
            t //= 2
        params["trans_up"] = _ConvParams(mixer, mixer * 4,
                                         name="trans_up")()
        params["trans_down"] = _ConvParams(mixer * 4, mixer,
                                           name="trans_down")()
        h64_f = bfm_chain_apply_folded(x_f.astype(jnp.bfloat16), params,
                                       act=self.act, width=W2)
        h = h64_f.reshape(B, H2, W2, 64)
        return _PadInBaseConv(self.out_channels, S * mixer, self.ksize,
                              act=self.act, name="conv")(h, train)


class _PadInBaseConv(nn.Module):
    """BaseConv whose conv kernel has canonical (k,k,real_in,out) params but
    is applied to a zero-padded (…, padded_in) input (extra channels are
    identically zero, so padding the kernel with zero rows is exact)."""

    out_channels: int
    real_in: int
    ksize: int = 3
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        x = _PadKernelConv2d(self.out_channels, self.real_in,
                             self.ksize, name="conv")(x)
        x = SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return get_activation(self.act)(x)


class _PadKernelConv2d(nn.Module):
    features: int
    real_in: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x):
        import jax

        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.ksize, self.ksize, self.real_in, self.features))
        pad_in = x.shape[-1]
        kp = jnp.zeros((self.ksize, self.ksize, pad_in, self.features),
                       x.dtype)
        kp = kp.at[:, :, :self.real_in, :].set(k.astype(x.dtype))
        pad = (self.ksize - 1) // 2
        return jax.lax.conv_general_dilated(
            x, kp, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class FocusPatched(nn.Module):
    """Focus stem for PRE-PATCHIFIED input: just the 3x3 conv (canonical
    parameter tree — conv/conv/kernel (3,3,4C,O))."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(x, train)


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
