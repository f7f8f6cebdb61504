"""Video Swin Transformer 3D (reference: core/swin_transformer/backbone.py).

The reference's customised Video-Swin: 3-D window attention with relative
position bias, cyclic-shift masking, PatchEmbed3D, spatial PatchMerging and
the custom temporal PatchMergingTime (2→1 time merge), with the
in_dim/out_dim generalisation of stock Swin (backbone.py:323-405). Used by
the experimental TAF stems (`Temporal_Active_Focus_swin`) and the SwinDarknet
variant.

JAX notes: all shapes static; window padding amounts are Python ints at trace
time so `jnp.pad` is free of dynamism; the shifted-window attention mask is
precomputed with numpy (reference's lru_cached compute_mask).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window/shift to the input size (backbone.py get_window_size)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if use_shift is not None:
                use_shift[i] = 0
    if shift_size is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def window_partition(x, window_size):
    """(B, D, H, W, C) → (B*nW, Wd*Wh*Ww, C)."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_reverse(windows, window_size, B, D, H, W):
    wd, wh, ww = window_size
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


@lru_cache()
def _relative_position_index(window_size: Tuple[int, int, int]) -> np.ndarray:
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


@lru_cache()
def compute_shift_mask(D, H, W, window_size, shift_size) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -100) for shifted windows
    (backbone.py compute_mask)."""
    img_mask = np.zeros((1, D, H, W, 1))
    cnt = 0
    wd, wh, ww = window_size
    sd, sh, sw = shift_size
    # NB: exact reference slicing — with shift 0, slice(-0, None) is the FULL
    # range, so the final region overwrites the axis (no partition), which is
    # the correct no-shift behavior.
    for d in (slice(-wd), slice(-wd, -sd), slice(-sd, None)):
        for h in (slice(-wh), slice(-wh, -sh), slice(-sh, None)):
            for w in (slice(-ww), slice(-ww, -sw), slice(-sw, None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    x = img_mask.reshape(1, D // wd, wd, H // wh, wh, W // ww, ww, 1)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    mask = x[:, None, :] - x[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    """W-MSA with 3-D relative position bias (backbone.py:81-164)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        wd, wh, ww = self.window_size
        table_size = (2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_size, self.num_heads))

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        rel_idx = _relative_position_index(self.window_size)[:N, :N]
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(
            N, N, self.num_heads).transpose(2, 0, 1)
        attn = attn + rel_bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None, :, :]
            attn = attn.reshape(-1, self.num_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock3D(nn.Module):
    """Swin block: (S)W-MSA + MLP, pre-norm residuals (backbone.py:167-267)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift_size)

        shortcut = x
        h = nn.LayerNorm(name="norm1")(x)
        pad_d = (-D) % window_size[0]
        pad_b = (-H) % window_size[1]
        pad_r = (-W) % window_size[2]
        h = jnp.pad(h, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))
        _, Dp, Hp, Wp, _ = h.shape

        if any(s > 0 for s in shift_size):
            h = jnp.roll(h, shift=(-shift_size[0], -shift_size[1],
                                   -shift_size[2]), axis=(1, 2, 3))
            mask = jnp.asarray(compute_shift_mask(
                Dp, Hp, Wp, tuple(window_size), tuple(shift_size)))
        else:
            mask = None

        windows = window_partition(h, window_size)
        attn = WindowAttention3D(self.dim, tuple(window_size),
                                 self.num_heads, name="attn")(windows, mask)
        h = window_reverse(attn, window_size, B, Dp, Hp, Wp)

        if any(s > 0 for s in shift_size):
            h = jnp.roll(h, shift=shift_size, axis=(1, 2, 3))
        h = h[:, :D, :H, :W, :]
        x = shortcut + h

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """Spatial 2x2 merge (backbone.py:270-299)."""

    dim: int
    out_dim: int = 0  # unused; spatial merge always 4C→2C

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], -1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)


class PatchMergingTime(nn.Module):
    """Temporal 2→1 merge (backbone.py:450-481, custom)."""

    dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = x.reshape(B, D // 2, 2, H, W, C)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, D // 2, H, W, 2 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, name="reduction")(x)


class BasicLayer3D(nn.Module):
    """One Swin stage: alternating W-MSA / SW-MSA blocks + optional
    downsample (backbone.py:323-405)."""

    in_dim: int
    out_dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (1, 7, 7)
    downsample: Optional[str] = None  # None | 'spatial' | 'time'

    @nn.compact
    def __call__(self, x):
        """x: (B, D, H, W, C)."""
        shift = (0, self.window_size[1] // 2, self.window_size[2] // 2)
        for i in range(self.depth):
            x = SwinBlock3D(self.in_dim, self.num_heads, self.window_size,
                            (0, 0, 0) if i % 2 == 0 else shift,
                            name=f"blocks_{i}")(x)
        if self.downsample == "spatial":
            x = PatchMerging(self.in_dim, name="downsample")(x)
        elif self.downsample == "time":
            x = PatchMergingTime(self.in_dim, self.out_dim,
                                 name="downsample")(x)
        return x


class PatchEmbed3D(nn.Module):
    """Conv3D patchify (backbone.py:408-447)."""

    patch_size: Tuple[int, int, int] = (1, 4, 4)
    embed_dim: int = 96
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (B, D, H, W, C)."""
        pd, ph, pw = self.patch_size
        B, D, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, (-D) % pd), (0, (-H) % ph),
                        (0, (-W) % pw), (0, 0)))
        x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID", name="proj")(x)
        if self.use_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x


class SwinTransformer3D(nn.Module):
    """The reference's customised Video-Swin (backbone.py:483-683): temporal
    merging stages first (2→1 time per stage until D=1), then the standard
    2,2,6,2 spatial pyramid. Input (B, D, H, W, C); returns the final
    (B, D', H', W', C') feature map."""

    in_chans: int
    depth_time_stages: int = 2          # log2 of temporal extent to collapse
    embed_dim: int = 96
    num_heads: int = 3
    patch_size: Tuple[int, int, int] = (1, 4, 4)
    window_hw: Tuple[int, int] = (4, 5)

    @nn.compact
    def __call__(self, x):
        x = PatchEmbed3D(self.patch_size, self.embed_dim,
                         name="patch_embed")(x)
        # temporal stages: window (2, h, w), PatchMergingTime downsample
        dim = self.embed_dim
        for i in range(self.depth_time_stages):
            out_dim = dim * 2 if i == 0 else dim
            x = BasicLayer3D(dim, out_dim, depth=2, num_heads=self.num_heads,
                             window_size=(2,) + tuple(self.window_hw),
                             downsample="time", name=f"time_layers_{i}")(x)
            dim = out_dim
        # spatial stages (2, 2, 6, 2 with spatial merging between)
        for j, d in enumerate((2, 2, 6, 2)):
            x = BasicLayer3D(dim, dim * 2, depth=d,
                             num_heads=self.num_heads * (2 ** j),
                             window_size=(1,) + tuple(self.window_hw),
                             downsample="spatial" if j < 3 else None,
                             name=f"layers_{j}")(x)
            if j < 3:
                dim *= 2
        return x


class TemporalActiveFocusSwin(nn.Module):
    """TAF swin stem (Temporal_Active_Focus_swin, reference
    Temporal_Active_Focus.py:220+): treats the K TAF bins as a short video,
    embeds 2-channel frames, runs temporal Swin stages until the time axis
    collapses, and projects to the stem width at half resolution."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .blocks import BaseConv

        B, H, W, C = x.shape
        K = C // 2
        # (B, H, W, 2K) interleaved (bin, pol) → (B, D=K, H, W, 2)
        video = x.reshape(B, H, W, K, 2).transpose(0, 3, 1, 2, 4)
        h = PatchEmbed3D((1, 2, 2), self.embed_dim, name="patch_embed")(video)
        dim = self.embed_dim
        d = K
        i = 0
        while d > 1:
            out_dim = dim * 2 if i == 0 else dim
            h = BasicLayer3D(dim, out_dim, depth=2, num_heads=2,
                             window_size=(2, 4, 4), downsample="time",
                             name=f"time_layers_{i}")(h)
            dim = out_dim
            d //= 2
            i += 1
        h = h[:, 0]  # (B, H/2, W/2, dim)
        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(h, train)


# ---------------------------------------------------------------------------
# TAF cross-window correlation stem (reference: core/swin_transformer/
# corr_extract.py + Temporal_Active_Focus_corr, Temporal_Active_Focus.py:129)
# ---------------------------------------------------------------------------

def corr_window_partition(x, window_size):
    """(B, R, D, H, W, C) → (B*nW, R, Wd*Wh*Ww, C) (corr_extract.py:65-76)."""
    B, R, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, R, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7, 8)
    return x.reshape(-1, R, wd * wh * ww, C)


def corr_window_reverse(windows, window_size, B, R, D, H, W):
    wd, wh, ww = window_size
    x = windows.reshape(B, D // wd, H // wh, W // ww, R, wd, wh, ww, -1)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7, 8)
    return x.reshape(B, R, D, H, W, -1)


class CorrAttention3D(nn.Module):
    """Cross-attention between the TAF tensor and R decay-shifted references
    within 3-D windows (corr3D, corr_extract.py:4-63). The relative position
    bias ignores the temporal axis (coords_d zeroed, :27)."""

    dim: int
    R: int
    window_size: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x, x_ref):
        """x: (Nw, N, C) values; x_ref: (Nw, R, N, C) queries/keys."""
        Nw, R, N, C = x_ref.shape
        scale = self.dim ** -0.5
        v = nn.Dense(self.dim, name="projv")(x)
        q = nn.Dense(self.dim, name="projq")(x_ref[:, 0:1]) * scale
        k = nn.Dense(self.dim, name="projk")(x_ref)
        attn = jnp.einsum("bind,brjd->brij", q[:, 0:1][:, :, :, :].squeeze(1)[:, None] if False else q.squeeze(1)[:, None], k) if False else \
            jnp.einsum("bnd,brmd->brnm", q[:, 0], k)

        wd, wh, ww = self.window_size
        # temporal axis zeroed in the bias index
        table_size = (2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1)
        bias_table = self.param("relative_position_bias_table",
                                nn.initializers.truncated_normal(0.02),
                                (table_size, self.R))
        rel_idx = _relative_position_index((1, wh, ww))
        # expand over the (flattened) temporal repeats of the window
        reps = wd
        rel_idx = np.tile(rel_idx, (reps, reps))[:N, :N]
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(N, N, self.R)
        attn = attn + rel_bias.transpose(2, 0, 1)[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("brnm,bmd->brnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Nw, N, R * self.dim)
        return nn.Dense(self.dim, name="reduceR")(out)


class CorrLayer3D(nn.Module):
    """Window-partitioned correlation layer (corrBlock3D + corr_BasicLayer)."""

    dim: int
    R: int
    window_size: Tuple[int, int, int] = (2, 4, 4)

    @nn.compact
    def __call__(self, x, x_ref):
        """x: (B, 1, D, H, W, C); x_ref: (B, R, D, H, W, C)."""
        B, _, D, H, W, C = x.shape
        window_size = get_window_size((D, H, W), self.window_size)
        xw = corr_window_partition(x, window_size)[:, 0]      # (B*nW, N, C)
        rw = corr_window_partition(x_ref, window_size)
        out = CorrAttention3D(self.dim, self.R, tuple(window_size),
                              name="attn")(xw, rw)
        return corr_window_reverse(out[:, None], window_size, B, 1, D, H, W)


class TemporalActiveFocusCorr(nn.Module):
    """TAF correlation stem (Temporal_Active_Focus_corr, reference :129-211):
    builds R decay-shifted copies of the TAF volume (deltas [0, 5, 10, 25]
    extra bins of age), patch-embeds both, then alternates cross-window
    correlation with grouped 1x1 time-merging convs until one time step
    remains."""

    out_channels: int
    ksize: int = 3
    act: str = "silu"
    embed_dim: int = 16
    deltas: Tuple[int, ...] = (0, 5, 10, 25)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        D = C // 2
        reduce_times = int(np.log2(D))
        R = len(self.deltas)
        ed = self.embed_dim

        # (B, H, W, 2D) interleaved → (B, D, H, W, 2)
        video = x.reshape(B, H, W, D, 2).transpose(0, 3, 1, 2, 4)
        deltas = jnp.asarray(self.deltas, jnp.float32)[None, :, None, None,
                                                       None, None]
        v = video[:, None]                                   # (B, 1, D, H, W, 2)
        # decay-shift in leaky space: age += delta (reference :189)
        ref = 1.0 - jnp.log1p(jnp.expm1((1.0 - v) * 8.7) + deltas) / 8.7

        embed = nn.Conv(ed, (2, 2), strides=(2, 2), name="patch_embed")
        embed_ref = nn.Conv(ed, (2, 2), strides=(2, 2), name="patch_embed_ref")
        h = embed(video.reshape(B * D, H, W, 2)).reshape(
            B, 1, D, H // 2, W // 2, ed)
        r = embed_ref(ref.reshape(B * R * D, H, W, 2)).reshape(
            B, R, D, H // 2, W // 2, ed)

        dim = ed
        d = D
        for i in range(reduce_times):
            h = CorrLayer3D(dim, R, name=f"corr_extracts_{i}")(h, r)
            # merge adjacent time steps: (B, 1, d, H', W', dim) → d/2, 2*dim
            hh = h.reshape(B, d, -1, dim).reshape(B, d // 2, 2, -1, dim)
            Hp, Wp = h.shape[3], h.shape[4]
            h2 = h[:, 0].transpose(0, 2, 3, 1, 4).reshape(
                B, Hp, Wp, d * dim)
            h2 = nn.LayerNorm(name=f"layer_norms_{i}")(h2)
            h2 = nn.Conv(d * dim, (1, 1),
                         feature_group_count=max(d // 2, 1),
                         name=f"convs_{i}")(h2)
            h2 = nn.relu(h2)
            h2 = nn.Dropout(0.1, deterministic=not train)(h2)
            d = d // 2
            dim = dim * 2
            h = h2.reshape(B, Hp, Wp, d, dim).transpose(0, 3, 1, 2, 4)[:, None]
            if i < reduce_times - 1:
                r2 = r.transpose(0, 1, 3, 4, 2, 5).reshape(
                    B * R, Hp, Wp, (d * 2) * (dim // 2))
                r2 = nn.LayerNorm(name=f"layer_norms_ref_{i}")(r2)
                r2 = nn.Conv((d * 2) * (dim // 2), (1, 1),
                             feature_group_count=max(d, 1),
                             name=f"convs_ref_{i}")(r2)
                r2 = nn.relu(r2)
                r2 = nn.Dropout(0.1, deterministic=not train)(r2)
                r = r2.reshape(B, R, Hp, Wp, d, dim).transpose(
                    0, 1, 4, 2, 3, 5)

        h = h[:, 0, 0]  # (B, H/2, W/2, dim)
        from .blocks import BaseConv

        return BaseConv(self.out_channels, self.ksize, 1, act=self.act,
                        name="conv")(h, train)
