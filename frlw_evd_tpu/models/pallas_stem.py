"""Pallas kernel for the BFM per-pixel channel chain (patchified input).

The BFM stem's grouped 1x1 convs + channel-mixer MLP are all per-pixel ops
with tiny weight matrices; XLA lowers the many-small-group convs at
~150 GB/s effective on v5e (41 + 49 ms for chain + MLP at 1MEGAPIXEL batch
128). This kernel runs the whole chain in ONE pass over the patchified
volume: per block, the (rows*W2, 64) pixel matrix flows through dense
materialized block-diagonal weights on the MXU (the canonical grouped
structure is zero-filled; `xout` collection is a 0/1 selection matmul, so no
lane slicing), then the MLP + residual, writing the 48-channel `h` that
feeds the stem's final 3x3 conv.

Weights stay in the canonical BinsFusionModule parameter shapes; the dense
matrices are materialised per call (a few KB of compute).

Reference math: core/Others/Temporal_Active_Focus.py:62-127.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pallas_call(*args, **kwargs):
    """pl.pallas_call, interpreted automatically on CPU backends (tests and
    the driver's virtual-CPU multichip dryrun run the same kernels)."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


ROWS = 16
S = 4            # subpixel blocks (2x2 space-to-depth)
PAIR = 2         # pixels packed per 128-lane matrix row (2 x 64ch)


def _sel_matrices(embed: int = 4, sizes=(16, 8, 4)):
    """0/1 selection: level-l output (S*sizes[l]) → h (S*12) s-major blocks
    [lvl0[0:4] | lvl1[0:4] | lvl2[0:4]] per subpixel."""
    mats = []
    mixer = embed * len(sizes)
    for lvl, sz in enumerate(sizes):
        m = np.zeros((S * sz, S * mixer), np.float32)
        for s in range(S):
            for j in range(embed):
                m[s * sz + j, s * mixer + lvl * embed + j] = 1.0
        mats.append(m)
    return mats


def _stem_chain_kernel(vol_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, s0_ref, s1_ref, s2_ref, wu_ref, bu_ref,
                       wd_ref, bd_ref, out_ref, *, act):
    rows, W2, C = vol_ref.shape[1:]
    x = vol_ref[0].reshape(rows * W2, C)
    f32 = jnp.float32
    y0 = jax.nn.relu(jax.lax.dot_general(
        x, w0_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32)
        + b0_ref[:])
    y1 = jax.nn.relu(jax.lax.dot_general(
        y0.astype(jnp.bfloat16), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b1_ref[:])
    y2 = jax.nn.relu(jax.lax.dot_general(
        y1.astype(jnp.bfloat16), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b2_ref[:])
    h = (jax.lax.dot_general(y0.astype(jnp.bfloat16), s0_ref[:],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
         + jax.lax.dot_general(y1.astype(jnp.bfloat16), s1_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
         + jax.lax.dot_general(y2.astype(jnp.bfloat16), s2_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=f32))
    u = jax.lax.dot_general(h.astype(jnp.bfloat16), wu_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + bu_ref[:]
    if act == "silu":
        u = jax.nn.silu(u)
    elif act == "gelu":
        u = jax.nn.gelu(u)
    else:
        u = jax.nn.relu(u)
    d = jax.lax.dot_general(u.astype(jnp.bfloat16), wd_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + bd_ref[:]
    out_ref[0] = (h + d).reshape(rows, W2, h.shape[-1]).astype(jnp.bfloat16)


def _chain_kernel_folded(vol_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, s0_ref, s1_ref, s2_ref, wu_ref, bu_ref,
                         wd_ref, bd_ref, p_ref, out_ref, *, act, n_pair):
    """Pair-packed variant: the FOLDED (rows, W2*64) block reshapes
    tile-aligned to (rows*W2/2, 128) — two pixels per matrix row — so every
    DMA moves full-lane tiles (the 64-ch-minor 4D blocks DMA at ~100 GB/s;
    folded blocks at ~730 GB/s on v5e) and every matmul has a 128-wide
    operand. All weights are kron(eye(2), W) block-diagonal pairs; the final
    placement matmul P scatters the 2x48 outputs into 2x(48+16 zero pad)
    channels so the output reshape stays tile-aligned."""
    rows, WF = vol_ref.shape[1:]
    x = vol_ref[0].reshape(n_pair * rows, PAIR * 64)
    f32 = jnp.float32

    def mm(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    y0 = jax.nn.relu(mm(x, w0_ref[:]) + b0_ref[:])
    y1 = jax.nn.relu(mm(y0.astype(jnp.bfloat16), w1_ref[:]) + b1_ref[:])
    y2 = jax.nn.relu(mm(y1.astype(jnp.bfloat16), w2_ref[:]) + b2_ref[:])
    h = (mm(y0.astype(jnp.bfloat16), s0_ref[:])
         + mm(y1.astype(jnp.bfloat16), s1_ref[:])
         + mm(y2.astype(jnp.bfloat16), s2_ref[:]))
    u = mm(h.astype(jnp.bfloat16), wu_ref[:]) + bu_ref[:]
    if act == "silu":
        u = jax.nn.silu(u)
    elif act == "gelu":
        u = jax.nn.gelu(u)
    else:
        u = jax.nn.relu(u)
    h = h + mm(u.astype(jnp.bfloat16), wd_ref[:]) + bd_ref[:]
    out = mm(h.astype(jnp.bfloat16), p_ref[:])
    out_ref[0] = out.astype(jnp.bfloat16).reshape(rows, WF)


@partial(jax.jit, static_argnames=("act", "width"))
def bfm_chain_apply_folded(vol_f, params, act: str = "silu",
                           width: int = 320):
    """Pair-packed BFM chain on the FOLDED patchified volume.

    vol_f: (B, H2, W2*S*2K) bf16 folded (physical layout full-lane).
    Returns h64_f (B, H2, W2*64) bf16 — per pixel 48 real channels + 16
    zeros (so the folded→NHWC reshape stays tile-aligned); feed the final
    3x3 conv with the canonical (3,3,48,64) kernel zero-padded to 64 in.
    """
    B, H2, WF = vol_f.shape
    W2 = width
    in_ch = WF // W2 // S
    tc = in_ch // 2
    embed = 4
    n_lvl = int(np.log2(tc))
    sizes = [int(embed * tc / 2**i / 2) for i in range(n_lvl)]
    mixer = embed * n_lvl

    eye2 = lambda m: jnp.kron(jnp.eye(PAIR, dtype=jnp.float32),
                              m.astype(jnp.float32))
    dense = []
    t = tc
    for i in range(n_lvl):
        p = params[f"convs_{i}"]
        d = _wn_dense(p["v"], p["g"], int(t / 2), sizes[i])
        d64 = jnp.kron(jnp.eye(S, dtype=d.dtype), d)
        dense.append((eye2(d64).astype(jnp.bfloat16),
                      jnp.tile(p["bias"], S * PAIR).astype(jnp.float32)))
        t //= 2
    # _sel_matrices already includes the S-subpixel structure
    sel = [eye2(jnp.asarray(m)).astype(jnp.bfloat16)
           for m in _sel_matrices(embed, tuple(sizes))]
    ku = params["trans_up"]["kernel"][0, 0]
    kd = params["trans_down"]["kernel"][0, 0]
    wu = eye2(jnp.kron(jnp.eye(S, dtype=ku.dtype), ku)).astype(jnp.bfloat16)
    bu = jnp.tile(params["trans_up"]["bias"], S * PAIR).astype(jnp.float32)
    wd = eye2(jnp.kron(jnp.eye(S, dtype=kd.dtype), kd)).astype(jnp.bfloat16)
    bd = jnp.tile(params["trans_down"]["bias"], S * PAIR).astype(jnp.float32)
    # placement: pair-row [p0_48 | p1_48] → [p0_48, 0*16, p1_48, 0*16]
    smix = S * mixer
    pm = np.zeros((PAIR * smix, PAIR * 64), np.float32)
    for s in range(PAIR):
        for j in range(smix):
            pm[s * smix + j, s * 64 + j] = 1.0
    pmat = jnp.asarray(pm).astype(jnp.bfloat16)

    rows = ROWS
    while H2 % rows:
        rows //= 2
    n_pair = W2 // PAIR

    const = lambda a: pl.BlockSpec(a.shape, lambda b, r: tuple(
        0 for _ in a.shape), memory_space=pltpu.VMEM)
    ins = [dense[0][0], dense[0][1].reshape(1, -1),
           dense[1][0], dense[1][1].reshape(1, -1),
           dense[2][0], dense[2][1].reshape(1, -1),
           sel[0], sel[1], sel[2],
           wu, bu.reshape(1, -1), wd, bd.reshape(1, -1), pmat]
    out = _pallas_call(
        partial(_chain_kernel_folded, act=act, n_pair=n_pair),
        grid=(B, H2 // rows),
        in_specs=[pl.BlockSpec((1, rows, WF), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM)]
                 + [const(a) for a in ins],
        out_specs=pl.BlockSpec((1, rows, W2 * 64), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2 * 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(vol_f, *ins)
    return out


def _wn_dense(v, g, groups, out_ch):
    """WeightNorm grouped 1x1 → dense (in, out) with zero off-blocks."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12)
    k = (v * (g / norm))[0, 0]                  # (in/groups, out)
    in_g = k.shape[0]
    og = out_ch // groups
    blocks = [k[:, i * og:(i + 1) * og] for i in range(groups)]
    dense = jax.scipy.linalg.block_diag(*blocks)    # (in, out)
    return dense


@partial(jax.jit, static_argnames=("act",))
def bfm_chain_apply(vol, params, act: str = "silu"):
    """Run the BFM channel chain + MLP on the patchified volume.

    vol: (B, H2, W2, S*2K) bf16. params: the canonical BinsFusionModule
    params subtree ({convs_i: {v, g, bias}, trans_up/down: {kernel, bias}}).
    Returns h (B, H2, W2, S*mixer) bf16 ready for the final 3x3 conv.
    """
    B, H2, W2, C = vol.shape
    in_ch = C // S
    tc = in_ch // 2
    sizes = []
    embed = 4
    n_lvl = int(np.log2(tc))
    t = tc
    for i in range(n_lvl):
        sizes.append(int(embed * t / 2))
        t //= 2
    mixer = embed * n_lvl

    dense = []
    cin = in_ch
    t = tc
    for i in range(n_lvl):
        p = params[f"convs_{i}"]
        d = _wn_dense(p["v"], p["g"], int(t / 2), sizes[i])
        dense.append((jnp.kron(jnp.eye(S, dtype=d.dtype), d)
                      .astype(jnp.bfloat16),
                      jnp.tile(p["bias"], S).astype(jnp.float32)))
        t //= 2
    sel = [jnp.asarray(m).astype(jnp.bfloat16)
           for m in _sel_matrices(embed, tuple(sizes))]
    ku = params["trans_up"]["kernel"][0, 0]
    kd = params["trans_down"]["kernel"][0, 0]
    wu = jnp.kron(jnp.eye(S, dtype=ku.dtype), ku).astype(jnp.bfloat16)
    bu = jnp.tile(params["trans_up"]["bias"], S).astype(jnp.float32)
    wd = jnp.kron(jnp.eye(S, dtype=kd.dtype), kd).astype(jnp.bfloat16)
    bd = jnp.tile(params["trans_down"]["bias"], S).astype(jnp.float32)

    rows = ROWS
    while H2 % rows:
        rows //= 2
    const = lambda shape: pl.BlockSpec(shape, lambda b, r: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = _pallas_call(
        partial(_stem_chain_kernel, act=act),
        grid=(B, H2 // rows),
        in_specs=[pl.BlockSpec((1, rows, W2, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
                  const(dense[0][0].shape), const(dense[0][1].shape),
                  const(dense[1][0].shape), const(dense[1][1].shape),
                  const(dense[2][0].shape), const(dense[2][1].shape),
                  const(sel[0].shape), const(sel[1].shape),
                  const(sel[2].shape),
                  const(wu.shape), const(bu.shape),
                  const(wd.shape), const(bd.shape)],
        out_specs=pl.BlockSpec((1, rows, W2, S * mixer),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, S * mixer), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(vol, dense[0][0], dense[0][1], dense[1][0], dense[1][1],
      dense[2][0], dense[2][1], sel[0], sel[1], sel[2], wu, bu, wd, bd)
    return out
