"""Pallas TPU kernel for the fused TAF queue update + leaky transform.

One HBM pass over the (B, H, W*2K)-folded packed queue: read state + the
pre-broadcast has/tmean planes, apply the queue update (age, shift, insert),
the empty-bin freeze, the leaky transform and the /255 bf16 cast, and write
both the new state and the detector input volume. The XLA formulation of
the same chain runs at ~300 GB/s effective because the 16-channel-minor
arrays fill 16/128 lanes per tile and the ops split into several passes;
here every block is a full-lane (ROWS, W*2K) tile.

Reference semantics: generate_taf.py:39-58 queue update + :69-76 leaky.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pallas_call(*args, **kwargs):
    """pl.pallas_call, interpreted automatically on CPU backends (tests and
    the driver's virtual-CPU multichip dryrun run the same kernels)."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


ROWS = 32


def _update_kernel(state_ref, tm_ref, anyev_ref, out_ref, vol_ref, *, C):
    s = state_ref[0]                              # (ROWS, WF) f32
    # single-plane encoding: tm in [-1, 0] where the cell received events,
    # -2.0 where it did not (saves a full (B, H, WF) has-mask plane)
    # f32 compare: Mosaic rejects bf16 cmpf on this target
    tm = tm_ref[0].astype(jnp.float32)
    has = tm > -1.5
    aged = s - 1.0
    shifted = jnp.concatenate(
        [jnp.zeros((s.shape[0], 2), jnp.float32), aged[:, :-2]], axis=1)
    mask01 = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % C) < 2
    new = jnp.where(mask01, tm, shifted)
    upd = jnp.where(has, new, aged)
    upd = jnp.where(anyev_ref[0, 0, 0] > 0.0, upd, s)
    out_ref[0] = upd
    # leaky transform: max(0, 1 - log1p(-x)/8.7) / 255 * 255 → [0, 1]
    lk = 1.0 - jnp.log1p(-upd) * (1.0 / 8.7)
    vol_ref[0] = jnp.maximum(lk, 0.0).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("height", "width"), donate_argnums=(0,))
def taf_update_leaky(state_f, tm_f, any_ev, *, height: int, width: int):
    """Fused queue update + leaky on the folded packed state.

    Args:
      state_f: (B, H, W*2K) f32 folded packed queue (c = 2*age + p minor
        within each pixel's 2K block, newest first).
      tm_f: (B, H, W*2K) bf16 pre-broadcast new-bin mean plane (position
        x*2K+c reads cell (x, c%%2)); -2.0 marks cells with no events.
      any_ev: (B,) f32, >0 when the stream received any event this bin
        (the reference's whole-frame freeze, generate_taf.py:40-41).
    Returns (new_state_f f32, volume_f bf16 in [0, 1]) both (B, H, W*2K).
    """
    B, H, WF = state_f.shape
    C = WF // width
    rows = ROWS
    # VMEM budget: buffered block copies (2 in + 2 out, double-buffered)
    # must fit the 16 MB scoped limit
    while H % rows or rows * WF * 8 * 4 > 12 * 1024 * 1024:
        rows //= 2
    grid = (B, H // rows)
    bspec = lambda dt: pl.BlockSpec((1, rows, WF), lambda b, r: (b, r, 0),
                                    memory_space=pltpu.VMEM)
    out_state, vol = _pallas_call(
        partial(_update_kernel, C=C),
        grid=grid,
        in_specs=[bspec(jnp.float32), bspec(jnp.bfloat16),
                  pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(bspec(jnp.float32), bspec(jnp.bfloat16)),
        out_shape=(jax.ShapeDtypeStruct((B, H, WF), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, WF), jnp.bfloat16)),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(state_f, tm_f, any_ev.reshape(B, 1, 1))
    return out_state, vol


@partial(jax.jit, static_argnames=("height", "width", "scatter", "precise"),
         donate_argnums=(0,))
def taf_stream_step_kernel(state_f, xytp, n_valid, *, height: int,
                           width: int, scatter: str = "pallas",
                           precise: bool = False):
    """Full streaming TAF step on the folded packed state: banded-scatter
    histogram (pallas_scatter) + XLA broadcast of has/tmean + fused update
    kernel. Returns (new_state_f, vol (B, H, W, 2K) bf16 in [0, 1])."""
    from .mxu_scatter import scatter_cnt_tsum_sorted
    from .pallas_scatter import scatter_cnt_tsum_pallas_sorted

    B, H, WF = state_f.shape
    W = width
    K = WF // W // 2
    E = xytp.shape[1]
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    valid = (jnp.arange(E)[None, :] < n_valid[:, None]) \
        & (x >= 0) & (x < W) & (y >= 0) & (y < H) & (p >= 0) & (p < 2)
    P = H * W * 2
    idx = jnp.where(valid, (y * W + x) * 2 + p, jnp.int32(P))
    tv = (t - 1.0) * valid

    if scatter == "pallas":
        cnt, tsum = scatter_cnt_tsum_pallas_sorted(idx, tv, valid, P,
                                                   precise)
    elif scatter == "sorted":
        cnt, tsum = scatter_cnt_tsum_sorted(idx, tv, valid, P, precise)
    else:
        # reject rather than silently substitute: a bench row labeled
        # "mxu" must not actually run the sorted path
        raise ValueError(f"taf_stream_step_kernel supports scatter "
                         f"'pallas' or 'sorted', got {scatter!r}")

    cnt4 = cnt.reshape(B, H, W, 2)
    tm4 = jnp.where(cnt4 > 0, tsum.reshape(B, H, W, 2) / (cnt4 + 1e-8),
                    -2.0).astype(jnp.bfloat16)
    tm_f = jnp.tile(tm4, (1, 1, 1, K)).reshape(B, H, WF)
    any_ev = jnp.any(cnt4 > 0, axis=(1, 2, 3)).astype(jnp.float32)

    state_f, vol_f = taf_update_leaky(state_f, tm_f, any_ev,
                                      height=H, width=W)
    return state_f, vol_f.reshape(B, H, W, 2 * K)


def _update_kernel_v2(state_ref, cnt_ref, tsum_ref, m_ref, anyev_ref,
                      out_ref, vol_ref, *, C):
    """v2: the per-cell→per-channel broadcast happens IN-kernel as one
    matmul with a constant 0/1 expansion matrix M (128 cells → 8*128
    channel positions, blockwise-aligned), so the (B, H, W*2K) tmean plane
    never exists in HBM."""
    s = state_ref[0]                              # (rows, WF) f32
    rows, WF = s.shape
    c = cnt_ref[0]                                # (rows, Wc) f32
    ts = tsum_ref[0]
    tm_small = jnp.where(c > 0, ts / (c + 1e-8), -2.0)
    nb = tm_small.shape[1] // 128
    tm128 = tm_small.reshape(rows * nb, 128).astype(jnp.bfloat16)
    tm = jax.lax.dot_general(tm128, m_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).reshape(rows, WF)
    has = tm > -1.5
    aged = s - 1.0
    shifted = jnp.concatenate(
        [jnp.zeros((rows, 2), jnp.float32), aged[:, :-2]], axis=1)
    mask01 = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % C) < 2
    new = jnp.where(mask01, tm, shifted)
    upd = jnp.where(has, new, aged)
    upd = jnp.where(anyev_ref[0, 0, 0] > 0.0, upd, s)
    out_ref[0] = upd
    lk = 1.0 - jnp.log1p(-upd) * (1.0 / 8.7)
    vol_ref[0] = jnp.maximum(lk, 0.0).astype(jnp.bfloat16)


def _expansion_matrix(K: int):
    """(128, 8*128) 0/1: local cell lx*8 + s*2 + p → channels
    lx*(8*2K)/... for the p64 layout, 128 cells = 16 pixels of (4 subpixel,
    2 pol) cells; each expands to 2K queue channels (c = 2*age + p)."""
    import numpy as _np

    out = _np.zeros((128, 8 * 128), _np.float32)
    per_px_cells = 8              # 4 subpixels x 2 polarities
    per_px_ch = 4 * (2 * K)       # 4 subpixels x 2K queue channels (64 @K=8)
    n_px = 128 // per_px_cells    # 16 pixels per 128-cell block
    assert n_px * per_px_ch == 8 * 128, "expansion matrix assumes K == 8"
    for lx in range(n_px):
        for sdx in range(4):
            for p in range(2):
                cin = lx * per_px_cells + sdx * 2 + p
                for a in range(K):
                    j = lx * per_px_ch + sdx * (2 * K) + 2 * a + p
                    out[cin, j] = 1.0
    return out


@partial(jax.jit, static_argnames=("height", "width"), donate_argnums=(0,))
def taf_update_leaky_v2(state_f, cnt_r, tsum_r, any_ev, *, height: int,
                        width: int):
    """Fused expansion + queue update + leaky for the p64 folded state.

    cnt_r/tsum_r: (B, H2, W2*8) f32 per-cell histograms in row-major
    (pixel, subpixel, polarity) order. state_f (B, H2, W2*64) f32.
    """
    B, H, WF = state_f.shape
    C = 16
    K = C // 2
    Wc = cnt_r.shape[-1]
    assert Wc % 128 == 0, (
        f"taf_update_leaky_v2 needs cells-per-row divisible by 128 "
        f"(width/2 %% 16 == 0); got {Wc} cell columns")
    M = jnp.asarray(_expansion_matrix(K)).astype(jnp.bfloat16)
    rows = ROWS
    while H % rows or rows * WF * 9 * 4 > 12 * 1024 * 1024:
        rows //= 2
    grid = (B, H // rows)
    bspec = lambda wid: pl.BlockSpec((1, rows, wid), lambda b, r: (b, r, 0),
                                     memory_space=pltpu.VMEM)
    out_state, vol = _pallas_call(
        partial(_update_kernel_v2, C=C),
        grid=grid,
        in_specs=[bspec(WF), bspec(Wc), bspec(Wc),
                  pl.BlockSpec(M.shape, lambda b, r: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(bspec(WF), bspec(WF)),
        out_shape=(jax.ShapeDtypeStruct((B, H, WF), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, WF), jnp.bfloat16)),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(state_f, cnt_r, tsum_r, M, any_ev.reshape(B, 1, 1))
    return out_state, vol


def _update_kernel_raw(state_ref, raw_cnt_ref, raw_tsum_ref, m_ref,
                       anyev_ref, out_ref, vol_ref, *, C):
    """v2b: reads the banded scatter's RAW (R, 256) layout directly — the
    cnt/tsum lanes arrive as (rows*20, 128) blocks already in the
    cell-per-lane shape the expansion matmul wants."""
    s = state_ref[0]                              # (rows, WF) f32
    rows, WF = s.shape
    c = raw_cnt_ref[0]                            # (rows*WF/1024, 128) f32
    ts = raw_tsum_ref[0]
    tm128 = jnp.where(c > 0, ts / (c + 1e-8), -2.0).astype(jnp.bfloat16)
    tm = jax.lax.dot_general(tm128, m_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).reshape(rows, WF)
    has = tm > -1.5
    aged = s - 1.0
    shifted = jnp.concatenate(
        [jnp.zeros((rows, 2), jnp.float32), aged[:, :-2]], axis=1)
    mask01 = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % C) < 2
    new = jnp.where(mask01, tm, shifted)
    upd = jnp.where(has, new, aged)
    upd = jnp.where(anyev_ref[0, 0, 0] > 0.0, upd, s)
    out_ref[0] = upd
    lk = 1.0 - jnp.log1p(-upd) * (1.0 / 8.7)
    vol_ref[0] = jnp.maximum(lk, 0.0).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("height", "width"), donate_argnums=(0,))
def taf_update_leaky_raw(state_f, raw, any_ev, *, height: int, width: int):
    """Fused expansion + update + leaky consuming the scatter's raw
    (B, R, 2*128) output (cnt lanes [0:128), tsum lanes [128:256))."""
    B, H, WF = state_f.shape
    C = 16
    K = C // 2
    assert (WF // 8) % 128 == 0, (
        f"taf_update_leaky_raw needs cells-per-row divisible by 128 "
        f"(width/2 %% 16 == 0); got folded width {WF}")
    M = jnp.asarray(_expansion_matrix(K)).astype(jnp.bfloat16)
    rows = ROWS
    while H % rows or rows * WF * 9 * 4 > 12 * 1024 * 1024:
        rows //= 2
    cells_rows = rows * (WF // 8) // 128          # raw rows per block
    grid = (B, H // rows)
    bspec = lambda: pl.BlockSpec((1, rows, WF), lambda b, r: (b, r, 0),
                                 memory_space=pltpu.VMEM)
    raw_spec = lambda col: pl.BlockSpec(
        (1, cells_rows, 128), lambda b, r, c=col: (b, r, c),
        memory_space=pltpu.VMEM)
    out_state, vol = _pallas_call(
        partial(_update_kernel_raw, C=C),
        grid=grid,
        in_specs=[bspec(), raw_spec(0), raw_spec(1),
                  pl.BlockSpec(M.shape, lambda b, r: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(bspec(), bspec()),
        out_shape=(jax.ShapeDtypeStruct((B, H, WF), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, WF), jnp.bfloat16)),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(state_f, raw, raw, M, any_ev.reshape(B, 1, 1))
    return out_state, vol


def p64_init_state(batch: int, height: int, width: int, K: int = 8):
    """Patchified folded state: (B, H/2, (W/2)*4*2K) filled with -6000."""
    return jnp.full((batch, height // 2, (width // 2) * 4 * 2 * K),
                    -6000.0, jnp.float32)


@partial(jax.jit, static_argnames=("height", "width", "scatter", "precise",
                                   "fold_output"), donate_argnums=(0,))
def taf_stream_step_kernel_p64(state_f, xytp, n_valid, any_events=None, *,
                               height: int, width: int,
                               scatter: str = "pallas",
                               precise: bool = False,
                               fold_output: bool = False):
    """Streaming TAF step on the PATCHIFIED folded state.

    The state lives at quarter resolution with the 2x2 subpixels packed into
    channels: cell (y2, x2) carries 4 subpixel blocks (s-major, s =
    (x&1)*2 + (y&1) → [tl, bl, tr, br]) of 2K packed queue channels each —
    i.e. the network input is produced ALREADY space-to-depth'd, so the
    detector's stem skips the patchify and every tensor in the pipeline has
    a ≥64-channel minor dim (vs 16: 4x better TPU lane occupancy).

    Returns (new_state_f, vol (B, H/2, W/2, 4*2K) bf16 in [0, 1]) for the
    *_p64 stems (models/stems.py BinsFusionModulePatched / FocusPatched).
    """
    from .mxu_scatter import scatter_cnt_tsum_sorted
    from .pallas_scatter import scatter_cnt_tsum_pallas_sorted

    B, H2, WF = state_f.shape
    W = width
    W2 = W // 2
    K = WF // W2 // 8
    E = xytp.shape[1]
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    valid = (jnp.arange(E)[None, :] < n_valid[:, None]) \
        & (x >= 0) & (x < W) & (y >= 0) & (y < height) & (p >= 0) & (p < 2)
    P = height * W * 2
    s = (x & 1) * 2 + (y & 1)
    cell = ((y >> 1) * W2 + (x >> 1)) * 4 + s
    idx = jnp.where(valid, cell * 2 + p, jnp.int32(P))
    tv = (t - 1.0) * valid

    if scatter == "pallas" and not precise and K == 8:
        # raw path: the update kernel reads the scatter's (B, R, 256)
        # layout directly; the (B, size) cnt/tsum never materialise
        raw, R = scatter_cnt_tsum_pallas_sorted(idx, tv, valid, P,
                                                False, raw=True)
        if any_events is None:
            # from the valid mask, not the raw scatter rows: a slice of
            # raw[:, :P // 128] drops tail cells when P % 128 != 0 (and a
            # ceil slice would include the sentinel lane)
            any_ev = jnp.any(valid, axis=1).astype(jnp.float32)
        else:
            # spatially-sharded callers pass the GLOBAL flag so a shard
            # with no local events still ages with the rest of the frame
            any_ev = any_events.astype(jnp.float32)
        state_f, vol_f = taf_update_leaky_raw(state_f, raw, any_ev,
                                              height=H2, width=W2 * 4)
        if fold_output:
            return state_f, vol_f
        return state_f, vol_f.reshape(B, H2, W2, 8 * K)
    if scatter == "pallas":
        cnt, tsum = scatter_cnt_tsum_pallas_sorted(idx, tv, valid, P,
                                                   precise)
    elif scatter == "sorted":
        cnt, tsum = scatter_cnt_tsum_sorted(idx, tv, valid, P, precise)
    else:
        raise ValueError(f"taf_stream_step_kernel_p64 supports scatter "
                         f"'pallas' or 'sorted', got {scatter!r}")

    if any_events is None:
        any_ev = jnp.any(cnt.reshape(B, -1) > 0, axis=1).astype(jnp.float32)
    else:
        any_ev = any_events.astype(jnp.float32)
    if K == 8:
        # v2: cell→channel broadcast happens in-kernel (expansion matmul)
        cnt_r = cnt.reshape(B, H2, W2 * 8)
        tsum_r = tsum.reshape(B, H2, W2 * 8)
        state_f, vol_f = taf_update_leaky_v2(state_f, cnt_r, tsum_r, any_ev,
                                             height=H2, width=W2 * 4)
    else:
        cnt5 = cnt.reshape(B, H2, W2, 4, 2)
        tm5 = jnp.where(cnt5 > 0,
                        tsum.reshape(B, H2, W2, 4, 2) / (cnt5 + 1e-8),
                        -2.0).astype(jnp.bfloat16)
        tm_f = jnp.tile(tm5, (1, 1, 1, 1, K)).reshape(B, H2, WF)
        # the update kernel sees W2*4 "subpixel columns" of 2K channels each
        state_f, vol_f = taf_update_leaky(state_f, tm_f, any_ev,
                                          height=H2, width=W2 * 4)
    if fold_output:
        # keep the full-lane folded layout for a folded-input stem
        return state_f, vol_f
    return state_f, vol_f.reshape(B, H2, W2, 8 * K)
