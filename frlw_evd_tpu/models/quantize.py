"""Post-training int8 quantization for serving (TPU-native; no reference
counterpart — the reference serves f32 torch at batch 1, core/model.py:59-60).

The v5e MXU runs int8×int8→int32 convolutions at 2× the bf16 rate
(394 vs 197 TOPS), so a PTQ path is a pure serving-throughput lever on the
detect stage. Design:

  * zero model changes — convs are swapped at trace time with
    `flax.linen.intercept_methods`, keyed by module path;
  * symmetric per-output-channel weight scales (sw[c] = max|W[..,c]| / 127),
    quantized ONCE from the checkpoint tree (`build_weight_table`);
  * symmetric per-tensor activation scales from an eager calibration pass
    (`calibrate_int8`) over representative batches — symmetric so the conv's
    zero padding maps exactly to q=0 (no zero-point correction terms);
  * int32 accumulation (`preferred_element_type`), dequant to f32 with the
    folded (sx·sw)[c] scale, bias/BN/activation run as usual downstream.

Only "MXU-worthy" sites are quantized: plain convs (groups=1, no dilation)
with ≥ `min_channels` in AND out channels. That automatically keeps the
prediction heads (out ≤ num_classes+5), depthwise convs, and the narrow
stem mixing convs in bf16, where accuracy is most sensitive and int8 gains
nothing.

Merged-branch head towers (heads.py _merged_towers) call lax.conv directly,
outside nn.Conv interception, so they participate through an explicit hook
(`maybe_merged_int8_conv`) keyed by the CANONICAL per-branch conv paths:
calibration records each branch's input range under its canonical key (the
two branches of layer 0 share an input; layer 1's halves are recorded — and
quantized — separately, exactly like the unmerged towers), and the weight
table's per-branch (q, sw) entries are concatenated to form the double-width
int8 kernel. Scales dicts are therefore interchangeable between canonical
and merged builds of the same checkpoint.

Accuracy is validated structurally in tests/test_quantize.py (quantized
head maps stay within a few percent relative L2 of the bf16 forward, and
an empty scale table reproduces the unquantized path bit-exactly); a
real-data mAP check joins the standing dress-rehearsal gate
(tools/dress_rehearsal.py) once a GEN1 dataset + checkpoint archive is
available.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

PathKey = str  # "/".join(module.path)

# Active quantization context for conv sites that bypass nn.Conv (the merged
# head towers). Value: {"mode": "record", "store": dict} during calibration,
# {"mode": "apply", "scales": .., "table": .., "min_channels": int} while an
# int8_ctx is installed, else None. Consulted at TRACE time only.
_MERGED: contextvars.ContextVar[Optional[dict]] = contextvars.ContextVar(
    "int8_merged_ctx", default=None)


def maybe_merged_int8_conv(x: jnp.ndarray, kernels: Sequence[jnp.ndarray],
                           keys: Sequence[PathKey], groups: int):
    """int8 path for a merged multi-branch conv built from canonical leaves.

    x: merged input — shared by all branches when groups == 1, or the
    channel-concat of per-branch inputs when groups == len(kernels).
    kernels: per-branch HWIO kernels (the canonical parameter leaves, in
    output-concat order). keys: the canonical conv path keys of the branches.

    Returns the f32 conv output (pre-BN), or None when no int8 context is
    active / the site is uncalibrated / too narrow — callers fall back to
    their bf16 conv. In record mode, banks each branch input's max|.| under
    its canonical key and returns None (calibration runs the bf16 math).
    """
    ctx = _MERGED.get()
    if ctx is None:
        return None
    nb = len(kernels)
    if groups == 1:
        parts = [x] * nb
    else:
        w_in = x.shape[-1] // nb
        parts = [x[..., i * w_in:(i + 1) * w_in] for i in range(nb)]
    if ctx["mode"] == "record":
        store = ctx["store"]
        mc = ctx["min_channels"]
        for key, p, kern in zip(keys, parts, kernels):
            if kern.shape[-2] >= mc and kern.shape[-1] >= mc:
                m = jnp.max(jnp.abs(jnp.asarray(p, jnp.float32)))
                store[key] = (jnp.maximum(store[key], m)
                              if key in store else m)
        return None
    scales, table = ctx["scales"], ctx["table"]
    if any(k not in scales for k in keys):
        return None
    qk, sw, xq_parts, out_scales = [], [], [], []
    for key, p, kern in zip(keys, parts, kernels):
        # groups == 1: all branches share one input tensor, and that input
        # is quantized ONCE with branch 0's activation scale below — so
        # every branch's output must be dequantized with that same scale,
        # whatever its own banked value says (a hand-merged or re-sliced
        # scales dict could disagree; using per-branch sx here would make
        # branch outputs silently wrong by the scale ratio)
        sx = scales[keys[0]] if groups == 1 else scales[key]
        if key in table:
            q, s = table[key]
        else:
            q, s = quantize_kernel(kern)
        qk.append(q)
        sw.append(s)
        out_scales.append(s * sx)
        xq_parts.append(jnp.clip(
            jnp.round(p.astype(jnp.float32) * (1.0 / sx)),
            -127, 127).astype(jnp.int8))
    # groups == 1: quantizing once with branch 0's scale is exact for every
    # branch (shared input); the unused xq_parts are DCE'd.
    xq = xq_parts[0] if groups == 1 else jnp.concatenate(xq_parts, axis=-1)
    out = jax.lax.conv_general_dilated(
        xq, jnp.concatenate(qk, axis=-1), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * jnp.concatenate(out_scales)


def _norm_strides(mod: nn.Conv) -> Tuple[int, int]:
    s = mod.strides
    if s is None:
        return (1, 1)
    if isinstance(s, int):
        return (s, s)
    return tuple(s)  # type: ignore[return-value]


def _norm_dilation(d) -> bool:
    """True iff the dilation attribute means 'no dilation'."""
    if d is None:
        return True
    if isinstance(d, int):
        return d == 1
    return all(x == 1 for x in d)


def _eligible(mod: nn.Module, method_name: str, min_channels: int) -> bool:
    """Quantize only plain 2-D NHWC convs big enough to ride the int8 MXU."""
    if not (isinstance(mod, nn.Conv) and method_name == "__call__"):
        return False
    if mod.feature_group_count != 1:
        return False
    if not (_norm_dilation(mod.kernel_dilation)
            and _norm_dilation(mod.input_dilation)):
        return False
    if isinstance(mod.padding, str) and mod.padding not in ("SAME", "VALID"):
        return False
    if len(mod.kernel_size) != 2:
        return False
    kernel = mod.variables["params"]["kernel"]
    if kernel.ndim != 4:
        return False
    cin, cout = int(kernel.shape[-2]), int(kernel.shape[-1])
    return cin >= min_channels and cout >= min_channels


def _conv_padding(mod: nn.Conv):
    pad = mod.padding
    if isinstance(pad, str):
        return pad
    if isinstance(pad, int):
        return [(pad, pad)] * 2
    return [tuple(p) if not isinstance(p, int) else (p, p) for p in pad]


def quantize_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns (q, sw): q int8 with q[..,c] ≈ kernel[..,c] / sw[c], sw f32 (C,).
    """
    kf = jnp.asarray(kernel, jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0
    sw = jnp.maximum(sw, 1e-12)
    q = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    return q, sw


def iter_conv_kernels(params: Dict) -> Iterator[Tuple[Tuple[str, ...], Any]]:
    """Yield (path, kernel) for every conv-shaped kernel in a params tree.

    The path matches `module.path` of the owning nn.Conv (params nesting
    mirrors module nesting; 'kernel' is the leaf name flax gives nn.Conv)."""

    def walk(tree, path):
        for name, child in tree.items():
            if name == "kernel" and hasattr(child, "ndim") and child.ndim == 4:
                yield path, child
            elif isinstance(child, dict):
                yield from walk(child, path + (name,))

    yield from walk(params, ())


def build_weight_table(params: Dict, scales: Dict[PathKey, float],
                       ) -> Dict[PathKey, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Pre-quantize every calibrated conv kernel once (host-side, from the
    master params, so the int8 codes don't inherit a bf16 round-trip).
    Returns {path: (q_int8, sw_f32)} for paths present in `scales`."""
    table = {}
    for path, kernel in iter_conv_kernels(params):
        key = "/".join(path)
        if key in scales:
            table[key] = quantize_kernel(kernel)
    return table


def calibrate_int8(model: nn.Module, variables, batches: Sequence,
                   *, min_channels: int = 64,
                   apply_kwargs: Optional[dict] = None) -> Dict[PathKey, float]:
    """Run `model.apply(variables, batch, False)` over calibration batches,
    recording activation ranges at every quantizable conv.

    The recording pass is JITTED: the interceptor captures each site's
    max|x| as a traced value and returns the dict as the jit output — one
    compile per distinct batch shape instead of eager op-by-op dispatch
    (which on a remote-compile TPU backend costs minutes per pass)."""
    kw = apply_kwargs or {}

    def one_batch(vs, b):
        local: Dict[PathKey, Any] = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if _eligible(mod, context.method_name, min_channels):
                key = "/".join(mod.path)
                m = jnp.max(jnp.abs(jnp.asarray(args[0], jnp.float32)))
                local[key] = (jnp.maximum(local[key], m)
                              if key in local else m)
            return next_fun(*args, **kwargs)

        token = _MERGED.set({"mode": "record", "store": local,
                             "min_channels": min_channels})
        try:
            with nn.intercept_methods(interceptor):
                model.apply(vs, b, False, **kw)
        finally:
            _MERGED.reset(token)
        return local

    fn = jax.jit(one_batch)
    amax: Dict[PathKey, float] = {}
    for b in batches:
        d = jax.device_get(fn(variables, b))
        for k, v in d.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return {k: max(v, 1e-12) / 127.0 for k, v in amax.items()}


def make_int8_interceptor(scales: Dict[PathKey, float],
                          weight_table: Optional[Dict[PathKey, Tuple]] = None,
                          *, min_channels: int = 64):
    """Trace-time conv replacement: int8 MXU conv + f32 dequant.

    `scales` values are Python floats → compile-time constants (the 1/sx
    multiply folds into the preceding elementwise chain). If a site has no
    prequantized entry in `weight_table`, its kernel is quantized inline
    from the live variables (cheap relative to the conv itself)."""
    weight_table = weight_table or {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not _eligible(mod, context.method_name, min_channels):
            return next_fun(*args, **kwargs)
        key = "/".join(mod.path)
        sx = scales.get(key)
        if sx is None:
            return next_fun(*args, **kwargs)
        x = args[0]
        if key in weight_table:
            kq, sw = weight_table[key]
        else:
            kq, sw = quantize_kernel(mod.variables["params"]["kernel"])
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                      -127, 127).astype(jnp.int8)
        out = jax.lax.conv_general_dilated(
            xq, kq, _norm_strides(mod), _conv_padding(mod),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * (sw * sx)
        if mod.use_bias:
            out = out + mod.variables["params"]["bias"].astype(jnp.float32)
        return out.astype(x.dtype)

    return interceptor


@contextlib.contextmanager
def int8_ctx(scales: Optional[Dict[PathKey, float]],
             weight_table: Optional[Dict[PathKey, Tuple]] = None,
             *, min_channels: int = 64):
    """Context manager installing the int8 interceptor (nn.Conv sites) and
    the merged-tower hook context; a no-op when `scales` is falsy, so call
    sites can pass it through unconditionally."""
    if not scales:
        yield
        return
    token = _MERGED.set({"mode": "apply", "scales": scales,
                         "table": weight_table or {},
                         "min_channels": min_channels})
    try:
        with nn.intercept_methods(
                make_int8_interceptor(scales, weight_table,
                                      min_channels=min_channels)):
            yield
    finally:
        _MERGED.reset(token)
