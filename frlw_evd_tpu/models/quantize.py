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
nothing. Merged-branch head towers (heads.py _merged_towers) call lax.conv
directly and therefore also stay bf16 — compose --dtype int8 with the
canonical head (int8 already makes the separate towers MXU-efficient).

Accuracy is validated structurally in tests/test_quantize.py (quantized
head maps stay within a few percent relative L2 of the bf16 forward, and
an empty scale table reproduces the unquantized path bit-exactly); a
real-data mAP check joins the standing dress-rehearsal gate
(tools/dress_rehearsal.py) once a GEN1 dataset + checkpoint archive is
available.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

PathKey = str  # "/".join(module.path)


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

        with nn.intercept_methods(interceptor):
            model.apply(vs, b, False, **kw)
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


def int8_ctx(scales: Optional[Dict[PathKey, float]],
             weight_table: Optional[Dict[PathKey, Tuple]] = None,
             *, min_channels: int = 64):
    """Context manager installing the int8 interceptor; a no-op when
    `scales` is falsy, so call sites can pass it through unconditionally."""
    if not scales:
        return contextlib.nullcontext()
    return nn.intercept_methods(
        make_int8_interceptor(scales, weight_table,
                              min_channels=min_channels))
