"""Composite detector: stem+backbone → neck → head (reference: core/model.py).

The reference iterates a trailing time dimension with optional recurrent
memory; for the wired exp types (basic/taf/taf_bfm/yolox*/yolov3*) the time
depth is 1, so the core module is a single-window NHWC detector. Sequence
models (ConvLSTM/ConvGRU memory) thread state through `lax.scan` in
models/memory.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Focus
from .darknet import CSPDarknet, Darknet
from .heads import YOLOXHead, compute_losses, decode_outputs, flatten_level_outputs, level_grids
from .pafpn import YOLOPAFPN
from .stems import BinsFusionModule, TemporalActiveFocus


class EventDetector(nn.Module):
    """backbone → neck → head; returns raw per-level maps."""

    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        feats = self.neck(feats, train)
        return self.head(feats, train)


class MemoryEventDetector(nn.Module):
    """backbone → per-level recurrent memory → neck → head (the ConvLSTM /
    ConvGRU exp variants, reference core/exp.py:482-488 + core/model.py:30-42).
    Functional state: __call__ takes and returns the memory carries; thread
    them across windows with lax.scan (None carries = fresh sequence)."""

    backbone: nn.Module
    memory: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, carries, x, train: bool = False):
        feats = self.backbone(x, train)
        if carries is None:
            carries = (None,) * len(feats)
        carries, feats = self.memory(carries, feats, train)
        feats = self.neck(feats, train)
        return carries, self.head(feats, train)


def _swin_stem(*args, **kwargs):
    from .swin3d import TemporalActiveFocusSwin
    return TemporalActiveFocusSwin(*args, **kwargs)


def _corr_stem(*args, **kwargs):
    from .swin3d import TemporalActiveFocusCorr
    return TemporalActiveFocusCorr(*args, **kwargs)


def _taf3d_stem(*args, **kwargs):
    from .stems import TemporalActiveFocus3D
    return TemporalActiveFocus3D(*args, **kwargs)


def _bfm_p64(*args, **kwargs):
    from .stems import BinsFusionModulePatched
    return BinsFusionModulePatched(*args, **kwargs)


def _bfm_p64_kernel(*args, **kwargs):
    from .stems import BinsFusionModulePatchedKernel
    return BinsFusionModulePatchedKernel(*args, **kwargs)


def _bfm_folded(*args, **kwargs):
    from .stems import BinsFusionModuleFolded
    return BinsFusionModuleFolded(*args, **kwargs)


def _focus_p64(*args, **kwargs):
    from .stems import FocusPatched
    return FocusPatched(*args, **kwargs)


_STEMS = {
    "focus": Focus,
    "taf": TemporalActiveFocus,
    "bfm": BinsFusionModule,
    # pre-patchified-input variants (identical param trees to focus/bfm):
    # pair with the p64 TAF state layout (encode/pallas_update)
    "focus_p64": _focus_p64,
    "bfm_p64": _bfm_p64,
    "bfm_p64_kernel": _bfm_p64_kernel,
    "bfm_folded": _bfm_folded,
    "taf_swin": _swin_stem,
    "taf_corr": _corr_stem,
    "taf_3d": _taf3d_stem,
}


def build_detector(num_classes: int, *, family: str = "aed",
                   stem: str = "focus", act: str = "silu",
                   strides: Sequence[int] = (8, 16, 32),
                   in_channels: Sequence[int] = (256, 256, 256),
                   depth: float = 0.33, stem_out_channels: int = 64,
                   head_width: int = 256,
                   head_merged: bool = False) -> EventDetector:
    """Exp-type model matrix (core/exp.py:352-391, :580-591).

    family: 'aed' (Darknet-21, uniform 256ch) or 'yolox' (CSPDarknet 0.33/0.5).
    stem: 'focus' | 'taf' | 'bfm'. Width knobs exist for fast tests; reference
    configs use the defaults.
    """
    stem_cls = _STEMS[stem]
    if family == "aed":
        backbone = Darknet(depth=21, stem=stem_cls,
                           stem_out_channels=stem_out_channels,
                           out_channels=tuple(in_channels), act=act)
        neck = YOLOPAFPN(depth=depth, in_channels=tuple(in_channels), act=act)
    elif family == "swin_darknet":
        from .darknet import SwinDarknet

        backbone = SwinDarknet(depth=21, stem=stem_cls,
                               stem_out_channels=stem_out_channels,
                               out_channels=tuple(in_channels), act=act)
        neck = YOLOPAFPN(depth=depth, in_channels=tuple(in_channels), act=act)
    elif family == "yolox":
        in_channels = (128, 256, 512)
        backbone = CSPDarknet(dep_mul=0.33, wid_mul=0.5, stem=stem_cls, act=act)
        neck = YOLOPAFPN(depth=0.33, in_channels=tuple(in_channels), act=act)
    else:
        raise ValueError(f"unknown family {family}")
    head = YOLOXHead(num_classes=num_classes, strides=tuple(strides), act=act,
                     width=head_width, merged_branches=head_merged)
    return EventDetector(backbone=backbone, neck=neck, head=head)


def eval_decode(level_outs, strides):
    """Eval-path decode: sigmoid obj/cls then geometric decode → (N, A, 5+C)."""
    hw = [o.shape[1:3] for o in level_outs]
    x_shift, y_shift, stride = [jnp.asarray(a) for a in level_grids(hw, strides)]
    outputs = flatten_level_outputs(level_outs)
    outputs = jnp.concatenate(
        [outputs[..., :4], jax.nn.sigmoid(outputs[..., 4:])], axis=-1)
    return decode_outputs(outputs, x_shift, y_shift, stride)


def detector_loss(level_outs, labels, strides, num_classes, radius):
    hw = [o.shape[1:3] for o in level_outs]
    return compute_losses(level_outs, labels, hw, strides, num_classes, radius)


def rollout_memory_detector(model: MemoryEventDetector, variables, windows,
                            train: bool = False):
    """Run a MemoryEventDetector over a (T, N, H, W, C) window sequence with
    state carried through `lax.scan` — the functional form of the reference's
    time-dim iteration with recurrent memory (core/model.py:27-42). Returns
    the per-window raw head maps stacked over T."""
    import jax

    # prime carries with one apply (shapes depend on the backbone)
    carries, outs0 = model.apply(variables, None, windows[0], train)

    def step(carries, x):
        carries, outs = model.apply(variables, carries, x, train)
        return carries, outs

    carries, outs = jax.lax.scan(step, carries, windows[1:])
    # prepend the first window's outputs
    stacked = [jnp.concatenate([o0[None], rest], axis=0)
               for o0, rest in zip(outs0, outs)]
    return carries, stacked
