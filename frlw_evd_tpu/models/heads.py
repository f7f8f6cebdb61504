"""Anchor-free decoupled YOLOX head (reference: core/yolox/models/yolo_head.py).

Key deviations from stock YOLOX preserved from the reference:
  * box w/h decoded as square(pred)·stride, NOT exp (yolo_head.py:254, :272)
  * SimOTA center radius is a config knob (5 GEN1 / 2.5 GEN4)
  * losses: IoU(1-iou²)·5 + BCE(obj over all anchors) + BCE(cls at fg),
    normalised by total fg count (yolo_head.py:445-464)

The head returns raw per-level maps; `decode_level_outputs` / `compute_losses`
are pure functions so the trainer can jit/vmap them freely.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .assign import simota_assign
from .blocks import BaseConv, DWConv, get_activation
from .losses import bce_with_logits, iou_loss


class _ConvBNParams(nn.Module):
    """Declares one BaseConv-compatible tower layer's variables WITHOUT
    applying them (conv/kernel, bn/{scale,bias} + batch_stats bn/{mean,var})
    so a merged-layout apply can consume the canonical parameter tree."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self):
        k = _NamedConvParam(self.in_channels, self.out_channels,
                            name="conv")()
        bn = _NamedBNParam(self.out_channels, name="bn")()
        return {"kernel": k, **bn}


class _NamedConvParam(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, self.in_channels, self.out_channels))


class _NamedBNParam(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        f = self.features
        return {
            "scale": self.param("scale", nn.initializers.ones, (f,)),
            "bias": self.param("bias", nn.initializers.zeros, (f,)),
            "mean": self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros(f)),
            "var": self.variable("batch_stats", "var",
                                 lambda: jnp.ones(f)),
        }


def _merged_towers(head, k, x, train):
    """The cls and reg towers of head level k as TWO double-width convs.

    Layer 0: one dense 3x3 conv W→2W whose kernel is the output-channel
    concat of the canonical cls_convs_{k}_0 / reg_convs_{k}_0 kernels.
    Layer 1: one grouped (groups=2) 3x3 conv 2W→2W with the canonical
    layer-1 kernels as the two groups. BatchNorm is per-channel, so the
    concat of each branch's scale/bias/mean/var is exact. Same math and the
    IDENTICAL parameter tree as the separate towers — an MXU layout A/B,
    not a different model. Returns (cls_feat, reg_feat)."""
    from .quantize import maybe_merged_int8_conv

    W = head.width
    h = x
    for layer in (0, 1):
        leaves = [
            _ConvBNParams(W, W, name=f"{branch}_convs_{k}_{layer}",
                          parent=head)()
            for branch in ("cls", "reg")
        ]
        groups = 2 if layer == 1 else 1
        # int8 serving path (models/quantize.py): keyed by the canonical
        # per-branch conv paths so calibration scales are interchangeable
        # with the unmerged head. None ⇒ no int8 ctx / uncalibrated site.
        keys = ["/".join((*head.path, f"{b}_convs_{k}_{layer}", "conv"))
                for b in ("cls", "reg")]
        y32 = maybe_merged_int8_conv(h, [l["kernel"] for l in leaves],
                                     keys, groups)
        if y32 is None:
            kernel = jnp.concatenate([l["kernel"] for l in leaves], axis=-1)
            y = jax.lax.conv_general_dilated(
                h, kernel.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)
            y32 = y.astype(jnp.float32)
        momentum, eps = 0.9, 1e-5
        if train:
            m = jnp.mean(y32, axis=(0, 1, 2))
            v = jnp.var(y32, axis=(0, 1, 2))
            for i, l in enumerate(leaves):
                sl = slice(i * W, (i + 1) * W)
                l["mean"].value = (momentum * l["mean"].value
                                   + (1 - momentum) * m[sl])
                l["var"].value = (momentum * l["var"].value
                                  + (1 - momentum) * v[sl])
        else:
            m = jnp.concatenate([l["mean"].value for l in leaves])
            v = jnp.concatenate([l["var"].value for l in leaves])
        scale = jnp.concatenate([l["scale"] for l in leaves])
        bias = jnp.concatenate([l["bias"] for l in leaves])
        inv = jax.lax.rsqrt(v + eps) * scale
        y = ((y32 - m) * inv + bias).astype(h.dtype)
        h = get_activation(head.act)(y)
    return h[..., :W], h[..., W:]


class YOLOXHead(nn.Module):
    num_classes: int
    strides: Sequence[int] = (8, 16, 32)
    width: int = 256
    act: str = "silu"
    depthwise: bool = False
    prior_prob: float = 1e-2
    merged_branches: bool = False  # run cls+reg towers as 2 double-width
                                   # convs per level (identical math/params;
                                   # on-chip MXU layout A/B)

    @nn.compact
    def __call__(self, features, train: bool = False):
        """features: list of NHWC maps (pan_out2/1/0). Returns a list of
        (N, H, W, 4+1+C) raw maps ordered [reg, obj, cls]."""
        Conv = DWConv if self.depthwise else BaseConv
        bias_init = nn.initializers.constant(
            -float(np.log((1 - self.prior_prob) / self.prior_prob)))
        outs = []
        for k, x in enumerate(features):
            x = BaseConv(self.width, 1, 1, act=self.act,
                         name=f"stems_{k}")(x, train)
            if self.merged_branches and not self.depthwise:
                cls_feat, reg_feat = _merged_towers(self, k, x, train)
            else:
                cls_feat = Conv(self.width, 3, 1, act=self.act,
                                name=f"cls_convs_{k}_0")(x, train)
                cls_feat = Conv(self.width, 3, 1, act=self.act,
                                name=f"cls_convs_{k}_1")(cls_feat, train)
                reg_feat = Conv(self.width, 3, 1, act=self.act,
                                name=f"reg_convs_{k}_0")(x, train)
                reg_feat = Conv(self.width, 3, 1, act=self.act,
                                name=f"reg_convs_{k}_1")(reg_feat, train)
            cls_out = nn.Conv(self.num_classes, (1, 1), bias_init=bias_init,
                              name=f"cls_preds_{k}")(cls_feat)
            reg_out = nn.Conv(4, (1, 1), name=f"reg_preds_{k}")(reg_feat)
            obj_out = nn.Conv(1, (1, 1), bias_init=bias_init,
                              name=f"obj_preds_{k}")(reg_feat)
            outs.append(jnp.concatenate([reg_out, obj_out, cls_out], axis=-1))
        return outs


def level_grids(hw_per_level, strides):
    """Anchor metadata: x-index, y-index and stride per flattened anchor,
    concatenated over levels in (y, x) row-major order (matching the torch
    flatten order). Returns numpy arrays (A,) each."""
    xs, ys, ss = [], [], []
    for (h, w), s in zip(hw_per_level, strides):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xs.append(xx.reshape(-1))
        ys.append(yy.reshape(-1))
        ss.append(np.full(h * w, s))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(ys).astype(np.float32),
            np.concatenate(ss).astype(np.float32))


def flatten_level_outputs(level_outs):
    """[(N,H,W,ch)] → (N, A, ch) with per-level (y, x) row-major anchors."""
    flat = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in level_outs]
    return jnp.concatenate(flat, axis=1)


def decode_outputs(outputs, x_shift, y_shift, stride):
    """Decode raw (N, A, 4+1+C): xy = (pred+grid)·stride, wh = pred²·stride
    (yolo_head.py:252-254, :271-272). obj/cls left raw."""
    xy = (outputs[..., :2] + jnp.stack([x_shift, y_shift], -1)) * stride[:, None]
    wh = jnp.square(outputs[..., 2:4]) * stride[:, None]
    return jnp.concatenate([xy, wh, outputs[..., 4:]], axis=-1)


def compute_losses(level_outs, labels, hw_per_level, strides, num_classes,
                   radius):
    """Training loss over a batch (yolo_head.py:305-473).

    Args:
      level_outs: list of raw (N, H, W, 5+C) maps.
      labels: (N, G, 5) rows [class, cx, cy, w, h]; all-zero rows = padding.
    Returns dict of scalar losses.
    """
    x_shift, y_shift, stride = [jnp.asarray(a) for a in
                                level_grids(hw_per_level, strides)]
    outputs = flatten_level_outputs(level_outs)          # (N, A, 5+C)
    decoded = decode_outputs(outputs, x_shift, y_shift, stride)
    bbox_preds = decoded[..., :4]
    obj_logits = decoded[..., 4]
    cls_logits = decoded[..., 5:]

    gt_valid = labels.sum(-1) > 0                        # (N, G)
    gt_classes = labels[..., 0].astype(jnp.int32)
    gt_boxes = labels[..., 1:5]

    anchor_xc = (x_shift + 0.5) * stride
    anchor_yc = (y_shift + 0.5) * stride

    def assign_one(gb, gc, gv, bp, ol, cl):
        a = simota_assign(gb, gc, gv, bp, ol, cl, anchor_xc, anchor_yc,
                          stride, radius, num_classes=num_classes)
        return a

    assignment = jax.vmap(assign_one)(
        gt_boxes, gt_classes, gt_valid,
        jax.lax.stop_gradient(bbox_preds),
        jax.lax.stop_gradient(obj_logits),
        jax.lax.stop_gradient(cls_logits))

    fg = assignment.fg_mask                              # (N, A)
    num_fg = jnp.maximum(assignment.num_fg.sum(), 1.0)
    num_gts = jnp.maximum(assignment.num_gt.sum(), 1.0)

    # targets (stop-gradient through the assignment)
    reg_target = jnp.take_along_axis(
        gt_boxes, assignment.matched_gt[..., None].astype(jnp.int32), axis=1)
    cls_target = (jax.nn.one_hot(assignment.matched_cls, num_classes)
                  * assignment.pred_iou[..., None])
    obj_target = fg.astype(jnp.float32)

    fgf = fg.astype(jnp.float32)
    n, a = fgf.shape
    li = iou_loss(bbox_preds.reshape(-1, 4), reg_target.reshape(-1, 4))
    loss_iou = (li * fgf.reshape(-1)).sum() / num_fg
    loss_obj = bce_with_logits(obj_logits, obj_target).sum() / num_fg
    lc = bce_with_logits(cls_logits, cls_target).sum(-1)
    loss_cls = (lc * fgf).sum() / num_fg

    reg_weight = 5.0
    total = reg_weight * loss_iou + loss_obj + loss_cls
    return {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "obj_loss": loss_obj,
        "cls_loss": loss_cls,
        "num_fg_per_gt": num_fg / num_gts,
    }
