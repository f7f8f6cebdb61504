"""YOLOv3 detector family (reference: core/yolov3/).

Darknet-53 backbone (LeakyReLU convs, optional BFM stem consuming 4-D input —
backbone.py:42-101), conv-set FPN with align-corners bilinear upsample
(fpn.py:19-69), and the anchor-based head `YOLOv3Head2` (head.py:327-752):
9 COCO anchors, sigmoid-xy / exp-wh decode, GIoU-as-objectness target with the
MSE(pos 5x / neg 1x) + CE + (1-giou)·scale criterion (criterion.py:53-178).

TPU split: the data-dependent per-box gt assignment (tools.py:401-482) runs
host-side in numpy per batch (it is O(boxes), tiny); everything dense — decode,
GIoU, criterion — is jit-compiled with static shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import SpmdBatchNorm
from .stems import BinsFusionModule

# 9 COCO anchors, [w, h] per (scale, anchor) — head.py:19-21 ANCHOR_SIZE2
ANCHOR_SIZE2 = [[10, 13], [16, 30], [33, 23],
                [30, 61], [62, 45], [59, 119],
                [116, 90], [156, 198], [373, 326]]
STRIDES = (8, 16, 32)
IGNORE_THRESH = 0.5


class ConvBnLeaky(nn.Module):
    """Conv → BN → LeakyReLU(0.1) (backbone.py:12-22)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.out_channels, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=True,
                    name="conv")(x)
        x = SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return jax.nn.leaky_relu(x, 0.1)


class ResBlock(nn.Module):
    """nblocks × (1x1 halve → 3x3 restore → residual add) (backbone.py:25)."""

    channels: int
    nblocks: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.nblocks):
            y = ConvBnLeaky(self.channels // 2, 1, name=f"b{i}_conv1")(x, train)
            y = ConvBnLeaky(self.channels, 3, name=f"b{i}_conv2")(y, train)
            x = x + y
        return x


class DarkNet53(nn.Module):
    """Classic Darknet-53 (backbone.py:42); stem replaceable by the BFM which
    already downsamples 2x (backbone.py:53-62)."""

    use_bfm_stem: bool = False
    act: str = "silu"  # BFM stem activation when enabled

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_bfm_stem:
            c1 = BinsFusionModule(64, ksize=3, act=self.act,
                                  name="layer_1")(x, train)
        else:
            c1 = ConvBnLeaky(32, 3, name="l1_conv1")(x, train)
            c1 = ConvBnLeaky(64, 3, 2, name="l1_conv2")(c1, train)
            c1 = ResBlock(64, 1, name="l1_res")(c1, train)
        c2 = ConvBnLeaky(128, 3, 2, name="l2_conv")(c1, train)
        c2 = ResBlock(128, 2, name="l2_res")(c2, train)
        c3 = ConvBnLeaky(256, 3, 2, name="l3_conv")(c2, train)
        c3 = ResBlock(256, 8, name="l3_res")(c3, train)
        c4 = ConvBnLeaky(512, 3, 2, name="l4_conv")(c3, train)
        c4 = ResBlock(512, 8, name="l4_res")(c4, train)
        c5 = ConvBnLeaky(1024, 3, 2, name="l5_conv")(c4, train)
        c5 = ResBlock(1024, 4, name="l5_res")(c5, train)
        return (c3, c4, c5)


def upsample_bilinear_2x_aligned(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=True (torch F.interpolate in
    fpn.py:61). src coordinate = dst * (in-1)/(out-1)."""
    n, h, w, c = x.shape
    h2, w2 = h * 2, w * 2

    def axis_weights(n_in, n_out):
        pos = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1)) if n_out > 1 \
            else jnp.zeros(n_out)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = pos - lo
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, h2)
    xlo, xhi, xf = axis_weights(w, w2)
    top = x[:, ylo] * (1 - yf)[None, :, None, None] + \
        x[:, yhi] * yf[None, :, None, None]
    out = top[:, :, xlo] * (1 - xf)[None, None, :, None] + \
        top[:, :, xhi] * xf[None, None, :, None]
    return out


class _ConvSet5(nn.Module):
    """5 alternating 1x1/3x3 leaky convs (fpn.py:26-52)."""

    filters: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = ConvBnLeaky(f, 1, name="c0")(x, train)
        x = ConvBnLeaky(f * 2, 3, name="c1")(x, train)
        x = ConvBnLeaky(f, 1, name="c2")(x, train)
        x = ConvBnLeaky(f * 2, 3, name="c3")(x, train)
        x = ConvBnLeaky(f, 1, name="c4")(x, train)
        return x


class YOLOv3FPN(nn.Module):
    """conv-set + upsample-concat FPN (fpn.py:19-69)."""

    @nn.compact
    def __call__(self, features, train: bool = False):
        c3, c4, c5 = features
        p5 = _ConvSet5(512, name="conv_set_3")(c5, train)
        p5_up = upsample_bilinear_2x_aligned(
            ConvBnLeaky(256, 1, name="conv_1x1_3")(p5, train))
        p4 = jnp.concatenate([c4, p5_up], axis=-1)
        p4 = _ConvSet5(256, name="conv_set_2")(p4, train)
        p4_up = upsample_bilinear_2x_aligned(
            ConvBnLeaky(128, 1, name="conv_1x1_2")(p4, train))
        p3 = jnp.concatenate([c3, p4_up], axis=-1)
        p3 = _ConvSet5(128, name="conv_set_1")(p3, train)
        return p3, p4, p5


class YOLOv3Head(nn.Module):
    """Anchor-based head network (YOLOv3Head2, head.py:327-375): one 3x3 conv
    + 1x1 det conv per level; channel layout [KA obj | KA*C cls | KA*4 reg]."""

    num_classes: int
    num_anchors: int = 3
    prior_prob: float = 1e-2

    @nn.compact
    def __call__(self, features, train: bool = False):
        p3, p4, p5 = features
        KA, C = self.num_anchors, self.num_classes
        out_ch = KA * (1 + C + 4)
        p5 = ConvBnLeaky(1024, 3, name="head_conv_1")(p5, train)
        p4 = ConvBnLeaky(512, 3, name="head_conv_3")(p4, train)
        p3 = ConvBnLeaky(256, 3, name="head_conv_4")(p3, train)

        # objectness bias init to the focal prior for the first KA channels
        prior = -float(np.log((1 - self.prior_prob) / self.prior_prob))

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[:KA].set(prior)

        pred_s = nn.Conv(out_ch, (1, 1), bias_init=bias_init,
                         name="head_det_1")(p3)
        pred_m = nn.Conv(out_ch, (1, 1), bias_init=bias_init,
                         name="head_det_2")(p4)
        pred_l = nn.Conv(out_ch, (1, 1), bias_init=bias_init,
                         name="head_det_3")(p5)
        return pred_s, pred_m, pred_l


class YOLOv3Detector(nn.Module):
    """DarkNet-53 → FPN → anchor head; raw per-level maps out."""

    num_classes: int
    use_bfm_stem: bool = False
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = DarkNet53(self.use_bfm_stem, self.act, name="backbone")(x, train)
        feats = YOLOv3FPN(name="neck")(feats, train)
        return YOLOv3Head(self.num_classes, name="head")(feats, train)


# ---------------------------------------------------------------------------
# decode / losses (pure functions)
# ---------------------------------------------------------------------------

def split_level_outputs(preds, num_classes: int, num_anchors: int):
    """Raw (N, H, W, KA*(1+C+4)) maps → flattened per-anchor
    (obj (N, A, 1), cls (N, A, C), reg (N, HW, KA, 4)) lists concatenated over
    levels, matching the reference channel slicing (head.py:711-736)."""
    KA, C = num_anchors, num_classes
    objs, clss, regs = [], [], []
    for p in preds:
        n, h, w, _ = p.shape
        obj = p[..., :KA].reshape(n, -1, 1)
        cls = p[..., KA:KA * (1 + C)].reshape(n, -1, C)
        reg = p[..., KA * (1 + C):].reshape(n, h * w, KA, 4)
        objs.append(obj)
        clss.append(cls)
        regs.append(reg)
    return objs, clss, regs


def yolov3_grids(hw_per_level, strides, anchors):
    """Per-level (grid_xy (HW, 2), anchor_wh (KA, 2)) numpy arrays."""
    anchors = np.asarray(anchors, np.float32).reshape(len(strides), -1, 2)
    out = []
    for (h, w), s, aw in zip(hw_per_level, strides, anchors):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float32)
        out.append((grid, aw))
    return out


def decode_boxes(preds, num_classes: int, img_size: int,
                 num_anchors: int = 3, strides=STRIDES,
                 anchors=ANCHOR_SIZE2):
    """Raw maps → (obj (N, A, 1), cls (N, A, C), boxes_xyxy (N, A, 4)
    normalised by img_size) — head.py:718-739."""
    objs, clss, regs = split_level_outputs(preds, num_classes, num_anchors)
    hw = [(p.shape[1], p.shape[2]) for p in preds]
    grids = yolov3_grids(hw, strides, anchors)
    boxes = []
    for reg, (grid, aw), s in zip(regs, grids, strides):
        xy = (jax.nn.sigmoid(reg[..., :2]) + jnp.asarray(grid)[None, :, None, :]) * s
        wh = jnp.exp(reg[..., 2:]) * jnp.asarray(aw)[None, None, :, :]
        x1y1 = xy - wh * 0.5
        x2y2 = xy + wh * 0.5
        boxes.append(jnp.concatenate([x1y1, x2y2], -1).reshape(reg.shape[0], -1, 4))
    obj = jnp.concatenate(objs, 1)
    cls = jnp.concatenate(clss, 1)
    box = jnp.concatenate(boxes, 1) / img_size
    return obj, cls, box


def giou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU on aligned (..., 4) xyxy boxes (tools.py:239-270)."""
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    area_a = jnp.prod(a[..., 2:] - a[..., :2], -1)
    area_b = jnp.prod(b[..., 2:] - b[..., :2], -1)
    en = jnp.all(tl < br, -1).astype(a.dtype)
    area_i = jnp.prod(br - tl, -1) * en
    area_u = area_a + area_b - area_i
    iou = jnp.clip(area_i / (area_u + 1e-14), 0.0)
    ctl = jnp.minimum(a[..., :2], b[..., :2])
    cbr = jnp.maximum(a[..., 2:], b[..., 2:])
    cen = jnp.all(ctl < cbr, -1).astype(a.dtype)
    area_c = jnp.prod(cbr - ctl, -1) * cen
    giou = iou - (area_c - area_u) / jnp.maximum(area_c, 1e-14)
    return jnp.clip(giou, -1.0, 1.0)


def gt_creator(img_size: int, strides, labels: np.ndarray,
               anchor_size=ANCHOR_SIZE2, multi_anchor: bool = False) -> np.ndarray:
    """Host-side per-cell anchor assignment (tools.py:401-482). labels:
    (B, G, 5) rows [class, cx, cy, w, h] (zero = pad). Returns
    (B, A_total, 7): [obj, cls, x1, y1, x2, y2, scale] normalised.

    multi_anchor=True assigns every anchor with wh-IoU > 0.5 (falling back to
    the single best when none exceeds it — tools.py
    label_assignment_with_anchorbox:320-357)."""
    B = labels.shape[0]
    KA = len(anchor_size) // len(strides)
    anchors = np.asarray(anchor_size, np.float64)
    gt = [np.zeros((B, img_size // s, img_size // s, KA, 7)) for s in strides]

    for bi in range(B):
        for row in labels[bi]:
            if row.sum() == 0:
                continue
            cls_id = int(row[0])
            xc, yc, bw, bh = row[1:5]
            if bw < 1.0 or bh < 1.0:
                continue
            x1, y1 = (xc - bw / 2) / img_size, (yc - bh / 2) / img_size
            x2, y2 = (xc + bw / 2) / img_size, (yc + bh / 2) / img_size
            scale = 2.0 - (bw / img_size) * (bh / img_size)
            # anchor wh IoU centred at origin
            inter = np.minimum(anchors[:, 0], bw) * np.minimum(anchors[:, 1], bh)
            union = anchors[:, 0] * anchors[:, 1] + bw * bh - inter + 1e-20
            iou = inter / union
            if multi_anchor and (iou > 0.5).any():
                picks = np.nonzero(iou > 0.5)[0]
            else:
                picks = [int(np.argmax(iou))]
            for idx in picks:
                s_ind, a_ind = idx // KA, idx % KA
                s = strides[s_ind]
                gx, gy = int(xc / s), int(yc / s)
                if 0 <= gy < gt[s_ind].shape[1] and 0 <= gx < gt[s_ind].shape[2]:
                    gt[s_ind][bi, gy, gx, a_ind] = [1.0, cls_id, x1, y1, x2,
                                                    y2, scale]
    flat = [g.reshape(B, -1, 7) for g in gt]
    return np.concatenate(flat, axis=1).astype(np.float32)


def yolov3_loss(preds, gt_tensor: jnp.ndarray, num_classes: int,
                img_size: int):
    """Criterion (criterion.py:53-178) + GIoU objectness target
    (head.py:741-751). gt_tensor from `gt_creator`."""
    obj_pred, cls_pred, box_pred = decode_boxes(preds, num_classes, img_size)

    target_pos = gt_tensor[..., 0]
    target_cls = gt_tensor[..., 1].astype(jnp.int32)
    target_box = gt_tensor[..., 2:6]
    target_scale = gt_tensor[..., 6]

    giou = giou_xyxy(box_pred, target_box)                  # (B, A)
    target_obj = jax.lax.stop_gradient(0.5 * (giou + 1.0)) * target_pos

    B = obj_pred.shape[0]
    # objectness: MSE on sigmoid with pos 5x / neg 1x weighting
    obj_prob = jax.nn.sigmoid(obj_pred[..., 0])
    mse = jnp.square(obj_prob - target_obj)
    loss_obj = (mse * (target_pos * 5.0 + (1 - target_pos))).sum() / B

    # class: CE at positives
    logp = jax.nn.log_softmax(cls_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, target_cls[..., None], axis=-1)[..., 0]
    loss_cls = (ce * target_pos).sum() / B

    # regression: (1 - giou) · scale at positives
    loss_reg = ((1.0 - giou) * target_scale * target_pos).sum() / B

    total = loss_obj + loss_cls + loss_reg
    return {"total_loss": total, "obj_loss": loss_obj, "cls_loss": loss_cls,
            "iou_loss": loss_reg}


def yolov3_eval_decode(preds, num_classes: int, img_size: int):
    """Eval path → (N, A, 5+C) rows [cx, cy, w, h, obj*<max later>, cls...]
    compatible with models.postprocess (conf 0.3 / NMS 0.5 per head.py:333-334).

    Scores follow the reference: sigmoid(obj) * softmax(cls); boxes are
    clamped to the frame then converted to cxcywh in pixels."""
    obj, cls, box = decode_boxes(preds, num_classes, img_size)
    box = jnp.clip(box, 0.0, 1.0) * img_size
    cx = (box[..., 0] + box[..., 2]) / 2
    cy = (box[..., 1] + box[..., 3]) / 2
    w = box[..., 2] - box[..., 0]
    h = box[..., 3] - box[..., 1]
    scores = jax.nn.sigmoid(obj[..., 0:1]) * jax.nn.softmax(cls, axis=-1)
    conf = jnp.max(scores, axis=-1, keepdims=True)
    cls_probs = scores / jnp.maximum(conf, 1e-12)  # argmax preserved
    return jnp.concatenate(
        [jnp.stack([cx, cy, w, h], -1), conf, cls_probs], axis=-1)
