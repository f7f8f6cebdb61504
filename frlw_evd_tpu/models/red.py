"""RED: recurrent event detector (Perot et al. architecture; reference:
core/RED/ — complete but unwired there, wired here as exp family `red`).

SE-ResNet backbone (7x7 stem + 3 SE-bottlenecks, strides 2,2,2,2) → 5 stacked
stride-2 ConvLSTM cells producing the SSD pyramid → SSD box head (priors,
variance-coded locations, hard-negative-mined focal/smooth-L1 MultiBox loss,
per-class NMS top-15 post-processing).

All dense math is jitted with fixed shapes; the prior assignment
(box_utils.assign_priors) is vectorised (the reference's per-target loop
becomes a scatter).
"""

from __future__ import annotations

import math
from itertools import product
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import SpmdBatchNorm

from .memory import ConvLSTMCell

CENTER_VARIANCE = 0.1
SIZE_VARIANCE = 0.2
IOU_THRESHOLD = 0.5
NEG_POS_RATIO = 3
CONFIDENCE_THRESHOLD = 0.01
NMS_THRESHOLD = 0.45
TOPK = 15


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------

class SEBottleneck(nn.Module):
    """3x conv-bn(-relu) + SE gate + 1x1 downsample residual
    (RED/backbone.py:6-58)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn(h, ch, ksize, stride, name):
            pad = (ksize - 1) // 2
            h = nn.Conv(ch, (ksize, ksize), strides=(stride, stride),
                        padding=[(pad, pad), (pad, pad)], use_bias=False,
                        name=f"{name}_conv")(h)
            return SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=f"{name}_bn")(h)

        out = jax.nn.relu(conv_bn(x, self.planes, 3, 1, "c1"))
        out = jax.nn.relu(conv_bn(out, self.planes, 3, self.stride, "c2"))
        out = conv_bn(out, self.planes, 3, 1, "c3")

        se = jnp.mean(out, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.planes // 4, (1, 1), use_bias=False,
                     name="conv_down")(se)
        se = jax.nn.relu(se)
        se = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv_up")(se)
        se = jax.nn.sigmoid(se)

        residual = conv_bn(x, self.planes, 1, self.stride, "down")
        return se * out + residual


class SEResNet(nn.Module):
    """7x7/2 stem + 3 SE bottlenecks (RED/backbone.py:61-91)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = SpmdBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = jax.nn.relu(x)
        x = SEBottleneck(64, 2, name="layer1")(x, train)
        x = SEBottleneck(64, 2, name="layer2")(x, train)
        x = SEBottleneck(128, 2, name="layer3")(x, train)
        return x


class MemoryLayers(nn.Module):
    """5 stacked stride-2 ConvLSTMs → SSD pyramid (RED/backbone.py:93-121)."""

    hidden: int = 256

    def setup(self):
        self.cells = [ConvLSTMCell(self.hidden, 3, 2, name=f"lstms_{i}")
                      for i in range(5)]

    def __call__(self, carries, x):
        outputs = []
        new_carries = []
        for cell, carry in zip(self.cells, carries):
            carry, x = cell(carry, x)
            new_carries.append(carry)
            outputs.append(x)
        return tuple(new_carries), outputs

    def init_carries(self, n, h, w, dtype=jnp.float32):
        out = []
        hh, ww = h, w
        for cell in self.cells:
            hh = (hh + 1) // 2
            ww = (ww + 1) // 2
            out.append((jnp.zeros((n, hh, ww, self.hidden), dtype),
                        jnp.zeros((n, hh, ww, self.hidden), dtype)))
        return tuple(out)


class SSDBoxPredictor(nn.Module):
    """Per-level 3x3 cls/reg heads (RED/ssd/box_head/box_predictor.py)."""

    num_classes: int  # including background
    boxes_per_location: Sequence[int] = (6, 6, 6, 4, 4)

    @nn.compact
    def __call__(self, features):
        cls_logits, bbox_pred = [], []
        for k, (feat, bpl) in enumerate(zip(features, self.boxes_per_location)):
            c = nn.Conv(bpl * self.num_classes, (3, 3),
                        padding=[(1, 1), (1, 1)], name=f"cls_{k}")(feat)
            r = nn.Conv(bpl * 4, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"reg_{k}")(feat)
            n = feat.shape[0]
            cls_logits.append(c.reshape(n, -1, self.num_classes))
            bbox_pred.append(r.reshape(n, -1, 4))
        return (jnp.concatenate(cls_logits, 1), jnp.concatenate(bbox_pred, 1))


class REDDetector(nn.Module):
    """SEResNet → MemoryLayers → SSD predictor. Single window step; thread
    `carries` across windows (None to start)."""

    num_classes: int  # foreground classes

    def setup(self):
        self.backbone = SEResNet()
        self.memory = MemoryLayers()
        self.predictor = SSDBoxPredictor(self.num_classes + 1)

    def __call__(self, carries, x, train: bool = False):
        feat = self.backbone(x, train)
        carries, pyramid = self.memory(carries, feat)
        cls_logits, bbox_pred = self.predictor(pyramid)
        return carries, (cls_logits, bbox_pred)

    def init_carries(self, n, h, w, dtype=jnp.float32):
        # backbone downsamples 16x; each of the 5 ConvLSTMs halves again
        # (static shape math — usable outside apply)
        hh, ww = (h + 15) // 16, (w + 15) // 16
        out = []
        for _ in range(5):
            hh, ww = (hh + 1) // 2, (ww + 1) // 2
            out.append((jnp.zeros((n, hh, ww, 256), dtype),
                        jnp.zeros((n, hh, ww, 256), dtype)))
        return tuple(out)


# ---------------------------------------------------------------------------
# priors / coding (RED/ssd/anchors/prior_box.py, utils/box_utils.py)
# ---------------------------------------------------------------------------

def pyramid_shapes(height: int, width: int):
    """Actual (fy, fx) sizes of the 5 ConvLSTM pyramid levels."""
    hh, ww = (height + 15) // 16, (width + 15) // 16
    out = []
    for _ in range(5):
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
        out.append((hh, ww))
    return out


def build_priors(height: int, width: int) -> np.ndarray:
    """SSD priors in center form, relative coordinates, clipped to [0, 1].

    Deviation from the reference PriorBox (which is unwired there): its
    hard-coded stride table disagrees with the sizes the ConvLSTM pyramid
    actually produces (e.g. a zero-height 5th map at H=256), so prior grids
    here are derived from the real feature-map shapes; sizes/aspect ratios
    keep the reference recipe.
    """
    maps = pyramid_shapes(height, width)
    fy = [m[0] for m in maps]
    fx = [m[1] for m in maps]
    expand = height / 256
    min_sizes = [s * expand for s in (10, 62, 114, 166, 218)]
    max_sizes = [s * expand for s in (62, 114, 166, 218, 270)]
    aspect_ratios = [[2, 3], [2, 3], [2, 3], [2], [2]]

    priors = []
    for k, (f_x, f_y) in enumerate(zip(fx, fy)):
        scale_x = f_x
        scale_y = f_y
        for i, j in product(range(f_y), range(f_x)):
            cx = (j + 0.5) / scale_x
            cy = (i + 0.5) / scale_y
            size = min_sizes[k]
            priors.append([cx, cy, size / width, size / height])
            size = math.sqrt(min_sizes[k] * max_sizes[k])
            priors.append([cx, cy, size / width, size / height])
            size = min_sizes[k]
            w, h = size / width, size / height
            for ratio in aspect_ratios[k]:
                r = math.sqrt(ratio)
                priors.append([cx, cy, w * r, h / r])
                priors.append([cx, cy, w / r, h * r])
    return np.clip(np.array(priors, np.float32), 0.0, 1.0)


def center_to_corner(b):
    return jnp.concatenate([b[..., :2] - b[..., 2:] / 2,
                            b[..., :2] + b[..., 2:] / 2], -1)


def corner_to_center(b):
    return jnp.concatenate([(b[..., :2] + b[..., 2:]) / 2,
                            b[..., 2:] - b[..., :2]], -1)


def locations_to_boxes(locations, priors):
    """Variance decoding (box_utils.convert_locations_to_boxes)."""
    return jnp.concatenate([
        locations[..., :2] * CENTER_VARIANCE * priors[..., 2:] + priors[..., :2],
        jnp.exp(locations[..., 2:] * SIZE_VARIANCE) * priors[..., 2:],
    ], -1)


def boxes_to_locations(boxes, priors):
    return jnp.concatenate([
        (boxes[..., :2] - priors[..., :2]) / priors[..., 2:] / CENTER_VARIANCE,
        jnp.log(jnp.maximum(boxes[..., 2:] / priors[..., 2:], 1e-8))
        / SIZE_VARIANCE,
    ], -1)


def iou_corner(a, b):
    """(..., 4) corner-form IoU with broadcast (box_utils.iou_of)."""
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: jnp.maximum(x[..., 2] - x[..., 0], 0) * \
        jnp.maximum(x[..., 3] - x[..., 1], 0)
    return inter / (area(a) + area(b) - inter + 1e-5)


def assign_priors(gt_corner, gt_labels, gt_valid, priors_corner):
    """Vectorised prior assignment (box_utils.assign_priors).

    Args: gt_corner (G, 4) relative corner boxes, gt_labels (G,) 1-based
    (0 = background), gt_valid (G,) bool, priors_corner (P, 4).
    Returns (boxes (P, 4) corner, labels (P,) int32)."""
    ious = iou_corner(gt_corner[None, :, :], priors_corner[:, None, :])  # (P, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    best_target_per_prior = ious.max(1)
    best_target_idx = ious.argmax(1)
    best_prior_per_target_idx = ious.argmax(0)                           # (G,)
    # force each valid target onto its best prior
    g_idx = jnp.arange(gt_corner.shape[0])
    safe_prior = jnp.where(gt_valid, best_prior_per_target_idx, 2**30)
    best_target_idx = best_target_idx.at[safe_prior].set(g_idx, mode="drop")
    best_target_per_prior = best_target_per_prior.at[safe_prior].set(
        2.0, mode="drop")
    labels = gt_labels[best_target_idx]
    labels = jnp.where(best_target_per_prior < IOU_THRESHOLD, 0, labels)
    boxes = gt_corner[best_target_idx]
    return boxes, labels.astype(jnp.int32)


def hard_negative_mining(loss, labels, neg_pos_ratio):
    """(N, P) background-loss ranks → keep mask (box_utils:105-134)."""
    pos_mask = labels > 0
    num_pos = pos_mask.sum(axis=1, keepdims=True)
    num_neg = num_pos * neg_pos_ratio
    loss = jnp.where(pos_mask, -jnp.inf, loss)
    order = jnp.argsort(-loss, axis=1)
    ranks = jnp.argsort(order, axis=1)
    neg_mask = ranks < num_neg
    return pos_mask | neg_mask


def multibox_loss(cls_logits, bbox_pred, labels, gt_locations,
                  gamma: float = 2.0):
    """Hard-negative-mined focal classification + smooth-L1 regression
    (RED/ssd/box_head/loss.py). labels (N, P) int32 (0 = bg)."""
    # mining mask from background log-softmax loss
    bg_loss = -jax.nn.log_softmax(cls_logits, axis=2)[:, :, 0]
    mask = hard_negative_mining(bg_loss, labels, NEG_POS_RATIO)

    probs = jax.nn.softmax(cls_logits, axis=-1)
    p_t = jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
    log_p = jnp.log(jnp.maximum(p_t, 1e-12))
    focal = -jnp.power(1.0 - p_t, gamma) * log_p
    n_mined = jnp.maximum(mask.sum(), 1)
    cls_loss = (focal * mask).sum() / n_mined  # size_average over mined set

    pos = labels > 0
    diff = bbox_pred - gt_locations
    abs_diff = jnp.abs(diff)
    smooth_l1 = jnp.where(abs_diff < 1.0, 0.5 * diff**2, abs_diff - 0.5).sum(-1)
    num_pos = jnp.maximum(pos.sum(), 1)
    reg_loss = (smooth_l1 * pos).sum() / num_pos
    cls_loss = cls_loss * n_mined / num_pos  # reference divides both by n_pos
    return reg_loss, cls_loss


def red_loss(cls_logits, bbox_pred, labels_batch, height, width, priors):
    """Full training loss from padded eval-style labels (N, G, 5)
    [class, cx, cy, w, h] in pixels."""
    priors_c = jnp.asarray(priors)
    priors_corner = center_to_corner(priors_c)

    def prep(labels):
        valid = labels.sum(-1) > 0
        boxes = labels[:, 1:5] / jnp.array([width, height, width, height])
        corner = center_to_corner(boxes)
        cls = labels[:, 0].astype(jnp.int32) + 1  # 1-based; 0 = bg
        gt_boxes, gt_labels = assign_priors(corner, cls, valid, priors_corner)
        locations = boxes_to_locations(corner_to_center(gt_boxes), priors_c)
        return locations, gt_labels

    locations, labels = jax.vmap(prep)(labels_batch)
    reg_loss, cls_loss = multibox_loss(cls_logits, bbox_pred, labels, locations)
    return {"total_loss": reg_loss + cls_loss, "iou_loss": reg_loss,
            "cls_loss": cls_loss}


def red_eval_decode(cls_logits, bbox_pred, priors, height, width):
    """→ (N, A, 5+C) rows compatible with models.postprocess, where A = P
    (per-prior, class-max) and boxes are cxcywh in pixels. conf threshold
    0.01 / NMS 0.45 / top-15 applied by the caller."""
    priors_c = jnp.asarray(priors)
    scores = jax.nn.softmax(cls_logits, axis=2)[..., 1:]   # drop background
    boxes = locations_to_boxes(bbox_pred, priors_c[None])
    scale = jnp.array([width, height, width, height])
    boxes = boxes * scale
    conf = scores.max(-1, keepdims=True)
    cls_probs = scores / jnp.maximum(conf, 1e-12)
    return jnp.concatenate([boxes, conf, cls_probs], axis=-1)
