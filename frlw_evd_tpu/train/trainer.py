"""Trainer: jitted train/eval steps over a device mesh + the epoch loop.

Mirrors the reference runtime (core/exp.py:212-350): Adam + yoloxwarmcos
per-iteration LR, per-epoch validation with best-mAP checkpoint selection,
resume from last_epoch. TPU-native differences: one jitted train step with the
batch sharded over the `data` mesh axis (XLA inserts the gradient all-reduce;
no DDP), BatchNorm stats updated inside the step, bfloat16 activations
optional.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data import Loader, PropheseeDataset, PropheseeTafDataset
from ..evaluate import Evaluator, Recorder
from ..models import build_detector
from ..models.detector import detector_loss, eval_decode
from ..models.postprocess import finalize_detections, postprocess_batch
from ..parallel.mesh import make_data_mesh, make_mesh, shard_batch
from .checkpoints import (load_checkpoint, save_checkpoint,
                          save_part_checkpoints, wait_for_checkpoints)
from .config import ExpConfig
from .schedule import yolox_warm_cos_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, rng, sample_input, tx) -> TrainState:
    variables = jax.jit(model.init, static_argnums=(2,))(rng, sample_input, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _compute_params(params, half_precision):
    """bf16 compute copies of the f32 master weights (TPU mixed precision).

    The cast sits INSIDE the differentiated function, so grads flow back to
    (and the optimizer updates) the f32 masters while every conv/matmul runs
    on the MXU in bfloat16 and every activation is stored/streamed as bf16.
    Casting only the inputs is not enough: f32 params promote the whole
    network back to f32 (measured on v5e, gen1 train fwd 48.5 → 37.2 ms at
    batch 64). Non-f32 leaves (e.g. int tables) pass through untouched.
    """
    if not half_precision:
        return params
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)


def make_yolov3_train_step(num_classes, img_size, half_precision=False):
    """YOLOv3 family: the anchor gt tensor is computed host-side per batch
    (models/yolov3.gt_creator) and passed in."""
    from ..models.yolov3 import yolov3_loss

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs, gt_tensor, dropout_rng):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)

        def loss_fn(params):
            params = _compute_params(params, half_precision)
            outs, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            outs = [o.astype(jnp.float32) for o in outs]
            losses = yolov3_loss(outs, gt_tensor, num_classes, img_size)
            return losses["total_loss"], (losses, updates["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, losses

    return train_step


def make_yolov3_eval_step(num_classes, img_size, max_detections=200,
                          half_precision=False):
    from ..models.yolov3 import yolov3_eval_decode

    @jax.jit
    def eval_step(state: TrainState, imgs):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)
        outs = state.apply_fn(
            {"params": _compute_params(state.params, half_precision),
             "batch_stats": state.batch_stats},
            imgs, False)
        outs = [o.astype(jnp.float32) for o in outs]
        decoded = yolov3_eval_decode(outs, num_classes, img_size)
        return postprocess_batch(decoded, conf_threshold=0.3,
                                 nms_threshold=0.5,
                                 max_detections=max_detections)

    return eval_step


def make_red_train_step(num_classes, height, width, priors,
                        half_precision=False):
    """RED family: SSD multibox loss; fresh ConvLSTM carries per batch
    (train_memory_steps=1, matching the reference's single-window training)."""
    from ..models.red import red_loss

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs, labels, dropout_rng):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)
        B = imgs.shape[0]

        def loss_fn(params):
            params = _compute_params(params, half_precision)
            model = state.apply_fn.__self__
            carries = model.init_carries(B, height, width)
            (carries, (cls_logits, bbox_pred)), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                carries, imgs, True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            cls_logits = cls_logits.astype(jnp.float32)
            bbox_pred = bbox_pred.astype(jnp.float32)
            losses = red_loss(cls_logits, bbox_pred, labels, height, width,
                              priors)
            return losses["total_loss"], (losses, updates["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), losses

    return train_step


def make_red_eval_step(num_classes, height, width, priors,
                       half_precision=False):
    from ..models.red import red_eval_decode

    @jax.jit
    def eval_step(state: TrainState, imgs):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)
        B = imgs.shape[0]
        model = state.apply_fn.__self__
        carries = model.init_carries(B, height, width)
        carries, (cls_logits, bbox_pred) = state.apply_fn(
            {"params": _compute_params(state.params, half_precision),
             "batch_stats": state.batch_stats},
            carries, imgs, False)
        decoded = red_eval_decode(cls_logits.astype(jnp.float32),
                                  bbox_pred.astype(jnp.float32), priors,
                                  height, width)
        return postprocess_batch(decoded, conf_threshold=0.01,
                                 nms_threshold=0.45, max_detections=15)

    return eval_step


def make_memory_train_step(strides, num_classes, radius,
                           half_precision=False):
    """ConvLSTM/ConvGRU memory exp types: fresh carries per batch
    (train_memory_steps=1, reference core/exp.py:482-488 + settings.py:45)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs, labels, dropout_rng):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)

        def loss_fn(params):
            params = _compute_params(params, half_precision)
            (carries, outs), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                None, imgs, True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            outs = [o.astype(jnp.float32) for o in outs]
            losses = detector_loss(outs, labels, strides, num_classes, radius)
            return losses["total_loss"], (losses, updates["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), losses

    return train_step


def make_memory_eval_step(strides, max_detections=200, half_precision=False):
    @jax.jit
    def eval_step(state: TrainState, imgs):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)
        carries, outs = state.apply_fn(
            {"params": _compute_params(state.params, half_precision),
             "batch_stats": state.batch_stats},
            None, imgs, False)
        outs = [o.astype(jnp.float32) for o in outs]
        decoded = eval_decode(outs, strides)
        return postprocess_batch(decoded, max_detections=max_detections)

    return eval_step


def make_train_step(strides, num_classes, radius, half_precision=False,
                    remat=False, patchify=False, remat_policy=None):
    """Returns a jitted (state, imgs, labels, dropout_rng) → (state, metrics).

    Under a mesh with the batch sharded over `data`, jit/GSPMD adds the
    gradient all-reduce automatically (params replicated). remat=True
    rematerialises the forward pass in the backward (jax.checkpoint),
    trading recompute FLOPs for activation memory on a fixed HBM budget
    (verified numerically identical to the plain step on v5e).

    patchify=True space-to-depths the (B, H, W, C) volume to
    (B, H/2, W/2, 4C) once at the top of the step and expects a model built
    with a `*_p64` stem (identical parameter tree): the full-resolution
    C-minor tensors — 12.5% TPU lane occupancy for TAF K=8 — never exist in
    the forward OR backward pass. Same math as the canonical stem
    (tests/test_train_p64.py proves loss+grad parity)."""
    from ..models.blocks import space_to_depth_patches

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs, labels, dropout_rng):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)
        if patchify:
            imgs = space_to_depth_patches(imgs)

        def forward(params):
            params = _compute_params(params, half_precision)
            outs, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            return [o.astype(jnp.float32) for o in outs], updates
        if remat:
            # remat_policy 'dots' keeps every matmul/conv output resident
            # and recomputes only the elementwise chains in the backward —
            # a fraction of full remat's recompute on a conv net while
            # still dropping the big activation copies
            policy = (jax.checkpoint_policies.checkpoint_dots
                      if remat_policy == "dots" else None)
            forward = jax.checkpoint(forward, policy=policy)

        def loss_fn(params):
            outs, updates = forward(params)
            losses = detector_loss(outs, labels, strides, num_classes, radius)
            return losses["total_loss"], (losses, updates["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, losses

    return train_step


def make_eval_step(strides, max_detections=200, half_precision=False,
                   patchify=False, quant=None):
    """Returns a jitted (state, imgs) → (dets, keep) inference step
    (decode + confidence gate + NMS fused on device). `quant` is an
    optional (act_scales, weight_table) pair from models/quantize.py —
    the calibrated conv sites then serve through int8 MXU ops."""
    from ..models.blocks import space_to_depth_patches
    from ..models.quantize import int8_ctx

    @jax.jit
    def eval_step(state: TrainState, imgs):
        if half_precision:
            imgs = imgs.astype(jnp.bfloat16)
        if patchify:
            imgs = space_to_depth_patches(imgs)
        with int8_ctx(*(quant or (None, None))):
            outs = state.apply_fn(
                {"params": _compute_params(state.params, half_precision),
                 "batch_stats": state.batch_stats},
                imgs, False)
        outs = [o.astype(jnp.float32) for o in outs]
        decoded = eval_decode(outs, strides)
        return postprocess_batch(decoded, max_detections=max_detections)

    return eval_step


class Trainer:
    """End-to-end experiment runner (reference basicExp)."""

    def __init__(self, cfg: ExpConfig, mesh=None):
        self.cfg = cfg
        if cfg.patchified and (cfg.family in ("red", "yolov3") or cfg.memory):
            raise ValueError(
                "patchified=True is only wired for the single-window "
                "aed/yolox families (p64 stems)")
        self.mesh = mesh if mesh is not None else make_data_mesh(
            cfg.batch_size, cfg.data_axis)
        if cfg.family == "yolov3":
            from ..models.yolov3 import YOLOv3Detector

            self.model = YOLOv3Detector(cfg.num_classes,
                                        use_bfm_stem=(cfg.stem == "bfm"),
                                        act=cfg.act)
        elif cfg.family == "red":
            from ..models.red import REDDetector

            self.model = REDDetector(cfg.num_classes)
        elif cfg.memory:
            from ..models.detector import MemoryEventDetector, _STEMS
            from ..models.darknet import Darknet
            from ..models.heads import YOLOXHead
            from ..models.memory import MemoryModel
            from ..models.pafpn import YOLOPAFPN

            self.model = MemoryEventDetector(
                backbone=Darknet(depth=21, stem=_STEMS[cfg.stem],
                                 out_channels=tuple(cfg.in_channels),
                                 act=cfg.act),
                memory=MemoryModel(
                    cell_type=cfg.memory, hidden_dims=tuple(cfg.in_channels),
                    act="relu"),
                neck=YOLOPAFPN(depth=cfg.depth,
                               in_channels=tuple(cfg.in_channels),
                               act=cfg.act),
                head=YOLOXHead(num_classes=cfg.num_classes,
                               strides=tuple(cfg.strides), act=cfg.act))
        else:
            stem = cfg.stem
            if cfg.patchified:
                patched = {"bfm": "bfm_p64", "focus": "focus_p64"}
                if stem not in patched:
                    raise ValueError(
                        f"patchified=True has no p64 variant of stem {stem!r}")
                stem = patched[stem]
            self.model = build_detector(
                cfg.num_classes, family=cfg.family, stem=stem,
                act=cfg.act, strides=cfg.strides,
                in_channels=cfg.in_channels, depth=cfg.depth)
        self.exp_dir = os.path.join(
            cfg.log_path, cfg.exp_name or cfg.resume_exp or cfg.exp_type)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        # -1 (not the reference's 0.0) so the first validation always writes
        # best_epoch and test-time loading never finds the file missing
        self.max_score = -1.0
        self.epoch = 0
        self.tb_writer = None

    # -- data --------------------------------------------------------------
    def _make_dataset(self, mode: str, augment: bool):
        cfg = self.cfg
        # sensor_hw_override must reach the dataset: labels are rescaled
        # sensor→input inside it, and the hard-coded per-dataset geometry
        # would silently mis-scale every box on non-standard sensors
        sensor = cfg.sensor_hw_override
        if cfg.uses_taf_dataset:
            return PropheseeTafDataset(
                cfg.bbox_path, cfg.data_path, cfg.dataset, cfg.img_size,
                cfg.img_size, cfg.infer_time, cfg.event_volume_bins, mode,
                augment, cfg.clipping, seed=cfg.seed, sensor_hw=sensor)
        return PropheseeDataset(
            cfg.bbox_path, cfg.data_path, cfg.dataset, cfg.img_size,
            cfg.img_size, cfg.event_volume_bins, cfg.infer_time, mode,
            augment, cfg.clipping, seed=cfg.seed, sensor_hw=sensor)

    def create_datasets(self):
        cfg = self.cfg
        self.train_dataset = self._make_dataset("train", cfg.augmentation)
        self.val_dataset = self._make_dataset("val", False)
        self.train_loader = Loader(self.train_dataset, cfg.batch_size,
                                   cfg.num_workers, shuffle=True,
                                   drop_last=True, seed=cfg.seed)
        self.val_loader = Loader(self.val_dataset, cfg.batch_size,
                                 cfg.num_workers, shuffle=False,
                                 drop_last=False)
        self.object_classes = self.train_dataset.object_classes

    def create_test_dataset(self):
        self.val_dataset = self._make_dataset("test", False)
        self.val_loader = Loader(self.val_dataset, self.cfg.batch_size,
                                 self.cfg.num_workers, shuffle=False,
                                 drop_last=False)
        self.object_classes = self.val_dataset.object_classes

    # -- setup -------------------------------------------------------------
    def build(self, iters_per_epoch: int):
        cfg = self.cfg
        schedule = yolox_warm_cos_schedule(
            cfg.init_lr, cfg.min_lr_ratio,
            cfg.max_epoch * max(iters_per_epoch, 1),
            cfg.warmup_epochs * max(iters_per_epoch, 1), cfg.warmup_lr)
        self.schedule = schedule
        tx = optax.adam(schedule)
        h, w = cfg.img_size
        sample = jnp.zeros((1, h, w, cfg.input_channels), jnp.float32)
        if cfg.patchified:
            from ..models.blocks import space_to_depth_patches

            sample = space_to_depth_patches(sample)
        if cfg.family == "red" or cfg.memory:
            carries = (self.model.init_carries(1, h, w)
                       if cfg.family == "red" else None)
            variables = jax.jit(self.model.init, static_argnums=(3,))(
                jax.random.key(cfg.seed), carries, sample, False)
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=tx.init(variables["params"]),
                tx=tx, apply_fn=self.model.apply)
        else:
            self.state = create_train_state(
                self.model, jax.random.key(cfg.seed), sample, tx)
        if cfg.family == "yolov3":
            self.train_step = make_yolov3_train_step(
                cfg.num_classes, cfg.img_size[0], cfg.half_precision)
            self.eval_step = make_yolov3_eval_step(
                cfg.num_classes, cfg.img_size[0],
                half_precision=cfg.half_precision)
        elif cfg.family == "red":
            from ..models.red import build_priors

            h, w = cfg.img_size
            priors = build_priors(h, w)
            self.train_step = make_red_train_step(
                cfg.num_classes, h, w, priors, cfg.half_precision)
            self.eval_step = make_red_eval_step(
                cfg.num_classes, h, w, priors,
                half_precision=cfg.half_precision)
        elif cfg.memory:
            self.train_step = make_memory_train_step(
                cfg.strides, cfg.num_classes, cfg.center_radius,
                cfg.half_precision)
            self.eval_step = make_memory_eval_step(
                cfg.strides, half_precision=cfg.half_precision)
        else:
            self.train_step = make_train_step(cfg.strides, cfg.num_classes,
                                              cfg.center_radius,
                                              cfg.half_precision,
                                              remat=cfg.remat,
                                              patchify=cfg.patchified)
            self.eval_step = make_eval_step(cfg.strides,
                                            half_precision=cfg.half_precision,
                                            patchify=cfg.patchified)
        self.dropout_rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
        if cfg.use_ema:
            from .ema import ema_init, ema_update

            self.ema_params = ema_init(self.state.params)
            self._ema_step = jax.jit(ema_update)
        else:
            self.ema_params = None
        n_params = sum(p.size for p in jax.tree.leaves(self.state.params))
        print(f"{n_params:,} total parameters.")

    # -- loops -------------------------------------------------------------
    def _prefetched_batches(self, lookahead: int = 2):
        """Device transfers dispatched `lookahead` batches ahead of the
        consuming step (jax device_put is async, so the host→HBM copy of
        batch i+1 overlaps step i's compute)."""
        import collections

        is_v3 = self.cfg.family == "yolov3"
        if is_v3:
            from ..models.yolov3 import gt_creator

        def put(item):
            imgs, labels, names, tss = item
            if is_v3:
                labels = gt_creator(self.cfg.img_size[0], self.cfg.strides,
                                    labels)
            return shard_batch(self.mesh,
                               (jnp.asarray(imgs), jnp.asarray(labels)),
                               self.cfg.data_axis)

        queue = collections.deque()
        for item in self.train_loader:
            queue.append(put(item))
            if len(queue) >= lookahead:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def train_epoch(self):
        losses_acc = []
        for batch in self._prefetched_batches():
            self.dropout_rng, step_rng = jax.random.split(self.dropout_rng)
            self.state, losses = self.train_step(self.state, batch[0],
                                                 batch[1], step_rng)
            if self.ema_params is not None:
                self.ema_params = self._ema_step(
                    self.ema_params, self.state.params, self.state.step)
            losses_acc.append(losses)
        if losses_acc:
            mean = {k: float(np.mean([float(l[k]) for l in losses_acc]))
                    for k in losses_acc[0]}
            lr = float(self.schedule(self.state.step - 1))
            print(f"Epoch {self.epoch}: " +
                  ", ".join(f"{k}={v:.4f}" for k, v in mean.items()) +
                  f", lr={lr:.6f}")
            return mean
        return {}

    def eval_epoch(self, evaluator: Evaluator):
        cfg = self.cfg
        seq_state = None
        seq_stream = None
        if cfg.seq_nms:
            from ..models.seq_nms import SeqNMSState

            seq_state = SeqNMSState()
        # evaluate the EMA weights when enabled (ModelEMA semantics)
        eval_state = (self.state.replace(params=self.ema_params)
                      if self.ema_params is not None else self.state)
        for imgs, labels, names, tss in self.val_loader:
            start = time.time()
            dets, keep = self.eval_step(eval_state, jnp.asarray(imgs))
            jax.block_until_ready(dets)
            infer_time = time.time() - start
            outputs = finalize_detections(dets, keep)
            if seq_state is not None:
                # link detections across consecutive windows of each stream
                # (yolo_head.py:283-300; val samples arrive in stream order)
                linked = []
                for out, name in zip(outputs, names):
                    if name != seq_stream:
                        seq_state.clean()
                        seq_stream = name
                    linked.append(seq_state.link(out))
                outputs = linked
            evaluator.add_result(outputs, list(tss), labels, names,
                                 infer_time, 0.0)
        return evaluator.evaluate()

    def make_evaluator(self, recorder=None) -> Evaluator:
        cfg = self.cfg
        return Evaluator(self.object_classes, cfg.batch_size, cfg.infer_time,
                         cfg.sensor_hw[1], cfg.sensor_hw[0],
                         cfg.img_size[1], cfg.img_size[0], cfg.dataset,
                         recorder)

    def _make_tb_writer(self):
        """TensorBoard scalars per epoch (Training/Loss, Validation/Map —
        reference core/exp.py:215,313,328); None if tensorboard is absent."""
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(os.path.join(self.exp_dir, "tensorboard"))
        except Exception:
            return None

    def train(self):
        cfg = self.cfg
        self.create_datasets()
        self.build(len(self.train_loader))
        if cfg.resume_exp:
            path = os.path.join(cfg.log_path, cfg.resume_exp, "checkpoints",
                                "last_epoch")
            self.state, self.epoch, self.max_score = load_checkpoint(
                path, self.state)
        self.tb_writer = self._make_tb_writer()
        try:
            self._train_loop()
        finally:
            # always drain async saves: surfaces background save errors and
            # publishes the final meta.json even if an epoch raised
            wait_for_checkpoints()
            if self.tb_writer is not None:
                self.tb_writer.close()

    def _train_loop(self):
        cfg = self.cfg
        while self.epoch < cfg.max_epoch_to_stop:
            mean = self.train_epoch()
            if self.tb_writer is not None and mean:
                self.tb_writer.add_scalar("Training/Loss",
                                          mean["total_loss"], self.epoch)
            save_checkpoint(os.path.join(self.ckpt_dir, "last_epoch"),
                            self.state, self.epoch, self.max_score)
            save_part_checkpoints(os.path.join(self.ckpt_dir, "last_epoch"),
                                  self.state)
            # reduce_evaluate: validate only every ~10% of the run and in the
            # final 40% (reference core/exp.py:249)
            import math as _math

            do_eval = (not cfg.reduce_evaluate) or (
                self.epoch > 0
                and (self.epoch % _math.ceil(cfg.max_epoch_to_stop / 10) == 0
                     or self.epoch >= cfg.max_epoch_to_stop / 5 * 3))
            if do_eval:
                result = self.eval_epoch(self.make_evaluator())
                if self.tb_writer is not None:
                    self.tb_writer.add_scalar("Validation/Map", result[0],
                                              self.epoch)
                if result[0] > self.max_score:
                    self.max_score = result[0]
                    best_state = (self.state.replace(params=self.ema_params)
                                  if self.ema_params is not None
                                  else self.state)
                    save_checkpoint(os.path.join(self.ckpt_dir, "best_epoch"),
                                    best_state, self.epoch, self.max_score)
                print(f"Epoch {self.epoch}: best score {self.max_score}")
            self.epoch += 1

    def test(self):
        cfg = self.cfg
        self.create_test_dataset()
        self.build(1)
        path = os.path.join(cfg.log_path, cfg.resume_exp or cfg.exp_type,
                            "checkpoints", "best_epoch")
        self.state, self.epoch, self.max_score = load_checkpoint(
            path, self.state)
        recorder = Recorder(self.exp_dir) if cfg.record else None
        return self.eval_epoch(self.make_evaluator(recorder))
