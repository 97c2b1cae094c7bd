"""YOLO fine-tune step + host-side target packing.

Companion to yolo_loss.py (ultralytics-formulation detection loss): this
module turns it into the same jit/mesh-shardable train-step shape the
SAM2 fine-tune uses (train_step.make_train_step) — shard the batch over
the data axis, replicate params, let XLA insert the gradient psum.

Reference capability: the detector behind /root/reference/README.md:113
is produced by an offline ultralytics fine-tune; here producing it is a
first-class, TPU-resident operation.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.taxonomy import TRAIN_CLASSES
from ..core.types import BBox
from .yolo_loss import YOLOLossConfig, yolo_detection_loss


def targets_from_boxes(
    boxes_per_image: Sequence[Sequence[BBox]],
    max_gt: int = 64,
    class_to_id: Optional[dict] = None,
):
    """Pad host BBox lists to static (B, M) arrays for the jit loss.

    Returns (gt_boxes (B, M, 4) f32 xyxy, gt_classes (B, M) i32,
    gt_valid (B, M) bool). Boxes must already be in the model's input
    pixel space (letterboxed).

    Defaults to the TRAINABLE label space (taxonomy.TRAIN_CLASSES =
    reference ids + capacitor/current.dc extension); an unmapped class
    name would silently become id 0 (__background__) and train the
    model to IGNORE that component — warn loudly instead."""
    class_to_id = class_to_id or dict(TRAIN_CLASSES)
    unmapped = {
        b.class_name
        for boxes in boxes_per_image
        for b in boxes
        if b.class_name not in class_to_id
    }
    if unmapped:
        logging.getLogger(__name__).warning(
            "targets_from_boxes: %d class name(s) not in the label map "
            "become __background__ GT (the model learns to ignore them): %s",
            len(unmapped), sorted(unmapped),
        )
    B = len(boxes_per_image)
    dropped = sum(max(0, len(b) - max_gt) for b in boxes_per_image)
    if dropped:
        # Silent truncation turns real components into implicit
        # background that penalizes correct detections during training —
        # surface it so callers size max_gt from their data.
        logging.getLogger(__name__).warning(
            "targets_from_boxes: dropping %d ground-truth boxes over "
            "max_gt=%d (max per image: %d) — raise max_gt",
            dropped, max_gt, max(len(b) for b in boxes_per_image),
        )
    gt_boxes = np.zeros((B, max_gt, 4), np.float32)
    gt_classes = np.zeros((B, max_gt), np.int32)
    gt_valid = np.zeros((B, max_gt), bool)
    for i, boxes in enumerate(boxes_per_image):
        for j, b in enumerate(boxes[:max_gt]):
            gt_boxes[i, j] = (b.xmin, b.ymin, b.xmax, b.ymax)
            gt_classes[i, j] = class_to_id.get(b.class_name, 0)
            gt_valid[i, j] = True
    return jnp.asarray(gt_boxes), jnp.asarray(gt_classes), jnp.asarray(gt_valid)


def init_detect_biases(
    variables: dict,
    num_classes: int,
    img_size: int,
    strides=(8, 16, 32),
) -> dict:
    """Detect-head prior bias init for from-random training (ultralytics
    Detect.bias_init): the classification convs start at
    log(5/nc/(size/stride)²) so initial sigmoid scores reflect the
    object prior (~5 objects per image) instead of 0.5 per class per
    anchor — without it the first hundreds of steps are spent pushing
    2100+ anchors × nc background logits down (measured: cls loss 43883
    at step 0, mAP stuck at 0 after 300 steps). Box convs start at 1.0.
    Conversion paths never need this (checkpoints overwrite biases)."""
    import copy
    import math

    out = copy.deepcopy(jax.tree.map(np.asarray, variables))
    for i, s in enumerate(strides):
        box_b = out["params"][f"cv2_{i}_2"]["bias"]
        out["params"][f"cv2_{i}_2"]["bias"] = np.full_like(box_b, 1.0)
        cls_b = out["params"][f"cv3_{i}_2"]["bias"]
        prior = math.log(5.0 / num_classes / (img_size / s) ** 2)
        out["params"][f"cv3_{i}_2"]["bias"] = np.full_like(cls_b, prior)
    return jax.tree.map(jnp.asarray, out)


def make_yolo_optimizer(
    learning_rate=1e-3, weight_decay: float = 5e-4, warmup_steps: int = 0,
    total_steps: int = 0, clip_norm: float = 10.0,
):
    """Global-norm-clipped AdamW with optional warmup (+ cosine decay
    when total_steps > 0).

    Clipping at 10.0 matches ultralytics' trainer and is load-bearing:
    an unclipped run diverged mid-training (cls head collapsed to -inf
    logits, task-aligned assignment then found zero candidates and the
    loss silently flatlined at 0 with fg=0 — observed at step ~2000 of
    a 320² nano run). AdamW over ultralytics' from-scratch SGD: transfer
    /synthetic fine-tunes converge in far fewer steps, and steps are
    what a 1-chip budget buys.

    apply_if_finite is equally load-bearing: clipping does NOT stop a
    non-finite gradient (the NaN global norm scales every leaf to NaN
    and the whole parameter tree is poisoned in one step — observed at
    step ~1100 of a 640² small run: one bad batch, then fg=0/loss=0
    forever). Skipping the update drops the bad batch instead."""
    if total_steps > 0:
        learning_rate = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps=max(1, warmup_steps),
            decay_steps=total_steps, end_value=learning_rate * 0.05,
        )
    elif warmup_steps > 0:
        learning_rate = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            boundaries=[warmup_steps],
        )
    return optax.apply_if_finite(
        optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.adamw(learning_rate, weight_decay=weight_decay),
        ),
        max_consecutive_errors=50,
    )


def make_yolo_train_step(model, tx, cfg: YOLOLossConfig):
    """train_step(params, opt_state, images, gt_boxes, gt_classes,
    gt_valid) -> (params, opt_state, metrics). jit/pjit externally."""

    def loss_fn(params, images, gt_boxes, gt_classes, gt_valid):
        outs = model.apply(params, images)
        return yolo_detection_loss(outs, gt_boxes, gt_classes, gt_valid, cfg)

    def train_step(params, opt_state, images, gt_boxes, gt_classes, gt_valid):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, gt_boxes, gt_classes, gt_valid
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step
