"""Detector decoding: DFL expectation, anchor grids, device NMS.

Ultralytics performs decode + NMS in torch on host order; here the whole
path is one jit program producing a statically-padded `Detections` pytree.
The reference additionally applies a second dict-level confidence NMS at
IoU 0.6 (src/analysis_pipeline.py:106) — that dedup happens in the
pipeline layer via the same `greedy_nms` op.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core.types import Detections
from ...ops.nms import greedy_nms

STRIDES = (8, 16, 32)


def _dfl(box_logits: jax.Array, reg_max: int) -> jax.Array:
    """Distribution Focal Loss decode: softmax expectation over bins.

    box_logits: (..., 4*reg_max) → (..., 4) ltrb distances in stride units.
    """
    shape = box_logits.shape[:-1]
    logits = box_logits.reshape(*shape, 4, reg_max)
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def decode_predictions(
    head_outputs: list[jax.Array],
    reg_max: int = 16,
    num_classes: int = 62,
) -> tuple[jax.Array, jax.Array]:
    """Per-scale head outputs → (boxes_xyxy (B, A, 4) px, scores (B, A, C))."""
    boxes_all, scores_all = [], []
    for out, stride in zip(head_outputs, STRIDES):
        b, h, w, _ = out.shape
        box_logits = out[..., : 4 * reg_max]
        cls_logits = out[..., 4 * reg_max :]
        ltrb = _dfl(box_logits, reg_max)  # (B, H, W, 4)

        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        x0 = (xs - ltrb[..., 0]) * stride
        y0 = (ys - ltrb[..., 1]) * stride
        x1 = (xs + ltrb[..., 2]) * stride
        y1 = (ys + ltrb[..., 3]) * stride
        boxes = jnp.stack([x0, y0, x1, y1], axis=-1).reshape(b, h * w, 4)
        scores = jax.nn.sigmoid(cls_logits).reshape(b, h * w, num_classes)
        boxes_all.append(boxes)
        scores_all.append(scores)
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


@functools.partial(
    jax.jit, static_argnames=("max_detections", "conf_threshold", "iou_threshold")
)
def postprocess(
    boxes: jax.Array,  # (B, A, 4)
    scores: jax.Array,  # (B, A, C)
    max_detections: int = 128,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.7,
) -> Detections:
    """Top-K by best-class score, then per-image class-aware NMS.

    Class-aware via the ultralytics trick: offset boxes per class id by a
    large constant before IoU so different classes never suppress each
    other.
    """

    def per_image(b: jax.Array, s: jax.Array) -> tuple:
        best_score = jnp.max(s, axis=-1)
        best_class = jnp.argmax(s, axis=-1).astype(jnp.int32)
        k = min(max_detections, best_score.shape[0])
        top_scores, top_idx = jax.lax.top_k(best_score, k)
        top_boxes = b[top_idx]
        top_classes = best_class[top_idx]
        valid = top_scores >= conf_threshold

        offset = top_classes.astype(jnp.float32)[:, None] * 7680.0
        keep = greedy_nms(
            top_boxes + offset, top_scores, valid, iou_threshold=iou_threshold
        )
        # Pad to max_detections if A < max_detections.
        pad = max_detections - k
        if pad > 0:
            top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
            top_scores = jnp.pad(top_scores, (0, pad))
            top_classes = jnp.pad(top_classes, (0, pad))
            keep = jnp.pad(keep, (0, pad))
        return top_boxes, top_scores, top_classes, keep

    out_boxes, out_scores, out_classes, out_valid = jax.vmap(per_image)(boxes, scores)
    return Detections(
        boxes=out_boxes, scores=out_scores, classes=out_classes, valid=out_valid
    )


def unletterbox_boxes(
    boxes: jax.Array, scale: jax.Array, pads: jax.Array,
    orig_w: int, orig_h: int,
) -> jax.Array:
    """Map letterboxed-pixel boxes back to original image pixels."""
    x0 = (boxes[..., 0] - pads[0]) / scale
    y0 = (boxes[..., 1] - pads[1]) / scale
    x1 = (boxes[..., 2] - pads[0]) / scale
    y1 = (boxes[..., 3] - pads[1]) / scale
    x0 = jnp.clip(x0, 0, orig_w)
    x1 = jnp.clip(x1, 0, orig_w)
    y0 = jnp.clip(y0, 0, orig_h)
    y1 = jnp.clip(y1, 0, orig_h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)
