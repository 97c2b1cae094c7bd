"""Device-side batched IoU and greedy NMS.

The reference applies greedy confidence NMS in Python dict-space
(src/utils.py:346-361, called at src/analysis_pipeline.py:106 with
IoU 0.6). Here NMS runs on device over statically-shaped padded
detections so the whole detect→NMS path stays inside one jit program:
a single (N, N) IoU matrix (one MXU-friendly broadcast), then a greedy
sequential pass as a `lax.fori_loop` over score-sorted rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def iou_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU, boxes as (N, 4) xyxy. Returns (N, M) float32."""
    a = boxes_a.astype(jnp.float32)
    b = boxes_b.astype(jnp.float32)
    inter_min = jnp.maximum(a[:, None, :2], b[None, :, :2])
    inter_max = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(inter_max - inter_min, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def greedy_nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float = 0.6,
) -> jax.Array:
    """Greedy highest-score-first NMS (semantics of src/utils.py:346-361).

    boxes (N,4), scores (N,), valid (N,) bool. Returns keep mask (N,) bool
    aligned with the *input* order.
    """
    n = boxes.shape[0]
    neg = jnp.float32(-1.0)
    s = jnp.where(valid, scores, neg)
    order = jnp.argsort(-s)  # score-descending, invalid last
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]
    ious = iou_matrix(sorted_boxes, sorted_boxes)

    def body(i, state):
        keep, suppressed = state
        is_kept = jnp.logical_and(sorted_valid[i], jnp.logical_not(suppressed[i]))
        keep = keep.at[i].set(is_kept)
        # Suppress later boxes overlapping this kept one.
        later = jnp.arange(n) > i
        hit = jnp.logical_and(later, ious[i] >= iou_threshold)
        suppressed = jnp.where(jnp.logical_and(is_kept, hit), True, suppressed)
        return keep, suppressed

    keep_sorted, _ = lax.fori_loop(
        0, n, body, (jnp.zeros(n, bool), jnp.zeros(n, bool))
    )
    # Scatter back to input order.
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep
