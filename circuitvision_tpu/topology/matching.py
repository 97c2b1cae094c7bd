"""Vectorized terminal-to-node matching.

The reference walks every contour point for every (component, contour)
pair in Python (src/circuit_analyzer.py:1380-1446) — the hottest pure-
Python loop in its pipeline. Here the same predicate is evaluated for
all pairs at once:

  touch[k, c] = broad_phase(label k bbox, comp c bbox)
                AND exists boundary pixel p of label k with
                    point_near_bbox(p, comp c bbox, thr_c)

`point_near_bbox` keeps the reference's exact semantics
(src/circuit_analyzer.py:811-846): inside the box, or within the class
threshold of any box *edge line* measured per-axis. The existence test
becomes a single (K, HW) × (HW, C) boolean contraction that XLA lowers
onto the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def touch_matrix(
    labels: jax.Array,  # (H, W) int32 label image, sentinel = H*W
    boundary: jax.Array,  # (H, W) bool boundary-pixel mask
    uniq_labels: jax.Array,  # (K,) compacted labels (sentinel padding)
    label_bboxes: jax.Array,  # (K, 4) xmin,ymin,xmax,ymax of each label
    label_valid: jax.Array,  # (K,) bool
    comp_boxes: jax.Array,  # (C, 4) float32 component boxes (resized space)
    comp_thresholds: jax.Array,  # (C,) float32 per-class pixel thresholds
    comp_valid: jax.Array,  # (C,) bool
) -> jax.Array:
    """Returns (K, C) bool: label k is electrically touched by component c."""
    h, w = labels.shape
    sentinel = h * w
    flat_labels = labels.reshape(-1)
    flat_boundary = boundary.reshape(-1)

    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)

    bx0, by0, bx1, by1 = (comp_boxes[:, i] for i in range(4))
    t = comp_thresholds

    # (HW, C) point-near-bbox predicate (reference :811-846).
    px = xs[:, None]
    py = ys[:, None]
    inside = (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
    near_edge = (
        (jnp.abs(px - bx0) <= t)
        | (jnp.abs(px - bx1) <= t)
        | (jnp.abs(py - by0) <= t)
        | (jnp.abs(py - by1) <= t)
    )
    near = (inside | near_edge) & comp_valid[None, :]

    # (K, HW) boundary-pixel one-hot per label.
    onehot = (flat_labels[None, :] == uniq_labels[:, None]) & flat_boundary[None, :]

    # Existence via f32 contraction → MXU.
    contact = (onehot.astype(jnp.float32) @ near.astype(jnp.float32)) > 0.0

    # Broad phase: component bbox overlaps label bounding rect
    # (reference :1399-1401).
    lx0, ly0, lx1, ly1 = (label_bboxes[:, i] for i in range(4))
    overlap = ~(
        (bx1[None, :] < lx0[:, None])
        | (bx0[None, :] > lx1[:, None])
        | (by1[None, :] < ly0[:, None])
        | (by0[None, :] > ly1[:, None])
    )

    return contact & overlap & label_valid[:, None] & comp_valid[None, :]
