"""Morphological skeletonization (wire centerline extraction).

The north-star spec lists skeletonization among the topology raster ops
(BASELINE.json). The reference approximates it with dilate/erode closing
only; this provides a true morphological skeleton for wire tracing:

    S(X) = union_k [ erode^k(X) minus open(erode^k(X)) ]

computed with a `lax.while_loop` over erosion depth — fully on device,
fixed upper bound = max wire half-width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .morphology import dilate, erode


@functools.partial(jax.jit, static_argnames=("max_iters",))
def skeletonize(mask: jax.Array, max_iters: int = 64) -> jax.Array:
    """Binary morphological skeleton. mask: (H, W) bool/0-255.
    Returns bool skeleton of 1-2 px wide centerlines."""
    x = (jnp.asarray(mask) > 0).astype(jnp.float32) * 255.0

    def erode0(v):
        # Erosion must treat outside-image as BACKGROUND (constant-0
        # border), or foreground touching the frame never erodes from
        # that side and a full-frame mask skeletonizes to nothing.
        # morphology.erode replicates the border (cv2 enhance_lines
        # parity); with a 3x3 kernel, zero-padded erosion == replicate
        # erosion with the border ring forced to zero (every border
        # output sees at least one outside zero; interior outputs see
        # none).
        e = erode(v, 3, 1)
        return (
            e.at[0, :].set(0.0)
            .at[-1, :].set(0.0)
            .at[:, 0].set(0.0)
            .at[:, -1].set(0.0)
        )

    def body(state):
        cur, skel, it = state
        eroded = erode0(cur)
        opened = dilate(eroded, 3, 1)
        skel = jnp.maximum(skel, jnp.maximum(cur - opened, 0.0))
        return eroded, skel, it + 1

    def cond(state):
        cur, _, it = state
        return jnp.logical_and(jnp.any(cur > 0), it < max_iters)

    _, skel, _ = lax.while_loop(
        cond, body, (x, jnp.zeros_like(x), jnp.int32(0))
    )
    return skel > 0
