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

    def body(state):
        cur, skel, it = state
        opened = dilate(erode(cur, 3, 1), 3, 1)
        skel = jnp.maximum(skel, jnp.maximum(cur - opened, 0.0))
        nxt = erode(cur, 3, 1)
        return nxt, skel, it + 1

    def cond(state):
        cur, _, it = state
        return jnp.logical_and(jnp.any(cur > 0), it < max_iters)

    _, skel, _ = lax.while_loop(
        cond, body, (x, jnp.zeros_like(x), jnp.int32(0))
    )
    return skel > 0
