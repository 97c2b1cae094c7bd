"""Connected-component labeling and per-label statistics on device.

Replaces cv2.findContours(RETR_EXTERNAL) + cv2.moments + cv2.boundingRect
(src/circuit_analyzer.py:388-459, 1370-1374, 1615-1633) with a fully
vectorized XLA formulation:

  1. every foreground pixel starts labeled with its own linear index;
  2. iterate {8-neighborhood min-propagation, two pointer-jump rounds}
     inside a `lax.while_loop` until fixpoint — the pointer jumping
     (label <- label[label]) gives superlinear convergence on long thin
     wires, where plain propagation would need O(wire length) sweeps;
  3. compact labels to a static top-K table with `jnp.unique(size=K)` —
     ascending linear-index order == raster order of each component's
     topmost-then-leftmost pixel, giving deterministic node ids;
  4. per-label area/centroid/bbox via a one-hot (K, HW) × (HW, stats)
     contraction that XLA maps onto the MXU.

The area filter threshold uses a contour-area estimate
(pixels − boundary/2 − 1, Pick's theorem) to match cv2.contourArea
semantics on filled regions, since cv2 measures the polygon through
boundary pixel centers rather than counting pixels.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from .morphology import boundary_mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LabelStats:
    """Per-label statistics, padded to a static K.

    labels:    (K,) int32 root linear indices (sentinel HW for padding)
    valid:     (K,) bool
    area:      (K,) float32 pixel counts
    contour_area: (K,) float32 cv2.contourArea-style estimate
    centroid:  (K, 2) float32 (x, y)
    bbox:      (K, 4) float32 (xmin, ymin, xmax, ymax) inclusive pixel bounds
    boundary_count: (K,) float32
    """

    labels: jax.Array
    valid: jax.Array
    area: jax.Array
    contour_area: jax.Array
    centroid: jax.Array
    bbox: jax.Array
    boundary_count: jax.Array


def _neighbor_min(lbl: jax.Array, sentinel: int) -> jax.Array:
    padded = jnp.pad(lbl, ((1, 1), (1, 1)), mode="constant", constant_values=sentinel)
    return lax.reduce_window(
        padded, sentinel, lax.min, (3, 3), (1, 1), padding="VALID"
    )


def _segmented_run_min(lbl: jax.Array, fg: jax.Array, axis: int, sentinel: int) -> jax.Array:
    """Min label over each contiguous foreground run along `axis`.

    A segmented min-scan (forward + backward associative_scan) that
    propagates a label across an entire straight wire segment in one step —
    the key to fast convergence on schematics, whose components are long
    horizontal/vertical runs. Plain neighborhood propagation needs O(run
    length) sweeps for the same effect.
    """
    reset = ~fg  # background breaks segments

    def combine(a, b):
        av, ar = a
        bv, br = b
        v = jnp.where(br, bv, jnp.minimum(av, bv))
        r = jnp.logical_or(ar, br)
        return v, r

    fwd_v, _ = lax.associative_scan(combine, (lbl, reset), axis=axis)
    bwd_v, _ = lax.associative_scan(combine, (lbl, reset), axis=axis, reverse=True)
    out = jnp.minimum(fwd_v, bwd_v)
    return jnp.where(fg, out, sentinel)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jax.Array, max_iters: int = 32) -> jax.Array:
    """8-connected component labeling.

    mask: (H, W) bool/int foreground.
    Returns (H, W) int32 labels; background pixels carry the sentinel H*W,
    foreground pixels carry the linear index of their component's
    raster-first pixel.

    Per iteration: row-run min scan, column-run min scan, 8-neighborhood
    min (diagonal links), a scatter-min "hook" that shortcuts tree roots
    (Playne–Hawick style union), and two pointer-jump compressions.
    Converges in a handful of iterations even on serpentine wires where
    chains of minimum linear indices point away from the root.
    """
    h, w = mask.shape
    sentinel = h * w
    fg = mask.astype(bool)
    idx = jnp.arange(sentinel, dtype=jnp.int32).reshape(h, w)
    init = jnp.where(fg, idx, sentinel)
    sent_arr = jnp.asarray([sentinel], jnp.int32)

    def pointer_jump(flat: jax.Array) -> jax.Array:
        # padded[sentinel] = sentinel so background self-links.
        padded = jnp.concatenate([flat, sent_arr])
        return padded[flat]

    def body(state):
        lbl, _, it = state
        l = _segmented_run_min(lbl, fg, axis=1, sentinel=sentinel)
        l = _segmented_run_min(l, fg, axis=0, sentinel=sentinel)
        m = jnp.where(fg, _neighbor_min(l, sentinel), sentinel)

        flat_old = lbl.reshape(-1)
        m_flat = m.reshape(-1)
        # Hook: write each pixel's new minimum into the pixel its old label
        # points at (a same-component index), creating root shortcuts.
        parent = jnp.concatenate([m_flat, sent_arr])
        parent = parent.at[flat_old].min(m_flat)
        flat = parent[flat_old]
        flat = pointer_jump(pointer_jump(flat))
        new = flat.reshape(h, w)
        changed = jnp.any(new != lbl)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    final, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return final


def label_components_host(mask) -> "tuple":
    """Reference two-pass union-find labeling on host (numpy) for testing
    and for small host-side paths. Returns (labels, background sentinel)."""
    import numpy as np

    m = np.asarray(mask).astype(bool)
    h, w = m.shape
    sentinel = h * w
    parent = np.arange(sentinel, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for y in range(h):
        for x in range(w):
            if not m[y, x]:
                continue
            p = y * w + x
            for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1)):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and m[ny, nx]:
                    union(p, ny * w + nx)

    labels = np.full((h, w), sentinel, dtype=np.int64)
    for y in range(h):
        for x in range(w):
            if m[y, x]:
                labels[y, x] = find(y * w + x)
    # Root of each set is its min index == raster-first pixel.
    return labels, sentinel


@functools.partial(jax.jit, static_argnames=("max_labels",))
def label_stats(labels: jax.Array, max_labels: int = 64) -> LabelStats:
    """Compact labels to a static-K table and compute per-label statistics."""
    h, w = labels.shape
    sentinel = h * w
    flat = labels.reshape(-1)

    # Label ids (root linear indices) compacted in DESCENDING raster-first
    # order — cv2.findContours returns outer contours in reverse raster
    # discovery order (verified against cv2 5.0: bottom-most blob is
    # contour 0), and the reference's node old-ids, renumbering sort and
    # per-id viz colors all follow that enumeration
    # (src/circuit_analyzer.py:388-459, 1547-1582).
    #
    # When more than max_labels components exist, keep the LARGEST ones:
    # truncating by raster position (the old jnp.unique scan) could drop
    # real top-of-image wires while keeping bottom noise specks; the
    # components a downstream area filter keeps are exactly the large
    # ones. With <= max_labels components the selection is identical.
    pixel_count = jnp.bincount(
        jnp.minimum(flat, sentinel), length=sentinel + 1
    ).at[sentinel].set(0)
    top_area, top_roots = jax.lax.top_k(pixel_count, max_labels)
    sel_valid = top_area > 0
    # Enumeration order within the selection: descending root index
    # (reverse raster discovery), invalid slots last.
    order_key = jnp.where(sel_valid, top_roots, -1)
    perm = jnp.argsort(-order_key)
    valid = sel_valid[perm]
    uniq = jnp.where(valid, top_roots[perm], sentinel)

    onehot = (flat[None, :] == uniq[:, None]).astype(jnp.float32)  # (K, HW)

    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)

    fg = flat != sentinel
    bnd = boundary_mask((labels != sentinel)).reshape(-1).astype(jnp.float32)

    # One contraction computes area, centroid sums, and boundary counts.
    feats = jnp.stack([jnp.ones_like(xs), xs, ys, bnd], axis=1)  # (HW, 4)
    agg = onehot @ feats  # (K, 4) — MXU matmul
    area = agg[:, 0]
    safe_area = jnp.maximum(area, 1.0)
    centroid = jnp.stack([agg[:, 1] / safe_area, agg[:, 2] / safe_area], axis=1)
    boundary_count = agg[:, 3]

    big = jnp.float32(1e9)
    x_masked = jnp.where(onehot > 0, xs[None, :], big)
    y_masked = jnp.where(onehot > 0, ys[None, :], big)
    xmin = jnp.min(x_masked, axis=1)
    ymin = jnp.min(y_masked, axis=1)
    xmax = jnp.max(jnp.where(onehot > 0, xs[None, :], -big), axis=1)
    ymax = jnp.max(jnp.where(onehot > 0, ys[None, :], -big), axis=1)
    bbox = jnp.stack([xmin, ymin, xmax, ymax], axis=1)

    contour_area = jnp.maximum(area - boundary_count / 2.0 - 1.0, 0.0)
    del fg
    return LabelStats(
        labels=uniq.astype(jnp.int32),
        valid=valid,
        area=area,
        contour_area=contour_area,
        centroid=centroid,
        bbox=bbox,
        boundary_count=boundary_count,
    )


def connected_components(
    mask: jax.Array, max_labels: int = 64, max_iters: int = 64
) -> tuple[jax.Array, LabelStats]:
    """Label + stats in one call. Returns (label image, stats table)."""
    labels = label_components(mask, max_iters=max_iters)
    return labels, label_stats(labels, max_labels=max_labels)
