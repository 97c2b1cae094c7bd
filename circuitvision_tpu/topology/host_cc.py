"""Host (numpy/scipy) connected-components + stats + touch stage.

Semantics-identical to the device formulation (ops/cc.py +
topology/matching.py, themselves modeled on the reference's
cv2.findContours walks, src/circuit_analyzer.py:388-459, 1380-1446):

- 8-connected components; a component's identity is the linear index of
  its raster-first pixel (scipy assigns ids in raster order; roots are
  recomputed explicitly), compacted to the smallest-K table exactly like
  jnp.unique(size=K, fill_value=H*W);
- boundary pixels = fg & ~erode3x3(fg) with the image border counting as
  background (cv2 semantics);
- contour-area estimate = pixels − boundary/2 − 1 (Pick's theorem);
- touch(k, c) = component c's near-region (inside the bbox, or within
  the per-class pixel threshold of any bbox edge LINE — the reference's
  is_point_near_bbox, :811-846) intersects label k's boundary pixels,
  gated by the bbox broad phase (:1399-1401).

Why this exists: CC label propagation is pointer-chasing — gathers,
scatters and a data-dependent fixpoint loop — which is the single worst
workload shape for a TPU. The device implementation (kept for
single-image latency, where everything rides one fused dispatch) costs
~100 ms/image inside the batched path; this host stage runs the same
math in ~10 ms/image of C-speed scipy/numpy, turning the end-to-end
throughput path host-bound instead of device-CC-bound (PERF.md).
"""
from __future__ import annotations

import numpy as np

from ..core.config import TopologyConfig


def label_touch_stage_host(
    fg: np.ndarray,  # (H, W) bool analysis raster (enhanced, binarized)
    width: float,  # true raster width (fg may carry right padding)
    cfg: TopologyConfig,
    comp_boxes: np.ndarray,  # (C, 4) float32 xmin,ymin,xmax,ymax
    comp_thr: np.ndarray,  # (C,) float32
    comp_valid: np.ndarray,  # (C,) bool
):
    """Returns (uniq, centroids, rel_area, keep, touch) with the same
    shapes/dtypes/ordering as the device `_label_touch_stage` outputs
    after compaction to K = cfg.max_labels."""
    from scipy import ndimage

    h, w = fg.shape
    sentinel = h * w
    K = cfg.max_labels

    lab, n = ndimage.label(fg, structure=np.ones((3, 3), np.int32))

    flat = lab.ravel()
    # Root (raster-first linear index) per scipy id 1..n.
    first = np.full(n + 1, sentinel, np.int64)
    # np.unique returns first occurrence indices for each sorted unique id.
    ids, first_idx = np.unique(flat, return_index=True)
    first[ids] = first_idx
    order = np.argsort(first[1:], kind="stable")  # ascending root order
    sel = order[: K]  # smallest-K roots, like jnp.unique(size=K)
    sel_ids = sel + 1

    uniq = np.full(K, sentinel, np.int32)
    uniq[: len(sel)] = first[sel_ids]
    valid = uniq != sentinel

    area_all = np.bincount(flat, minlength=n + 1).astype(np.float64)
    ys = np.repeat(np.arange(h, dtype=np.float64), w)
    xs = np.tile(np.arange(w, dtype=np.float64), h)
    sx = np.bincount(flat, weights=xs, minlength=n + 1)
    sy = np.bincount(flat, weights=ys, minlength=n + 1)

    interior = ndimage.binary_erosion(
        fg, structure=np.ones((3, 3), bool), border_value=0
    )
    bnd = fg & ~interior
    bcount_all = np.bincount(lab[bnd].ravel(), minlength=n + 1).astype(np.float64)

    area = np.zeros(K, np.float32)
    centroids = np.zeros((K, 2), np.float32)
    bcount = np.zeros(K, np.float32)
    area[: len(sel)] = area_all[sel_ids]
    safe = np.maximum(area_all[sel_ids], 1.0)
    centroids[: len(sel), 0] = sx[sel_ids] / safe
    centroids[: len(sel), 1] = sy[sel_ids] / safe
    bcount[: len(sel)] = bcount_all[sel_ids]

    contour_area = np.maximum(area - bcount / 2.0 - 1.0, 0.0)
    rel_area = (contour_area / (float(h) * float(width))).astype(np.float32)
    keep = valid & (rel_area > cfg.contour_area_threshold)

    # Label bounding rects (inclusive), widened +1 on max like the device
    # broad phase (cv2.boundingRect is max-exclusive).
    slices = ndimage.find_objects(lab)
    lb = np.zeros((K, 4), np.float32)
    for row, sid in enumerate(sel_ids):
        sl = slices[sid - 1]
        lb[row] = (sl[1].start, sl[0].start, sl[1].stop - 1 + 1.0, sl[0].stop - 1 + 1.0)

    C = len(comp_boxes)
    touch = np.zeros((K, C), bool)
    xs1 = np.arange(w, dtype=np.float32)
    ys1 = np.arange(h, dtype=np.float32)
    bnd_lab = np.where(bnd, lab, 0)
    for c in range(C):
        if not comp_valid[c]:
            continue
        bx0, by0, bx1, by1 = comp_boxes[c]
        t = comp_thr[c]
        in_x = (xs1 >= bx0) & (xs1 <= bx1)
        in_y = (ys1 >= by0) & (ys1 <= by1)
        strip_x = (np.abs(xs1 - bx0) <= t) | (np.abs(xs1 - bx1) <= t)
        strip_y = (np.abs(ys1 - by0) <= t) | (np.abs(ys1 - by1) <= t)
        near = (in_y[:, None] & in_x[None, :]) | strip_x[None, :] | strip_y[:, None]
        hit_ids = np.unique(bnd_lab[near])
        hit = np.zeros(n + 1, bool)
        hit[hit_ids] = True
        hit[0] = False
        contact = hit[sel_ids]
        # broad phase: component bbox overlaps widened label rect
        overlap = ~(
            (bx1 < lb[: len(sel), 0])
            | (bx0 > lb[: len(sel), 2])
            | (by1 < lb[: len(sel), 1])
            | (by0 > lb[: len(sel), 3])
        )
        # the device path passes `keep` as touch_matrix's label_valid gate
        touch[: len(sel), c] = contact & overlap & keep[: len(sel)]
    return uniq, centroids, rel_area, keep, touch
