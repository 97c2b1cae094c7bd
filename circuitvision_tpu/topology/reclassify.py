"""Terminal reclassification from preliminary connectivity.

Re-implements reclassify_terminals_based_on_connectivity
(src/circuit_analyzer.py:2217-2311): a classical adaptive-threshold mask
of the ORIGINAL image, component boxes subtracted, contours extracted at
the smaller 1e-4 area threshold, and any 'terminal' detection touching
>= 2 distinct contours (10 px threshold) relabeled 'voltage.dc' — the
reference's fix for AC sources misdetected as terminals.

The per-point contour walks become the same touch-matrix contraction used
by the main node stage.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core import taxonomy
from ..core.config import TopologyConfig
from ..core.types import BBox
from ..ops.cc import connected_components
from ..ops.image import adaptive_threshold_mean_inv, rgb_to_gray
from ..ops.morphology import boundary_mask
from .matching import touch_matrix
from .nodes import subtract_component_boxes


def segment_classical(image_rgb: np.ndarray, cfg: Optional[TopologyConfig] = None) -> np.ndarray:
    """Classical fallback wire mask: grayscale → adaptive mean threshold,
    inverted (reference segment_circuit, src/circuit_analyzer.py:313-319)."""
    cfg = cfg or TopologyConfig()
    gray = rgb_to_gray(jnp.asarray(image_rgb))
    mask = adaptive_threshold_mean_inv(gray, cfg.adaptive_block, float(cfg.adaptive_c))
    return np.asarray(mask)


def reclassify_terminals(
    image_rgb: np.ndarray,
    bboxes: Sequence[BBox],
    cfg: Optional[TopologyConfig] = None,
) -> list[BBox]:
    """Return a new bbox list with multi-connected terminals relabeled
    'voltage.dc' (the reference mutates in place; we return copies)."""
    cfg = cfg or TopologyConfig()
    out = [dataclasses.replace(b) for b in bboxes]
    terminal_idx = [i for i, b in enumerate(out) if b.class_name == "terminal"]
    if not terminal_idx:
        return out

    mask = segment_classical(image_rgb, cfg)
    wire = subtract_component_boxes(mask, out)

    h, w = wire.shape
    fg_raw = jnp.asarray(wire) > 0
    # Auto-invert when mostly white (get_contours semantics, :398).
    fg = jnp.where(jnp.mean(jnp.asarray(wire, jnp.float32)) > 127.0, ~fg_raw, fg_raw)
    labels, stats = connected_components(fg, max_labels=cfg.max_labels, max_iters=256)
    rel_area = np.asarray(stats.contour_area) / float(h * w)
    keep = np.asarray(stats.valid) & (rel_area > cfg.prelim_contour_area_threshold)
    if not keep.any():
        return out

    comp_boxes = np.asarray(
        [[out[i].xmin, out[i].ymin, out[i].xmax, out[i].ymax] for i in terminal_idx],
        np.float32,
    )
    thr = np.full(len(terminal_idx), float(cfg.reclass_pixel_threshold), np.float32)
    broad = np.asarray(stats.bbox) + np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)
    touch = np.asarray(
        touch_matrix(
            labels,
            boundary_mask(fg),
            stats.labels,
            jnp.asarray(broad, jnp.float32),
            jnp.asarray(keep),
            jnp.asarray(comp_boxes),
            jnp.asarray(thr),
            jnp.ones(len(terminal_idx), bool),
        )
    )

    for col, i in enumerate(terminal_idx):
        distinct = int(touch[:, col].sum())
        if distinct >= cfg.reclass_min_connections:
            b = out[i]
            b.original_class_if_reclassified = b.class_name
            b.class_name = "voltage.dc"
            b.class_id = taxonomy.CLASSES.get("voltage.dc", b.class_id)
            b.was_reclassified_from_terminal = True
    return out
