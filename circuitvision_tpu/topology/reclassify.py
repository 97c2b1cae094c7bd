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
from ..ops.image import adaptive_threshold_mean_inv, rgb_to_gray
from .nodes import subtract_component_boxes


def segment_classical(
    image_rgb: np.ndarray,
    cfg: Optional[TopologyConfig] = None,
    swap_rb: bool = False,
) -> np.ndarray:
    """Classical fallback wire mask: grayscale → adaptive mean threshold,
    inverted (reference segment_circuit, src/circuit_analyzer.py:313-319).

    swap_rb reproduces the reference reclassify path's channel quirk: it
    converts RGB→BGR and segment_circuit then applies COLOR_RGB2GRAY to
    the BGR image (src/circuit_analyzer.py:2234-2238), so luma is
    computed with the R/B weights swapped. Grayscale content is
    unaffected; colored photos need the quirk for mask parity.
    """
    cfg = cfg or TopologyConfig()
    img = jnp.asarray(image_rgb)
    if swap_rb:
        img = img[..., ::-1]
    gray = rgb_to_gray(img)
    mask = adaptive_threshold_mean_inv(gray, cfg.adaptive_block, float(cfg.adaptive_c))
    return np.asarray(mask)


def reclassify_terminals(
    image_rgb: np.ndarray,
    bboxes: Sequence[BBox],
    cfg: Optional[TopologyConfig] = None,
) -> list[BBox]:
    """Return a new bbox list with multi-connected terminals relabeled
    'voltage.dc' (the reference mutates in place; we return copies).

    Raster prep (adaptive threshold) runs on device; the contour/touch
    stage runs through the cv2-exact host backend
    (host_cc.contour_touch_stage_host) with the reference reclassify
    walk's exact shape: prelim area threshold 1e-4, pixel threshold 10,
    NO rect broad phase (:2254-2287)."""
    from .host_cc import contour_touch_stage_host
    from .nodes import _comp_bucket

    cfg = cfg or TopologyConfig()
    out = [dataclasses.replace(b) for b in bboxes]
    terminal_idx = [i for i, b in enumerate(out) if b.class_name == "terminal"]
    if not terminal_idx:
        return out

    mask = segment_classical(image_rgb, cfg, swap_rb=True)
    wire = subtract_component_boxes(mask, out)
    h, w = wire.shape

    bucket = _comp_bucket(len(terminal_idx))
    comp_boxes = np.zeros((bucket, 4), np.float32)
    comp_thr = np.full(bucket, float(cfg.reclass_pixel_threshold), np.float32)
    comp_valid = np.zeros(bucket, bool)
    for col, i in enumerate(terminal_idx):
        b = out[i]
        comp_boxes[col] = (b.xmin, b.ymin, b.xmax, b.ymax)
        comp_valid[col] = True

    # Auto-invert when mostly white (get_contours semantics, :398).
    fg = wire != 0
    if wire.mean() > 127.0:
        fg = ~fg
    _cen, _rel, touch, _cts = contour_touch_stage_host(
        fg, float(w), cfg, comp_boxes, comp_thr, comp_valid,
        area_threshold=cfg.prelim_contour_area_threshold,
        broad_phase=False,
    )
    touch = touch[:, : len(terminal_idx)]

    for col, i in enumerate(terminal_idx):
        distinct = int(touch[:, col].sum())
        if distinct >= cfg.reclass_min_connections:
            b = out[i]
            b.original_class_if_reclassified = b.class_name
            b.class_name = "voltage.dc"
            b.class_id = taxonomy.CLASSES.get("voltage.dc", b.class_id)
            b.was_reclassified_from_terminal = True
    return out
