"""Node extraction: wire mask + component boxes → electrical node graph.

Re-implements get_node_connections (src/circuit_analyzer.py:1286-1605)
with the device pipeline:

  component subtraction → resize to H=600 → enhance_lines →
  connected components → boundary extraction → touch matrix →
  ground selection → renumbering

All raster compute is jit-compiled XLA (ops/, topology/matching.py); the
final ground-selection/renumbering bookkeeping is O(#nodes) host logic,
preserving the reference's exact tie-breaks:

  - contours filtered at relative area > 4e-4          (:388,410)
  - node ids assigned in deterministic raster order    (see ops/cc.py)
  - ground = source-connected node lowest on screen
    (max centroid-y, stable order on ties)             (:1472-1498)
  - fallbacks: max-connection nodes, then lowest node  (:1499-1545)
  - non-ground nodes renumbered 1..N in old-id order,
    dropped unless >= 2 components (single-other-node
    exception preserved)                               (:1547-1582)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import taxonomy
from ..core.config import TopologyConfig
from ..core.types import BBox, Node
from ..ops.cc import connected_components
from ..ops.image import resize_bilinear
from ..ops.morphology import boundary_mask, enhance_lines
from .matching import touch_matrix


def subtract_component_boxes(
    mask: np.ndarray, bboxes: Sequence[BBox], preserve=taxonomy.MASK_PRESERVE_CLASSES
) -> np.ndarray:
    """Zero out every bbox not in the preserve set (reference :1328-1341).

    Host-side scatter: the box list is small and dynamic; the result is
    shipped to device once for the heavy raster stages.
    """
    out = np.asarray(mask).copy()
    h, w = out.shape[:2]
    for b in bboxes:
        if b.class_name in preserve:
            continue
        y0, y1 = max(0, int(b.ymin)), min(h, int(b.ymax))
        x0, x1 = max(0, int(b.xmin)), min(w, int(b.xmax))
        if y0 < y1 and x0 < x1:
            out[y0:y1, x0:x1] = 0
    return out


@dataclasses.dataclass
class NodeExtraction:
    """Full output of the node stage (mirrors the reference's 6-tuple
    return, src/circuit_analyzer.py:1605, minus matplotlib viz)."""

    nodes: list[Node]
    emptied_mask: np.ndarray
    enhanced_mask: np.ndarray
    label_image: np.ndarray
    resized_bboxes: list[BBox]
    raw_node_count: int = 0


def _prepare_raster(
    emptied_mask: np.ndarray, cfg: TopologyConfig
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Resize → enhance → binarize. Returns (enhanced_u8, fg_bool, sx, sy)."""
    h, w = emptied_mask.shape[:2]
    new_h, new_w = cfg.resize_height, int(cfg.resize_height * (w / h))
    resized = resize_bilinear(jnp.asarray(emptied_mask, jnp.float32), (new_h, new_w))
    # Optional fused Pallas path: one VMEM band pass for the whole
    # blur+close chain (already rounded). Exact-match with the XLA chain
    # on TPU, but at the 600-row analysis raster XLA's own fusion is
    # already sub-millisecond, so this stays opt-in.
    default_params = (
        cfg.use_fused_morphology
        and cfg.blur_kernel == 5
        and cfg.blur_sigma == 1.0
        and cfg.morph_kernel == 3
        and cfg.morph_iterations == 2
    )
    if default_params and jax.default_backend() not in ("cpu",):
        from ..ops.pallas.fused_morphology import enhance_lines_fused

        enhanced = enhance_lines_fused(resized)
    else:
        enhanced = jnp.round(
            enhance_lines(
                resized,
                blur_ksize=cfg.blur_kernel,
                blur_sigma=cfg.blur_sigma,
                morph_ksize=cfg.morph_kernel,
                iterations=cfg.morph_iterations,
            )
        )
    # Quantize to uint8 semantics (cv2 operates on rounded uint8 — the
    # faint Gaussian halo below 0.5 must NOT count as foreground).
    enhanced_u8 = jnp.clip(enhanced, 0, 255)
    # Auto-invert when mostly white (reference get_contours :398).
    mean = jnp.mean(enhanced_u8)
    enhanced_u8 = jnp.where(mean > 127.0, 255.0 - enhanced_u8, enhanced_u8)
    fg = enhanced_u8 > 0
    return np.asarray(enhanced_u8).astype(np.uint8), fg, new_w / w, new_h / h


def extract_nodes(
    wire_mask: np.ndarray,
    bboxes: Sequence[BBox],
    cfg: Optional[TopologyConfig] = None,
) -> NodeExtraction:
    """Run the full node-extraction stage.

    wire_mask: (H, W) uint8 0/255 segmentation (SAM2 or classical), in the
        same coordinate space as `bboxes`.
    """
    cfg = cfg or TopologyConfig()
    if wire_mask is None:
        return NodeExtraction([], None, None, None, [])

    # 1. Component subtraction (preserve crossover/junction/circuit/vss).
    emptied = subtract_component_boxes(wire_mask, bboxes)

    # 2-3. Resize to analysis height + line enhancement (device).
    enhanced_u8, fg, sx, sy = _prepare_raster(emptied, cfg)
    new_h, new_w = fg.shape
    resized_bboxes = [b.scaled(sx, sy) for b in bboxes]

    # 4. Connected components + area filter (device).
    labels, stats = connected_components(
        fg, max_labels=cfg.max_labels, max_iters=256
    )
    rel_area = np.asarray(stats.contour_area) / float(new_h * new_w)
    keep = np.asarray(stats.valid) & (rel_area > cfg.contour_area_threshold)

    uniq = np.asarray(stats.labels)
    centroids = np.asarray(stats.centroid)
    lbl_bboxes = np.asarray(stats.bbox)

    # 5. Touch matrix over electrical components only (device).
    comp_indices = [
        i for i, b in enumerate(resized_bboxes) if b.class_name not in taxonomy.NON_COMPONENTS
    ]
    if not comp_indices or not keep.any():
        return NodeExtraction([], emptied, enhanced_u8, np.asarray(labels), resized_bboxes)

    comp_boxes = np.asarray(
        [
            [resized_bboxes[i].xmin, resized_bboxes[i].ymin, resized_bboxes[i].xmax, resized_bboxes[i].ymax]
            for i in comp_indices
        ],
        np.float32,
    )
    comp_thr = np.asarray(
        [
            taxonomy.pixel_threshold_for_class(resized_bboxes[i].class_name, cfg)
            for i in comp_indices
        ],
        np.float32,
    )
    bnd = boundary_mask(fg)
    # cv2.boundingRect is max-exclusive; widen label boxes by 1 to match
    # the reference broad phase (:1391-1400).
    broad_boxes = lbl_bboxes + np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)

    touch = np.asarray(
        touch_matrix(
            labels,
            bnd,
            jnp.asarray(uniq),
            jnp.asarray(broad_boxes, jnp.float32),
            jnp.asarray(keep),
            jnp.asarray(comp_boxes),
            jnp.asarray(comp_thr),
            jnp.ones(len(comp_indices), bool),
        )
    )

    # 6. Build per-label component lists in bbox-list order with UID dedupe
    # (reference :1431-1443).
    kept_label_rows = [k for k in range(len(uniq)) if keep[k]]
    node_records = []
    for node_id, k in enumerate(kept_label_rows):
        comps: list[BBox] = []
        seen: set[str] = set()
        for ci, gi in enumerate(comp_indices):
            if touch[k, ci]:
                b = resized_bboxes[gi]
                if b.persistent_uid in seen:
                    continue
                seen.add(b.persistent_uid)
                comps.append(b)
        cx, cy = centroids[k]
        node_records.append(
            {
                "old_id": node_id,
                "label": int(uniq[k]),
                "components": comps,
                "centroid": (int(cx), int(cy)),
                "area": float(rel_area[k]),
            }
        )

    valid_nodes = [r for r in node_records if r["components"]]
    if not valid_nodes:
        return NodeExtraction(
            [], emptied, enhanced_u8, np.asarray(labels), resized_bboxes,
            raw_node_count=len(node_records),
        )

    # 7. Ground selection (reference :1470-1545).
    ground_old_id = _select_ground(valid_nodes)

    # 8. Renumbering (reference :1547-1582).
    nodes = _renumber(valid_nodes, ground_old_id)
    return NodeExtraction(
        nodes, emptied, enhanced_u8, np.asarray(labels), resized_bboxes,
        raw_node_count=len(node_records),
    )


def _select_ground(valid_nodes: list[dict]) -> Optional[int]:
    """Ground = source-connected node lowest on screen; fallbacks to the
    max-connection node, then the lowest valid node (reference :1470-1545).
    Sorts are stable, preserving reference tie-break order."""
    source_candidates = [
        r
        for r in valid_nodes
        if any(c.class_name in taxonomy.SOURCE_COMPONENTS for c in r["components"])
    ]
    if source_candidates:
        best = sorted(source_candidates, key=lambda r: r["centroid"][1], reverse=True)[0]
        return best["old_id"]

    max_conn = max(len(r["components"]) for r in valid_nodes)
    nodes_with_max = [r for r in valid_nodes if len(r["components"]) == max_conn]
    if nodes_with_max:
        if len(nodes_with_max) > 1:
            best = sorted(nodes_with_max, key=lambda r: r["centroid"][1], reverse=True)[0]
            return best["old_id"]
        return nodes_with_max[0]["old_id"]
    best = sorted(valid_nodes, key=lambda r: r["centroid"][1], reverse=True)[0]
    return best["old_id"]


def _renumber(valid_nodes: list[dict], ground_old_id: Optional[int]) -> list[Node]:
    by_old = {r["old_id"]: r for r in valid_nodes}
    nodes: list[Node] = []
    if ground_old_id is not None and ground_old_id in by_old:
        g = by_old[ground_old_id]
        nodes.append(
            Node(id=0, components=g["components"], centroid=g["centroid"],
                 area=g["area"], label=g["label"])
        )
        next_id = 1
        for old_id in sorted(r["old_id"] for r in valid_nodes if r["old_id"] != ground_old_id):
            r = by_old[old_id]
            keep = len(r["components"]) >= 2 or (
                len(nodes) == 1 and len(valid_nodes) == 2 and len(r["components"]) > 0
            )
            if keep:
                nodes.append(
                    Node(id=next_id, components=r["components"], centroid=r["centroid"],
                         area=r["area"], label=r["label"])
                )
                next_id += 1
    else:
        next_id = 0
        for old_id in sorted(r["old_id"] for r in valid_nodes):
            r = by_old[old_id]
            if r["components"]:
                nodes.append(
                    Node(id=next_id, components=r["components"], centroid=r["centroid"],
                         area=r["area"], label=r["label"])
                )
                next_id += 1
    return nodes
