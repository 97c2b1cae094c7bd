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
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import taxonomy
from ..core.config import TopologyConfig
from ..core.types import BBox, Node
from ..ops.cc import label_components, label_stats
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


@functools.lru_cache(maxsize=32)
def _topology_program(cfg: TopologyConfig, in_h: int, in_w: int, max_comp: int):
    """One jit program for the whole raster topology stage.

    The stage previously ran as ~8 separate dispatches (resize, enhance,
    label, stats, boundary, touch, plus eager glue) — each paying a full
    host↔device round trip, which dominates single-image latency on
    remote-attached TPUs (~420 ms of a 650 ms analyze() measured). Fused,
    it is one dispatch and a few-KB result fetch.
    """
    new_h, new_w = cfg.resize_height, int(cfg.resize_height * (in_w / in_h))

    def program(mask_f32, comp_boxes, comp_thr, comp_valid):
        resized = resize_bilinear(mask_f32, (new_h, new_w))
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
        enhanced_u8 = jnp.clip(enhanced, 0, 255)
        mean = jnp.mean(enhanced_u8)
        enhanced_u8 = jnp.where(mean > 127.0, 255.0 - enhanced_u8, enhanced_u8)
        fg = enhanced_u8 > 0

        labels = label_components(fg, max_iters=256)
        stats = label_stats(labels, max_labels=cfg.max_labels)
        rel_area = stats.contour_area / float(new_h * new_w)
        keep = stats.valid & (rel_area > cfg.contour_area_threshold)
        bnd = boundary_mask(fg)
        # cv2.boundingRect is max-exclusive; widen label boxes by 1 to
        # match the reference broad phase (:1391-1400).
        broad = stats.bbox + jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
        touch = touch_matrix(
            labels, bnd, stats.labels, broad, keep, comp_boxes, comp_thr, comp_valid
        )
        return enhanced_u8, labels, stats, rel_area, keep, touch

    return jax.jit(program), (new_h, new_w)


def _comp_bucket(n: int) -> int:
    for size in (32, 64, 128, 256):
        if n <= size:
            return size
    return ((n + 255) // 256) * 256


def extract_nodes(
    wire_mask: np.ndarray,
    bboxes: Sequence[BBox],
    cfg: Optional[TopologyConfig] = None,
    fetch_viz: bool = True,
) -> NodeExtraction:
    """Run the full node-extraction stage.

    wire_mask: (H, W) uint8 0/255 segmentation (SAM2 or classical), in the
        same coordinate space as `bboxes`.
    fetch_viz: also pull the enhanced mask + label image to host (each is a
        full raster transfer — skip for throughput paths that only need the
        node graph).
    """
    cfg = cfg or TopologyConfig()
    if wire_mask is None:
        return NodeExtraction([], None, None, None, [])

    # 1. Component subtraction (preserve crossover/junction/circuit/vss).
    emptied = subtract_component_boxes(wire_mask, bboxes)
    in_h, in_w = emptied.shape[:2]

    program, (new_h, new_w) = _topology_program(cfg, in_h, in_w, 0)
    sx, sy = new_w / in_w, new_h / in_h
    resized_bboxes = [b.scaled(sx, sy) for b in bboxes]

    # Electrical components only, padded to a static bucket.
    comp_indices = [
        i for i, b in enumerate(resized_bboxes) if b.class_name not in taxonomy.NON_COMPONENTS
    ]
    bucket = _comp_bucket(max(1, len(comp_indices)))
    comp_boxes = np.zeros((bucket, 4), np.float32)
    comp_thr = np.zeros(bucket, np.float32)
    comp_valid = np.zeros(bucket, bool)
    for col, i in enumerate(comp_indices):
        b = resized_bboxes[i]
        comp_boxes[col] = (b.xmin, b.ymin, b.xmax, b.ymax)
        comp_thr[col] = taxonomy.pixel_threshold_for_class(b.class_name, cfg)
        comp_valid[col] = True

    # 2-5. One device dispatch for resize→enhance→CC→stats→touch.
    enhanced_dev, labels_dev, stats, rel_area_dev, keep_dev, touch_dev = program(
        jnp.asarray(emptied, jnp.float32),
        jnp.asarray(comp_boxes),
        jnp.asarray(comp_thr),
        jnp.asarray(comp_valid),
    )

    # One batched host fetch for the few-KB bookkeeping arrays (sequential
    # np.asarray calls each pay a full round trip on remote-attached TPUs).
    fetch = [rel_area_dev, keep_dev, stats.labels, stats.centroid, touch_dev]
    if fetch_viz:
        fetch += [enhanced_dev, labels_dev]
    fetched = jax.device_get(fetch)
    rel_area, keep, uniq, centroids, touch = fetched[:5]
    touch = touch[:, : len(comp_indices)]
    if fetch_viz:
        enhanced_u8 = fetched[5].astype(np.uint8)
        labels = fetched[6]
    else:
        enhanced_u8 = None
        labels = None

    if not comp_indices or not keep.any():
        return NodeExtraction([], emptied, enhanced_u8, labels, resized_bboxes)

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
            [], emptied, enhanced_u8, labels, resized_bboxes,
            raw_node_count=len(node_records),
        )

    # 7. Ground selection (reference :1470-1545).
    ground_old_id = _select_ground(valid_nodes)

    # 8. Renumbering (reference :1547-1582).
    nodes = _renumber(valid_nodes, ground_old_id)
    return NodeExtraction(
        nodes, emptied, enhanced_u8, labels, resized_bboxes,
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
