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


def _cv2_resize_u8(img_f32, out_hw):
    """cv2.resize INTER_LINEAR on uint8 data: plain (non-antialiased)
    bilinear, result materialized back to integer grey values — the
    reference resizes the uint8 emptied mask BEFORE blurring
    (src/circuit_analyzer.py:787-809), so the blur must see rounded
    integers, not the float interpolants."""
    return jnp.clip(
        jnp.round(resize_bilinear(img_f32, out_hw, antialias=False)), 0, 255
    )


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
    #: colored contour outlines + ids (reference :405-458); fetch_viz only
    contour_viz: Optional[np.ndarray] = None
    #: contour viz + cyan terminal contact points (reference :1598-1601)
    connection_viz: Optional[np.ndarray] = None
    #: final nodes drawn on the resized pre-enhance mask (reference
    #: :1584-1599); fetch_viz only
    node_viz: Optional[np.ndarray] = None


def _enhance_chain(resized: jax.Array, cfg: TopologyConfig) -> jax.Array:
    """resize output → enhance_lines → uint8 quantize → auto-invert.

    Shared by the single-image fused program and the batched per-image
    stage so both paths run bit-identical raster semantics.
    """
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
    return jnp.where(mean > 127.0, 255.0 - enhanced_u8, enhanced_u8)


def _label_touch_stage(fg, wid_f32, cfg, comp_boxes, comp_thr, comp_valid):
    """CC labeling → stats → touch matrix on a binarized raster.

    `wid_f32` is the ACTUAL raster width (the raster may carry background
    zero-padding to a bucketed width; padding changes no label, stat, or
    touch result, but relative areas must use the true extent).
    """
    new_h = fg.shape[0]
    labels = label_components(fg, max_iters=256)
    stats = label_stats(labels, max_labels=cfg.max_labels)
    rel_area = stats.contour_area / (float(new_h) * wid_f32)
    keep = stats.valid & (rel_area > cfg.contour_area_threshold)
    bnd = boundary_mask(fg)
    # cv2.boundingRect is max-exclusive; widen label boxes by 1 to
    # match the reference broad phase (:1391-1400).
    broad = stats.bbox + jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
    touch = touch_matrix(
        labels, bnd, stats.labels, broad, keep, comp_boxes, comp_thr, comp_valid
    )
    return labels, stats, rel_area, keep, touch


@functools.lru_cache(maxsize=32)
def _topology_program(cfg: TopologyConfig, in_h: int, in_w: int, with_viz: bool):
    """One jit program for the single-image raster topology stage:
    resize → enhance → bit-packed binarized raster (for the host contour
    stage, which computes the node graph with cv2-exact polygon
    semantics). One dispatch, one small fetch — single-image latency on
    remote-attached TPUs is round-trip-bound (~420 ms of a 650 ms
    analyze() before fusing). The viz flavor additionally emits the CC
    label image (256-iteration propagation) and the pre-enhance resize
    for the contour/node visualizations; throughput callers
    (fetch_viz=False) get a program without that work at all — as a jit
    output it could not be dead-code-eliminated."""
    new_h, new_w = cfg.resize_height, int(cfg.resize_height * (in_w / in_h))
    w8 = (new_w + 7) // 8

    def program(mask_f32):
        resized = _cv2_resize_u8(mask_f32, (new_h, new_w))
        enhanced_u8 = _enhance_chain(resized, cfg)
        fg = enhanced_u8 > 0
        m = fg.astype(jnp.uint32)
        padded = jnp.pad(m, ((0, 0), (0, w8 * 8 - new_w)))
        bits = padded.reshape(new_h, w8, 8)
        weights = jnp.asarray((128, 64, 32, 16, 8, 4, 2, 1), jnp.uint32)
        packed = (bits * weights).sum(-1).astype(jnp.uint8)
        if not with_viz:
            return (packed,)
        labels = label_components(fg, max_iters=256)
        # `resized` (pre-enhance) is the base of the reference's node
        # visualization (src/circuit_analyzer.py:1584-1586); fetched
        # only when cv2 is absent.
        return enhanced_u8, labels, packed, resized

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

    program, (new_h, new_w) = _topology_program(cfg, in_h, in_w, bool(fetch_viz))
    sx, sy = new_w / in_w, new_h / in_h
    resized_bboxes = [b.scaled(sx, sy) for b in bboxes]

    # Electrical components only, padded to a static bucket.
    comp_indices, comp_boxes, comp_thr, comp_valid = _component_arrays(
        resized_bboxes, cfg
    )

    # 2. One device dispatch for resize→enhance→pack (+ label/viz flavor).
    outs = program(jnp.asarray(emptied, jnp.float32))
    if fetch_viz:
        enhanced_dev, labels_dev, packed_dev, resized_dev = outs
    else:
        (packed_dev,) = outs

    # One batched host fetch (sequential np.asarray calls each pay a full
    # round trip on remote-attached TPUs). The resized (pre-enhance)
    # raster is only needed as the node-viz BASE when cv2 is absent —
    # with cv2 present the base is recomputed on host with cv2.resize
    # for byte parity, so skip that transfer entirely.
    try:
        import cv2 as _cv2
    except ImportError:  # pragma: no cover - cv2 always present in env
        _cv2 = None
    fetch = [packed_dev]
    if fetch_viz:
        fetch += [enhanced_dev, labels_dev]
        if _cv2 is None:
            fetch.append(resized_dev)
    fetched = jax.device_get(fetch)
    fg = np.unpackbits(fetched[0], axis=1)[:, :new_w].astype(bool)
    if fetch_viz:
        enhanced_u8 = fetched[1].astype(np.uint8)
        labels = fetched[2]
        resized_u8 = fetched[3].astype(np.uint8) if _cv2 is None else None
    else:
        enhanced_u8 = None
        labels = None
        resized_u8 = None

    # 3-5. cv2-exact contour trace / polygon stats / vertex touch on host
    # (host_cc.contour_touch_stage_host) — identical backend to the
    # batched path, so single and batch netlists agree by construction.
    from .host_cc import contour_touch_stage_host

    centroids, rel_area, touch, contours = contour_touch_stage_host(
        fg, float(new_w), cfg, comp_boxes, comp_thr, comp_valid
    )
    touch = touch[:, : len(comp_indices)]
    k = len(rel_area)
    if not comp_indices or k == 0:
        return NodeExtraction([], emptied, enhanced_u8, labels, resized_bboxes)

    nodes, raw_count = _assemble_nodes(
        resized_bboxes, comp_indices, np.arange(k), centroids, rel_area,
        np.ones(k, bool), touch,
    )
    cviz = pviz = nviz = None
    if fetch_viz and labels is not None:
        from ..core.viz import connection_points_viz, contour_viz, node_viz

        cviz = contour_viz((new_h, new_w), contours)
        pts = _connection_points(contours, touch, resized_bboxes, comp_indices, cfg)
        pviz = connection_points_viz(cviz, pts)
        # node.label is the compacted contour index in this path
        # (_assemble_nodes receives np.arange(k) as the label ids).
        # Base raster: the debug-viz layer draws with cv2 (putText,
        # drawContours), so when cv2 is present the base also uses
        # cv2.resize for BYTE parity with the reference image — the
        # first-party device resize agrees to ±1 gray (fixed-point
        # rounding), which never affects the analysis raster's
        # binarization (netlist parity pinned reference-wide) but would
        # fail a pixel-equality check on this debug image.
        if _cv2 is not None:
            nviz_base = _cv2.resize(
                emptied, (new_w, new_h), interpolation=_cv2.INTER_LINEAR
            )
        else:
            nviz_base = resized_u8
        nviz = node_viz(nviz_base, nodes, dict(enumerate(contours)))
    return NodeExtraction(
        nodes, emptied, enhanced_u8, labels, resized_bboxes,
        raw_node_count=raw_count, contour_viz=cviz, connection_viz=pviz,
        node_viz=nviz,
    )


def _connection_points(
    contours, touch, resized_bboxes, comp_indices, cfg
) -> list[tuple[int, int]]:
    """First contour vertex matching each touching (component, contour)
    pair — the point the reference appends before `break`ing its walk
    (src/circuit_analyzer.py:1423-1443)."""
    points: list[tuple[int, int]] = []
    for k, ct in enumerate(contours):
        row = touch[k]
        if not row.any():
            continue
        xs = ct.vertices[:, 0].astype(np.int64)
        ys = ct.vertices[:, 1].astype(np.int64)
        for ci, gi in enumerate(comp_indices):
            if not row[ci]:
                continue
            b = resized_bboxes[gi]
            t = taxonomy.pixel_threshold_for_class(b.class_name, cfg)
            inside = (xs >= b.xmin) & (xs <= b.xmax) & (ys >= b.ymin) & (ys <= b.ymax)
            near = (
                (np.abs(xs - b.xmin) <= t)
                | (np.abs(xs - b.xmax) <= t)
                | (np.abs(ys - b.ymin) <= t)
                | (np.abs(ys - b.ymax) <= t)
            )
            sel = np.nonzero(inside | near)[0]
            if len(sel):
                points.append((int(xs[sel[0]]), int(ys[sel[0]])))
    return points


def _assemble_nodes(
    resized_bboxes, comp_indices, uniq, centroids, rel_area, keep, touch
) -> tuple[list[Node], int]:
    """Host bookkeeping from fetched device stats: per-label component
    lists → ground selection → renumbering (reference :1431-1582)."""
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
        return [], len(node_records)

    # 7. Ground selection (reference :1470-1545).
    ground_old_id = _select_ground(valid_nodes)

    # 8. Renumbering (reference :1547-1582).
    return _renumber(valid_nodes, ground_old_id), len(node_records)


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


def _component_arrays(resized_bboxes, cfg: TopologyConfig, bucket: Optional[int] = None):
    """Electrical-component boxes padded to a static bucket (jit inputs)."""
    comp_indices = [
        i
        for i, b in enumerate(resized_bboxes)
        if b.class_name not in taxonomy.NON_COMPONENTS
    ]
    bucket = bucket or _comp_bucket(max(1, len(comp_indices)))
    comp_boxes = np.zeros((bucket, 4), np.float32)
    comp_thr = np.zeros(bucket, np.float32)
    comp_valid = np.zeros(bucket, bool)
    for col, i in enumerate(comp_indices):
        b = resized_bboxes[i]
        comp_boxes[col] = (b.xmin, b.ymin, b.xmax, b.ymax)
        comp_thr[col] = taxonomy.pixel_threshold_for_class(b.class_name, cfg)
        comp_valid[col] = True
    return comp_indices, comp_boxes, comp_thr, comp_valid


def _subtract_arrays(bboxes, h: int, w: int, bucket: Optional[int] = None):
    """Boxes to zero out of the mask (everything not mask-preserved),
    pre-clamped to the raster exactly like subtract_component_boxes."""
    sub = [
        (max(0, int(b.xmin)), max(0, int(b.ymin)), min(w, int(b.xmax)), min(h, int(b.ymax)))
        for b in bboxes
        if b.class_name not in taxonomy.MASK_PRESERVE_CLASSES
    ]
    sub = [(x0, y0, x1, y1) for (x0, y0, x1, y1) in sub if x0 < x1 and y0 < y1]
    bucket = bucket or _comp_bucket(max(1, len(sub)))
    boxes = np.zeros((bucket, 4), np.float32)
    valid = np.zeros(bucket, bool)
    for col, bb in enumerate(sub):
        boxes[col] = bb
        valid[col] = True
    return boxes, valid


@functools.lru_cache(maxsize=64)
def _batched_stage_a(cfg: TopologyConfig, in_h: int, in_w: int, sub_bucket: int):
    """Per-image raster prep for the batched path: device-side component
    subtraction → resize to the 600-row analysis raster → enhance →
    quantize/auto-invert. Output stays on device for stage B; bit-identical
    to the single-image path (host subtraction + _topology_program prefix).
    """
    new_h, new_w = cfg.resize_height, int(cfg.resize_height * (in_w / in_h))

    w8 = (new_w + 7) // 8

    def program(mask_u8, sub_boxes, sub_valid):
        ys = jnp.arange(in_h, dtype=jnp.float32)[:, None, None]
        xs = jnp.arange(in_w, dtype=jnp.float32)[None, :, None]
        in_box = (
            (xs >= sub_boxes[:, 0])
            & (xs < sub_boxes[:, 2])
            & (ys >= sub_boxes[:, 1])
            & (ys < sub_boxes[:, 3])
            & sub_valid
        ).any(-1)
        emptied = jnp.where(in_box, 0.0, mask_u8.astype(jnp.float32))
        resized = _cv2_resize_u8(emptied, (new_h, new_w))
        enhanced = _enhance_chain(resized, cfg)
        # Bit-packed copy for the host-CC path (np.unpackbits order) —
        # fused here so the host path costs ONE dispatch per image.
        m = (enhanced > 0).astype(jnp.uint32)
        padded = jnp.pad(m, ((0, 0), (0, w8 * 8 - new_w)))
        bits = padded.reshape(new_h, w8, 8)
        weights = jnp.asarray((128, 64, 32, 16, 8, 4, 2, 1), jnp.uint32)
        packed = (bits * weights).sum(-1).astype(jnp.uint8)
        return enhanced, packed

    return jax.jit(program), (new_h, new_w)


@functools.lru_cache(maxsize=32)
def _batched_stage_b(cfg: TopologyConfig, batch: int, pad_w: int, comp_bucket: int):
    """Chunk-wide CC/stats/touch: ONE dispatch + ONE fetch for a whole
    batch of analysis rasters (each zero-padded on the right to pad_w —
    background padding provably changes no label, stat, boundary, or
    touch result; true widths feed the relative-area threshold)."""

    def single(enhanced_u8, wid, comp_boxes, comp_thr, comp_valid):
        fg = enhanced_u8 > 0
        labels, stats, rel_area, keep, touch = _label_touch_stage(
            fg, wid, cfg, comp_boxes, comp_thr, comp_valid
        )
        del labels
        return stats.labels, stats.centroid, rel_area, keep, touch

    return jax.jit(jax.vmap(single))


@dataclasses.dataclass
class PackedRaster:
    """Device handle for one image's prepared analysis raster (stage-A
    output): bit-packed 600-row binarized enhance chain, plus the resize
    geometry needed to finish extraction on host."""

    packed_dev: object  # (new_h, ceil(new_w/8)) uint8, device-resident
    in_shape: tuple[int, int]
    new_h: int
    new_w: int


def prepare_packed_raster(mask, bboxes: Sequence[BBox], cfg: TopologyConfig) -> PackedRaster:
    """Dispatch stage-A (subtract → resize → enhance → bit-pack) for one
    image and start an async device→host copy of the packed raster.

    Subtraction depends only on each box's coordinates and whether its
    class is mask-preserved — properties unchanged by the later
    reclassify/enrich host stages ('terminal'→'voltage.dc' flips the
    touch threshold, not preserve-set membership) — so callers may run
    this as soon as crop-adjusted boxes exist and overlap the fetch with
    other work; `finish_from_packed` applies the final post-reclassify
    classes."""
    in_h, in_w = mask.shape[:2]
    sub_boxes, sub_valid = _subtract_arrays(bboxes, in_h, in_w)
    prog_a, (new_h, new_w) = _batched_stage_a(cfg, in_h, in_w, sub_boxes.shape[0])
    _enh, packed = prog_a(
        jnp.asarray(mask), jnp.asarray(sub_boxes), jnp.asarray(sub_valid)
    )
    try:
        packed.copy_to_host_async()
    except Exception:  # pragma: no cover - platform without async copies
        pass
    return PackedRaster(packed, (in_h, in_w), new_h, new_w)


def finish_from_packed(
    packed_host: np.ndarray,
    pr: PackedRaster,
    bboxes: Sequence[BBox],
    cfg: TopologyConfig,
    comp_bucket: Optional[int] = None,
) -> NodeExtraction:
    """Host half of batched extraction: unpack the raster → cv2-exact
    contour trace / polygon stats / vertex touch (host_cc.
    contour_touch_stage_host) → assemble nodes. `bboxes` are the final
    (post-reclassify/enrich) boxes; only their classes may differ from
    the ones used at prepare time."""
    from .host_cc import contour_touch_stage_host

    in_h, in_w = pr.in_shape
    sx, sy = pr.new_w / in_w, pr.new_h / in_h
    resized_bboxes = [b.scaled(sx, sy) for b in bboxes]
    comp_indices, cb, ct, cv = _component_arrays(
        resized_bboxes, cfg, bucket=comp_bucket
    )
    fg = np.unpackbits(packed_host, axis=1)[:, : pr.new_w].astype(bool)
    centroids, rel_area, touch, _contours = contour_touch_stage_host(
        fg, float(pr.new_w), cfg, cb, ct, cv
    )
    touch = touch[:, : len(comp_indices)]
    k = len(rel_area)
    if not comp_indices or k == 0:
        return NodeExtraction([], None, None, None, resized_bboxes)
    nodes, raw_count = _assemble_nodes(
        resized_bboxes, comp_indices, np.arange(k), centroids, rel_area,
        np.ones(k, bool), touch,
    )
    return NodeExtraction(
        nodes, None, None, None, resized_bboxes, raw_node_count=raw_count
    )


def extract_nodes_batched(
    masks: Sequence,
    bboxes_list: Sequence[Sequence[BBox]],
    cfg: Optional[TopologyConfig] = None,
    pad_to: Optional[int] = None,
    device_cc: bool = False,
) -> list[NodeExtraction]:
    """Node extraction over a whole batch with TWO device round trips
    (stage-A dispatches are fetch-free) instead of 2×B.

    masks: per-image (H_i, W_i) uint8 0/255 wire masks — numpy arrays or
        device-resident jax arrays (e.g. straight from the batched SAM2
        mask program, avoiding a host round trip entirely).
    pad_to: pad the batch dim to this size so chunked callers reuse one
        compiled program for partial final chunks (device_cc path only).
    device_cc: run the CC/stats/touch stage on device (the original
        batched formulation). Default False: raster prep (subtraction,
        resize, morphology) stays on device, then the binarized analysis
        raster comes back bit-packed and CC/stats/touch run at C speed on
        host (topology/host_cc.py) — the device CC's gather/scatter
        fixpoint costs ~100 ms/image on v5e vs ~10 ms/image host, and was
        the single largest cost of the end-to-end path (PERF.md).

    Produces the same nodes as per-image extract_nodes (parity-tested);
    viz artifacts (emptied/enhanced/label images) are not materialized —
    this is the throughput path (`fetch_viz=False` semantics).
    """
    cfg = cfg or TopologyConfig()
    n = len(masks)
    if n == 0:
        return []

    if not device_cc:
        prs = [
            prepare_packed_raster(m, bbs, cfg)
            for m, bbs in zip(masks, bboxes_list)
        ]
        packed_host = jax.device_get([pr.packed_dev for pr in prs])
        return [
            finish_from_packed(ph, pr, bbs, cfg)
            for ph, pr, bbs in zip(packed_host, prs, bboxes_list)
        ]

    enhanced = []
    packed_rasters = []
    metas = []  # (resized_bboxes, comp_indices, comp arrays, new_w)
    comp_bucket = max(
        _comp_bucket(
            max(
                1,
                sum(
                    1
                    for b in bbs
                    if b.class_name not in taxonomy.NON_COMPONENTS
                ),
            )
        )
        for bbs in bboxes_list
    )
    for mask, bboxes in zip(masks, bboxes_list):
        in_h, in_w = mask.shape[:2]
        sub_boxes, sub_valid = _subtract_arrays(bboxes, in_h, in_w)
        prog_a, (new_h, new_w) = _batched_stage_a(
            cfg, in_h, in_w, sub_boxes.shape[0]
        )
        enh, packed = prog_a(
            jnp.asarray(mask), jnp.asarray(sub_boxes), jnp.asarray(sub_valid)
        )
        enhanced.append(enh)
        packed_rasters.append(packed)
        sx, sy = new_w / in_w, new_h / in_h
        resized_bboxes = [b.scaled(sx, sy) for b in bboxes]
        comp_indices, comp_boxes, comp_thr, comp_valid = _component_arrays(
            resized_bboxes, cfg, bucket=comp_bucket
        )
        metas.append(
            (resized_bboxes, comp_indices, comp_boxes, comp_thr, comp_valid, new_w)
        )

    pad_w = max(((e.shape[1] + 127) // 128) * 128 for e in enhanced)
    batch = max(pad_to or 0, n)
    stack = [jnp.pad(e, ((0, 0), (0, pad_w - e.shape[1]))) for e in enhanced]
    while len(stack) < batch:
        stack.append(jnp.zeros((cfg.resize_height, pad_w), jnp.float32))
    prog_b = _batched_stage_b(cfg, batch, pad_w, comp_bucket)
    widths = np.asarray(
        [m[5] for m in metas] + [pad_w] * (batch - n), np.float32
    )
    out = prog_b(
        jnp.stack(stack),
        jnp.asarray(widths),
        jnp.asarray(np.stack([m[2] for m in metas] + [metas[0][2]] * (batch - n))),
        jnp.asarray(np.stack([m[3] for m in metas] + [metas[0][3]] * (batch - n))),
        jnp.asarray(np.stack([m[4] for m in metas] + [metas[0][4]] * (batch - n))),
    )
    uniq_b, centroids_b, rel_area_b, keep_b, touch_b = jax.device_get(out)

    results = []
    for i, (resized_bboxes, comp_indices, _cb, _ct, _cv, _w) in enumerate(metas):
        keep = keep_b[i]
        touch = touch_b[i][:, : len(comp_indices)]
        if not comp_indices or not keep.any():
            results.append(NodeExtraction([], None, None, None, resized_bboxes))
            continue
        nodes, raw_count = _assemble_nodes(
            resized_bboxes, comp_indices, uniq_b[i], centroids_b[i],
            rel_area_b[i], keep, touch,
        )
        results.append(
            NodeExtraction(
                nodes, None, None, None, resized_bboxes, raw_node_count=raw_count
            )
        )
    return results
