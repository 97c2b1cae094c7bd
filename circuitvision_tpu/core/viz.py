"""Host-side visualization + summary utilities.

Re-implements the reference's annotation/stat helpers:
  - create_annotated_image  (src/utils.py:363-408)
  - calculate_component_stats (src/utils.py:410-430) — see also
    CircuitAnalyzerTPU._component_stats
  - summarize_components    (src/utils.py:109-122)
  - contour/node debug overlays (src/circuit_analyzer.py:415-458, 1584-1603)
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from .types import BBox, Node

#: 15-color debug palette (src/circuit_analyzer.py:415-431)
BRIGHT_COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (0, 255, 255),
    (255, 0, 255), (255, 128, 0), (128, 0, 255), (0, 255, 128),
    (255, 192, 203), (173, 216, 230), (255, 165, 0), (127, 255, 212),
    (240, 230, 140), (255, 105, 180),
]


def create_annotated_image(image: np.ndarray, bboxes: Sequence[BBox]) -> np.ndarray:
    """Green boxes + red class/confidence labels on a white strip."""
    try:
        import cv2
    except Exception:  # pragma: no cover - cv2 always present in this env
        return image.copy()
    out = np.ascontiguousarray(image.copy())
    for b in bboxes:
        cv2.rectangle(out, (b.xmin, b.ymin), (b.xmax, b.ymax), (0, 255, 0), 2)
        label = f"{b.class_name}: {b.confidence:.2f}"
        (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(out, (b.xmin, b.ymin - th - 5), (b.xmin + tw, b.ymin),
                      (255, 255, 255), -1)
        cv2.putText(out, label, (b.xmin, b.ymin - 5), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (0, 0, 255), 1)
    return out


def summarize_components(bboxes: Sequence[BBox]) -> str:
    """'Detected: 2 Resistors, 1 Voltage Dc' summary line."""
    counts: dict[str, int] = {}
    for b in bboxes:
        name = b.class_name.replace(".", " ").title()
        counts[name] = counts.get(name, 0) + 1
    if not counts:
        return "Detected: nothing"
    parts = [f"{n} {name}{'s' if n > 1 else ''}" for name, n in counts.items()]
    return "Detected: " + ", ".join(parts)


def _region_boundary(region: np.ndarray) -> np.ndarray:
    """Boundary of a boolean region: pixels with any 8-neighbor outside
    (image border counts as outside, like cv2.findContours)."""
    er = region.copy()
    padded = np.pad(region, 1, mode="constant")
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            er &= padded[1 + dy : 1 + dy + region.shape[0],
                         1 + dx : 1 + dx + region.shape[1]]
    return region & ~er


def _dilate_bool(mask: np.ndarray, radius: int) -> np.ndarray:
    out = np.zeros_like(mask)
    padded = np.pad(mask, radius, mode="constant")
    h, w = mask.shape
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx <= radius * radius:
                out |= padded[radius + dy : radius + dy + h,
                              radius + dx : radius + dx + w]
    return out


def contour_viz(
    label_image: np.ndarray,
    kept_labels: Sequence[int],
    centroids: Sequence[tuple[int, int]],
) -> np.ndarray:
    """Colored wire-contour debug image (reference get_contours viz,
    src/circuit_analyzer.py:405-458): each kept contour outlined ~2 px
    thick in the 15-color palette with its red id at the centroid."""
    try:
        import cv2
    except Exception:  # pragma: no cover
        cv2 = None
    h, w = label_image.shape[:2]
    out = np.zeros((h, w, 3), np.uint8)
    for i, (lbl, (cx, cy)) in enumerate(zip(kept_labels, centroids)):
        region = label_image == lbl
        bnd = _dilate_bool(_region_boundary(region), 1)  # thickness ≈ 2
        out[bnd] = BRIGHT_COLORS[i % len(BRIGHT_COLORS)]
        if cv2 is not None:
            cv2.putText(out, str(i), (int(cx) + 10, int(cy) + 10),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 0, 0), 2)
    return out


def connection_points_viz(
    contour_img: np.ndarray, points: Sequence[tuple[int, int]]
) -> np.ndarray:
    """Contour viz + filled cyan circles at every terminal contact point
    (reference src/circuit_analyzer.py:1598-1601)."""
    try:
        import cv2
    except Exception:  # pragma: no cover
        cv2 = None
    out = np.ascontiguousarray(contour_img.copy())
    for x, y in points:
        if cv2 is not None:
            cv2.circle(out, (int(x), int(y)), 5, (0, 255, 255), -1)
        else:
            out[max(0, int(y) - 2) : int(y) + 3, max(0, int(x) - 2) : int(x) + 3] = (
                0, 255, 255,
            )
    return out


def node_overlay(
    mask_or_image: np.ndarray, nodes: Sequence[Node], label_image: np.ndarray = None
) -> np.ndarray:
    """Node visualization: colored regions + node ids at centroids."""
    try:
        import cv2
    except Exception:  # pragma: no cover
        return np.asarray(mask_or_image)
    base = np.asarray(mask_or_image)
    if base.ndim == 2:
        base = np.stack([base] * 3, axis=-1)
    out = np.ascontiguousarray(base.astype(np.uint8).copy())
    for node in nodes:
        if label_image is not None and node.label >= 0:
            color = BRIGHT_COLORS[node.id % len(BRIGHT_COLORS)]
            region = label_image == node.label
            out[region] = color
        cx, cy = int(node.centroid[0]), int(node.centroid[1])
        cv2.putText(out, str(node.id), (cx - 10, cy + 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.9, (0, 0, 255), 2)
    return out
