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


def contour_viz(shape_hw: tuple[int, int], contours: Sequence) -> np.ndarray:
    """Colored wire-contour debug image, BYTE-IDENTICAL to the reference
    get_contours viz (src/circuit_analyzer.py:405-458): black canvas,
    each kept contour's CHAIN_APPROX_SIMPLE polygon drawn with
    cv2.drawContours thickness 2 in the 15-color palette, red id at the
    int-truncated moments centroid + (10, 10)."""
    try:
        import cv2
    except Exception:  # pragma: no cover - cv2 always present in this env
        cv2 = None
    h, w = shape_hw
    out = np.zeros((h, w, 3), np.uint8)
    for i, ct in enumerate(contours):
        color = BRIGHT_COLORS[i % len(BRIGHT_COLORS)]
        cx, cy = ct.centroid if ct.m00 != 0 else (0, 0)  # reference :449-451
        if cv2 is not None:
            poly = np.asarray(ct.vertices, np.int32).reshape(-1, 1, 2)
            cv2.drawContours(out, [poly], -1, color, 2)
            cv2.putText(out, str(i), (int(cx) + 10, int(cy) + 10),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 0, 0), 2)
        else:  # pragma: no cover - structural fallback
            xs = np.clip(ct.vertices[:, 0], 0, w - 1)
            ys = np.clip(ct.vertices[:, 1], 0, h - 1)
            out[ys, xs] = color
    return out


def node_viz(
    resized_mask_u8: np.ndarray, nodes: Sequence[Node], contour_by_label: dict
) -> np.ndarray:
    """Final node visualization, BYTE-IDENTICAL to the reference
    (src/circuit_analyzer.py:1584-1599): the resized (pre-enhance)
    emptied mask GRAY2BGR, each final node's contour drawn green
    thickness 2 with its renumbered id in red at (cx-10, cy+10), scale
    0.9 — drawing skipped for zero-area contours, like the m00 guard."""
    try:
        import cv2
    except Exception:  # pragma: no cover
        cv2 = None
    base = np.ascontiguousarray(
        np.stack([np.asarray(resized_mask_u8, np.uint8)] * 3, axis=-1)
    )
    if cv2 is None:  # pragma: no cover - structural fallback
        return base
    for node in nodes:
        ct = contour_by_label.get(node.label)
        if ct is None or ct.m00 == 0:
            continue
        cx, cy = ct.centroid
        poly = np.asarray(ct.vertices, np.int32).reshape(-1, 1, 2)
        cv2.drawContours(base, [poly], -1, (0, 255, 0), 2)
        cv2.putText(base, str(node.id), (int(cx) - 10, int(cy) + 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.9, (0, 0, 255), 2)
    return base


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
