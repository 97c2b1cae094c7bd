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
