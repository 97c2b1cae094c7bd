"""Component enumeration: draw visual IDs for the VLM value pass.

Re-implements enumerate_components (src/circuit_analyzer.py:479-785):
eight candidate positions around each component are tested against the
component itself, other components, schematic text boxes, and previously
drawn numbers; the closest valid position wins; a cascading fallback
places unplaceable numbers near the top-left corner.

Rendering happens on host (this image is network-bound VLM input, never
device compute); cv2.putText is used with the reference's exact font
metrics so visual-id geometry matches.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np

from ..core import taxonomy
from ..core.types import BBox

try:  # pragma: no cover - environment probe
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _overlap_area(a: tuple, b: tuple) -> int:
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    iw = max(0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0, min(ay1, by1) - max(ay0, by0))
    return iw * ih


def _text_size(text: str, font_scale: float, thickness: int) -> tuple[int, int]:
    if _HAS_CV2:
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, font_scale, thickness)
        return tw, th
    # Hershey simplex approximation if cv2 is absent.
    return int(len(text) * 19 * font_scale), int(22 * font_scale)


def _draw_number(img: np.ndarray, text: str, org: tuple[int, int], font_scale: float, thickness: int) -> None:
    if _HAS_CV2:
        cv2.putText(img, text, org, cv2.FONT_HERSHEY_SIMPLEX, font_scale,
                    (255, 255, 255), thickness + 2, cv2.LINE_AA)
        # The reference passes (0, 0, 255) ("red in BGR") to putText on
        # what is actually the RGB pipeline image (src/circuit_analyzer.py
        # :497, :757-760) — its digits render BLUE. Reproduced verbatim
        # for pixel parity of the VLM input image (pinned in
        # tests/test_reference_diff.py).
        cv2.putText(img, text, org, cv2.FONT_HERSHEY_SIMPLEX, font_scale,
                    (0, 0, 255) if img.shape[-1] == 3 else 255, thickness, cv2.LINE_AA)
    else:  # pragma: no cover
        from PIL import Image, ImageDraw

        pil = Image.fromarray(img)
        # Same literal color quirk as the cv2 path: the reference
        # passes BGR-red (0,0,255) onto the RGB image.
        ImageDraw.Draw(pil).text((org[0], org[1] - 16), text, fill=(0, 0, 255))
        img[:] = np.asarray(pil)


def _candidate_positions(b: BBox, tw: int, th: int) -> list[tuple[int, int]]:
    """Eight positions around the component (reference :602-612),
    in declaration order for tie stability."""
    pad = 5
    cx = b.xmin + b.width // 2
    cy = b.ymin + b.height // 2
    half_w, half_h = tw // 2, th // 2
    return [
        (b.xmax + pad, cy - half_h),  # right_middle
        (b.xmin - tw - pad, cy - half_h),  # left_middle
        (cx - half_w, b.ymin - th - pad),  # top_center
        (cx - half_w, b.ymax + pad),  # bottom_center
        (b.xmax + pad, b.ymin - th),  # top_right_corner_out
        (b.xmin - tw - pad, b.ymin - th),  # top_left_corner_out
        (b.xmax + pad, b.ymax),  # bottom_right_corner_out
        (b.xmin - tw - pad, b.ymax),  # bottom_left_corner_out
    ]


def assign_visual_ids(
    bboxes: Sequence[BBox],
    excluded_labels: Optional[frozenset] = None,
) -> list[BBox]:
    """The ID half of enumerate_components without the drawing half.

    Visual ids are assigned by a sequential counter over the non-excluded
    boxes in input order (reference :479-785) — the digit PLACEMENT search
    never affects which id a component gets, only where its digit lands
    on the image. Box-driven readers (enrich/trained_reader.py) are handed
    the id'd boxes directly and never OCR the digits, so the pipeline can
    skip the ~4 ms/img host draw for them (measured on a 520×720 crop;
    the black-box VLM path still draws via enumerate_components)."""
    excluded = (
        excluded_labels if excluded_labels is not None
        else taxonomy.NON_COMPONENTS
    )
    out_boxes: list[BBox] = []
    counter = 0
    for b in bboxes:
        if b.class_name in excluded:
            continue
        counter += 1
        out = dataclasses.replace(b)
        out.visual_id = counter
        out_boxes.append(out)
    return out_boxes


def enumerate_components(
    image: np.ndarray,
    bboxes: Sequence[BBox],
    excluded_labels: Optional[frozenset] = None,
) -> tuple[np.ndarray, list[BBox]]:
    """Draw visual IDs next to electrical components. Returns
    (annotated image copy, boxes-with-visual-ids)."""
    img = np.asarray(image).copy()
    h, w = img.shape[:2]
    excluded = excluded_labels if excluded_labels is not None else taxonomy.NON_COMPONENTS

    # Font scaling tied to image height (:495-496).
    font_scale = max(0.4, h / 900.0)
    thickness = int(max(1, h / 600.0))

    static_text_rects = []
    components = []
    for b in bboxes:
        if b.class_name in excluded:
            static_text_rects.append((b.xmin, b.ymin, b.xmax, b.ymax))
        else:
            components.append(b)

    drawn_rects: list[tuple] = []
    out_boxes: list[BBox] = []
    counter = 0

    for comp in components:
        counter += 1
        text = str(counter)
        tw, th = _text_size(text, font_scale, thickness)
        comp_rect = (comp.xmin, comp.ymin, comp.xmax, comp.ymax)
        cx = comp.xmin + comp.width // 2
        cy = comp.ymin + comp.height // 2

        permissible = []
        for px, py in _candidate_positions(comp, tw, th):
            px, py = int(round(px)), int(round(py))
            rect = (px, py, px + tw, py + th)
            if not (0 <= px < w - tw and 0 <= py < h - th):
                continue
            if _overlap_area(rect, comp_rect) > 0:
                continue
            if any(
                _overlap_area(rect, (o.xmin, o.ymin, o.xmax, o.ymax)) > 0
                for o in components
                if o.persistent_uid != comp.persistent_uid
            ):
                continue
            if any(_overlap_area(rect, r) > 0 for r in static_text_rects):
                continue
            if any(_overlap_area(rect, r) > 0 for r in drawn_rects):
                continue
            dist = math.hypot(cx - (px + tw // 2), cy - (py + th // 2))
            permissible.append((dist, px, py))

        if permissible:
            permissible.sort(key=lambda p: p[0])
            _, x, y = permissible[0]
        else:
            # Fallback near the component's top-left (:736-755).
            x = max(0, min(comp.xmin + 3, w - tw))
            y = max(0, min(comp.ymin - th - 3, h - th))
            if _overlap_area((x, y, x + tw, y + th), comp_rect) > 0:
                x = max(0, min(5, w - tw))
                y = max(0, min(5 + (counter - 1) * (th + 2), h - th))

        _draw_number(img, text, (x, y + th), font_scale, thickness)
        drawn_rects.append((x, y, x + tw, y + th))
        out = dataclasses.replace(comp)
        out.visual_id = counter
        out_boxes.append(out)

    return img, out_boxes
