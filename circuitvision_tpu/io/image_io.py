"""Host-side image ingest: decode + EXIF orientation.

Re-implements process_new_upload's image handling
(src/analysis_pipeline.py:12-95): bytes → RGB array with EXIF
auto-rotation (orientation tag 0x0112), plus the EXIF summary used by the
UI (src/utils.py:567-596). JPEG decode stays on host by design
(SURVEY.md §2.3) — device arrays are produced downstream.
"""
from __future__ import annotations

import io
from typing import Optional

import numpy as np

ORIENTATION_TAG = 0x0112


def decode_image(data: bytes) -> np.ndarray:
    """Decode encoded image bytes to an RGB uint8 array, EXIF-rotated."""
    from PIL import Image, ImageOps

    img = Image.open(io.BytesIO(data))
    try:
        exif = img.getexif()
        if exif and exif.get(ORIENTATION_TAG, 1) != 1:
            img = ImageOps.exif_transpose(img)
    except Exception:
        pass
    return np.asarray(img.convert("RGB"))


def load_image(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_image(f.read())


def format_exif_data(path: str) -> Optional[dict]:
    """Orientation/Software tags for display (src/utils.py:567-596)."""
    from PIL import Image
    from PIL.ExifTags import TAGS

    try:
        img = Image.open(path)
        important = {"Software", "Orientation"}
        out = {}
        exif = img.getexif()
        for tag_id, value in (exif or {}).items():
            tag = TAGS.get(tag_id, tag_id)
            if tag in important:
                if isinstance(value, bytes):
                    value = f"[Binary data, {len(value)} bytes]"
                out[tag] = value
        return out or None
    except Exception:
        return None
