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


def format_exif_value(value):
    """Display form of one EXIF value (reference format_value,
    src/utils.py:558-565): bytes → size note, strings cleaned of
    non-printables ("[Empty string]" when nothing survives)."""
    if isinstance(value, bytes):
        return f"[Binary data, {len(value)} bytes]"
    if isinstance(value, str):
        cleaned = "".join(c for c in value if c.isprintable())
        return cleaned if cleaned else "[Empty string]"
    return value


def format_exif_data(path: str) -> Optional[dict]:
    """Orientation/Software tags for display (src/utils.py:567-596).

    Mirrors the reference exactly, including its use of the legacy
    `_getexif()` API: formats without it (e.g. PNG, even with an eXIf
    chunk) yield None, and failures at any step yield None."""
    from PIL import Image
    from PIL.ExifTags import TAGS

    try:
        img = Image.open(path)
        important = {"Software", "Orientation"}
        out = {}
        try:
            exif = img._getexif()
            if exif:
                for tag_id, value in exif.items():
                    tag = TAGS.get(tag_id, tag_id)
                    if tag in important:
                        out[tag] = format_exif_value(value)
        except Exception:
            pass
        return out or None
    except Exception:
        return None
