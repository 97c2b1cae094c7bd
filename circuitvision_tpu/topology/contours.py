"""Outer-contour extraction with OpenCV-equivalent polygon semantics.

The reference's node stage consumes cv2.findContours(RETR_EXTERNAL,
CHAIN_APPROX_SIMPLE) through four quantities (src/circuit_analyzer.py:
388-459, 1380-1446, 1470-1545, 1615-1633):

  1. enumeration order (node old-ids) — reverse raster discovery;
  2. cv2.contourArea — POLYGON area of the outer border (a ring's area
     includes its hole; pixel counting gets this badly wrong);
  3. cv2.moments m00/m10/m01 — Green's-theorem polygon moments
     (centroids feed ground selection and node ordering);
  4. the CHAIN_APPROX_SIMPLE vertex list — the reference's terminal
     matching walks ONLY these direction-change points, so a component
     near the middle of a long straight wire run does NOT match via the
     edge-strip rule unless a vertex falls in the strip.

Hole-nested components (a blob inside another component's hole) are NOT
top-level contours under RETR_EXTERNAL and are skipped entirely.

Primary implementation: first-party C++ tracer (native/contours.cpp,
ctypes; auto-built on first use when g++ is available). Fallback: a pure
NumPy/Python Moore trace with identical semantics. Both are pinned
against the real cv2 as oracle in tests/test_native_contours.py.
"""
from __future__ import annotations

import ctypes
import dataclasses
import logging
import os
import threading

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "native", "libcvcontours.so"
)
_lib = None
_lib_lock = threading.Lock()
_build_failed = False


@dataclasses.dataclass
class Contour:
    """One top-level outer contour (cv2-equivalent)."""

    vertices: np.ndarray  # (V, 2) int32 (x, y) CHAIN_APPROX_SIMPLE points
    area: float  # |polygon area| == cv2.contourArea
    m00: float  # signed polygon moments == cv2.moments
    m10: float
    m01: float
    rect: tuple[int, int, int, int]  # (xmin, ymin, xmax, ymax) inclusive
    #: raster-first linear pixel index of the component (y0 * W + x0) —
    #: equals the label id in ops/cc.py's root-labeled rasters, letting
    #: viz map contours onto device label images.
    root: int = -1

    @property
    def centroid(self) -> tuple[int, int]:
        """int-truncated polygon centroid, cv2.moments usage in the
        reference (:1620-1622). Caller must ensure m00 != 0 (kept
        contours have area > 0)."""
        return int(self.m10 / self.m00), int(self.m01 / self.m00)


def _load_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                from .build_native import build

                build(verbose=False)
            except Exception:
                logger.info("native contour tracer unavailable; using python path")
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cv_trace_contours.restype = ctypes.c_int
            lib.cv_trace_contours.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            logger.exception("failed to load native contour tracer")
            _build_failed = True
    return _lib


_MAX_CONTOURS = 4096


def _cv2_vertex_order(verts: np.ndarray, root: int, w: int) -> np.ndarray:
    """Reorder an emitted vertex sequence into cv2's exact traversal.

    The chain walk emits direction-change vertices in the rotation
    opposite to cv2.findContours'; reversing reproduces cv2's sequence
    (the vertex SET is direction-invariant: a pixel is a vertex iff its
    in/out steps differ, which is symmetric under reversal). cv2 always
    emits the trace start — the component's raster-first pixel, our
    `root` — as the FIRST point, even when it lies mid-run (collinear);
    insert it if the reversal does not already lead with it. Pinned
    sequence-exact against cv2 in tests/test_native_contours.py."""
    if len(verts) < 2:
        return verts
    v = np.ascontiguousarray(verts[::-1])
    sx, sy = root % w, root // w
    if v[0, 0] == sx and v[0, 1] == sy:
        return v
    idx = np.nonzero((v[:, 0] == sx) & (v[:, 1] == sy))[0]
    if len(idx):
        return np.ascontiguousarray(np.roll(v, -int(idx[0]), axis=0))
    return np.ascontiguousarray(
        np.concatenate([np.asarray([[sx, sy]], v.dtype), v], axis=0)
    )


def trace_contours(fg: np.ndarray, force_python: bool = False) -> list[Contour]:
    """Top-level outer contours of a boolean/0-255 raster, in cv2
    RETR_EXTERNAL output order (reverse raster discovery)."""
    fg_u8 = np.ascontiguousarray((np.asarray(fg) != 0).astype(np.uint8))
    h, w = fg_u8.shape
    lib = None if force_python else _load_lib()
    if lib is not None:
        vert_cap = 2 * (h * w + 8)
        verts = np.empty(vert_cap, np.int32)
        offsets = np.empty(_MAX_CONTOURS + 1, np.int32)
        stats = np.empty(_MAX_CONTOURS * 9, np.float64)
        n = lib.cv_trace_contours(
            fg_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vert_cap,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            _MAX_CONTOURS,
        )
        if n >= 0:
            out = []
            for k in range(n):
                s = stats[9 * k : 9 * k + 9]
                out.append(
                    Contour(
                        vertices=_cv2_vertex_order(
                            verts[2 * offsets[k] : 2 * offsets[k + 1]]
                            .reshape(-1, 2)
                            .copy(),
                            int(s[8]), w,
                        ),
                        area=float(s[0]), m00=float(s[1]),
                        m10=float(s[2]), m01=float(s[3]),
                        rect=(int(s[4]), int(s[5]), int(s[6]), int(s[7])),
                        root=int(s[8]),
                    )
                )
            return out
        logger.warning("native contour tracer overflow; python fallback")
    return _trace_contours_python(fg_u8)


# Clockwise 8-neighborhood starting East (must match contours.cpp).
_DX = (1, 1, 0, -1, -1, -1, 0, 1)
_DY = (0, 1, 1, 1, 0, -1, -1, -1)


def _trace_contours_python(fg_u8: np.ndarray) -> list[Contour]:
    from scipy import ndimage

    h, w = fg_u8.shape
    fgb = fg_u8 != 0
    lab, n = ndimage.label(fgb, structure=np.ones((3, 3), np.int32))
    if n == 0:
        return []
    # scipy ids are raster-discovery-ordered already.
    # Outer background: 4-connected flood from the frame.
    bg = ~fgb
    frame = np.zeros_like(bg)
    frame[0, :] = frame[-1, :] = True
    frame[:, 0] = frame[:, -1] = True
    outer_bg = ndimage.binary_propagation(
        frame & bg, mask=bg, structure=ndimage.generate_binary_structure(2, 1)
    )
    # Top-level: component 4-adjacent to outer bg or touching the frame.
    near_outer = ndimage.binary_dilation(
        outer_bg, structure=ndimage.generate_binary_structure(2, 1)
    )
    top_ids = set(np.unique(lab[near_outer & fgb]))
    top_ids |= set(np.unique(lab[frame & fgb]))
    top_ids.discard(0)

    fys, fxs = np.nonzero(fgb)
    fl = lab[fys, fxs]
    ids, first_idx = np.unique(fl, return_index=True)
    first = dict(zip(ids.tolist(), zip(fys[first_idx].tolist(), fxs[first_idx].tolist())))

    out = []
    for c in range(n, 0, -1):
        if c not in top_ids:
            continue
        y0, x0 = first[c]
        chain = _moore_trace(lab, c, x0, y0, w, h)
        out.append(_contour_from_chain(chain, root=y0 * w + x0, width=w))
    return out


def _moore_trace(lab, c, x0, y0, w, h):
    """One full outer-border cycle (see contours.cpp for the termination
    rationale: stop when the first move's (pixel, backtrack) state
    recurs)."""

    def find_dir(px, py, back):
        for d in range(1, 9):
            cand = (back + d) & 7
            nx, ny = px + _DX[cand], py + _DY[cand]
            if 0 <= nx < w and 0 <= ny < h and lab[ny, nx] == c:
                return cand
        return -1

    dir0 = find_dir(x0, y0, 4)
    if dir0 < 0:
        return [(x0, y0)]
    x1, y1 = x0 + _DX[dir0], y0 + _DY[dir0]
    back1 = (dir0 + 4) & 7
    chain = []
    cx, cy, back = x1, y1, back1
    guard = 8 * w * h + 16
    while True:
        chain.append((cx, cy))
        d = find_dir(cx, cy, back)
        cx, cy = cx + _DX[d], cy + _DY[d]
        back = (d + 4) & 7
        if cx == x1 and cy == y1 and back == back1:
            return chain
        guard -= 1
        if guard <= 0:  # pragma: no cover - degenerate safety
            return chain


def _contour_from_chain(chain, root: int = -1, width: int = 0) -> Contour:
    m = len(chain)
    pts = np.asarray(chain, np.int64)
    if m == 1:
        verts = pts.astype(np.int32)
        x, y = chain[0]
        return Contour(verts, 0.0, 0.0, 0.0, 0.0, (x, y, x, y), root=root)
    nxt = np.roll(pts, -1, axis=0)
    prv = np.roll(pts, 1, axis=0)
    din = pts - prv
    dout = nxt - pts
    is_vert = (din != dout).any(axis=1)
    verts = pts[is_vert].astype(np.int32)
    if width:
        verts = _cv2_vertex_order(verts, root, width)
    cross = pts[:, 0] * nxt[:, 1] - nxt[:, 0] * pts[:, 1]
    a2 = float(cross.sum())
    m10 = float((cross * (pts[:, 0] + nxt[:, 0])).sum()) / 6.0
    m01 = float((cross * (pts[:, 1] + nxt[:, 1])).sum()) / 6.0
    return Contour(
        verts,
        area=abs(a2) / 2.0,
        m00=a2 / 2.0,
        m10=m10,
        m01=m01,
        rect=(
            int(pts[:, 0].min()), int(pts[:, 1].min()),
            int(pts[:, 0].max()), int(pts[:, 1].max()),
        ),
        root=root,
    )
