"""cv2-oracle parity for the first-party contour tracer.

Pins topology/contours.py (C++ tracer + python fallback) against the real
cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) / contourArea /
moments / boundingRect on structured and randomized rasters: contour
count, enumeration order, vertex SETS, areas, moment ratios, rects, and
the hole-nesting cut.
"""
from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from circuitvision_tpu.topology.contours import trace_contours


def cv2_contours(fg: np.ndarray):
    img = (np.asarray(fg) != 0).astype(np.uint8)
    contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    out = []
    for c in contours:
        M = cv2.moments(c)
        x, y, w, h = cv2.boundingRect(c)
        out.append(
            {
                "verts": {tuple(p) for p in c.reshape(-1, 2).tolist()},
                "seq": c.reshape(-1, 2),
                "area": cv2.contourArea(c),
                "m": M,
                "rect": (x, y, x + w - 1, y + h - 1),
            }
        )
    return out


def assert_matches_cv2(fg, force_python: bool):
    want = cv2_contours(fg)
    got = trace_contours(fg, force_python=force_python)
    assert len(got) == len(want), f"count {len(got)} != cv2 {len(want)}"
    for k, (g, w_) in enumerate(zip(got, want)):
        assert g.rect == w_["rect"], f"contour {k} rect"
        assert {tuple(p) for p in g.vertices.tolist()} == w_["verts"], (
            f"contour {k} vertex set"
        )
        # Sequence-exact: the reference's terminal walk takes the FIRST
        # matching vertex (connection-point viz), so traversal order and
        # start point must equal cv2's.
        assert np.array_equal(g.vertices, w_["seq"]), (
            f"contour {k} vertex sequence\nours: {g.vertices.tolist()}\n"
            f"cv2:  {w_['seq'].tolist()}"
        )
        assert g.area == pytest.approx(w_["area"], abs=1e-6), f"contour {k} area"
        if w_["m"]["m00"] != 0:
            assert g.m00 != 0
            assert g.m10 / g.m00 == pytest.approx(
                w_["m"]["m10"] / w_["m"]["m00"], abs=1e-9
            ), f"contour {k} cx"
            assert g.m01 / g.m00 == pytest.approx(
                w_["m"]["m01"] / w_["m"]["m00"], abs=1e-9
            ), f"contour {k} cy"
        else:
            assert g.m00 == 0


def structured_rasters():
    rs = []
    # blobs in distinct positions (ordering)
    a = np.zeros((60, 80), np.uint8)
    a[5:15, 5:20] = 1
    a[5:15, 50:70] = 1
    a[40:55, 10:30] = 1
    rs.append(("three-blobs", a))
    # ring with speck inside the hole (RETR_EXTERNAL cut) + outside speck
    b = np.zeros((80, 100), np.uint8)
    b[10:70, 10:90] = 1
    b[20:60, 20:80] = 0
    b[35:45, 45:55] = 1
    b[2:5, 94:98] = 1
    rs.append(("ring-nested", b))
    # L-shape, 1-px line, single pixel, domino
    c = np.zeros((50, 50), np.uint8)
    c[5:10, 5:30] = 1
    c[5:30, 5:10] = 1
    c[40, 10:30] = 1
    c[45, 45] = 1
    c[20, 40:42] = 1
    rs.append(("degenerate", c))
    # blob touching every border
    d = np.zeros((30, 30), np.uint8)
    d[0:30, 12:18] = 1
    d[12:18, 0:30] = 1
    rs.append(("frame-touching", d))
    # wire grid (realistic circuit raster)
    e = np.zeros((120, 160), np.uint8)
    for y in (20, 60, 100):
        e[y : y + 3, 10:150] = 1
    for x in (10, 75, 147):
        e[20:103, x : x + 3] = 1
    e[40:50, 40:50] = 0
    rs.append(("grid", e))
    return rs


class TestStructured:
    @pytest.mark.parametrize("name,fg", structured_rasters())
    @pytest.mark.parametrize("force_python", [False, True])
    def test_structured(self, name, fg, force_python):
        assert_matches_cv2(fg, force_python)


class TestRandomized:
    @pytest.mark.parametrize("force_python", [False, True])
    def test_random_blobs(self, force_python):
        rng = np.random.default_rng(7)
        for trial in range(30):
            h = int(rng.integers(20, 90))
            w = int(rng.integers(20, 110))
            fg = np.zeros((h, w), np.uint8)
            for _ in range(int(rng.integers(1, 14))):
                bh = int(rng.integers(1, 12))
                bw = int(rng.integers(1, 12))
                y = int(rng.integers(0, h - bh + 1))
                x = int(rng.integers(0, w - bw + 1))
                fg[y : y + bh, x : x + bw] ^= 1  # XOR → holes and odd shapes
            assert_matches_cv2(fg, force_python)

    @pytest.mark.parametrize("force_python", [False, True])
    def test_random_wires(self, force_python):
        rng = np.random.default_rng(11)
        for trial in range(15):
            h, w = 100, 140
            fg = np.zeros((h, w), np.uint8)
            t = int(rng.integers(1, 4))
            for _ in range(int(rng.integers(2, 7))):
                y = int(rng.integers(5, h - 10))
                x0, x1 = sorted(rng.integers(5, w - 5, 2).tolist())
                fg[y : y + t, x0:x1] = 1
            for _ in range(int(rng.integers(2, 7))):
                x = int(rng.integers(5, w - 10))
                y0, y1 = sorted(rng.integers(5, h - 5, 2).tolist())
                fg[y0:y1, x : x + t] = 1
            for _ in range(int(rng.integers(0, 10))):
                fg[rng.integers(0, h), rng.integers(0, w)] = 1
            assert_matches_cv2(fg, force_python)


class TestAdversarial:
    """Sequence-exactness on hostile shapes: diagonal 1-px staircases (the
    start pixel can sit mid-run), spirals, random noise fields, and
    border-hugging rings."""

    @pytest.mark.parametrize("force_python", [False, True])
    def test_diagonal_staircases(self, force_python):
        for t in (1, 2):
            fg = np.zeros((60, 80), np.uint8)
            for i in range(40):
                fg[10 + i // 2 : 10 + i // 2 + t, 10 + i : 10 + i + t] = 1
            assert_matches_cv2(fg, force_python)
            assert_matches_cv2(fg[::-1].copy(), force_python)
            assert_matches_cv2(fg[:, ::-1].copy(), force_python)

    @pytest.mark.parametrize("force_python", [False, True])
    def test_spiral(self, force_python):
        fg = np.zeros((81, 81), np.uint8)
        x0, y0, x1, y1 = 2, 2, 78, 78
        while x1 - x0 > 6:
            fg[y0 : y0 + 2, x0:x1] = 1
            fg[y0:y1, x1 - 2 : x1] = 1
            fg[y1 - 2 : y1, x0 + 6 : x1] = 1
            fg[y0 + 6 : y1, x0 : x0 + 2] = 1
            x0 += 6; y0 += 6; x1 -= 6; y1 -= 6
        assert_matches_cv2(fg, force_python)

    @pytest.mark.parametrize("force_python", [False, True])
    def test_dense_noise(self, force_python):
        rng = np.random.default_rng(23)
        for p in (0.2, 0.5, 0.8):
            fg = (rng.random((70, 90)) < p).astype(np.uint8)
            assert_matches_cv2(fg, force_python)

    @pytest.mark.parametrize("force_python", [False, True])
    def test_border_ring_and_full(self, force_python):
        fg = np.zeros((40, 50), np.uint8)
        fg[0, :] = fg[-1, :] = 1
        fg[:, 0] = fg[:, -1] = 1
        assert_matches_cv2(fg, force_python)
        assert_matches_cv2(np.ones((30, 30), np.uint8), force_python)
        assert_matches_cv2(np.ones((1, 30), np.uint8), force_python)
        assert_matches_cv2(np.ones((30, 1), np.uint8), force_python)
