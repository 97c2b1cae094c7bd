"""Cross-validation of XLA image ops against OpenCV (reference substrate).

cv2 is available in this environment only as a test oracle — production
compute runs the XLA ops. These tests pin the semantics the topology
stage depends on (SURVEY.md §7 hard part 2).
"""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from circuitvision_tpu.ops.cc import connected_components, label_components
from circuitvision_tpu.ops.image import adaptive_threshold_mean_inv, rgb_to_gray
from circuitvision_tpu.ops.morphology import dilate, erode, gaussian_blur


def _wire_image(seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((120, 160), np.uint8)
    for _ in range(6):
        y = rng.integers(10, 110)
        x0, x1 = sorted(rng.integers(5, 155, 2))
        img[y : y + 3, x0:x1] = 255
    for _ in range(4):
        x = rng.integers(10, 150)
        y0, y1 = sorted(rng.integers(5, 115, 2))
        img[y0:y1, x : x + 3] = 255
    return img


class TestMorphologyParity:
    def test_dilate_matches_cv2(self):
        img = _wire_image()
        ours = np.asarray(dilate(img.astype(np.float32), 3, 2)).astype(np.uint8)
        ref = cv2.dilate(img, np.ones((3, 3), np.uint8), iterations=2)
        np.testing.assert_array_equal(ours, ref)

    def test_erode_matches_cv2(self):
        img = _wire_image()
        ours = np.asarray(erode(img.astype(np.float32), 3, 2)).astype(np.uint8)
        ref = cv2.erode(img, np.ones((3, 3), np.uint8), iterations=2)
        np.testing.assert_array_equal(ours, ref)

    def test_gaussian_blur_close_to_cv2(self):
        img = _wire_image().astype(np.float32)
        ours = np.asarray(gaussian_blur(img, 5, 1.0))
        ref = cv2.GaussianBlur(img, (5, 5), 1.0)
        # float path: identical kernels; borders replicate in both.
        np.testing.assert_allclose(ours, ref, atol=1e-2)


class TestThresholdParity:
    def test_adaptive_mean_inv_matches_cv2(self):
        rng = np.random.default_rng(1)
        gray = (rng.random((96, 128)) * 255).astype(np.uint8)
        gray[40:45, :] = 5  # dark band
        ours = np.asarray(adaptive_threshold_mean_inv(gray.astype(np.float32), 31, 21.0))
        ref = cv2.adaptiveThreshold(
            gray, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV, 31, 21
        )
        # cv2 rounds the box-filter mean to uint8 before comparing; allow
        # disagreement only on pixels within 1 gray level of the threshold.
        disagree = ours != ref
        if disagree.any():
            mean = cv2.boxFilter(
                gray.astype(np.float32), -1, (31, 31),
                borderType=cv2.BORDER_REPLICATE,
            )
            margin = np.abs(gray.astype(np.float32) - (mean - 21.0))
            assert margin[disagree].max() <= 1.0, (
                f"{disagree.sum()} disagreements beyond rounding margin"
            )

    def test_rgb_to_gray_matches_cv2(self):
        rng = np.random.default_rng(2)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        ours = np.asarray(rgb_to_gray(img.astype(np.float32)))
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
        np.testing.assert_allclose(ours, ref, atol=1.0)


class TestConnectedComponentsParity:
    def test_component_partition_matches_cv2(self):
        img = _wire_image(seed=3)
        fg = img > 0
        ours = np.asarray(label_components(jnp.asarray(fg)))
        n_ref, ref = cv2.connectedComponents(img, connectivity=8)
        # Same partition: bijection between our labels and cv2 labels.
        pairs = set(zip(ours[fg].tolist(), ref[fg].tolist()))
        assert len(pairs) == n_ref - 1  # cv2 label 0 = background
        assert len({a for a, _ in pairs}) == len({b for _, b in pairs})

    def test_area_and_centroid_match_cv2_stats(self):
        img = _wire_image(seed=4)
        fg = img > 0
        _, stats = connected_components(jnp.asarray(fg), max_labels=64)
        areas = sorted(
            a for a, v in zip(np.asarray(stats.area), np.asarray(stats.valid)) if v
        )
        n, labels, cv_stats, centroids = cv2.connectedComponentsWithStats(img, connectivity=8)
        ref_areas = sorted(cv_stats[1:, cv2.CC_STAT_AREA].tolist())
        assert [int(a) for a in areas] == ref_areas

    def test_contour_area_estimate_tracks_cv2(self):
        # Filled blobs of varying size: the Pick-style estimate must stay
        # within a few percent of cv2.contourArea.
        for size in (8, 15, 30):
            img = np.zeros((64, 64), np.uint8)
            img[10 : 10 + size, 12 : 12 + size] = 255
            contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            ref = cv2.contourArea(contours[0])
            _, stats = connected_components(jnp.asarray(img > 0), max_labels=8)
            est = float(np.asarray(stats.contour_area)[0])
            assert abs(est - ref) / max(ref, 1) < 0.05, (size, est, ref)

    def test_raster_order_matches_cv2_contour_order(self):
        # Our compacted label order == cv2.findContours RETR_EXTERNAL
        # enumeration (reverse raster discovery); verify against cv2
        # centroids sorted the same way.
        img = _wire_image(seed=5)
        fg = img > 0
        _, stats = connected_components(jnp.asarray(fg), max_labels=64)
        ours = [
            tuple(np.round(c, 1))
            for c, v in zip(np.asarray(stats.centroid), np.asarray(stats.valid))
            if v
        ]
        n, labels = cv2.connectedComponents(img, connectivity=8)
        firsts = []
        for lbl in range(1, n):
            ys, xs = np.where(labels == lbl)
            order = np.lexsort((xs, ys))[0]
            cx, cy = xs.mean(), ys.mean()
            firsts.append(((ys[order], xs[order]), (round(cx, 1), round(cy, 1))))
        firsts.sort(key=lambda t: t[0], reverse=True)
        ref_order = [c for _, c in firsts]
        assert len(ours) == len(ref_order)
        for (ax, ay), (bx, by) in zip(ours, ref_order):
            assert abs(float(ax) - float(bx)) < 0.2
            assert abs(float(ay) - float(by)) < 0.2
