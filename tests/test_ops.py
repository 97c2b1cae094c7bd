"""Device image ops: morphology, connected components, NMS, thresholding."""
import numpy as np
import jax.numpy as jnp

from circuitvision_tpu.core.geometry import nms_by_confidence
from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.ops.cc import (
    connected_components,
    label_components,
    label_components_host,
    label_stats,
)
from circuitvision_tpu.ops.image import (
    adaptive_threshold_mean_inv,
    keep_aspect_size,
    letterbox,
    resize_bilinear,
    rgb_to_gray,
    sam2_preprocess,
)
from circuitvision_tpu.ops.morphology import (
    boundary_mask,
    dilate,
    enhance_lines,
    erode,
    gaussian_blur,
)
from circuitvision_tpu.ops.nms import greedy_nms, iou_matrix


class TestMorphology:
    def test_dilate_grows_point(self):
        img = np.zeros((9, 9), np.float32)
        img[4, 4] = 255
        out = np.asarray(dilate(img, 3, 1))
        assert out[3:6, 3:6].min() == 255
        assert out[2, 2] == 0

    def test_erode_shrinks_block(self):
        img = np.zeros((9, 9), np.float32)
        img[3:6, 3:6] = 255
        out = np.asarray(erode(img, 3, 1))
        assert out[4, 4] == 255
        assert out[3, 3] == 0

    def test_close_reconnects_gap(self):
        # enhance_lines must bridge a 2px break in a horizontal wire.
        img = np.zeros((21, 41), np.float32)
        img[10, 2:18] = 255
        img[10, 20:39] = 255  # 2px gap at x=18,19
        out = np.asarray(enhance_lines(img))
        assert out[10, 18] > 0 and out[10, 19] > 0

    def test_gaussian_blur_normalized(self):
        img = np.full((16, 16), 100.0, np.float32)
        out = np.asarray(gaussian_blur(img, 5, 1.0))
        np.testing.assert_allclose(out, 100.0, rtol=1e-5)

    def test_boundary_mask(self):
        img = np.zeros((10, 10), bool)
        img[2:8, 2:8] = True
        b = np.asarray(boundary_mask(img))
        assert b[2, 2] and b[2, 5] and b[7, 7]
        assert not b[4, 4]
        assert not b[0, 0]

    def test_boundary_at_image_edge(self):
        img = np.ones((5, 5), bool)
        b = np.asarray(boundary_mask(img))
        assert b[0, 0] and b[0, 4]
        assert not b[2, 2]


class TestConnectedComponents:
    def test_two_blobs(self):
        img = np.zeros((20, 20), bool)
        img[2:5, 2:5] = True
        img[10:15, 10:15] = True
        labels = np.asarray(label_components(jnp.asarray(img)))
        fg_labels = set(labels[img].tolist())
        assert len(fg_labels) == 2
        assert (labels[~img] == 400).all()

    def test_matches_host_union_find(self):
        rng = np.random.default_rng(0)
        img = rng.random((40, 50)) > 0.6
        dev = np.asarray(label_components(jnp.asarray(img), max_iters=128))
        host, sentinel = label_components_host(img)
        assert (dev == host).all()

    def test_diagonal_connectivity(self):
        img = np.zeros((10, 10), bool)
        img[1, 1] = img[2, 2] = img[3, 3] = True
        labels = np.asarray(label_components(jnp.asarray(img)))
        assert labels[1, 1] == labels[2, 2] == labels[3, 3]

    def test_long_wire_converges(self):
        # A serpentine wire spanning the whole image — the pointer-jumping
        # path must converge well inside the iteration cap.
        img = np.zeros((60, 60), bool)
        for row in range(0, 60, 4):
            img[row, :] = True
            if (row // 4) % 2 == 0 and row + 4 < 60:
                img[row : row + 5, -1] = True
            elif row + 4 < 60:
                img[row : row + 5, 0] = True
        labels = np.asarray(label_components(jnp.asarray(img), max_iters=64))
        assert len(set(labels[img].tolist())) == 1

    def test_stats_area_centroid_bbox(self):
        img = np.zeros((20, 30), bool)
        img[4:8, 10:20] = True  # 4x10 block
        labels, stats = connected_components(jnp.asarray(img), max_labels=8)
        stats = np.asarray(stats.area), np.asarray(stats.centroid), np.asarray(
            stats.bbox
        ), np.asarray(stats.valid)
        area, centroid, bbox, valid = stats
        assert valid[0] and not valid[1]
        assert area[0] == 40
        np.testing.assert_allclose(centroid[0], [14.5, 5.5])
        np.testing.assert_allclose(bbox[0], [10, 4, 19, 7])

    def test_label_order_is_reverse_raster(self):
        img = np.zeros((20, 20), bool)
        img[15:18, 2:5] = True  # lower-left (first in cv2 output order)
        img[2:5, 10:13] = True  # upper-right (discovered first, emitted last)
        _, stats = connected_components(jnp.asarray(img), max_labels=8)
        centroids = np.asarray(stats.centroid)
        # Compacted order matches cv2.findContours enumeration: REVERSE
        # raster discovery (cv2 prepends) → the lower blob is row 0.
        assert centroids[0][1] > centroids[1][1]

    def test_overflow_keeps_largest_components(self):
        """With more components than max_labels, compaction must keep the
        LARGE (filter-surviving) blobs, not the bottom-most raster ones —
        a top-of-image wire cannot be evicted by bottom noise specks."""
        img = np.zeros((64, 64), bool)
        img[2:5, 2:60] = True  # big top wire (174 px)
        for k in range(12):  # 12 single-pixel specks along the bottom
            img[60, 3 + 5 * k] = True
        _, stats = connected_components(jnp.asarray(img), max_labels=8)
        area = np.asarray(stats.area)
        valid = np.asarray(stats.valid)
        assert valid.sum() == 8  # truncated (13 components exist)
        assert area[valid].max() == 174.0  # the wire survived
        # enumeration among the kept is still reverse-raster: the wire is
        # topmost, so it must be the LAST valid row.
        assert area[np.nonzero(valid)[0][-1]] == 174.0

    def test_contour_area_estimate(self):
        # For a 10x10 filled square: pixels=100, boundary=36,
        # cv2.contourArea would give 81 (9x9 polygon through centers).
        img = np.zeros((20, 20), bool)
        img[5:15, 5:15] = True
        _, stats = connected_components(jnp.asarray(img), max_labels=4)
        est = float(np.asarray(stats.contour_area)[0])
        assert abs(est - 81.0) <= 1.0


class TestNMS:
    def test_iou_matrix(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 5], [20, 20, 30, 30]], jnp.float32)
        m = np.asarray(iou_matrix(boxes, boxes))
        assert m[0, 0] == 1.0
        np.testing.assert_allclose(m[0, 1], 0.5)
        assert m[0, 2] == 0.0

    def test_matches_host_greedy(self):
        rng = np.random.default_rng(1)
        n = 40
        xy = rng.uniform(0, 90, (n, 2))
        wh = rng.uniform(5, 30, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        keep = np.asarray(
            greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), iou_threshold=0.5)
        )
        host_boxes = [
            BBox("x", float(s), *[float(v) for v in b]) for b, s in zip(boxes, scores)
        ]
        kept_host = nms_by_confidence(host_boxes, 0.5)
        kept_uids = {b.persistent_uid for b in kept_host}
        dev_uids = {host_boxes[i].persistent_uid for i in range(n) if keep[i]}
        assert dev_uids == kept_uids

    def test_padding_ignored(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
        scores = jnp.asarray([0.9, 0.0])
        valid = jnp.asarray([True, False])
        keep = np.asarray(greedy_nms(boxes, scores, valid, iou_threshold=0.5))
        assert keep.tolist() == [True, False]


class TestImageOps:
    def test_rgb_to_gray(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[..., 0] = 255
        out = np.asarray(rgb_to_gray(img))
        np.testing.assert_allclose(out, 255 * 0.299, rtol=1e-5)

    def test_resize_bilinear_identity(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = np.asarray(resize_bilinear(img, (4, 4)))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_keep_aspect(self):
        assert keep_aspect_size(1200, 800, 600) == (600, 400)

    def test_adaptive_threshold_lines(self):
        # Dark lines on white background must come out as 255.
        img = np.full((64, 64), 250.0, np.float32)
        img[30:33, :] = 10.0
        out = np.asarray(adaptive_threshold_mean_inv(img, 31, 21))
        assert out[31, 32] == 255
        assert out[5, 5] == 0

    def test_letterbox_shapes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        canvas, scale, pads = letterbox(jnp.asarray(img), 640)
        assert canvas.shape == (640, 640, 3)
        np.testing.assert_allclose(float(scale), 640 / 200, rtol=1e-6)
        # Vertical padding, horizontal full-width.
        assert float(pads[0]) == 0
        assert float(pads[1]) == (640 - 320) // 2

    def test_sam2_preprocess(self):
        img = np.full((50, 70, 3), 128, np.uint8)
        out = np.asarray(sam2_preprocess(jnp.asarray(img), resolution=64))
        assert out.shape == (64, 64, 3)
        expected = (128 / 255 - 0.485) / 0.229
        np.testing.assert_allclose(out[..., 0], expected, rtol=1e-4)
