"""Detection mAP, mask metrics, netlist exact-match."""
import numpy as np

from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.eval.metrics import (
    average_precision,
    map50,
    mask_accuracy,
    mask_dice,
    mask_iou,
    netlist_exact_match,
)


def _b(cls, x0, y0, x1, y1, conf=0.9):
    return BBox(class_name=cls, confidence=conf, xmin=x0, ymin=y0, xmax=x1, ymax=y1)


class TestAP:
    def test_perfect_detection(self):
        gt = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)]
        preds = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)]
        scores = [np.array([0.9, 0.8])]
        assert average_precision(preds, scores, gt) == 1.0

    def test_no_predictions(self):
        gt = [np.array([[0, 0, 10, 10]], float)]
        assert average_precision([np.zeros((0, 4))], [np.zeros(0)], gt) == 0.0

    def test_half_recall(self):
        gt = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)]
        preds = [np.array([[0, 0, 10, 10]], float)]
        scores = [np.array([0.9])]
        ap = average_precision(preds, scores, gt)
        assert 0.4 < ap < 0.6

    def test_false_positive_lowers_ap(self):
        gt = [np.array([[0, 0, 10, 10]], float)]
        preds = [np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)]
        scores = [np.array([0.5, 0.9])]  # FP ranked above TP
        ap = average_precision(preds, scores, gt)
        assert ap < 1.0

    def test_duplicate_detection_is_fp(self):
        gt = [np.array([[0, 0, 10, 10]], float)]
        preds = [np.array([[0, 0, 10, 10], [1, 1, 11, 11]], float)]
        scores = [np.array([0.9, 0.8])]
        ap = average_precision(preds, scores, gt)
        assert ap == 1.0  # duplicate ranked below; AP unaffected at full recall


class TestMAP50:
    def test_two_classes(self):
        gt = [[_b("resistor", 0, 0, 10, 10), _b("diode", 20, 20, 30, 30)]]
        pred = [[_b("resistor", 0, 0, 10, 10, 0.9), _b("diode", 20, 20, 30, 30, 0.8)]]
        out = map50(pred, gt)
        assert out["map"] == 1.0
        assert set(out["per_class"]) == {"resistor", "diode"}

    def test_missing_class(self):
        gt = [[_b("resistor", 0, 0, 10, 10)]]
        pred = [[]]
        out = map50(pred, gt)
        assert out["map"] == 0.0


class TestMaskMetrics:
    def test_identical(self):
        m = np.zeros((10, 10)); m[2:8, 2:8] = 1
        assert mask_iou(m, m) == 1.0
        assert mask_accuracy(m, m) == 1.0
        assert mask_dice(m, m) == 1.0

    def test_disjoint(self):
        a = np.zeros((10, 10)); a[0:2, 0:2] = 1
        b = np.zeros((10, 10)); b[8:10, 8:10] = 1
        assert mask_iou(a, b) == 0.0
        assert mask_dice(a, b) == 0.0
        assert mask_accuracy(a, b) == (100 - 8) / 100

    def test_empty_pair(self):
        z = np.zeros((5, 5))
        assert mask_iou(z, z) == 1.0


class TestNetlistMatch:
    def test_exact(self):
        assert netlist_exact_match(["R1 1 0 10"], ["R1 1 0 10"]) == 1.0

    def test_whitespace_insensitive(self):
        assert netlist_exact_match(["R1 1 0 10  \n\n"], ["R1 1 0 10"]) == 1.0

    def test_mismatch(self):
        assert netlist_exact_match(["R1 1 0 10"], ["R1 1 0 20"]) == 0.0

    def test_fraction(self):
        assert netlist_exact_match(["a", "x"], ["a", "b"]) == 0.5
