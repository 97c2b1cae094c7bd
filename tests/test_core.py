"""Taxonomy registry, BBox semantics, and host geometry/NMS."""
from circuitvision_tpu.core import geometry, taxonomy
from circuitvision_tpu.core.types import BBox


def _bbox(cls, x0, y0, x1, y1, conf=0.9):
    return BBox(class_name=cls, confidence=conf, xmin=x0, ymin=y0, xmax=x1, ymax=y1)


class TestTaxonomy:
    def test_class_count(self):
        assert len(taxonomy.CLASSES) == 62

    def test_usable_filter(self):
        # 62 - 6 deleting - 26 unknown - 4 reducing = 26 usable
        assert len(taxonomy.USABLE_CLASSES) == 62 - len(taxonomy.DELETING) - len(
            taxonomy.UNKNOWN
        ) - len(taxonomy.REDUCING)
        assert "resistor" in taxonomy.USABLE_CLASSES
        assert "__background__" not in taxonomy.USABLE_CLASSES
        assert "relay" not in taxonomy.USABLE_CLASSES

    def test_netlist_map(self):
        assert taxonomy.spice_prefix("resistor") == "R"
        assert taxonomy.spice_prefix("voltage.ac") == "V"
        assert taxonomy.spice_prefix("current.dependent") == "G"
        assert taxonomy.spice_prefix("junction") == ""
        assert taxonomy.spice_prefix("never_seen") == "UN"

    def test_pixel_thresholds(self):
        assert taxonomy.pixel_threshold_for_class("resistor") == 6
        assert taxonomy.pixel_threshold_for_class("voltage.dc") == 20
        assert taxonomy.pixel_threshold_for_class("diode") == 8
        assert taxonomy.pixel_threshold_for_class("transistor.bjt") == 8

    def test_id_round_trip(self):
        for name, cid in taxonomy.CLASSES.items():
            assert taxonomy.ID_TO_NAME[cid] == name


class TestBBox:
    def test_persistent_uid_scheme(self):
        b = _bbox("resistor", 1, 2, 3, 4)
        assert b.persistent_uid == "resistor_1_2_3_4"

    def test_uid_survives_scaling(self):
        b = _bbox("resistor", 10, 20, 30, 40)
        scaled = b.scaled(0.5, 0.5)
        assert scaled.persistent_uid == b.persistent_uid
        assert (scaled.xmin, scaled.ymin, scaled.xmax, scaled.ymax) == (5, 10, 15, 20)

    def test_shift_clip_drops_degenerate(self):
        b = _bbox("resistor", 0, 0, 10, 10)
        assert b.shifted_clipped(20, 0, 100, 100) is None
        kept = b.shifted_clipped(5, 5, 100, 100)
        assert kept is not None and (kept.xmin, kept.ymin) == (0, 0)

    def test_dict_round_trip(self):
        b = _bbox("resistor", 1, 2, 3, 4)
        d = b.to_dict()
        assert d["class"] == "resistor"
        b2 = BBox.from_dict(d)
        assert b2.persistent_uid == b.persistent_uid


class TestGeometry:
    def test_iou_disjoint(self):
        assert geometry.iou(_bbox("a", 0, 0, 10, 10), _bbox("b", 20, 20, 30, 30)) == 0.0

    def test_iou_identical(self):
        b = _bbox("a", 0, 0, 10, 10)
        assert geometry.iou(b, b) == 1.0

    def test_iou_half(self):
        a = _bbox("a", 0, 0, 10, 10)
        b = _bbox("b", 0, 0, 10, 5)
        assert geometry.iou(a, b) == 0.5

    def test_nms_by_confidence(self):
        hi = _bbox("a", 0, 0, 10, 10, conf=0.9)
        lo = _bbox("a", 1, 1, 11, 11, conf=0.5)
        far = _bbox("a", 50, 50, 60, 60, conf=0.7)
        kept = geometry.nms_by_confidence([lo, hi, far], iou_threshold=0.5)
        assert hi in kept and far in kept and lo not in kept

    def test_nms_scalar_vectorized_agree_on_degenerate_boxes(self):
        """Boxes with xmax<xmin (area clamps to 0 in BBox.area) must
        suppress identically whether the list is below or above the
        vectorized-path cutoff (24)."""
        import random

        rng = random.Random(7)
        base = []
        for i in range(30):
            x0, y0 = rng.randint(0, 80), rng.randint(0, 80)
            if i % 5 == 0:  # degenerate: reversed corners
                base.append(_bbox("a", x0 + 10, y0 + 10, x0, y0, conf=rng.random()))
            else:
                base.append(
                    _bbox("a", x0, y0, x0 + rng.randint(5, 20),
                          y0 + rng.randint(5, 20), conf=rng.random())
                )
        vec = geometry.nms_by_confidence(base, iou_threshold=0.5)
        # Force the scalar path on the identical input by monkeypatching
        # nothing: slice into <24 chunks is NOT equivalent, so instead
        # compare against a reference greedy loop mirroring the scalar arm.
        remaining = sorted(base, key=lambda b: b.confidence, reverse=True)
        kept = []
        while remaining:
            best = remaining.pop(0)
            kept.append(best)
            remaining = [b for b in remaining if geometry.iou(best, b) < 0.5]
        assert vec == kept

    def test_nms_by_area(self):
        big = _bbox("a", 0, 0, 20, 20, conf=0.1)
        small = _bbox("a", 0, 0, 12, 12, conf=0.9)
        kept = geometry.nms_by_area([small, big], iou_threshold=0.3)
        assert kept == [big]

    def test_proximity_overlap(self):
        a = _bbox("a", 0, 0, 10, 10)
        b = _bbox("b", 5, 5, 15, 15)
        assert geometry.bboxes_proximal(a, b, 0)

    def test_proximity_near(self):
        a = _bbox("a", 0, 0, 10, 10)
        b = _bbox("b", 15, 0, 25, 10)
        assert geometry.bboxes_proximal(a, b, 5)
        assert not geometry.bboxes_proximal(a, b, 4)

    def test_point_near_bbox_inside(self):
        b = _bbox("a", 0, 0, 10, 10)
        assert geometry.point_near_bbox((5, 5), b, 0)

    def test_point_near_bbox_edge_line_semantics(self):
        # Reference parity: |px - xmin| <= thr matches regardless of py.
        b = _bbox("a", 10, 10, 20, 20)
        assert geometry.point_near_bbox((11, 100), b, 6)
        assert not geometry.point_near_bbox((40, 100), b, 6)
