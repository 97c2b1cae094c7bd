"""Topology stage: node extraction, crop, reclassification, enumeration.

Golden-image style tests on synthetic schematics (SURVEY.md §4 item 2):
wires drawn as rasters, component boxes subtracted, node partitions and
netlist text checked end-to-end.
"""
import numpy as np

from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.netlist.generate import generate_netlist_from_nodes, stringify_netlist
from circuitvision_tpu.topology.crop import crop_image_and_adjust_bboxes
from circuitvision_tpu.topology.enumerate_components import enumerate_components
from circuitvision_tpu.topology.nodes import extract_nodes, subtract_component_boxes
from circuitvision_tpu.topology.reclassify import reclassify_terminals, segment_classical


def _bbox(cls, x0, y0, x1, y1, conf=0.9, **kw):
    return BBox(class_name=cls, confidence=conf, xmin=x0, ymin=y0, xmax=x1, ymax=y1, **kw)


def loop_circuit():
    """A rectangular wire loop with a V source on the left edge and a
    resistor on the top edge. Subtracting the two component boxes splits
    the loop into exactly two nodes."""
    mask = np.zeros((300, 400), np.uint8)
    w = 3
    mask[50 : 50 + w, 50:353] = 255  # top wire
    mask[250 : 250 + w, 50:353] = 255  # bottom wire
    mask[50:253, 50 : 50 + w] = 255  # left wire
    mask[50:253, 350 : 350 + w] = 255  # right wire
    v = _bbox("voltage.dc", 35, 120, 70, 180)
    r = _bbox("resistor", 150, 35, 250, 70)
    return mask, [v, r]


class TestSubtract:
    def test_preserves_junctions(self):
        mask = np.full((50, 50), 255, np.uint8)
        boxes = [_bbox("resistor", 0, 0, 10, 10), _bbox("junction", 20, 20, 30, 30)]
        out = subtract_component_boxes(mask, boxes)
        assert out[5, 5] == 0
        assert out[25, 25] == 255


class TestExtractNodes:
    def test_loop_two_nodes(self):
        mask, boxes = loop_circuit()
        result = extract_nodes(mask, boxes)
        assert len(result.nodes) == 2
        ids = sorted(n.id for n in result.nodes)
        assert ids == [0, 1]
        # Both components touch both nodes.
        for node in result.nodes:
            uids = {c.persistent_uid for c in node.components}
            assert len(uids) == 2

    def test_ground_is_lowest_source_connected(self):
        mask, boxes = loop_circuit()
        result = extract_nodes(mask, boxes)
        g = next(n for n in result.nodes if n.id == 0)
        other = next(n for n in result.nodes if n.id == 1)
        # Ground contains the bottom wire → larger centroid y.
        assert g.centroid[1] > other.centroid[1]

    def test_netlist_from_extraction(self):
        mask, boxes = loop_circuit()
        result = extract_nodes(mask, boxes)
        netlist = generate_netlist_from_nodes(result.nodes)
        text = stringify_netlist(netlist)
        assert "V1" in text and "R1" in text
        # Two-terminal components span both nodes.
        v = next(l for l in netlist if l.component_type == "V")
        assert {v.node_1, v.node_2} == {0, 1}

    def test_no_mask_returns_empty(self):
        result = extract_nodes(None, [])
        assert result.nodes == []

    def test_open_wire_single_node_dropped(self):
        # A single dangling wire segment touching one resistor: one node
        # with 1 component → renumbering keeps ground only if >= 2 comps
        # rule applies; single node still returned as ground node 0.
        mask = np.zeros((200, 300), np.uint8)
        mask[100:103, 50:250] = 255
        r = _bbox("resistor", 120, 85, 180, 115)
        result = extract_nodes(mask, [r])
        # the box splits the wire into 2 pieces, each touching r once
        assert len(result.nodes) >= 1
        netlist = generate_netlist_from_nodes(result.nodes)
        # R touches both pieces → a normal 2-node resistor line
        if len(result.nodes) == 2:
            assert len(netlist) == 1
            assert netlist[0].component_type == "R"

    def test_small_specks_filtered(self):
        mask, boxes = loop_circuit()
        mask[10:12, 10:12] = 255  # speck below area threshold
        result = extract_nodes(mask, boxes)
        assert len(result.nodes) == 2


class TestCrop:
    def test_crop_applied_around_cluster(self):
        img = np.zeros((1000, 1400, 3), np.uint8)
        boxes = [
            _bbox("resistor", 500, 400, 560, 430),
            _bbox("voltage.dc", 600, 400, 650, 460),
            _bbox("capacitor.unpolarized", 500, 500, 560, 530),
        ]
        cropped, adjusted, info = crop_image_and_adjust_bboxes(img, boxes)
        assert info.applied
        x0, y0, x1, y1 = info.window
        assert x0 <= 500 - 80 + 1 and y1 >= 530 + 79
        assert cropped.shape[0] < 1000
        # Boxes shifted into crop space, uids preserved.
        assert adjusted[0].persistent_uid == boxes[0].persistent_uid
        assert adjusted[0].xmin == 500 - x0

    def test_no_crop_when_basis_too_large(self):
        img = np.zeros((200, 200, 3), np.uint8)
        boxes = [
            _bbox("resistor", 1, 1, 100, 195),
            _bbox("voltage.dc", 120, 1, 199, 195),
        ]
        _, _, info = crop_image_and_adjust_bboxes(img, boxes)
        assert not info.applied
        assert info.reason_for_no_crop == "crop_basis_bbox_too_large"

    def test_no_elements(self):
        img = np.zeros((100, 100, 3), np.uint8)
        boxes = [_bbox("text", 10, 10, 30, 20)]
        out_img, out_boxes, info = crop_image_and_adjust_bboxes(img, boxes)
        assert not info.applied
        assert info.reason_for_no_crop == "no_elements_for_clustering"
        assert len(out_boxes) == 1

    def test_isolated_far_component_excluded(self):
        img = np.zeros((1000, 1400, 3), np.uint8)
        cluster = [
            _bbox("resistor", 500, 400, 560, 430),
            _bbox("voltage.dc", 600, 400, 650, 460),
        ]
        outlier = _bbox("resistor", 50, 50, 90, 80)
        cropped, adjusted, info = crop_image_and_adjust_bboxes(img, cluster + [outlier])
        assert info.applied
        # Outlier's box does not survive the crop (clipped away).
        uids = {b.persistent_uid for b in adjusted}
        assert outlier.persistent_uid not in uids

    def test_text_expands_window(self):
        img = np.zeros((1000, 1400, 3), np.uint8)
        boxes = [
            _bbox("resistor", 500, 400, 560, 430),
            _bbox("voltage.dc", 600, 400, 650, 460),
            _bbox("text", 380, 390, 440, 410),  # just left of padded window
        ]
        _, _, info = crop_image_and_adjust_bboxes(img, boxes)
        assert info.applied
        assert info.window[0] <= 360  # text pulled the window left


class TestReclassify:
    def test_terminal_with_two_connections_becomes_source(self):
        # White background, two wires converging on a 'terminal' box.
        img = np.full((200, 300, 3), 255, np.uint8)
        img[100:103, 20:140] = 0  # left wire
        img[100:103, 160:280] = 0  # right wire
        term = _bbox("terminal", 140, 85, 160, 115)
        out = reclassify_terminals(img, [term])
        assert out[0].class_name == "voltage.dc"
        assert out[0].was_reclassified_from_terminal
        assert out[0].original_class_if_reclassified == "terminal"

    def test_terminal_with_one_connection_kept(self):
        img = np.full((200, 300, 3), 255, np.uint8)
        img[100:103, 20:140] = 0  # only a left wire
        term = _bbox("terminal", 140, 85, 160, 115)
        out = reclassify_terminals(img, [term])
        assert out[0].class_name == "terminal"

    def test_classical_mask_polarity(self):
        img = np.full((100, 100, 3), 255, np.uint8)
        img[50:53, 10:90] = 0
        mask = segment_classical(img)
        assert mask[51, 50] == 255  # dark line → foreground
        assert mask[10, 10] == 0


class TestEnumerate:
    def test_ids_assigned_and_drawn(self):
        img = np.full((300, 400, 3), 255, np.uint8)
        boxes = [
            _bbox("resistor", 100, 100, 150, 130),
            _bbox("voltage.dc", 250, 100, 300, 160),
            _bbox("text", 10, 10, 60, 30),
        ]
        out_img, out_boxes = enumerate_components(img, boxes)
        assert [b.visual_id for b in out_boxes] == [1, 2]
        # text excluded from enumeration
        assert all(b.class_name != "text" for b in out_boxes)
        assert (out_img != img).any()  # something was drawn

    def test_input_image_not_mutated(self):
        img = np.full((300, 400, 3), 255, np.uint8)
        snapshot = img.copy()
        enumerate_components(img, [_bbox("resistor", 100, 100, 150, 130)])
        assert (img == snapshot).all()


class TestFetchVizFlag:
    def test_no_viz_fetch_still_builds_nodes(self):
        mask, boxes = loop_circuit()
        result = extract_nodes(mask, boxes, fetch_viz=False)
        assert len(result.nodes) == 2
        assert result.enhanced_mask is None
        assert result.label_image is None


class TestNodeDebugViz:
    """Debug-surface parity for the node stage: colored contour viz +
    connection-points viz (reference src/circuit_analyzer.py:405-458,
    :1598-1601; VERDICT r1 missing #5)."""

    def test_contour_and_connection_viz(self):
        from tests.test_golden_circuit import build_circuit
        from circuitvision_tpu.core.viz import BRIGHT_COLORS
        from circuitvision_tpu.topology.nodes import extract_nodes

        mask, boxes = build_circuit()
        ex = extract_nodes(mask, boxes)
        assert ex.contour_viz is not None and ex.connection_viz is not None
        assert ex.contour_viz.shape == ex.enhanced_mask.shape + (3,)
        # Every kept contour painted with its palette color.
        painted = {tuple(c) for c in ex.contour_viz.reshape(-1, 3).tolist()} - {(0, 0, 0)}
        for i in range(3):  # golden circuit keeps ≥3 contours → ids 0,1,2
            assert tuple(BRIGHT_COLORS[i]) in painted
        # Cyan contact circles appear only in the connection viz, and land
        # near component boxes (within class threshold of an edge).
        cyan = (ex.connection_viz == np.asarray([0, 255, 255])).all(-1)
        assert cyan.any()
        assert not (ex.contour_viz == np.asarray([0, 255, 255])).all(-1).any()
        # Terminal contacts exist at the component boxes. (Points farther
        # out along the box's axis bands are faithful too: the reference's
        # is_point_near_bbox measures per-axis distance to infinite edge
        # LINES, src/circuit_analyzer.py:811-846, preserved here.)
        ys, xs = np.nonzero(cyan)
        comp = [b for b in ex.resized_bboxes if b.class_name not in ("text", "junction")]
        pad = 5 + 25  # circle radius + max class threshold (source=20) + slack
        near_any = np.zeros(len(xs), bool)
        for b in comp:
            near_any |= (
                (xs >= b.xmin - pad) & (xs <= b.xmax + pad)
                & (ys >= b.ymin - pad) & (ys <= b.ymax + pad)
            )
        assert near_any.any()

    def test_fetch_viz_false_skips(self):
        from tests.test_golden_circuit import build_circuit
        from circuitvision_tpu.topology.nodes import extract_nodes

        mask, boxes = build_circuit()
        ex = extract_nodes(mask, boxes, fetch_viz=False)
        assert ex.contour_viz is None and ex.connection_viz is None
        assert len(ex.nodes) == 3


class TestHostCCParity:
    """topology/host_cc.label_touch_stage_host vs the device stage."""

    def test_stage_parity_on_synthetic_rasters(self):
        import jax.numpy as jnp
        from circuitvision_tpu.core.config import TopologyConfig
        from circuitvision_tpu.topology.host_cc import label_touch_stage_host
        from circuitvision_tpu.topology.nodes import _label_touch_stage

        cfg = TopologyConfig()
        rng = np.random.default_rng(0)
        h, w = 120, 160
        fg = np.zeros((h, w), bool)
        # wires: a loop + a dangling stub + salt noise specks
        fg[20:23, 10:150] = True
        fg[100:103, 10:150] = True
        fg[20:103, 10:13] = True
        fg[20:103, 147:150] = True
        fg[60:62, 60:100] = True
        for _ in range(30):
            y, x = rng.integers(0, h), rng.integers(0, w)
            fg[y, x] = True

        comp_boxes = np.asarray(
            [[5, 50, 18, 80], [140, 50, 155, 80], [70, 15, 95, 30], [0, 0, 0, 0]],
            np.float32,
        )
        comp_thr = np.asarray([6, 20, 8, 6], np.float32)
        comp_valid = np.asarray([True, True, True, False])

        uniq_d, cen_d, rel_d, keep_d, touch_d = map(
            np.asarray,
            (lambda s: (s[1].labels, s[1].centroid, s[2], s[3], s[4]))(
                _label_touch_stage(
                    jnp.asarray(fg), jnp.float32(w), cfg,
                    jnp.asarray(comp_boxes), jnp.asarray(comp_thr),
                    jnp.asarray(comp_valid),
                )
            ),
        )
        uniq_h, cen_h, rel_h, keep_h, touch_h = label_touch_stage_host(
            fg, float(w), cfg, comp_boxes, comp_thr, comp_valid
        )
        np.testing.assert_array_equal(uniq_d, uniq_h)
        np.testing.assert_array_equal(keep_d, keep_h)
        np.testing.assert_array_equal(touch_d, touch_h)
        # sentinel padding rows are unused downstream; the device computes
        # the background pseudo-label's centroid there, the host zeros it
        valid = uniq_h != fg.size
        np.testing.assert_allclose(cen_d[valid], cen_h[valid], atol=1e-3)
        np.testing.assert_allclose(rel_d[valid], rel_h[valid], atol=1e-6)
