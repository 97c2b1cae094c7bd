"""Golden end-to-end test on a richer synthetic schematic.

Four-node circuit with a DC source, two resistors, a capacitor, a ground
symbol, a junction (preserved in the wire mask), and schematic text: the
netlist text is pinned exactly — any regression in CC ordering, ground
selection, renumbering, counters, or VLM merge changes this string.

Layout (wire mask, 400×500):

      N_top ────R1──── N_mid ────R2──── N_right
        │                │                │
        V1               C1               │
        │                │                │
      N_bot ───────────(junction)─────────┘
        │
       gnd
"""
import numpy as np

from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.netlist.fix import fix_netlist
from circuitvision_tpu.netlist.generate import (
    generate_netlist_from_nodes,
    stringify_netlist,
)
from circuitvision_tpu.sim.engine import perform_dc_analysis
from circuitvision_tpu.topology.enumerate_components import enumerate_components
from circuitvision_tpu.topology.nodes import extract_nodes


def _bbox(cls, x0, y0, x1, y1, conf=0.9, **kw):
    return BBox(class_name=cls, confidence=conf, xmin=x0, ymin=y0, xmax=x1, ymax=y1, **kw)


def build_circuit():
    H, W, t = 400, 500, 3
    mask = np.zeros((H, W), np.uint8)
    # top rail
    mask[60 : 60 + t, 60:440] = 255
    # three verticals: left (V1), middle (C1), right (plain wire)
    mask[60:340, 60 : 60 + t] = 255
    mask[60:340, 250 : 250 + t] = 255
    mask[60:340, 437 : 437 + t] = 255
    # bottom rail
    mask[337 : 337 + t, 60:440] = 255
    # gnd stub below bottom-left
    mask[337:380, 60 : 60 + t] = 255

    boxes = [
        _bbox("voltage.dc", 45, 150, 78, 250, semantic_direction="UP", semantic_reason="SIGN"),
        _bbox("resistor", 110, 45, 190, 78),      # R1 on top rail (left span)
        _bbox("resistor", 300, 45, 380, 78),      # R2 on top rail (right span)
        _bbox("capacitor.unpolarized", 235, 150, 268, 250),  # C1 middle vertical
        _bbox("gnd", 45, 355, 78, 385),
        _bbox("junction", 245, 330, 258, 345),    # preserved in mask
        _bbox("text", 110, 10, 180, 30),          # schematic text (ignored)
    ]
    return mask, boxes


class TestGoldenCircuit:
    def test_full_flow_pinned(self):
        mask, boxes = build_circuit()
        extraction = extract_nodes(mask, boxes)

        # Subtracting V1/R1/R2/C1 splits the loop; junction keeps the
        # bottom rail whole. Expect 3 electrical nodes:
        #   bottom rail+gnd stub (ground), top-left segment, top-mid segment.
        assert len(extraction.nodes) == 3
        ground = next(n for n in extraction.nodes if n.id == 0)
        # ground = lowest source-connected node (bottom rail, includes V1+gnd)
        classes = {c.class_name for c in ground.components}
        assert "voltage.dc" in classes and "gnd" in classes

        netlist = generate_netlist_from_nodes(extraction.nodes)
        valueless = stringify_netlist(netlist)
        # Pinned structural netlist text — byte-identical to the reference
        # implementation's own output on this (mask, boxes) input
        # (cross-checked via tests/test_reference_diff.py machinery).
        # Reference behaviors showing here: node old-ids follow cv2's
        # reverse-raster contour enumeration (ground = bottom rail is
        # contour 0), the matching walk tests only CHAIN_APPROX_SIMPLE
        # vertices against the edge-line rule (:1407-1446), and gnd
        # touches only one node so the single-node guard skips it
        # (:1680-1684).
        assert valueless.split("\n") == [
            "V1 0 2 None",
            "R1 1 0 None",
            "C1 1 0 None",
            "R2 2 1 None",
        ]

        enum_img, enum_boxes = enumerate_components(
            np.full((400, 500, 3), 255, np.uint8), boxes
        )
        assert [b.visual_id for b in enum_boxes] == [1, 2, 3, 4, 5]

        vlm = [
            {"id": "1", "class": "voltage.dc", "value": "10"},
            {"id": "2", "class": "resistor", "value": "1k"},
            {"id": "3", "class": "resistor", "value": "2k"},
            {"id": "4", "class": "capacitor.unpolarized", "value": "1u"},
            {"id": "5", "class": "gnd", "value": None},
        ]
        fix_netlist(netlist, vlm, enum_boxes)
        final = stringify_netlist(netlist)
        assert final.split("\n") == [
            "V1 0 2 10",
            "R1 2 1 1k",
            "R2 1 0 2k",
            "C1 1 0 1u",
        ]

        sim = perform_dc_analysis(final)
        assert sim.ok, sim.error
        # V1 0 2 10 → V(2) = -10; R1/R2 divider puts node 1 at -20/3 V.
        assert sim.node_voltages["2"] == "-10.000V"
        assert abs(float(sim.node_voltages["1"].rstrip("V")) + 20.0 / 3.0) < 1e-2

    def test_direction_down_flips_source(self):
        mask, boxes = build_circuit()
        boxes[0].semantic_direction = "DOWN"
        extraction = extract_nodes(mask, boxes)
        netlist = generate_netlist_from_nodes(extraction.nodes)
        v = next(l for l in netlist if l.component_type == "V")
        assert (v.node_1, v.node_2) == (2, 0)  # flipped vs UP's (0, 2)


class TestSkeleton:
    def test_skeleton_thin_line(self):
        from circuitvision_tpu.ops.skeleton import skeletonize

        mask = np.zeros((40, 80), np.uint8)
        mask[18:25, 10:70] = 255  # 7px-thick wire
        skel = np.asarray(skeletonize(mask))
        assert skel.any()
        # Skeleton is thin: per-column at most ~2 px in the wire interior.
        col_counts = skel[:, 20:60].sum(axis=0)
        assert col_counts.max() <= 2
        # And lies inside the original wire.
        assert not skel[~(mask > 0)].any()
