"""Netlist generation / fix / stringify semantics.

Locks in the reference behaviors cited in SURVEY.md §4 item 1: counter
semantics, UNKNOWN-direction default node swap, VLM merge rules, visual-id
sorting, and renumbering.
"""
from circuitvision_tpu.core.types import BBox, NetlistLine, Node
from circuitvision_tpu.netlist.fix import fix_netlist
from circuitvision_tpu.netlist.generate import (
    generate_fallback_netlist,
    generate_netlist_from_nodes,
    stringify_netlist,
)


def _bbox(cls, x0, y0, x1, y1, direction=None, reason=None, conf=0.9):
    return BBox(
        class_name=cls,
        confidence=conf,
        xmin=x0,
        ymin=y0,
        xmax=x1,
        ymax=y1,
        semantic_direction=direction,
        semantic_reason=reason,
    )


def _two_node_circuit(direction=None, reason=None):
    """V source + resistor between node 0 (ground, bottom) and node 1 (top)."""
    v = _bbox("voltage.dc", 10, 40, 30, 80, direction, reason)
    r = _bbox("resistor", 60, 40, 80, 80)
    n0 = Node(id=0, components=[v, r], centroid=(50.0, 100.0))
    n1 = Node(id=1, components=[v, r], centroid=(50.0, 20.0))
    return [n0, n1]


class TestGenerate:
    def test_basic_two_component(self):
        netlist = generate_netlist_from_nodes(_two_node_circuit())
        assert len(netlist) == 2
        types = {l.component_type for l in netlist}
        assert types == {"V", "R"}
        v = next(l for l in netlist if l.component_type == "V")
        assert v.component_num == 1
        # direction=None on a direction-relevant class (voltage source)
        # takes the reference's UNSWAPPED fallthrough branch — distinct
        # from the "UNKNOWN" string, which swaps (:1986-1988 vs
        # :2027-2030; pinned by tests/test_reference_diff.py).
        assert (v.node_1, v.node_2) == (0, 1)

    def test_unknown_string_direction_swaps(self):
        netlist = generate_netlist_from_nodes(_two_node_circuit("UNKNOWN", None))
        v = next(l for l in netlist if l.component_type == "V")
        # "UNKNOWN" hits the swap default: other node becomes primary.
        assert (v.node_1, v.node_2) == (1, 0)

    def test_direction_up_sign_orders_nodes(self):
        # + at bottom → direction UP. node0 (ground) centroid y=100 is lower
        # on screen than node1 y=20.  n1=(ground) encountered first.
        # UP: swapped iff n1y < n2y → 100 < 20 False → primary=node0.
        netlist = generate_netlist_from_nodes(_two_node_circuit("UP", "SIGN"))
        v = next(l for l in netlist if l.component_type == "V")
        assert (v.node_1, v.node_2) == (0, 1)

    def test_direction_down_sign(self):
        netlist = generate_netlist_from_nodes(_two_node_circuit("DOWN", "SIGN"))
        v = next(l for l in netlist if l.component_type == "V")
        assert (v.node_1, v.node_2) == (1, 0)

    def test_voltage_with_arrow_becomes_current_source(self):
        netlist = generate_netlist_from_nodes(_two_node_circuit("UP", "ARROW"))
        prefixes = sorted(l.component_type for l in netlist)
        assert prefixes == ["I", "R"]

    def test_current_source_with_sign_becomes_voltage_source(self):
        i = _bbox("current.dc", 10, 40, 30, 80, "UP", "SIGN")
        r = _bbox("resistor", 60, 40, 80, 80)
        nodes = [
            Node(id=0, components=[i, r], centroid=(50.0, 100.0)),
            Node(id=1, components=[i, r], centroid=(50.0, 20.0)),
        ]
        netlist = generate_netlist_from_nodes(nodes)
        assert sorted(l.component_type for l in netlist) == ["R", "V"]

    def test_counters_increment_per_prefix(self):
        r1 = _bbox("resistor", 0, 0, 10, 10)
        r2 = _bbox("resistor", 100, 0, 110, 10)
        c1 = _bbox("capacitor.polarized", 200, 0, 210, 10)
        nodes = [
            Node(id=0, components=[r1, r2, c1], centroid=(0.0, 50.0)),
            Node(id=1, components=[r1, r2, c1], centroid=(0.0, 10.0)),
        ]
        netlist = generate_netlist_from_nodes(nodes)
        rs = [l for l in netlist if l.component_type == "R"]
        assert [l.component_num for l in rs] == [1, 2]
        cs = [l for l in netlist if l.component_type == "C"]
        assert [l.component_num for l in cs] == [1]

    def test_terminal_becomes_type_n(self):
        t = _bbox("terminal", 0, 0, 10, 10)
        nodes = [Node(id=1, components=[t], centroid=(5.0, 5.0))]
        netlist = generate_netlist_from_nodes(nodes)
        assert len(netlist) == 1
        line = netlist[0]
        assert line.component_type == "N"
        assert line.node_1 == 1 and line.node_2 == "0"

    def test_single_node_nonterminal_skipped(self):
        r = _bbox("resistor", 0, 0, 10, 10)
        nodes = [Node(id=1, components=[r], centroid=(5.0, 5.0))]
        assert generate_netlist_from_nodes(nodes) == []

    def test_ignorable_classes_skipped(self):
        j = _bbox("junction", 0, 0, 5, 5)
        t = _bbox("text", 20, 0, 30, 5)
        nodes = [Node(id=0, components=[j, t], centroid=(0.0, 0.0))]
        assert generate_netlist_from_nodes(nodes) == []

    def test_gnd_forces_node2_zero(self):
        g = _bbox("gnd", 0, 90, 10, 100)
        r = _bbox("resistor", 40, 40, 60, 60)
        nodes = [
            Node(id=0, components=[g, r], centroid=(5.0, 95.0)),
            Node(id=1, components=[g, r], centroid=(50.0, 20.0)),
        ]
        netlist = generate_netlist_from_nodes(nodes)
        gl = next(l for l in netlist if l.class_name == "gnd")
        assert gl.node_2 == 0 and gl.node_1 == 1
        assert gl.component_type == "0"

    def test_component_emitted_once(self):
        r = _bbox("resistor", 0, 0, 10, 10)
        nodes = [
            Node(id=0, components=[r], centroid=(0.0, 50.0)),
            Node(id=1, components=[r], centroid=(0.0, 10.0)),
            Node(id=2, components=[r], centroid=(0.0, 90.0)),
        ]
        netlist = generate_netlist_from_nodes(nodes)
        assert len(netlist) == 1


class TestStringify:
    def test_plain_line(self):
        line = NetlistLine("R", 1, 1, 0, "None", class_name="resistor")
        assert line.stringify() == "R1 1 0 None"

    def test_gnd_and_empty_type_suppressed(self):
        assert NetlistLine("0", 1, 1, 0, "x", class_name="gnd").stringify() == ""
        assert NetlistLine("", 1, 1, 0, "x", class_name="junction").stringify() == ""

    def test_missing_fields_suppressed(self):
        assert NetlistLine("R", None, 1, 0, "5").stringify() == ""
        assert NetlistLine("R", 1, None, 0, "5").stringify() == ""

    def test_full_netlist_text(self):
        netlist = generate_netlist_from_nodes(_two_node_circuit())
        text = stringify_netlist(netlist)
        assert "V1 0 1 None" in text
        assert "R1" in text


class TestFixNetlist:
    def _netlist_and_enum(self):
        nodes = _two_node_circuit()
        netlist = generate_netlist_from_nodes(nodes)
        enum = []
        vid = 1
        for line in netlist:
            b = line.source
            b.visual_id = vid
            enum.append(b)
            vid += 1
        return netlist, enum

    def test_value_fills_none(self):
        netlist, enum = self._netlist_and_enum()
        r_uid = next(l for l in netlist if l.component_type == "R").persistent_uid
        r_vid = next(b.visual_id for b in enum if b.persistent_uid == r_uid)
        vlm = [{"id": str(r_vid), "class": "resistor", "value": "10k"}]
        fix_netlist(netlist, vlm, enum)
        r = next(l for l in netlist if l.class_name == "resistor")
        assert r.value == "10k"

    def test_alpha_value_invalidated_for_sources(self):
        netlist, enum = self._netlist_and_enum()
        v_uid = next(l for l in netlist if l.component_type == "V").persistent_uid
        v_vid = next(b.visual_id for b in enum if b.persistent_uid == v_uid)
        vlm = [{"id": str(v_vid), "class": "voltage.dc", "value": "Vin"}]
        fix_netlist(netlist, vlm, enum)
        v = next(l for l in netlist if l.component_type == "V")
        assert v.value is None

    def test_ac_value_kept_for_sources(self):
        netlist, enum = self._netlist_and_enum()
        v_uid = next(l for l in netlist if l.component_type == "V").persistent_uid
        v_vid = next(b.visual_id for b in enum if b.persistent_uid == v_uid)
        vlm = [{"id": str(v_vid), "class": "voltage.ac", "value": "ac"}]
        fix_netlist(netlist, vlm, enum)
        v = next(l for l in netlist if l.component_type == "V")
        assert v.value == "ac"

    def test_vlm_class_overrides(self):
        netlist, enum = self._netlist_and_enum()
        r_uid = next(l for l in netlist if l.component_type == "R").persistent_uid
        r_vid = next(b.visual_id for b in enum if b.persistent_uid == r_uid)
        vlm = [{"id": str(r_vid), "class": "capacitor.unpolarized", "value": "-j50"}]
        fix_netlist(netlist, vlm, enum)
        c = next(l for l in netlist if l.class_name == "capacitor.unpolarized")
        assert c.component_type == "C"
        assert c.value == "-j50"
        assert c.component_num == 1  # renumbered per final type

    def test_sort_by_visual_id_then_renumber(self):
        r1 = _bbox("resistor", 0, 0, 10, 10)
        r2 = _bbox("resistor", 100, 0, 110, 10)
        nodes = [
            Node(id=0, components=[r1, r2], centroid=(0.0, 50.0)),
            Node(id=1, components=[r1, r2], centroid=(0.0, 10.0)),
        ]
        netlist = generate_netlist_from_nodes(nodes)
        # Enumerate in reverse so visual order flips generation order.
        enum = []
        for line, vid in zip(netlist, [2, 1]):
            b = line.source
            b.visual_id = vid
            enum.append(b)
        fix_netlist(netlist, [], enum)
        assert [l.visual_id for l in netlist] == [1, 2]
        assert [l.component_num for l in netlist] == [1, 2]

    def test_gnd_class_from_vlm_forces_node2(self):
        netlist, enum = self._netlist_and_enum()
        r_uid = next(l for l in netlist if l.component_type == "R").persistent_uid
        r_vid = next(b.visual_id for b in enum if b.persistent_uid == r_uid)
        vlm = [{"id": str(r_vid), "class": "gnd", "value": None}]
        fix_netlist(netlist, vlm, enum)
        g = next(l for l in netlist if l.class_name == "gnd")
        assert g.node_2 == 0
        assert g.stringify() == ""  # gnd suppressed from SPICE text

    def test_none_vlm_value_clears_source_value(self):
        netlist, enum = self._netlist_and_enum()
        v = next(l for l in netlist if l.component_type == "V")
        v.value = "5"
        v_vid = next(b.visual_id for b in enum if b.persistent_uid == v.persistent_uid)
        vlm = [{"id": str(v_vid), "class": "voltage.dc", "value": None}]
        fix_netlist(netlist, vlm, enum)
        v = next(l for l in netlist if l.component_type == "V")
        assert v.value is None


class TestFallback:
    def test_fallback_netlist_from_components(self):
        boxes = [
            _bbox("resistor", 0, 0, 10, 10),
            _bbox("gnd", 20, 0, 30, 10),
            _bbox("text", 40, 0, 50, 10),
            _bbox("voltage.dc", 60, 0, 70, 10),
        ]
        lines = generate_fallback_netlist(boxes)
        assert sorted(l.component_type for l in lines) == ["R", "V"]
