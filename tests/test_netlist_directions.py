"""Exhaustive direction/ordering cases for the node-ordering logic
(src/circuit_analyzer.py:1937-2034 semantics)."""
import pytest

from circuitvision_tpu.core.types import BBox, Node
from circuitvision_tpu.netlist.generate import generate_netlist_from_nodes


def _circuit(cls, direction, reason, n1_centroid, n2_centroid):
    comp = BBox(
        class_name=cls, confidence=0.9, xmin=0, ymin=0, xmax=10, ymax=10,
        semantic_direction=direction, semantic_reason=reason,
    )
    nodes = [
        Node(id=0, components=[comp, _other()], centroid=n1_centroid),
        Node(id=1, components=[comp, _other()], centroid=n2_centroid),
    ]
    return nodes


def _other():
    return BBox(class_name="resistor", confidence=0.9, xmin=50, ymin=0, xmax=60, ymax=10)


def _v_nodes(cls, direction, reason, n1c, n2c):
    netlist = generate_netlist_from_nodes(_circuit(cls, direction, reason, n1c, n2c))
    line = next(l for l in netlist if l.class_name == cls)
    return line.node_1, line.node_2


# node 0 at (0, 100) [low on screen], node 1 at (0, 0) [high].
LOW, HIGH = (0.0, 100.0), (0.0, 0.0)
# node 0 at (0, 0) [left], node 1 at (100, 0) [right].
LEFT, RIGHT = (0.0, 0.0), (100.0, 0.0)


class TestVoltageSign:
    def test_up_picks_lower_node_first(self):
        # UP + SIGN: swap iff n1y < n2y. n1=LOW (y=100) vs n2=HIGH (y=0):
        # 100 < 0 false → node_1 = first node (0).
        assert _v_nodes("voltage.dc", "UP", "SIGN", LOW, HIGH) == (0, 1)

    def test_up_swaps_when_first_is_higher(self):
        assert _v_nodes("voltage.dc", "UP", "SIGN", HIGH, LOW) == (1, 0)

    def test_down_inverts(self):
        assert _v_nodes("voltage.dc", "DOWN", "SIGN", LOW, HIGH) == (1, 0)
        assert _v_nodes("voltage.dc", "DOWN", "SIGN", HIGH, LOW) == (0, 1)

    def test_left_right(self):
        assert _v_nodes("voltage.dc", "LEFT", "SIGN", LEFT, RIGHT) == (1, 0)
        assert _v_nodes("voltage.dc", "RIGHT", "SIGN", LEFT, RIGHT) == (0, 1)

    def test_unknown_defaults_to_swap(self):
        # UNKNOWN → (node2, node1) primary (reference :1984-1988).
        assert _v_nodes("voltage.dc", "UNKNOWN", "UNKNOWN", LOW, HIGH) == (1, 0)

    def test_unhandled_direction_keeps_order(self):
        # A direction string outside UP/DOWN/LEFT/RIGHT falls through to
        # (node1, node2) (reference :2023-2026).
        assert _v_nodes("voltage.dc", "DIAGONAL", "SIGN", LOW, HIGH) == (0, 1)


class TestDiode:
    def test_diode_uses_direction(self):
        assert _v_nodes("diode", "RIGHT", "UNKNOWN", LEFT, RIGHT) == (0, 1)
        assert _v_nodes("diode", "LEFT", "UNKNOWN", LEFT, RIGHT) == (1, 0)

    def test_diode_unknown_swaps(self):
        assert _v_nodes("diode", "UNKNOWN", "UNKNOWN", LEFT, RIGHT) == (1, 0)


class TestNonDirectional:
    def test_resistor_always_default_swap(self):
        # Not a source/diode: ordering logic returns the default swap even
        # with a direction present.
        nodes = _circuit("capacitor.unpolarized", "UP", "SIGN", LOW, HIGH)
        netlist = generate_netlist_from_nodes(nodes)
        line = next(l for l in netlist if l.class_name == "capacitor.unpolarized")
        assert (line.node_1, line.node_2) == (1, 0)


class TestCurrentSource:
    def test_current_arrow_keeps_i_prefix(self):
        nodes = _circuit("current.dc", "UP", "ARROW", LOW, HIGH)
        netlist = generate_netlist_from_nodes(nodes)
        line = next(l for l in netlist if l.class_name == "current.dc")
        assert line.component_type == "I"
        # acts_like_arrow: swap iff n1y < n2y → 100 < 0 false → no swap.
        assert (line.node_1, line.node_2) == (0, 1)
