"""Differential netlist parity against the reference's OWN code.

Runs the reference implementation's host chain in-process (heavy deps
stubbed, tests/ref_loader.py):

    get_node_connections → generate_netlist_from_nodes → stringify_line
    (/root/reference/src/circuit_analyzer.py:1286-1605, 1607-1770,
     1909-1927)

against this repo's chain:

    topology.nodes.extract_nodes_batched → netlist.generate → stringify

on IDENTICAL (wire mask, detections) inputs — the 5 pinned eval circuits
plus randomized ladder topologies (eval/randomized.py) exercising the
class-dependent pixel thresholds (6/8/20), gnd/terminal handling,
semantic-direction node ordering, ARROW/SIGN prefix overrides, and
contour areas straddling the 4e-4 keep threshold.

Acceptance (SURVEY §7.5): byte-identical netlist text.
"""
from __future__ import annotations

import copy

import numpy as np
import pytest

from tests.ref_loader import bbox_to_ref_dict, load_reference_analyzer

N_RANDOM = 50


@pytest.fixture(scope="module")
def ref():
    return load_reference_analyzer()


def reference_netlist_text(ref, mask: np.ndarray, boxes) -> str:
    """The reference pipeline's valueless netlist text for one image
    (stage ordering of src/analysis_pipeline.py:227-279)."""
    dicts = [bbox_to_ref_dict(b) for b in boxes]
    nodes, *_ = ref.get_node_connections(None, mask.copy(), copy.deepcopy(dicts))
    netlist = ref.generate_netlist_from_nodes(nodes)
    return "\n".join(ref.stringify_line(line) for line in netlist)


def repo_netlist_text(mask: np.ndarray, boxes) -> str:
    from circuitvision_tpu.core.config import TopologyConfig
    from circuitvision_tpu.netlist.generate import (
        generate_netlist_from_nodes,
        stringify_netlist,
    )
    from circuitvision_tpu.topology.nodes import extract_nodes_batched

    ex = extract_nodes_batched([mask], [list(boxes)], TopologyConfig())[0]
    return stringify_netlist(generate_netlist_from_nodes(ex.nodes))


def _diff_case(ref, name: str, mask, boxes) -> str | None:
    want = reference_netlist_text(ref, mask, boxes)
    got = repo_netlist_text(mask, boxes)
    if want != got:
        return f"--- {name} ---\nreference:\n{want}\nrepo:\n{got}"
    return None


class TestEvalCircuitsMatchReference:
    def test_eval_circuits(self, ref):
        from circuitvision_tpu.eval.synth import make_circuits

        failures = []
        for c in make_circuits():
            d = _diff_case(ref, c.name, c.wire_mask, c.boxes)
            if d:
                failures.append(d)
        assert not failures, "\n".join(failures)


class TestRandomizedTopologiesMatchReference:
    def test_randomized(self, ref):
        from circuitvision_tpu.eval.randomized import random_circuits

        failures = []
        for i, (mask, boxes) in enumerate(random_circuits(N_RANDOM)):
            d = _diff_case(ref, f"random-{1000 + i}", mask, boxes)
            if d:
                failures.append(d)
        assert not failures, (
            f"{len(failures)}/{N_RANDOM} randomized circuits diverge:\n"
            + "\n".join(failures[:10])
        )
