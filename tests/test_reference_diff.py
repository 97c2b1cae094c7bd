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


def _crop_fingerprint_ref(ref, image, boxes):
    img, adj, dbg = ref.crop_image_and_adjust_bboxes(
        image, [bbox_to_ref_dict(b) for b in boxes], padding=80
    )
    return (
        img.shape,
        img.tobytes(),
        [
            (d["persistent_uid"], d["xmin"], d["ymin"], d["xmax"], d["ymax"])
            for d in adj
        ],
        bool(dbg["crop_applied"]),
    )


def _crop_fingerprint_repo(image, boxes):
    from circuitvision_tpu.core.config import CropConfig
    from circuitvision_tpu.topology.crop import crop_image_and_adjust_bboxes

    img, adj, info = crop_image_and_adjust_bboxes(image, list(boxes), CropConfig())
    return (
        img.shape,
        img.tobytes(),
        [(b.persistent_uid, b.xmin, b.ymin, b.xmax, b.ymax) for b in adj],
        bool(info.applied),
    )


class TestCropMatchesReference:
    """crop_image_and_adjust_bboxes vs the reference's own code
    (src/circuit_analyzer.py:937-1284) on identical (image, detections):
    cropped pixels, adjusted box coordinates + uid order, and the
    crop-applied decision must all match."""

    def test_eval_circuits(self, ref):
        from circuitvision_tpu.eval.synth import make_all_circuits

        failures = []
        for c in make_all_circuits():
            want = _crop_fingerprint_ref(ref, c.image, c.boxes)
            got = _crop_fingerprint_repo(c.image, c.boxes)
            if want != got:
                failures.append(
                    f"--- {c.name} ---\nref:  shape={want[0]} applied={want[3]} "
                    f"boxes={want[2]}\nrepo: shape={got[0]} applied={got[3]} "
                    f"boxes={got[2]}"
                )
        assert not failures, "\n".join(failures)

    def test_randomized(self, ref):
        import numpy as np

        from circuitvision_tpu.eval.randomized import random_circuits

        failures = []
        for i, (mask, boxes) in enumerate(random_circuits(20)):
            image = np.dstack([mask] * 3)
            want = _crop_fingerprint_ref(ref, image, boxes)
            got = _crop_fingerprint_repo(image, boxes)
            if want != got:
                failures.append(
                    f"--- random-{1000 + i} ---\nref:  shape={want[0]} "
                    f"applied={want[3]} boxes={want[2]}\nrepo: shape={got[0]} "
                    f"applied={got[3]} boxes={got[2]}"
                )
        assert not failures, "\n".join(failures[:6])


def _hostile_vlm_out(enum_ids: list) -> list[dict]:
    """Deterministic VLM stage-2 output exercising every fix_netlist merge
    rule (src/circuit_analyzer.py:1772-1907): None values, non-numeric
    source values (invalidation), 'ac' values (invalidation exemption),
    class overrides, gnd forcing, missing ids, and an unknown extra id."""
    out = []
    for i, vid in enumerate(enum_ids):
        k = i % 7
        if k == 0:
            out.append({"id": str(vid), "class": "resistor", "value": None})
        elif k == 1:
            out.append({"id": str(vid), "class": "voltage.dc", "value": "abc"})
        elif k == 2:
            out.append(
                {"id": str(vid), "class": "voltage.ac", "value": "AC 5V 1kHz 0deg"}
            )
        elif k == 3:
            out.append({"id": str(vid), "class": "capacitor", "value": "10u"})
        elif k == 4:
            out.append({"id": str(vid), "class": "gnd", "value": None})
        elif k == 5:
            pass  # component absent from VLM output
        else:
            out.append({"id": str(vid), "class": "resistor", "value": "4.7k"})
    out.append({"id": "999", "class": "inductor", "value": "1m"})
    return out


def _fixed_netlist_ref(ref, image, mask, boxes) -> str:
    import copy as _copy

    dicts = [bbox_to_ref_dict(b) for b in boxes]
    nodes, *_ = ref.get_node_connections(None, mask.copy(), _copy.deepcopy(dicts))
    netlist = ref.generate_netlist_from_nodes(nodes)
    _, enum_boxes = ref.enumerate_components(image, _copy.deepcopy(dicts))
    ids = [d["id"] for d in enum_boxes if d.get("id") is not None]
    ref.fix_netlist(netlist, _hostile_vlm_out(ids), enum_boxes)
    return "\n".join(ref.stringify_line(line) for line in netlist)


def _fixed_netlist_repo(image, mask, boxes) -> str:
    from circuitvision_tpu.core.config import TopologyConfig
    from circuitvision_tpu.netlist.fix import fix_netlist
    from circuitvision_tpu.netlist.generate import (
        generate_netlist_from_nodes,
        stringify_netlist,
    )
    from circuitvision_tpu.topology.enumerate_components import enumerate_components
    from circuitvision_tpu.topology.nodes import extract_nodes_batched

    ex = extract_nodes_batched([mask], [list(boxes)], TopologyConfig())[0]
    netlist = generate_netlist_from_nodes(ex.nodes)
    _, enum_boxes = enumerate_components(image, list(boxes))
    ids = [b.visual_id for b in enum_boxes if b.visual_id is not None]
    fix_netlist(netlist, _hostile_vlm_out(ids), enum_boxes)
    return stringify_netlist(netlist)


class TestFixNetlistMatchesReference:
    """The FINAL (post-VLM-merge) netlist text vs the reference's own
    enumerate_components + fix_netlist + stringify chain
    (src/circuit_analyzer.py:479-785, 1772-1907, 1909-1927) on identical
    inputs and identical hostile VLM output."""

    def test_eval_circuits(self, ref):
        from circuitvision_tpu.eval.synth import make_circuits

        failures = []
        for c in make_circuits():
            want = _fixed_netlist_ref(ref, c.image, c.wire_mask, c.boxes)
            got = _fixed_netlist_repo(c.image, c.wire_mask, c.boxes)
            if want != got:
                failures.append(
                    f"--- {c.name} ---\nreference:\n{want}\nrepo:\n{got}"
                )
        assert not failures, "\n".join(failures)

    def test_randomized(self, ref):
        import numpy as np

        from circuitvision_tpu.eval.randomized import random_circuits

        failures = []
        for i, (mask, boxes) in enumerate(random_circuits(20)):
            image = np.dstack([mask] * 3)
            want = _fixed_netlist_ref(ref, image, mask, boxes)
            got = _fixed_netlist_repo(image, mask, boxes)
            if want != got:
                failures.append(
                    f"--- random-{1000 + i} ---\nreference:\n{want}\nrepo:\n{got}"
                )
        assert not failures, (
            f"{len(failures)}/20 randomized circuits diverge after fix_netlist:\n"
            + "\n".join(failures[:6])
        )
