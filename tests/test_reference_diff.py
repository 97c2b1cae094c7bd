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

from tests.ref_loader import REF_ROOT, bbox_to_ref_dict, load_reference_analyzer

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


def _reclassify_fingerprint_ref(ref, image, boxes):
    # Mutates in place; the fingerprint reads the mutated dicts.
    dicts = [bbox_to_ref_dict(b) for b in boxes]
    ref.reclassify_terminals_based_on_connectivity(image, dicts)
    return [
        (
            d["persistent_uid"],
            d["class"],
            bool(d.get("was_reclassified_from_terminal", False)),
            d.get("original_yolo_class_if_reclassified"),
        )
        for d in dicts
    ]


def _reclassify_fingerprint_repo(image, boxes):
    from circuitvision_tpu.core.config import TopologyConfig
    from circuitvision_tpu.topology.reclassify import reclassify_terminals

    out = reclassify_terminals(image, list(boxes), TopologyConfig())
    return [
        (
            b.persistent_uid,
            b.class_name,
            bool(b.was_reclassified_from_terminal),
            b.original_class_if_reclassified,
        )
        for b in out
    ]


class TestReclassifyMatchesReference:
    """reclassify_terminals_based_on_connectivity vs the reference's own
    code (src/circuit_analyzer.py:2217-2311) on identical (image,
    detections): per-uid final class, the was-reclassified flag, and the
    stored original class must all match. Exercises the classical
    adaptive-threshold mask (incl. the RGB→BGR→RGB2GRAY channel-swap
    quirk, :2234-2238), box subtraction, the prelim 1e-4 contour
    threshold, and the 10 px no-broad-phase touch walk."""

    def test_eval_circuits(self, ref):
        from circuitvision_tpu.eval.synth import make_all_circuits

        failures = []
        for c in make_all_circuits():
            want = _reclassify_fingerprint_ref(ref, c.image, c.boxes)
            got = _reclassify_fingerprint_repo(c.image, c.boxes)
            if want != got:
                failures.append(f"--- {c.name} ---\nref:  {want}\nrepo: {got}")
        assert not failures, "\n".join(failures)

    def test_randomized_scenes(self, ref):
        from circuitvision_tpu.eval.randomized import random_reclassify_scene

        n = 25
        failures = []
        any_reclassified = False
        for i in range(n):
            image, boxes = random_reclassify_scene(4000 + i)
            want = _reclassify_fingerprint_ref(ref, image, boxes)
            got = _reclassify_fingerprint_repo(image, boxes)
            any_reclassified |= any(f[2] for f in want)
            if want != got:
                failures.append(f"--- scene-{4000 + i} ---\nref:  {want}\nrepo: {got}")
        assert not failures, (
            f"{len(failures)}/{n} reclassify scenes diverge:\n"
            + "\n".join(failures[:6])
        )
        # The scenes must actually exercise the reclassification branch.
        assert any_reclassified

    def test_channel_swap_quirk(self, ref):
        """A light-cyan wire (RGB 148,255,245) reads gray≈222 under normal
        RGB luma (stroke detected → terminal reclassified) but gray≈240
        under the reference's swapped-channel luma (NOT detected → kept).
        Both implementations must agree on the quirk outcome."""
        import numpy as np

        from circuitvision_tpu.core.types import BBox

        # Two separate single-wire scenes: any second contour would
        # "connect" through the reference's is-point-near-bbox quirk
        # (per-axis distance, :2287→:811-846), masking the luma effect.
        def scene(color):
            img = np.full((200, 300, 3), 255, np.uint8)
            img[100:103, 20:280] = color
            boxes = [BBox(class_name="terminal", confidence=0.9,
                          xmin=140, ymin=86, xmax=170, ymax=116)]
            return img, boxes

        img_cyan, boxes_cyan = scene((148, 255, 245))
        want = _reclassify_fingerprint_ref(ref, img_cyan, boxes_cyan)
        got = _reclassify_fingerprint_repo(img_cyan, boxes_cyan)
        assert want == got, f"ref {want} != repo {got}"
        # Swapped luma ≈240 > local threshold → wire invisible → kept.
        assert want[0][1] == "terminal" and want[0][2] is False

        img_black, boxes_black = scene((0, 0, 0))
        want = _reclassify_fingerprint_ref(ref, img_black, boxes_black)
        got = _reclassify_fingerprint_repo(img_black, boxes_black)
        assert want == got, f"ref {want} != repo {got}"
        # Control: a visible wire yields two stubs → reclassified.
        assert want[0][1] == "voltage.dc" and want[0][2] is True


class TestHostUtilsMatchReference:
    """Pure host utils vs the reference's own src/utils.py functions on
    fuzzed inputs."""

    def _random_dict_boxes(self, rng, n):
        from circuitvision_tpu.core.types import BBox

        boxes = []
        for _ in range(n):
            x0 = int(rng.integers(0, 500))
            y0 = int(rng.integers(0, 400))
            b = BBox(
                class_name="resistor",
                # Quantized confidences force ties → pins sort stability.
                confidence=round(float(rng.choice([0.3, 0.5, 0.7, 0.9])), 2),
                xmin=x0, ymin=y0,
                xmax=x0 + int(rng.integers(10, 120)),
                ymax=y0 + int(rng.integers(10, 120)),
            )
            boxes.append(b)
        return boxes

    def test_nms_matches(self, ref):
        import numpy as np

        from src.utils import (
            non_max_suppression_by_area,
            non_max_suppression_by_confidence,
        )

        from circuitvision_tpu.core.geometry import nms_by_area, nms_by_confidence

        rng = np.random.default_rng(7)
        for trial in range(30):
            boxes = self._random_dict_boxes(rng, int(rng.integers(0, 40)))
            dicts = [bbox_to_ref_dict(b) for b in boxes]
            for thr in (0.3, 0.5, 0.6):
                want = [d["persistent_uid"]
                        for d in non_max_suppression_by_confidence(list(dicts), thr)]
                got = [b.persistent_uid for b in nms_by_confidence(boxes, thr)]
                assert want == got, f"conf-NMS trial {trial} thr {thr}"
                want = [d["persistent_uid"]
                        for d in non_max_suppression_by_area(list(dicts), thr)]
                got = [b.persistent_uid for b in nms_by_area(boxes, thr)]
                assert want == got, f"area-NMS trial {trial} thr {thr}"

    def test_nms_matches_on_noisy_detector_output(self, ref):
        """The bench regime — ~100 jittered low-confidence duplicates of a
        few GT boxes — exercises the vectorized (n ≥ 24) NMS path, which
        must stay sequence-identical to the reference loop."""
        import numpy as np

        from src.utils import non_max_suppression_by_confidence

        from circuitvision_tpu.core.types import BBox

        from circuitvision_tpu.core.geometry import nms_by_confidence

        rng = np.random.default_rng(13)
        for trial in range(6):
            base = self._random_dict_boxes(rng, 7)
            boxes = list(base)
            for _ in range(100):
                src = base[int(rng.integers(0, len(base)))]
                dx, dy = int(rng.integers(-6, 7)), int(rng.integers(-6, 7))
                boxes.append(BBox(
                    class_name=src.class_name,
                    confidence=round(float(rng.uniform(0.05, 0.4)), 3),
                    xmin=src.xmin + dx, ymin=src.ymin + dy,
                    xmax=src.xmax + dx, ymax=src.ymax + dy,
                ))
            dicts = [bbox_to_ref_dict(b) for b in boxes]
            for thr in (0.5, 0.6):
                want = [d["persistent_uid"]
                        for d in non_max_suppression_by_confidence(list(dicts), thr)]
                got = [b.persistent_uid for b in nms_by_confidence(boxes, thr)]
                assert want == got, f"noisy NMS trial {trial} thr {thr}"

    def test_iou_matches(self, ref):
        import numpy as np

        from src.utils import calculate_iou

        from circuitvision_tpu.core.geometry import iou

        rng = np.random.default_rng(11)
        boxes = self._random_dict_boxes(rng, 40)
        for a in boxes[:20]:
            for b in boxes[20:]:
                want = calculate_iou(bbox_to_ref_dict(a), bbox_to_ref_dict(b))
                got = iou(a, b)
                assert abs(want - got) < 1e-12, (a, b, want, got)

    AC_CORPUS = [
        "AC 5V 1kHz 0deg", "AC 10.5mA 50.2Hz -45.5deg", "AC 5V 0deg",
        "AC 4.7 230 90", "ac 12v 60hz 30deg", "4:-45", "1:45", " 3.3 : 90 ",
        "0.5:-180", "AC 5V", "AC", "5V", "12:", ":45", "4:-45:7", "AC5V0deg",
        "AC -3.2V 10Hz +15deg", "+2.5:-0.5", "nonsense", "", "AC  7  8  9",
        "ac 1.5kV 2MHz 0.25deg", "10", "j45", "AC 0 0 0",
    ]

    def test_ac_string_parser_matches(self, ref):
        from src.utils import _parse_vlm_ac_string

        from circuitvision_tpu.netlist.values import parse_ac_string

        for s in self.AC_CORPUS:
            want = _parse_vlm_ac_string(s)
            got = parse_ac_string(s)
            assert want == got, f"{s!r}: ref {want} != repo {got}"
        assert _parse_vlm_ac_string(None) == parse_ac_string(None)
        assert _parse_vlm_ac_string(4.2) == parse_ac_string(4.2)

    # Inputs the reference parser handles correctly. Excluded as dead
    # code in the reference (documented deviations, PARITY.md): metric
    # suffixes ("4.7k" — startswith() instead of endswith()), complex
    # values ("5+3j" — complex() is fed "5"+"+3" or "5"+"+j3", both
    # invalid; "j5" even escapes with IndexError), and "Ω" (str.lower()
    # maps Ω→ω, so the unit table never matches).
    VALUE_CORPUS_SHARED = [
        "10", "4.7", "0.001", "  42  ", "5e-5", "5E-5", "3.3e3",
        "5x10^-5", "5 x 10^-5", "5 * 10^-5", "2.2x10^3",
        "100ohm", "3.3v", "2a", "1.5henry", "0.1farad",
    ]

    def test_value_parser_matches_on_shared_domain(self, ref):
        from src.utils import parse_component_value as ref_parse

        from circuitvision_tpu.netlist.values import parse_component_value

        for s in self.VALUE_CORPUS_SHARED:
            want = ref_parse(s)
            got = parse_component_value(s)
            assert want == got, f"{s!r}: ref {want} != repo {got}"

    def test_value_parser_documented_deviation(self, ref):
        """Metric suffixes: the reference's prefix walk uses startswith on
        a string that still begins with digits, so '4.7k' raises
        ValueError (src/utils.py:538-544 dead code); the repo parser
        handles the suffix (documented deviation, PARITY.md)."""
        import pytest as _pytest

        from src.utils import parse_component_value as ref_parse

        from circuitvision_tpu.netlist.values import parse_component_value

        for s in ("4.7k", "10u", "1m", "2.2n"):
            with _pytest.raises(ValueError):
                ref_parse(s)
        assert parse_component_value("4.7k") == _pytest.approx(4700.0)
        assert parse_component_value("10u") == _pytest.approx(1e-5)

        # Complex values: every reference complex pattern feeds complex()
        # an invalid string ("5"+"+j3" or "5"+"+3"), and the one-group
        # pattern ("j5") reads group(2) → IndexError escapes.
        for s in ("5+j3", "5+3j", "7.5+j0.5"):
            with _pytest.raises(ValueError):
                ref_parse(s)
        with _pytest.raises(IndexError):
            ref_parse("j5")
        assert parse_component_value("5+j3") == 5 + 3j
        assert parse_component_value("5-3j") == 5 - 3j
        assert parse_component_value("j5") == 5j

        # "Ω": the reference lowercases Ω→ω before its unit table lookup.
        with _pytest.raises(ValueError):
            ref_parse("220Ω")
        assert parse_component_value("220Ω") == _pytest.approx(220.0)


class TestVLMResponseParserMatchesReference:
    """The stage-2 VLM response parser vs the reference's own
    gemini_labels_openrouter parse block (src/utils.py:249-282), driven
    through the REAL reference function with a mocked OpenAI client
    returning each corpus string as the completion content. Pins the
    char-set strip quirks (str.strip takes a character SET; the second
    strip's source is '```json\\\\n' — a literal backslash, not a
    newline), the null→None ast path, and the json fallback."""

    CORPUS = [
        "[{'id': '1', 'class': 'resistor', 'value': '1k'}]",
        "```python\n[{'id': '1', 'class': 'resistor', 'value': None}]\n```",
        '```json\n[{"id": "1", "class": "gnd", "value": null}]\n```',
        '[{"id": "1", "class": "voltage.dc", "value": null}]',
        "```\n[{'id': '2', 'class': 'capacitor', 'value': '10u'}]\n```",
        "[{'id': '3', 'class': 'diode', 'value': null}]",  # null in ast path
        "  [{'id': '4', 'class': 'inductor', 'value': '1m'}] \n",
        "[]",
        "[{'id': '5', 'value': 'nothing'}, {'id': '6', 'value': 'null'}]",
    ]
    CORPUS_ERRORS = [
        "not a list at all",
        "```json\n{broken\n```",
        "",
        "``````",  # strips to empty → both parsers fail
    ]

    def _ref_parse(self, ref, content: str):
        """Run the REAL gemini_labels_openrouter with a canned client."""
        import os
        import sys
        import types

        import numpy as np

        openai_stub = sys.modules["openai"]

        class _Completions:
            def create(self, **kw):
                msg = types.SimpleNamespace(content=content)
                choice = types.SimpleNamespace(message=msg)
                return types.SimpleNamespace(choices=[choice])

        class _OpenAI:
            def __init__(self, *a, **kw):
                self.chat = types.SimpleNamespace(completions=_Completions())

        class _APIError(Exception):
            pass

        openai_stub.OpenAI = _OpenAI
        openai_stub.APIError = _APIError
        from src.utils import gemini_labels_openrouter

        img = np.zeros((4, 4, 3), np.uint8)
        # Scope the key: leaking it into the process would flip
        # enrich.client.default_client() from None to a real HTTP client
        # for every later test in this pytest process.
        had = "OPENROUTER_API_KEY" in os.environ
        prev = os.environ.get("OPENROUTER_API_KEY")
        os.environ["OPENROUTER_API_KEY"] = "test-key"
        try:
            return gemini_labels_openrouter(img)
        finally:
            if had:
                os.environ["OPENROUTER_API_KEY"] = prev
            else:
                del os.environ["OPENROUTER_API_KEY"]

    def test_corpus_matches(self, ref):
        from circuitvision_tpu.enrich.client import parse_vlm_list

        for s in self.CORPUS:
            want = self._ref_parse(ref, s)
            got = parse_vlm_list(s)
            assert want == got, f"{s!r}: ref {want!r} != repo {got!r}"

    def test_error_cases_raise_in_both(self, ref):
        import pytest as _pytest

        from circuitvision_tpu.enrich.client import parse_vlm_list

        for s in self.CORPUS_ERRORS:
            with _pytest.raises(ValueError):
                self._ref_parse(ref, s)
            with _pytest.raises(ValueError):
                parse_vlm_list(s)


class TestEnumImageMatchesReference:
    def test_enum_image_pixels_and_ids(self, ref):
        """The enumerated VLM-input image vs the reference's own
        enumerate_components (src/circuit_analyzer.py:479-785):
        BYTE-IDENTICAL pixels (same Hershey font geometry, same white
        halo, and the reference's literal (0,0,255) text color — 'red in
        BGR' applied to the RGB pipeline image, i.e. blue digits) and the
        same per-uid visual ids."""
        import contextlib
        import copy as _copy
        import io as _io

        import numpy as np

        from circuitvision_tpu.eval.synth import make_all_circuits
        from circuitvision_tpu.topology.enumerate_components import (
            enumerate_components,
        )

        for c in make_all_circuits():
            dicts = [bbox_to_ref_dict(b) for b in c.boxes]
            with contextlib.redirect_stdout(_io.StringIO()):
                ref_img, ref_boxes = ref.enumerate_components(
                    c.image, _copy.deepcopy(dicts)
                )
                our_img, our_boxes = enumerate_components(c.image, list(c.boxes))
            np.testing.assert_array_equal(ref_img, our_img, err_msg=c.name)
            assert [(d["persistent_uid"], d.get("id")) for d in ref_boxes] == [
                (b.persistent_uid, b.visual_id) for b in our_boxes
            ], c.name


class TestAnnotatedImageMatchesReference:
    def test_annotated_image_pixels(self, ref):
        """create_annotated_image vs the reference's own function
        (src/utils.py:363-408): byte-identical pixels (green boxes, white
        label strips, red Hershey labels) across the eval set."""
        import numpy as np

        from src.utils import create_annotated_image as ref_annot

        from circuitvision_tpu.core.viz import create_annotated_image
        from circuitvision_tpu.eval.synth import make_all_circuits

        for c in make_all_circuits():
            dicts = [bbox_to_ref_dict(b) for b in c.boxes]
            np.testing.assert_array_equal(
                ref_annot(c.image, dicts),
                create_annotated_image(c.image, c.boxes),
                err_msg=c.name,
            )

    def test_component_stats_match(self, ref):
        """calculate_component_stats vs the reference's
        (src/utils.py:410-430)."""
        from src.utils import calculate_component_stats as ref_stats

        from circuitvision_tpu.eval.synth import make_all_circuits
        from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU

        for c in make_all_circuits():
            dicts = [bbox_to_ref_dict(b) for b in c.boxes]
            want = ref_stats(dicts)
            got = CircuitAnalyzerTPU._component_stats(c.boxes)
            assert want == got, (c.name, want, got)


class TestNodeStageArtifactsMatchReference:
    def test_debug_images_byte_equal(self, ref):
        """The node stage's debug artifacts vs the reference's own
        get_node_connections outputs (src/circuit_analyzer.py:1286-1605)
        on identical (mask, detections): the emptied mask, the colored
        contour viz (drawContours polygons + red ids), the final node viz
        (green contours + ids on the resized emptied mask), and the
        connection-points viz (cyan circles at the FIRST matching
        CHAIN_APPROX_SIMPLE vertex per touching pair) must all be
        BYTE-IDENTICAL. Requires the tracer's vertex sequences to equal
        cv2's exactly (tests/test_native_contours.py)."""
        import contextlib
        import copy as _copy
        import io as _io

        import numpy as np

        from circuitvision_tpu.core.config import TopologyConfig
        from circuitvision_tpu.eval.synth import make_circuits
        from circuitvision_tpu.topology.nodes import extract_nodes

        for c in make_circuits():
            dicts = [bbox_to_ref_dict(b) for b in c.boxes]
            with contextlib.redirect_stdout(_io.StringIO()):
                (_nodes, r_emptied, _r_enh, r_cviz, r_nviz, r_pviz
                 ) = ref.get_node_connections(
                    None, c.wire_mask.copy(), _copy.deepcopy(dicts))
            ex = extract_nodes(c.wire_mask, list(c.boxes), TopologyConfig())
            np.testing.assert_array_equal(
                r_emptied, ex.emptied_mask, err_msg=f"{c.name} emptied")
            np.testing.assert_array_equal(
                r_cviz, ex.contour_viz, err_msg=f"{c.name} contour_viz")
            np.testing.assert_array_equal(
                r_nviz, ex.node_viz, err_msg=f"{c.name} node_viz")
            np.testing.assert_array_equal(
                r_pviz, ex.connection_viz, err_msg=f"{c.name} connection_viz")


# ---------------------------------------------------------------------------
# SPICE deck preprocessing (src/spice_simulator.py:9-219)
# ---------------------------------------------------------------------------


_REF_SIM_CACHE: dict = {}


def _load_reference_sim():
    """Import the reference spice_simulator with a recording PySpice stub.

    The reference's DC/AC entry points build the full deck text and hand
    it to PySpice's SpiceParser (src/spice_simulator.py:62, 206); the
    stub captures that source string and aborts, so the functions'
    PREPROCESSING (reactance commenting, AC source/C/L rewriting,
    stringification) runs for real while the unavailable native solver
    never does. Returns (module, captured) where captured["deck"] holds
    the last deck handed to the parser.

    Singleton: the reference module binds SpiceParser at import time
    (`from PySpice.Spice.Parser import SpiceParser`), so a second stub
    installation would record into a dict the cached module no longer
    writes to."""
    if "sim" in _REF_SIM_CACHE:
        return _REF_SIM_CACHE["sim"]
    import contextlib
    import importlib
    import sys
    import types

    from tests.ref_loader import REF_ROOT, install_stubs

    install_stubs()
    captured: dict[str, str] = {}

    class _Abort(Exception):
        pass

    class _RecordingParser:
        def __init__(self, source=None, **kw):
            captured["deck"] = source
            raise _Abort("deck captured; solver unavailable")

    pyspice = types.ModuleType("PySpice")
    spice = types.ModuleType("PySpice.Spice")
    parser_mod = types.ModuleType("PySpice.Spice.Parser")
    parser_mod.SpiceParser = _RecordingParser
    unit_mod = types.ModuleType("PySpice.Unit")
    unit_mod.u_Hz = lambda x: x
    pyspice.Spice = spice
    spice.Parser = parser_mod
    pyspice.Unit = unit_mod
    sys.modules["PySpice"] = pyspice
    sys.modules["PySpice.Spice"] = spice
    sys.modules["PySpice.Spice.Parser"] = parser_mod
    sys.modules["PySpice.Unit"] = unit_mod

    # st.expander is used as a context manager around the deck dump
    # BEFORE the parser runs; the generic no-op stub would raise there.
    import streamlit as st

    st.expander = lambda *a, **kw: contextlib.nullcontext()

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    mod = importlib.import_module("src.spice_simulator")
    _REF_SIM_CACHE["sim"] = (mod, captured)
    return mod, captured


def _quiet_logger():
    import logging

    lg = logging.getLogger("ref_sim_diff")
    lg.handlers = []
    lg.propagate = False
    lg.addHandler(logging.NullHandler())
    return lg


_AC_LINE_CORPUS = [
    # (class, type, num, n1, n2, value) — every rewrite rule + failure arm
    ("voltage.ac", "V", 1, 1, 0, "AC 5V 1kHz 0deg"),
    ("voltage.ac", "V", 2, 2, 0, "AC 5V 0deg"),
    ("voltage.dc", "V", 3, 1, 2, "4:-45"),
    ("voltage.dc", "V", 4, 1, 0, "ac garbage here"),  # AC-ish → "0 AC 1 0"
    ("current.dc", "I", 1, 2, 0, "weird:stuff"),  # ':' → "0 AC 1 0"
    ("voltage.dc", "V", 5, 1, 0, "5"),  # plain value unchanged
    ("voltage.dc", "V", 6, 1, 0, None),  # None → "None" token
    ("capacitor", "C", 1, 1, 2, "-j50"),  # → 1/(2πf·50)
    ("capacitor", "C", 2, 1, 2, "-j"),  # empty reactance → Xc=1.0
    ("capacitor", "C", 3, 1, 2, "-jxyz"),  # ValueError → unchanged
    ("capacitor", "C", 4, 1, 2, "-j0"),  # Xc<=0 → unchanged
    ("capacitor", "C", 5, 1, 2, "10u"),  # unchanged
    ("inductor", "L", 1, 2, 0, "j20"),  # → 20/(2πf)
    ("inductor", "L", 2, 2, 0, "20j"),  # Xlj form
    ("inductor", "L", 3, 2, 0, "j"),  # → Xl=1.0
    ("inductor", "L", 4, 2, 0, "jxy"),  # ValueError → unchanged
    ("inductor", "L", 5, 2, 0, "-5j"),  # Xl<0 → unchanged
    ("gnd", "0", 1, 0, 0, None),  # skipped entirely
    ("resistor", "R", 1, 1, 2, "100"),
]


class TestSimPreprocessMatchesReference:
    def test_dc_deck_text(self, ref):
        """perform_dc_spice_analysis's deck (reactance commenting +
        .title/.end wrap, src/spice_simulator.py:16-54) vs
        sim.engine.perform_dc_analysis's DCResult.deck — byte equal."""
        mod, captured = _load_reference_sim()
        from circuitvision_tpu.sim.engine import perform_dc_analysis

        netlists = [
            "V1 1 0 5\nR1 1 2 100\nR2 2 0 100",
            # C/L reactance lines get commented out, others kept
            "V1 1 0 5\nC1 1 2 -j50\nL1 2 0 j20\nC2 2 0 10u\nl2 2 0 -j3",
            # leading whitespace preserved, empty lines preserved
            "V1 1 0 5\n\n   R1 1 2 100\n  c9 1 0 j1 extra",
            # short C line (len<4) is NOT problematic
            "C1 1 2\nL1 2 0 j5",
        ]
        for text in netlists:
            captured.clear()
            mod.perform_dc_spice_analysis(text, _quiet_logger())
            assert captured.get("deck"), f"reference did not parse: {text!r}"
            got = perform_dc_analysis(text).deck
            assert got == captured["deck"], (
                f"DC deck diverges for {text!r}:\n"
                f"reference:\n{captured['deck']}\nrepo:\n{got}"
            )

    def test_ac_body_text(self, ref):
        """perform_ac_spice_analysis's rewritten netlist body (source
        phasor rewrite, C/L reactance→value conversion, stringify,
        src/spice_simulator.py:126-199) vs perform_ac_analysis — byte
        equal, including float repr of converted C/L values."""
        mod, captured = _load_reference_sim()
        from circuitvision_tpu.core.types import NetlistLine
        from circuitvision_tpu.sim.engine import perform_ac_analysis

        title = ".title detected_circuit_ac\n"
        for freq in (1000.0, 437.5, 60.0):
            dicts = [
                {
                    "class": cls,
                    "component_type": ct,
                    "component_num": num,
                    "node_1": n1,
                    "node_2": n2,
                    "value": val,
                }
                for cls, ct, num, n1, n2, val in _AC_LINE_CORPUS
            ]
            captured.clear()
            mod.perform_ac_spice_analysis(
                {"netlist": dicts}, ref, freq, _quiet_logger()
            )
            assert captured.get("deck"), "reference did not reach the parser"
            ref_body = captured["deck"].split("\n* Equivalent SPICE command")[0]
            assert ref_body.startswith(title)
            ref_body = ref_body[len(title):]

            lines = [
                NetlistLine(
                    component_type=ct, component_num=num, node_1=n1,
                    node_2=n2, value=val, class_name=cls,
                )
                for cls, ct, num, n1, n2, val in _AC_LINE_CORPUS
            ]
            deck = perform_ac_analysis(lines, freq).deck
            got_body = deck.split("\n* .ac lin 1")[0]
            assert got_body.startswith(title)
            got_body = got_body[len(title):]
            assert got_body == ref_body, (
                f"AC body diverges at {freq} Hz:\n"
                f"reference:\n{ref_body}\nrepo:\n{got_body}"
            )


# ---------------------------------------------------------------------------
# Upload ingest / EXIF auto-rotation (src/analysis_pipeline.py:12-95)
# ---------------------------------------------------------------------------


import io as _io_mod


class _Upload(_io_mod.BytesIO):
    """Minimal streamlit UploadedFile stand-in (read/seek + name/type)."""

    def __init__(self, data: bytes, name: str, mime: str):
        super().__init__(data)
        self.name = name
        self.type = mime


def _jpeg_with_orientation(arr: "np.ndarray", orientation: int) -> bytes:
    """Encode arr as JPEG carrying EXIF orientation tag 0x0112."""
    import io as _io

    from PIL import Image

    img = Image.fromarray(arr)
    exif = img.getexif()
    if orientation:
        exif[0x0112] = orientation
    buf = _io.BytesIO()
    img.save(buf, format="JPEG", quality=95, exif=exif.tobytes())
    return buf.getvalue()


class TestUploadIngestMatchesReference:
    def test_decoded_rotated_image(self, ref, tmp_path):
        """process_new_upload's decoded + EXIF-auto-rotated
        `original_image` (src/analysis_pipeline.py:18-78) vs
        io.image_io.decode_image — pixel-identical for every EXIF
        orientation 1..8, no-EXIF JPEG, and PNG. (cv2 and PIL decode
        identically in this environment — both libjpeg-turbo — so the
        reference's cv2-decode/PIL-rotate split collapses to one array.)"""
        import importlib
        import logging
        import sys
        import types

        import numpy as np

        from circuitvision_tpu.io.image_io import decode_image
        from tests.ref_loader import REF_ROOT, install_stubs

        install_stubs()
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        import streamlit as st

        pipeline = importlib.import_module("src.analysis_pipeline")

        rng = np.random.default_rng(7)
        arr = np.clip(
            np.cumsum(rng.normal(0, 3, (96, 128, 3)), axis=1) + 128, 0, 255
        ).astype(np.uint8)

        cases = {}
        for o in range(1, 9):
            cases[f"jpeg_o{o}"] = (_jpeg_with_orientation(arr, o), "image/jpeg")
        cases["jpeg_noexif"] = (_jpeg_with_orientation(arr, 0), "image/jpeg")
        from PIL import Image

        pbuf = _io_mod.BytesIO()
        Image.fromarray(arr).save(pbuf, format="PNG")
        cases["png"] = (pbuf.getvalue(), "image/png")

        lg = logging.getLogger("ref_upload_diff")
        lg.handlers = [logging.NullHandler()]
        lg.propagate = False
        for name, (data, mime) in cases.items():
            st.session_state = types.SimpleNamespace()
            up = _Upload(data, f"{name}.{mime.split('/')[-1]}", mime)
            updir = tmp_path / name
            pipeline.process_new_upload(up, str(updir), lg)
            want = st.session_state.active_results["original_image"]
            got = decode_image(data)
            assert want.shape == got.shape, (
                f"{name}: ref {want.shape} vs repo {got.shape}"
            )
            np.testing.assert_array_equal(want, got, err_msg=name)


# ---------------------------------------------------------------------------
# format_exif_data (src/utils.py:558-596) and the direct-Gemini labels path
# (gemini_labels, src/utils.py:125-182)
# ---------------------------------------------------------------------------


class TestFormatExifDataMatchesReference:
    def test_display_dicts_equal(self, ref, tmp_path):
        """Orientation/Software display dicts — including the reference's
        printable-cleaning, [Empty string] fallback, bytes note, and its
        legacy-_getexif None-for-PNG behavior — must be equal."""
        import sys

        from PIL import Image

        from circuitvision_tpu.io.image_io import format_exif_data

        sys.path.insert(0, REF_ROOT) if REF_ROOT not in sys.path else None
        from src.utils import format_exif_data as ref_format

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 255, (32, 32, 3), np.uint8)

        def jpeg(path, software=None, orientation=None):
            img = Image.fromarray(arr)
            exif = img.getexif()
            if software is not None:
                exif[0x0131] = software
            if orientation is not None:
                exif[0x0112] = orientation
            img.save(path, format="JPEG", exif=exif.tobytes())
            return str(path)

        cases = {
            "plain": jpeg(tmp_path / "a.jpg"),
            "orient": jpeg(tmp_path / "b.jpg", orientation=6),
            "software": jpeg(tmp_path / "c.jpg", software="CircuitCam 1.0"),
            "nonprintable": jpeg(
                tmp_path / "d.jpg", software="Cam\x00\x07 2", orientation=3
            ),
            "unprintable_only": jpeg(tmp_path / "e.jpg", software="\x00\x01"),
            "missing": str(tmp_path / "nope.jpg"),
        }
        png = tmp_path / "f.png"
        Image.fromarray(arr).save(png, format="PNG")
        cases["png"] = str(png)
        for name, path in cases.items():
            assert format_exif_data(path) == ref_format(path), name



class TestGeminiLabelsMatchesReference:
    """Drives the REAL reference gemini_labels with a recording genai stub
    and diffs both the request composition (model, contents, config) and
    the parse behavior against GeminiVLMClient.get_labels."""

    class _Recorder:
        def __init__(self):
            self.calls = []
            self.response_text = ""
            rec = self

            class _Models:
                def generate_content(self, *, model, contents, config):
                    rec.calls.append(
                        {"model": model, "contents": contents, "config": config}
                    )
                    import types as _t

                    return _t.SimpleNamespace(text=rec.response_text)

            self.models = _Models()

    RESPONSES = [
        # python-literal list (json fails → ast fallback in the reference)
        "```python\n[{'id': '1', 'class': 'resistor', 'value': '10k'}]\n```",
        # fenced JSON with null (json-first path)
        '```json\n[{"id": "1", "class": "diode", "value": null}]\n```',
        # bare JSON
        '[{"id": "2", "class": "capacitor", "value": "10u"}]',
        # garbage (both must raise)
        "I cannot help with that.",
    ]

    def _run_reference(self, ref, image, text):
        import os
        import sys

        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        import src.utils as ref_utils

        rec = self._Recorder()
        old_client = ref_utils.genai.Client
        old_cfg = getattr(ref_utils.types, "GenerateContentConfig", None)
        ref_utils.genai.Client = lambda api_key=None: rec
        ref_utils.types.GenerateContentConfig = lambda **kw: kw
        os.environ["GEMINI_API_KEY"] = "test-key"
        rec.response_text = text
        try:
            out = ref_utils.gemini_labels(image)
            err = None
        except Exception as e:
            out, err = None, type(e).__name__
        finally:
            ref_utils.genai.Client = old_client
            if old_cfg is not None:
                ref_utils.types.GenerateContentConfig = old_cfg
            os.environ.pop("GEMINI_API_KEY", None)
        return rec.calls[-1], out, err

    def _run_repo(self, image, text):
        import os

        from circuitvision_tpu.enrich.client import GeminiVLMClient

        os.environ["GEMINI_API_KEY"] = "test-key"
        try:
            client = GeminiVLMClient()
        finally:
            os.environ.pop("GEMINI_API_KEY", None)
        rec = self._Recorder()
        rec.response_text = text
        client.client = rec
        try:
            out = client.get_labels(image)
            err = None
        except Exception as e:
            out, err = None, type(e).__name__
        return rec.calls[-1], out, err

    def test_requests_and_parses_equal(self, ref):
        rng = np.random.default_rng(11)
        image = rng.integers(0, 255, (24, 40, 3), np.uint8)
        for text in self.RESPONSES:
            want_call, want_out, want_err = self._run_reference(ref, image, text)
            got_call, got_out, got_err = self._run_repo(image, text)
            assert got_call["model"] == want_call["model"]
            assert got_call["config"] == want_call["config"]
            assert len(got_call["contents"]) == len(want_call["contents"]) == 3
            np.testing.assert_array_equal(
                np.asarray(got_call["contents"][0]),
                np.asarray(want_call["contents"][0]),
            )
            assert got_call["contents"][1] == want_call["contents"][1]
            assert got_call["contents"][2] == want_call["contents"][2]
            assert (got_out, got_err is None) == (want_out, want_err is None), (
                f"parse diverges for {text!r}: repo ({got_out!r}, {got_err}) "
                f"vs reference ({want_out!r}, {want_err})"
            )
