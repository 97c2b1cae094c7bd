"""Generate circuitvision_tpu/eval/pinned_netlists.json for the hostile
eval categories.

For every circuit in eval/synth.py's hostile set, this script:
  1. runs the FULL repo pipeline (oracle boxes, classical mask, FakeVLM
     directions + labels) to produce the valueless and final netlists;
  2. CROSS-CHECKS the valueless netlist byte-for-byte against the
     reference implementation's own topology chain (get_node_connections
     → generate_netlist_from_nodes → stringify_line) run on the same
     post-crop (mask, boxes) inputs — a pin is only written if the
     reference produces the identical text;
  3. for EXIF circuits, additionally verifies the stored-rotated image
     round-trips to the upright render through io.image_io.load_image.

Usage: python scripts/pin_eval_netlists.py
"""
import contextlib
import copy
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402


def main() -> None:
    from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
    from circuitvision_tpu.enrich.client import FakeVLMClient
    from circuitvision_tpu.eval import synth
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
    from ref_loader import bbox_to_ref_dict, load_reference_analyzer

    ref = load_reference_analyzer()
    analyzer = CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale="n", img_size=64), use_sam2=False
        )
    )

    pins = {}
    circuits = synth.make_hostile_circuits()
    for c in circuits:
        analyzer.bboxes = lambda img, gt=c.boxes: copy.deepcopy(gt)
        analyzer.vlm_client = FakeVLMClient(
            labels=c.vlm_labels, directions=c.directions
        )
        res = analyzer.analyze(c.image)
        res = analyzer.generate_final_netlist(res)

        # reference cross-check on identical post-crop inputs
        dicts = [bbox_to_ref_dict(b) for b in res.bboxes]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            nodes, *_ = ref.get_node_connections(
                None, res.sam_mask.copy(), copy.deepcopy(dicts)
            )
            net = ref.generate_netlist_from_nodes(nodes)
        ref_text = "\n".join(ref.stringify_line(line) for line in net)
        if not res.nodes:
            # No-nodes ladder: the repo emits the components-only fallback
            # netlist; the reference's own fallback call is a TypeError
            # (src/analysis_pipeline.py:314, PARITY.md). Verify the
            # reference also finds nothing, then pin the fallback text.
            assert not nodes and ref_text == "", (c.name, ref_text)
            print(f"{c.name:12s} fallback path (reference: no nodes — its "
                  "own fallback is a TypeError; pin is the repo fallback)")
        elif ref_text != (res.valueless_netlist_text or ""):
            raise SystemExit(
                f"{c.name}: reference mismatch!\nref : {ref_text!r}\n"
                f"repo: {res.valueless_netlist_text!r}"
            )
        pins[c.name] = {
            "valueless": res.valueless_netlist_text or "",
            "final": res.netlist_text or "",
        }
        print(f"{c.name:12s} [{c.category}] pinned "
              f"({len((res.netlist_text or '').splitlines())} lines, ref-verified)")

    # EXIF round-trip check
    import tempfile

    from circuitvision_tpu.io.image_io import load_image

    with tempfile.TemporaryDirectory() as tmp:
        synth.write_eval_set(tmp, [c for c in circuits if c.exif_orientation])
        for c in circuits:
            if not c.exif_orientation:
                continue
            loaded = load_image(os.path.join(tmp, "images", f"{c.name}.png"))
            np.testing.assert_array_equal(loaded, c.image)
            print(f"{c.name:12s} EXIF orientation {c.exif_orientation} "
                  "round-trips upright")

    out = os.path.join(REPO, "circuitvision_tpu", "eval", "pinned_netlists.json")
    with open(out, "w") as f:
        json.dump(pins, f, indent=1)
    print(f"wrote {out} ({len(pins)} pins)")


if __name__ == "__main__":
    main()
