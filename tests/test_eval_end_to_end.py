"""North-star fidelity gate: the eval harness, driven end-to-end from
IMAGES through the classical pipeline with oracle detections, must score
netlist exact-match = 100% on the synthetic eval set (VERDICT r1 #8 /
BASELINE.md fidelity metric).
"""
import argparse
import os

import numpy as np
import pytest

from circuitvision_tpu.eval.synth import make_all_circuits, write_eval_set

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL_DATA = os.path.join(REPO, "eval_data")


def _args(data):
    return argparse.Namespace(
        data=data,
        yolo_checkpoint=None,
        sam2_checkpoint=None,
        scale="n",
        det_size=64,
        limit=0,
        oracle_boxes=True,
        classical_mask=True,
        vlm=None,
    )


@pytest.fixture(scope="module")
def eval_dir(tmp_path_factory):
    """Use the checked-in eval_data/ when present (validates the shipped
    set); otherwise render a fresh one."""
    if os.path.isdir(os.path.join(EVAL_DATA, "images")):
        return EVAL_DATA
    root = str(tmp_path_factory.mktemp("eval_data"))
    write_eval_set(root)
    return root


class TestEvalEndToEnd:
    def test_netlist_exact_match_100(self, eval_dir):
        import sys

        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from eval_pipeline import run_eval

        report = run_eval(_args(eval_dir))
        assert report["images"] == 63
        assert report["netlist_exact_match"] == 1.0
        by_cat = report["netlist_exact_match_by_category"]
        assert set(by_cat) == {
            "basic", "semiconductors", "threshold-edge", "multi-cluster",
            "exif-rotated", "degenerate", "randomized-glyph", "nested-loop",
            "border-wire", "extreme-aspect", "multi-terminal", "hand-drawn",
        }
        for cat, stats in by_cat.items():
            assert stats["match"] == 1.0, (cat, stats)
        # Classical mask vs GT wire raster: the glyph/value/annotation ink
        # (inside boxes, subtracted before topology) depresses raw mask
        # IoU vs the wires-only GT — the netlist gate above is the
        # fidelity metric; these floors catch gross mask regressions.
        assert report["segmentation"]["pixel_accuracy"] > 0.97
        assert report["segmentation"]["mean_iou"] > 0.45

    def test_checked_in_set_matches_renderer(self, eval_dir):
        """The shipped eval_data/ must stay in sync with eval/synth.py."""
        if eval_dir != EVAL_DATA:
            pytest.skip("no checked-in eval_data/")
        from PIL import Image

        from circuitvision_tpu.io.image_io import load_image

        for c in make_all_circuits():
            # load_image applies EXIF rotation — the stored image must
            # come back upright for every circuit, including exif_*.
            img = load_image(os.path.join(EVAL_DATA, "images", f"{c.name}.png"))
            np.testing.assert_array_equal(img, c.image)
            with open(os.path.join(EVAL_DATA, "netlists", f"{c.name}.cir")) as f:
                assert f.read() == c.netlist_text
