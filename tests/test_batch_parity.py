"""Batched-path parity: analyze_batch() must produce the same netlists
as analyze() per image (VERDICT r1 missing #2).

Ground-truth detections are injected at the detection boundary of BOTH
paths (random-weight YOLO output is noise), so the test pins the full
post-detection chain the batch path must share with the single-image
path: confidence-NMS → cluster crop → segmentation on the CROP →
terminal reclassification → direction enrichment → node extraction →
netlist (+ no-VLM-dir comparison netlist + enumeration). Reference stage
ordering: src/analysis_pipeline.py:97-326.
"""
import copy

import numpy as np
import pytest

from circuitvision_tpu.core.config import (
    DetectorConfig,
    PipelineConfig,
    SAM2Config,
)
from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.enrich.client import FakeVLMClient
from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
from circuitvision_tpu.pipeline.batch import BatchedPipeline

TINY_SAM = SAM2Config(
    resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
    global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
    dtype="float32",
)


def _cpu_mesh(n):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return Mesh(np.asarray(devs[:n]).reshape(n, 1), ("data", "model"))


def _bbox(cls, x0, y0, x1, y1, conf=0.9, **kw):
    return BBox(class_name=cls, confidence=conf, xmin=x0, ymin=y0, xmax=x1, ymax=y1, **kw)


def golden_image():
    """The golden 4-node circuit (test_golden_circuit.build_circuit) drawn
    as an IMAGE: black strokes on white so the classical mask recovers the
    wire raster."""
    H, W, t = 400, 500, 3
    img = np.full((H, W, 3), 255, np.uint8)
    img[60 : 60 + t, 60:440] = 0
    img[60:340, 60 : 60 + t] = 0
    img[60:340, 250 : 250 + t] = 0
    img[60:340, 437 : 437 + t] = 0
    img[337 : 337 + t, 60:440] = 0
    img[337:380, 60 : 60 + t] = 0
    boxes = [
        _bbox("voltage.dc", 45, 150, 78, 250),
        _bbox("resistor", 110, 45, 190, 78),
        _bbox("resistor", 300, 45, 380, 78),
        _bbox("capacitor.unpolarized", 235, 150, 268, 250),
        _bbox("gnd", 45, 355, 78, 385),
        _bbox("junction", 245, 330, 258, 345),
        _bbox("text", 110, 10, 180, 30),
    ]
    return img, boxes


def loop_image():
    """Simple V+R loop (test_pipeline.synthetic_circuit), different size."""
    img = np.full((300, 400, 3), 255, np.uint8)
    w = 3
    img[50 : 50 + w, 50:353] = 0
    img[250 : 250 + w, 50:353] = 0
    img[50:253, 50 : 50 + w] = 0
    img[50:253, 350 : 350 + w] = 0
    boxes = [
        _bbox("voltage.dc", 35, 120, 70, 180),
        _bbox("resistor", 150, 35, 250, 70),
    ]
    return img, boxes


CIRCUITS = [golden_image(), loop_image()]
GT_BY_SHAPE = {img.shape: boxes for img, boxes in CIRCUITS}


def _inject_detections(monkeypatch, analyzer):
    """Patch the detection boundary of both paths with ground truth.

    Fresh copies every call: downstream stages mutate BBoxes in place
    (reclassify, enrichment, visual ids)."""

    def fake_bboxes(img):
        return copy.deepcopy(GT_BY_SHAPE[img.shape])

    monkeypatch.setattr(analyzer, "bboxes", fake_bboxes)

    def fake_detect(self, chunk):
        return [copy.deepcopy(GT_BY_SHAPE[img.shape]) for img in chunk]

    monkeypatch.setattr(BatchedPipeline, "_detect_bboxes", fake_detect)


class TestBatchParity:
    def test_netlists_match_single_image_path(self, monkeypatch):
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                sam2=TINY_SAM,
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(directions={"voltage.dc": ("UP", "SIGN")}),
        )
        _inject_detections(monkeypatch, analyzer)

        images = [img for img, _ in CIRCUITS] * 3  # repeat: exercises chunking
        singles = [analyzer.analyze(img) for img in images]
        # Full 8-device data mesh (conftest forces 8 virtual CPU devices);
        # 6 images into batch 8 exercises chunk padding under sharding.
        batched = analyzer.analyze_batch(images, mesh=_cpu_mesh(8), batch_size=8)

        assert len(batched) == len(singles)
        for s, b in zip(singles, batched):
            assert b.netlist_text == s.netlist_text
            assert b.valueless_netlist_text == s.valueless_netlist_text
            assert (
                b.valueless_netlist_text_no_vlm_dir
                == s.valueless_netlist_text_no_vlm_dir
            )
            assert [x.class_name for x in b.bboxes] == [
                x.class_name for x in s.bboxes
            ]
            np.testing.assert_array_equal(b.sam_mask, s.sam_mask)
            # the crop decision must match too (same image_for_analysis)
            assert b.image_for_analysis.shape == s.image_for_analysis.shape
            assert b.crop_info.window == s.crop_info.window
            # enumeration ran (nodes were found on these circuits)
            assert s.nodes and b.nodes
            assert b.enum_image is not None
            assert [x.visual_id for x in b.enum_bboxes] == [
                x.visual_id for x in s.enum_bboxes
            ]

    def test_golden_netlist_text_via_batch(self, monkeypatch):
        """The batched path reproduces the pinned golden valueless netlist."""
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                sam2=TINY_SAM,
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(directions={"voltage.dc": ("UP", "SIGN")}),
        )
        _inject_detections(monkeypatch, analyzer)
        img, _ = golden_image()
        (res,) = analyzer.analyze_batch([img], mesh=_cpu_mesh(8), batch_size=8)
        assert res.valueless_netlist_text.split("\n") == [
            "V1 0 2 None",
            "R1 1 0 None",
            "C1 1 0 None",
            "R2 2 1 None",
        ]


class TestInterleavedFinalize:
    def test_finalize_true_equals_trailing_finalize(self, monkeypatch):
        """analyze_many(finalize=True) must produce byte-identical final
        netlists to analyze_many() + finalize_netlists() — the interleave
        only changes WHEN each chunk's VLM value pass runs, not its
        batching or merge semantics."""
        client = FakeVLMClient(
            labels=[
                {"id": "1", "class": "voltage.dc", "value": "10"},
                {"id": "2", "class": "resistor", "value": "1k"},
            ],
            directions={"voltage.dc": ("UP", "SIGN")},
        )
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                sam2=TINY_SAM,
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=client,
        )
        _inject_detections(monkeypatch, analyzer)
        images = [img for img, _ in CIRCUITS] * 5  # 10 images, 2 chunks of 8

        pipe = BatchedPipeline(analyzer, mesh=_cpu_mesh(8), batch_size=8)
        serial = analyzer.finalize_netlists(
            pipe.analyze_many(images), chunk_size=8
        )
        calls_before = getattr(client, "label_batch_calls", 0)
        interleaved = pipe.analyze_many(images, finalize=True)

        assert len(interleaved) == len(serial)
        for a, b in zip(serial, interleaved):
            assert b.netlist_text == a.netlist_text
            assert b.netlist_text is not None
            assert b.vlm_stage2_output == a.vlm_stage2_output
            assert b.valueless_netlist_text == a.valueless_netlist_text
        # values actually merged (not the valueless fallback)
        assert any(
            r.netlist_text != r.valueless_netlist_text for r in interleaved
        )
        # the interleave batched per chunk, not per image
        assert getattr(client, "label_batch_calls", 0) - calls_before == 2

    def test_analyze_batch_finalize_flag(self, monkeypatch):
        """analyze_batch(finalize=True) — the CLI --final path — finalizes
        through the interleaved pipeline."""
        client = FakeVLMClient(
            labels=[{"id": "1", "class": "voltage.dc", "value": "5"}]
        )
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                sam2=TINY_SAM,
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=client,
        )
        _inject_detections(monkeypatch, analyzer)
        img, _ = golden_image()
        (res,) = analyzer.analyze_batch(
            [img], mesh=_cpu_mesh(8), batch_size=8, finalize=True
        )
        assert res.netlist_text is not None
        assert res.vlm_stage2_output == client.labels


class TestErrorPropagation:
    def test_segment_stage_error_raises_without_hang(self, monkeypatch):
        """A stage exception with many chunks still pending must raise to
        the caller. Regression: the consumer used to join the producer
        threads BEFORE raising; with > ~2*prefetch chunks queued the
        producers were blocked on the bounded queues and the join
        deadlocked — the caller hung instead of seeing the error."""
        import threading

        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(),
        )
        _inject_detections(monkeypatch, analyzer)
        pipe = BatchedPipeline(analyzer, mesh=_cpu_mesh(2), batch_size=2)

        def boom(self, staged):
            raise RuntimeError("injected segment failure")

        monkeypatch.setattr(BatchedPipeline, "_segment_phase", boom)

        img = loop_image()[0]
        outcome = {}

        def run():
            try:
                pipe.analyze_many([img] * 20, prefetch=2)  # 10 chunks
                outcome["result"] = "returned"
            except RuntimeError as e:
                outcome["result"] = str(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout=120)
        assert not t.is_alive(), "analyze_many hung on a stage exception"
        assert outcome["result"] == "injected segment failure"


@pytest.mark.slow
class TestBatchSam2Path:
    def test_sam2_mask_bitwise_equals_single_path(self, monkeypatch):
        """With SAM2 enabled, the batched mask must be BITWISE equal to
        the single-image path's: both run the same fixed-shape SAM2
        program on the same crop and the same bilinear-upsample →
        threshold-at-0 finalize chain (reference postprocess ordering,
        src/sam2_infer.py:117-121); random weights make exact equality a
        meaningful pin of the preprocessing + finalize chain, not of the
        model."""
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                sam2=TINY_SAM,
                use_sam2=True,
            ),
            use_sam2=True,
            vlm_client=FakeVLMClient(),
        )
        _inject_detections(monkeypatch, analyzer)
        for img, _boxes in CIRCUITS:
            single = analyzer.analyze(img)
            (batched,) = analyzer.analyze_batch(
                [img], mesh=_cpu_mesh(1), batch_size=1
            )
            # identical crop decision → identical mask space
            assert batched.sam_mask.shape == single.sam_mask.shape
            assert batched.sam_mask.dtype == np.uint8
            assert set(np.unique(batched.sam_mask)) <= {0, 255}
            np.testing.assert_array_equal(batched.sam_mask, single.sam_mask)
            assert batched.netlist_text == single.netlist_text
