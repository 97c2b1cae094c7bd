"""End-to-end pipeline: synthetic schematic → netlist → simulation.

Drives CircuitAnalyzerTPU's stage surface with deterministic inputs: a
drawn wire raster + injected detections (the model path is exercised
separately with random weights for structure), a FakeVLMClient for both
VLM stages, and the MNA engine for DC/AC.
"""
import numpy as np
import pytest

from circuitvision_tpu.core.config import (
    DetectorConfig,
    PipelineConfig,
    SAM2Config,
)
from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.enrich.client import FakeVLMClient, parse_vlm_list
from circuitvision_tpu.enrich.directions import enrich_directions
from circuitvision_tpu.netlist.fix import fix_netlist
from circuitvision_tpu.netlist.generate import generate_netlist_from_nodes, stringify_netlist
from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
from circuitvision_tpu.topology.enumerate_components import enumerate_components
from circuitvision_tpu.topology.nodes import extract_nodes


def _bbox(cls, x0, y0, x1, y1, conf=0.9, **kw):
    return BBox(class_name=cls, confidence=conf, xmin=x0, ymin=y0, xmax=x1, ymax=y1, **kw)


def synthetic_circuit():
    """White 300×400 schematic: wire loop + V source + resistor drawn as
    black strokes; detections provided as ground truth."""
    img = np.full((300, 400, 3), 255, np.uint8)
    w = 3
    img[50 : 50 + w, 50:353] = 0
    img[250 : 250 + w, 50:353] = 0
    img[50:253, 50 : 50 + w] = 0
    img[50:253, 350 : 350 + w] = 0
    v = _bbox("voltage.dc", 35, 120, 70, 180)
    r = _bbox("resistor", 150, 35, 250, 70)
    return img, [v, r]


class TestStageFlow:
    def test_classical_mask_to_final_netlist_and_dc(self):
        img, boxes = synthetic_circuit()
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64), use_sam2=False
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(
                labels=[
                    {"id": "1", "class": "voltage.dc", "value": "10"},
                    {"id": "2", "class": "resistor", "value": "1k"},
                ],
                directions={"voltage.dc": ("UP", "SIGN")},
            ),
        )
        # classical mask from drawn strokes
        mask = np.asarray(analyzer.segment_circuit(img))
        assert mask.max() == 255
        boxes = enrich_directions(img, boxes, analyzer.vlm_client)
        extraction = extract_nodes(mask, boxes, analyzer.cfg.topology)
        assert len(extraction.nodes) == 2
        netlist = generate_netlist_from_nodes(extraction.nodes)
        assert sorted(l.component_type for l in netlist) == ["R", "V"]

        enum_img, enum_boxes = enumerate_components(img, boxes)
        fix_netlist(netlist, analyzer.vlm_client.get_labels(enum_img), enum_boxes)
        text = stringify_netlist(netlist)
        assert "10" in text and "1k" in text

        sim = analyzer.simulate(text)
        assert sim.ok, sim.error
        # V=10 across R=1k → 10 mA magnitude through the source
        currents = {k: v for k, v in sim.branch_currents.items()}
        assert "v1" in currents

    def test_ac_flow(self):
        img, boxes = synthetic_circuit()
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64), use_sam2=False
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(
                labels=[
                    {"id": "1", "class": "voltage.ac", "value": "4:-45"},
                    {"id": "2", "class": "resistor", "value": "100"},
                ]
            ),
        )
        mask = np.asarray(analyzer.segment_circuit(img))
        extraction = extract_nodes(mask, boxes, analyzer.cfg.topology)
        netlist = generate_netlist_from_nodes(extraction.nodes)
        enum_img, enum_boxes = enumerate_components(img, boxes)
        fix_netlist(netlist, analyzer.vlm_client.get_labels(enum_img), enum_boxes)
        text = stringify_netlist(netlist)

        from circuitvision_tpu.netlist.values import detect_analysis_mode

        assert detect_analysis_mode(text) == "AC"
        from circuitvision_tpu.core.types import AnalysisResult

        res = AnalysisResult(netlist=netlist, netlist_text=text)
        sim = analyzer.simulate(res, frequency_hz=60.0)
        assert sim.ok, sim.error
        assert any("∠" in v for v in sim.node_voltages.values())


class TestAnalyzeIntegration:
    @pytest.fixture(scope="class")
    def analyzer(self):
        return CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, num_classes=62),
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(),
        )

    def test_analyze_runs_end_to_end(self, analyzer):
        """Random-weight YOLO on a synthetic image: the pipeline must run
        every stage and produce a (possibly empty) netlist without error."""
        img, _ = synthetic_circuit()
        result = analyzer.analyze(img)
        assert result.netlist_text is not None
        assert "YOLO Component Detection" in result.timings.timings
        assert "Node Analysis" in result.timings.timings

    def test_detect_returns_valid_bboxes(self, analyzer):
        img, _ = synthetic_circuit()
        boxes = analyzer.bboxes(img)
        for b in boxes:
            assert b.xmax >= b.xmin and b.ymax >= b.ymin
            assert b.class_name in __import__(
                "circuitvision_tpu.core.taxonomy", fromlist=["CLASSES"]
            ).CLASSES


class TestVLMParsing:
    def test_parse_fenced_json(self):
        out = parse_vlm_list('```json\n[{"id": "1", "class": "resistor", "value": null}]\n```')
        assert out[0]["value"] is None

    def test_parse_python_literal(self):
        out = parse_vlm_list("[{'id': '1', 'class': 'resistor', 'value': None}]")
        assert out[0]["class"] == "resistor"

    def test_parse_error_raises(self):
        with pytest.raises(ValueError):
            parse_vlm_list("not a list at all {{{")


class TestParamDtypeCast:
    def test_bf16_config_casts_float_params_once(self):
        """bf16 configs must hold bf16 params (converted checkpoints and
        flax init are float32): without the one-time cast XLA re-converts
        every parameter per step and Pallas kernels get f32 refs whose
        doubled VMEM footprint OOMs at serving batch sizes (observed on
        the v5e at batch 8)."""
        import jax
        import jax.numpy as jnp

        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="bfloat16"),
                sam2=SAM2Config(
                    resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
                    global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
                    backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
                    dtype="bfloat16",
                ),
                use_sam2=True,
            ),
            use_sam2=True,
            vlm_client=FakeVLMClient(),
        )
        for tree in (analyzer.yolo_variables, analyzer.sam2_variables):
            leaves = jax.tree_util.tree_leaves(tree)
            assert leaves
            assert not any(x.dtype == jnp.float32 for x in leaves), (
                "float32 params survived the bf16 cast"
            )

    def test_f32_config_params_untouched(self):
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(),
        )
        import jax
        import jax.numpy as jnp

        assert all(
            x.dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(analyzer.yolo_variables)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
