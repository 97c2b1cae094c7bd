"""Web UI endpoints driven over real HTTP against a live server thread."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from http.server import ThreadingHTTPServer
from PIL import Image

from circuitvision_tpu import webapp
from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
from circuitvision_tpu.enrich.client import FakeVLMClient
from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU


@pytest.fixture(scope="module")
def server():
    webapp._STATE["analyzer"] = CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
            use_sam2=False,
        ),
        use_sam2=False,
        vlm_client=FakeVLMClient(
            labels=[{"id": "1", "class": "resistor", "value": "1k"}]
        ),
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), webapp.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, data: bytes) -> dict:
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


class TestWebApp:
    def test_index_serves_page(self, server):
        with urllib.request.urlopen(server + "/", timeout=60) as resp:
            body = resp.read().decode()
        assert "CircuitVision" in body and "Run SPICE Analysis" in body

    def test_analyze_flow(self, server):
        img = np.full((120, 160, 3), 255, np.uint8)
        img[60:63, 20:140] = 0
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        out = _post(server + "/analyze", buf.getvalue())
        assert "netlist_text" in out and "timings" in out
        assert isinstance(out["bboxes"], list)
        # crop-decision debug surface (reference app.py:559-594)
        assert out["crop"] is None or {
            "applied", "window", "reason", "original_dims", "cropped_dims",
            "basis_bbox", "clustering_threshold", "text_expansions",
        } <= set(out["crop"])
        assert isinstance(out["vlm_crops"], list)
        # original-image YOLO-detections debug surface (app.py:626-640);
        # always present — boxes are drawn on the pre-crop original
        assert isinstance(out["annotated_orig"], str)
        assert len(out["annotated_orig"]) > 100
        # emptied-mask debug image (app.py:705-710); "" when node
        # analysis produced no mask on this synthetic input
        assert "emptied" in out

    def test_final_returns_raw_vlm_output(self, server):
        """/final carries the reference's raw-VLM debug block
        (app.py:777-791): the stage-2 list formatted python-style."""
        img = np.full((120, 160, 3), 255, np.uint8)
        img[60:63, 20:140] = 0
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        _post(server + "/analyze", buf.getvalue())
        # the random-weight detector may find nothing → no enum image →
        # stage 2 skipped by the ladder; inject one so the VLM path runs
        # deterministically over real HTTP
        with webapp._STATE["lock"]:
            webapp._STATE["result"].enum_image = img
        out = _post(server + "/final", b"")
        assert out["vlm_raw"].startswith("[\n    {\n")
        assert "'class': 'resistor'" in out["vlm_raw"]

    def test_vlm_direction_gallery(self, server):
        """With oracle detections incl. a voltage source, the analyze
        response carries the per-component VLM direction crops + the
        interpreted type (reference app.py:643-683)."""
        import copy

        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.eval.synth import make_circuits

        c = make_circuits()[1]  # loop: V + R
        analyzer = webapp._STATE["analyzer"]
        old_bboxes, old_client = analyzer.bboxes, analyzer.vlm_client
        analyzer.bboxes = lambda img: copy.deepcopy(c.boxes)
        analyzer.vlm_client = FakeVLMClient(
            labels=c.vlm_labels, directions={"voltage.dc": ("UP", "ARROW")}
        )
        try:
            buf = io.BytesIO()
            Image.fromarray(c.image).save(buf, format="PNG")
            out = _post(server + "/analyze", buf.getvalue())
        finally:
            analyzer.bboxes = old_bboxes
            analyzer.vlm_client = old_client
        crops = out["vlm_crops"]
        assert crops, "expected direction crops for the voltage source"
        v = next(x for x in crops if x["class"] == "voltage.dc")
        assert v["direction"] == "UP" and v["reason"] == "ARROW"
        # voltage + ARROW reads as a current source (reference app.py:664-668)
        assert v["interpreted"] == "current.dc"
        assert isinstance(v["img"], str) and len(v["img"]) > 100

    def test_mode_endpoint(self, server):
        out = _post(server + "/mode", b"V1 1 0 0 AC 1 0\nR1 1 0 1k")
        assert out["mode"] == "AC"

    def test_simulate_endpoint(self, server):
        out = _post(server + "/simulate?freq=60", b"V1 1 0 10\nR1 1 2 1k\nR2 2 0 1k")
        assert out["ok"]
        assert out["node_voltages"]["2"] == "5.000V"

    def test_simulate_error_surfaces(self, server):
        out = _post(server + "/simulate?freq=60", b"R1 1 0 None")
        assert not out["ok"] and "Error" in out["error"]

    def test_bad_image_returns_error(self, server):
        req = urllib.request.Request(
            server + "/analyze", data=b"notanimage", method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                out = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            assert e.code == 500
            out = json.loads(e.read())
        assert out.get("ok") is False and out.get("error")

    def test_device_badge(self, server):
        with urllib.request.urlopen(server + "/device", timeout=60) as resp:
            out = json.loads(resp.read())
        assert "device" in out and "×" in out["device"]


class TestVlmTextEscaping:
    """External-VLM text renders via innerHTML in the debug page; it must
    arrive HTML-escaped from the server so a hostile/markup-bearing model
    response displays as text instead of executing (the reference's
    Streamlit st.code/st.markdown escape implicitly)."""

    def test_format_vlm_output_escapes_markup(self):
        out = webapp._format_vlm_output(
            [{"id": "1", "class": "<script>alert(1)</script>", "value": None}]
        )
        assert "<script>" not in out
        assert "&lt;script&gt;alert(1)&lt;/script&gt;" in out
        # reference formatting shape is preserved (app.py:780-789)
        assert out.startswith("[\n    {\n")

    def test_format_vlm_output_nondict_row_escaped(self):
        out = webapp._format_vlm_output(["<img onerror=x src=y>"])
        assert "<img" not in out and "&lt;img" in out

    def test_direction_gallery_escapes_vlm_fields(self):
        from circuitvision_tpu.core.types import AnalysisResult, BBox

        crop = np.zeros((4, 4, 3), np.uint8)
        box = BBox(
            class_name="voltage.dc", confidence=0.9,
            xmin=0, ymin=0, xmax=4, ymax=4,
            persistent_uid="voltage.dc_0_0_4_4",
        )
        # raw VLM reply carrying markup (client upper-cases but does not
        # restrict to the UP/DOWN/LEFT/RIGHT vocabulary)
        box.semantic_direction = "<B ONCLICK=X>UP"
        box.semantic_reason = "SIGN"
        result = AnalysisResult(original_image=crop)
        result.bboxes = [box]
        result.vlm_direction_crops = {box.persistent_uid: crop}
        gallery = webapp._vlm_direction_gallery(result)
        assert len(gallery) == 1
        assert "<" not in gallery[0]["direction"]
        assert "&lt;B ONCLICK=X&gt;UP" == gallery[0]["direction"]
