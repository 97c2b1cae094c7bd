"""Micro-batching serving layer (pipeline/server.py): results must match
the offline analyze_many path exactly, requests must actually coalesce
into device batches, a failed batch must not take down the server, and
the HTTP surface must round-trip.

The reference has no serving story beyond a single Streamlit session
(one request at a time, /root/reference/app.py:327-438); this layer is
the TPU-native production path (SURVEY §2.4 / north star), so it is
pinned against the offline batch pipeline it wraps.
"""
import copy
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from circuitvision_tpu.core.config import (
    DetectorConfig,
    PipelineConfig,
    SAM2Config,
)
from circuitvision_tpu.enrich.client import FakeVLMClient
from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
from circuitvision_tpu.pipeline.batch import BatchedPipeline
from circuitvision_tpu.pipeline.server import BatchingExecutor, make_server

from .test_batch_parity import (
    _cpu_mesh,
    _inject_detections,
    golden_image,
    loop_image,
)


@pytest.fixture(scope="module")
def analyzer():
    return CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
            use_sam2=False,
        ),
        use_sam2=False,
        vlm_client=FakeVLMClient(directions={"voltage.dc": ("UP", "SIGN")}),
    )


@pytest.fixture()
def pipeline(analyzer, monkeypatch):
    _inject_detections(monkeypatch, analyzer)
    return BatchedPipeline(analyzer, mesh=_cpu_mesh(2), batch_size=4)


class TestBatchingExecutor:
    def test_results_match_offline_batch_path(self, pipeline):
        images = [golden_image()[0], loop_image()[0], golden_image()[0]]
        offline = pipeline.analyze_many(images)
        with BatchingExecutor(pipeline, max_wait_ms=50) as ex:
            served = ex.map(images)
        assert [r.netlist_text for r in served] == [
            r.netlist_text for r in offline
        ]
        assert [len(r.nodes) for r in served] == [len(r.nodes) for r in offline]

    def test_concurrent_requests_coalesce(self, pipeline):
        """8 concurrent submits at batch_size=4 must run in ≤3 batches,
        not 8 — the whole point of the layer."""
        img = loop_image()[0]
        with BatchingExecutor(pipeline, max_wait_ms=500) as ex:
            futs = [ex.submit(copy.deepcopy(img)) for _ in range(8)]
            texts = {f.result(timeout=300).netlist_text for f in futs}
            stats = ex.stats()
        assert len(texts) == 1  # identical inputs → identical netlists
        assert stats["requests"] == 8
        assert stats["completed"] == 8
        assert stats["batches"] <= 3
        assert stats["mean_batch_size"] >= 8 / 3

    def test_single_request_flushes_on_deadline(self, pipeline):
        """A lone request must not wait for a full batch."""
        with BatchingExecutor(pipeline, max_wait_ms=10) as ex:
            res = ex.submit(loop_image()[0]).result(timeout=300)
        assert res.netlist_text

    def test_failed_batch_isolates(self, pipeline, monkeypatch):
        """A stage exception fails only its own batch's futures; the
        executor keeps serving (degradation-ladder posture)."""
        real = BatchedPipeline._detect_crop_phase
        calls = {"n": 0}

        def flaky(self, chunk):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected stage failure")
            return real(self, chunk)

        monkeypatch.setattr(BatchedPipeline, "_detect_crop_phase", flaky)
        with BatchingExecutor(pipeline, max_wait_ms=10) as ex:
            bad = ex.submit(loop_image()[0])
            with pytest.raises(RuntimeError, match="injected"):
                bad.result(timeout=300)
            good = ex.submit(loop_image()[0]).result(timeout=300)
            stats = ex.stats()
        assert good.netlist_text
        assert stats["failed"] == 1
        assert stats["completed"] == 1

    def test_submit_after_close_raises(self, pipeline):
        ex = BatchingExecutor(pipeline, max_wait_ms=10)
        ex.close()
        with pytest.raises(RuntimeError):
            ex.submit(loop_image()[0])

    def test_backlogged_queue_still_fills_batches(self, pipeline):
        """An aged first request (queue backlog past max_wait_ms) must
        still coalesce with already-queued requests: the deadline bounds
        waiting for requests that have NOT arrived, not batch assembly.
        Regression: the old code broke out at deadline<=0 and served
        1-request batches under exactly the load batching exists for."""
        import queue as _q

        from circuitvision_tpu.pipeline.server import _Request

        ex = BatchingExecutor.__new__(BatchingExecutor)
        ex.pipeline = pipeline  # batch_size 4
        ex.max_wait_ms = 25.0
        ex._requests = _q.Queue()
        stale = time.perf_counter() - 1.0  # submitted 1 s ago
        for _ in range(6):
            ex._requests.put(_Request(None, None, stale))
        batch = ex._next_batch()
        assert len(batch) == 4  # full batch, not 1
        assert ex._requests.qsize() == 2


class TestHTTPServer:
    def test_analyze_roundtrip_and_stats(self, pipeline):
        from PIL import Image

        img = loop_image()[0]
        expected = pipeline.analyze_many([img])[0]

        with BatchingExecutor(pipeline, max_wait_ms=10) as ex:
            server = make_server(ex, port=0)  # ephemeral port
            port = server.server_address[1]
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            try:
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/analyze",
                    data=buf.getvalue(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=300) as resp:
                    payload = json.loads(resp.read())
                assert payload["netlist_text"] == expected.netlist_text
                assert payload["nodes"] == len(expected.nodes)
                assert payload["bboxes"]

                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30
                ) as resp:
                    assert json.loads(resp.read()) == {"ok": True}
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30
                ) as resp:
                    stats = json.loads(resp.read())
                assert stats["completed"] >= 1
                assert stats["latency_s"]["p50"] is not None
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metrics", timeout=30
                ) as resp:
                    assert resp.headers["Content-Type"].startswith(
                        "text/plain"
                    )
                    text = resp.read().decode()
                # Prometheus text exposition: counters + the latency
                # summary with conventional quantile labels.
                assert "# TYPE circuitvision_requests_total counter" in text
                assert "circuitvision_completed_total 1" in text
                assert (
                    "# TYPE circuitvision_request_latency_seconds summary"
                    in text
                )
                assert 'quantile="0.5"' in text
            finally:
                server.shutdown()
                t.join(timeout=30)


class TestGracefulShutdown:
    def test_sigterm_drains_and_exits_zero(self):
        """A real SIGTERM to a live serve() process exits 0 through the
        drain path (executor __exit__), not the default kill — the
        production stop signal (docker/kubelet) must not sever the
        device client mid-dispatch (PERF.md infrastructure note)."""
        import os
        import signal
        import subprocess
        import sys

        proc = subprocess.Popen(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "serve_sigterm_worker.py")],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        try:
            port_line = proc.stdout.readline().strip()
            assert port_line.startswith("PORT="), port_line
            port = int(port_line.split("=")[1])
            deadline = time.time() + 120
            up = False
            while time.time() < deadline:
                try:
                    with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5
                    ) as resp:
                        up = json.loads(resp.read())["ok"]
                        break
                except Exception:
                    time.sleep(0.2)
            assert up, "server never came up"
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0
        assert "DRAINED" in out


class TestServedFinalPass:
    def test_final_executor_merges_values(self, analyzer, monkeypatch):
        """BatchingExecutor(final=True) runs the batched stage-2 per served
        batch: served netlists carry VLM values and equal the offline
        analyze_batch → finalize_netlists path."""
        analyzer.vlm_client.labels = [
            {"id": "1", "class": "voltage.dc", "value": "12"}
        ]
        try:
            _inject_detections(monkeypatch, analyzer)
            pipe = BatchedPipeline(analyzer, mesh=_cpu_mesh(2), batch_size=4)
            imgs = [golden_image()[0], loop_image()[0], golden_image()[0], loop_image()[0]]

            offline = analyzer.finalize_netlists(
                pipe.analyze_many([copy.deepcopy(i) for i in imgs]), chunk_size=4
            )
            with BatchingExecutor(pipe, max_wait_ms=50.0, final=True) as ex:
                served = ex.map([copy.deepcopy(i) for i in imgs])
            for a, b in zip(served, offline):
                assert a.netlist_text == b.netlist_text
                assert "12" in a.netlist_text  # value actually merged
        finally:
            analyzer.vlm_client.labels = []
