"""Micro-batching inference server: concurrent requests → device batches.

The reference serves one request at a time from a single Streamlit
session (`/root/reference/app.py:327-438`; batch size is 1 everywhere —
SURVEY §2.4). On TPU the economics invert: the SAM2 step at batch 8
costs ~1.24× batch 1 (PERF.md), so a server that groups concurrent
requests into device micro-batches multiplies throughput ~6× on the
same hardware. This module is that layer:

- :class:`BatchingExecutor` — a persistent three-stage pipeline
  (detect+crop / segment / host topology, the same stages as
  ``BatchedPipeline.analyze_many``) fed by a request queue. Requests
  group into micro-batches of up to ``pipeline.batch_size``; a batch is
  flushed when full or when its oldest request has waited
  ``max_wait_ms`` — the standard accelerator-serving latency/throughput
  knob. Because the stages are persistent threads, the device stays
  busy across micro-batches exactly as in the offline throughput path.
- :func:`serve` — a stdlib HTTP front end: ``POST /analyze`` (image
  bytes → netlist JSON), ``GET /healthz``, ``GET /stats``.

A batch that fails in any stage fails only its own requests (each
future gets the exception); the executor keeps serving — the same
degradation-ladder posture as the rest of the pipeline (SURVEY §5).
"""
from __future__ import annotations

import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

from ..core.types import AnalysisResult
from .batch import BatchedPipeline

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    image: np.ndarray
    future: Future
    t_submit: float


@dataclass
class _Stats:
    """Lock-protected serving counters."""

    lock: threading.Lock = field(default_factory=threading.Lock)
    requests: int = 0
    completed: int = 0
    failed: int = 0
    batches: int = 0
    batch_size_sum: int = 0
    # rolling latency window (seconds, last 512 completions)
    latencies: list = field(default_factory=list)

    def record_batch(self, n: int) -> None:
        with self.lock:
            self.batches += 1
            self.batch_size_sum += n

    def record_done(self, t_submit: float, ok: bool) -> None:
        with self.lock:
            if ok:
                self.completed += 1
            else:
                self.failed += 1
            self.latencies.append(time.perf_counter() - t_submit)
            if len(self.latencies) > 512:
                del self.latencies[: len(self.latencies) - 512]

    def snapshot(self, queue_depth: int) -> dict:
        with self.lock:
            lat = sorted(self.latencies)
            n = len(lat)

            def pct(p: float) -> Optional[float]:
                return lat[min(n - 1, int(p * n))] if n else None

            return {
                "requests": self.requests,
                "completed": self.completed,
                "failed": self.failed,
                "batches": self.batches,
                "mean_batch_size": (
                    self.batch_size_sum / self.batches if self.batches else None
                ),
                "queue_depth": queue_depth,
                "latency_s": {"p50": pct(0.50), "p90": pct(0.90), "p99": pct(0.99)},
            }


class BatchingExecutor:
    """Groups concurrent analyze() requests into device micro-batches.

    Parameters
    ----------
    pipeline:
        The :class:`BatchedPipeline` to execute on. Its ``batch_size``
        is the micro-batch ceiling (requests beyond it wait for the
        next batch; the device program shape never changes).
    max_wait_ms:
        Flush deadline: a non-full batch launches once its first
        request has waited this long. 0 disables *waiting* for requests
        that have not arrived yet (latency-optimal under light load);
        already-queued requests still join the batch at zero latency
        cost, so a backlog never collapses to size-1 batches.
    queue_depth:
        Backpressure bound on queued requests; ``submit`` blocks when
        full (callers see it as latency, never unbounded memory).
    """

    def __init__(
        self,
        pipeline: BatchedPipeline,
        max_wait_ms: float = 25.0,
        queue_depth: int = 256,
        final: bool = False,
    ):
        self.pipeline = pipeline
        self.max_wait_ms = float(max_wait_ms)
        #: run the batched VLM stage-2 value pass per served batch
        #: (analyzer.finalize_netlists — one decode dispatch per batch
        #: with the on-TPU reader)
        self.final = bool(final)
        self._requests: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self._stats = _Stats()
        self._closed = False
        # Serializes the closed-check+enqueue in submit() against close()'s
        # closed-set+sentinel: without it a request could land BEHIND the
        # shutdown sentinel and its Future would never resolve.
        self._submit_lock = threading.Lock()
        # Stage queues carry (requests, staged) tuples; bounded so a slow
        # consumer backpressures the device instead of buffering masks.
        self._q1: "queue.Queue" = queue.Queue(maxsize=2)
        self._q2: "queue.Queue" = queue.Queue(maxsize=2)
        self._threads = [
            threading.Thread(target=self._detect_loop, daemon=True, name="cv-detect"),
            threading.Thread(target=self._segment_loop, daemon=True, name="cv-segment"),
            threading.Thread(target=self._topology_loop, daemon=True, name="cv-topology"),
        ]
        for t in self._threads:
            t.start()

    # -- public API -------------------------------------------------------
    def submit(self, image: np.ndarray) -> "Future[AnalysisResult]":
        """Enqueue one image; returns a Future resolving to its
        AnalysisResult (full ``analyze()`` semantics)."""
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("executor is closed")
            fut: Future = Future()
            with self._stats.lock:
                self._stats.requests += 1
            self._requests.put(_Request(image, fut, time.perf_counter()))
        return fut

    def map(self, images: Sequence[np.ndarray]) -> list[AnalysisResult]:
        """Submit many images and wait for all results (in order)."""
        futs = [self.submit(img) for img in images]
        return [f.result() for f in futs]

    def stats(self) -> dict:
        return self._stats.snapshot(self._requests.qsize())

    def close(self) -> None:
        """Drain in-flight work and stop the stage threads."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._requests.put(None)
        for t in self._threads:
            t.join(timeout=60)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- stage threads ----------------------------------------------------
    def _next_batch(self) -> Optional[list[_Request]]:
        """Block for the first request, then coalesce until the batch is
        full or max_wait_ms has elapsed since that first request."""
        first = self._requests.get()
        if first is None:
            return None
        batch = [first]
        deadline = first.t_submit + self.max_wait_ms / 1e3
        while len(batch) < self.pipeline.batch_size:
            remaining = deadline - time.perf_counter()
            try:
                # The deadline only bounds waiting for requests that have
                # NOT arrived yet: once it passes (e.g. the first request
                # aged in a backlog), already-queued requests still join
                # at zero latency cost — without this, any backlog would
                # collapse every batch to size 1 exactly when batching
                # matters most.
                item = (
                    self._requests.get_nowait()
                    if remaining <= 0
                    else self._requests.get(timeout=remaining)
                )
            except queue.Empty:
                break
            if item is None:
                # propagate shutdown after this batch completes
                self._requests.put(None)
                break
            batch.append(item)
        return batch

    def _fail(self, batch: list[_Request], exc: BaseException) -> None:
        logger.exception("serving batch of %d failed", len(batch), exc_info=exc)
        for r in batch:
            if not r.future.done():
                # Requests already completed earlier in the same loop
                # iteration keep their success result AND stats entry.
                r.future.set_exception(exc)
                self._stats.record_done(r.t_submit, ok=False)

    def _detect_loop(self) -> None:
        while True:
            batch = self._next_batch()
            if batch is None:
                self._q1.put(None)
                return
            self._stats.record_batch(len(batch))
            try:
                staged = self.pipeline._detect_crop_phase([r.image for r in batch])
                self._q1.put((batch, staged))
            except Exception as e:
                self._fail(batch, e)

    def _segment_loop(self) -> None:
        while True:
            item = self._q1.get()
            if item is None:
                self._q2.put(None)
                return
            batch, staged = item
            try:
                staged = self.pipeline._segment_phase(staged)
                self._q2.put((batch, staged))
            except Exception as e:
                self._fail(batch, e)

    def _topology_loop(self) -> None:
        while True:
            item = self._q2.get()
            if item is None:
                return
            batch, staged = item
            try:
                self.pipeline._materialize_masks(staged)
                results = [self.pipeline._pre_topology(st) for st in staged]
                self.pipeline._enrich_chunk(staged, results)
                self.pipeline._extract_nodes_chunk(staged, results)
                results = [
                    self.pipeline._post_topology(st, res)
                    for st, res in zip(staged, results)
                ]
                if self.final:
                    results = self.pipeline.analyzer.finalize_netlists(
                        results, chunk_size=len(results)
                    )
                for req, res in zip(batch, results):
                    req.future.set_result(res)
                    self._stats.record_done(req.t_submit, ok=True)
            except Exception as e:
                self._fail(batch, e)


# -- HTTP front end --------------------------------------------------------

def _prometheus_text(stats: dict) -> str:
    """The /stats snapshot in Prometheus text exposition format
    (counters + gauges + latency-quantile gauges), so the serving layer
    plugs into standard scrape-based monitoring without an adapter.
    The reference has no metrics export at all (SURVEY §5)."""
    lines = []

    def metric(name, kind, value, help_text, labels=""):
        if value is None:
            return
        lines.append(f"# HELP {name} {help_text}")
        lines.append(f"# TYPE {name} {kind}")
        lines.append(f"{name}{labels} {value}")

    metric("circuitvision_requests_total", "counter", stats["requests"],
           "Analyze requests received")
    metric("circuitvision_completed_total", "counter", stats["completed"],
           "Requests completed successfully")
    metric("circuitvision_failed_total", "counter", stats["failed"],
           "Requests failed")
    metric("circuitvision_batches_total", "counter", stats["batches"],
           "Device micro-batches executed")
    metric("circuitvision_mean_batch_size", "gauge",
           stats["mean_batch_size"], "Mean micro-batch occupancy")
    metric("circuitvision_queue_depth", "gauge", stats["queue_depth"],
           "Requests waiting for a batch slot")
    lat = {
        k: v for k, v in (stats.get("latency_s") or {}).items() if v is not None
    }
    if lat:
        lines.append(
            "# HELP circuitvision_request_latency_seconds "
            "End-to-end request latency (rolling window)"
        )
        lines.append("# TYPE circuitvision_request_latency_seconds summary")
        for q, v in lat.items():
            # p50/p90/p99 → the conventional quantile label 0.5/0.9/0.99
            frac = int(q[1:]) / 100.0
            lines.append(
                "circuitvision_request_latency_seconds"
                f'{{quantile="{frac:g}"}} {v}'
            )
    return "\n".join(lines) + "\n"


def _result_json(result: AnalysisResult) -> dict:
    """Serving response: the structural outputs, no debug rasters (the
    interactive webapp serves those; this endpoint is the throughput
    surface)."""
    return {
        "netlist_text": result.netlist_text or "",
        "netlist_no_dir": result.valueless_netlist_text_no_vlm_dir,
        "bboxes": [b.to_dict() for b in result.bboxes_orig_nms],
        "nodes": len(result.nodes),
        "timings": result.timings.timings if result.timings else {},
    }


def make_server(
    executor: BatchingExecutor,
    port: int = 8600,
    request_timeout_s: float = 120.0,
) -> ThreadingHTTPServer:
    """Build (but do not start) the batching HTTP server.

    ThreadingHTTPServer gives one thread per in-flight request; they all
    funnel into the executor's queue, which is where batching happens.
    """

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json({"ok": True})
            elif self.path == "/stats":
                self._json(executor.stats())
            elif self.path == "/metrics":
                body = _prometheus_text(executor.stats()).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/analyze":
                return self.send_error(404)
            try:
                from ..io.image_io import decode_image

                n = int(self.headers.get("Content-Length", 0))
                image = decode_image(self.rfile.read(n))
                result = executor.submit(image).result(timeout=request_timeout_s)
                self._json(_result_json(result))
            except Exception as e:
                self._json({"ok": False, "error": str(e)}, 500)

        def log_message(self, *args):
            logger.debug("http: %s", args)

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def _sigterm_to_exit(signum, frame):
    """SIGTERM → SystemExit so serve()'s finally/with blocks run.

    Production stops (docker stop, kubelet, systemd) send SIGTERM;
    Python's default action kills the process mid-flight — in-flight
    futures never resolve and the device client dies inside a dispatch
    (a SIGTERM'd client once wedged this environment's remote-TPU
    tunnel for a day, PERF.md infrastructure note). Raising SystemExit
    instead unwinds through serve(): the HTTP loop stops, then the
    executor's __exit__ drains in-flight batches before the process
    exits."""
    raise SystemExit(0)


def serve(
    analyzer,
    port: int = 8600,
    batch_size: Optional[int] = None,
    max_wait_ms: float = 25.0,
    final: bool = False,
) -> None:
    """Start the micro-batching server (blocks). SIGINT and SIGTERM
    both shut down gracefully: stop accepting, drain in-flight work,
    then return."""
    import signal

    pipeline = BatchedPipeline(analyzer, batch_size=batch_size)
    with BatchingExecutor(pipeline, max_wait_ms=max_wait_ms, final=final) as ex:
        server = make_server(ex, port=port)
        logger.info("serving on :%d (batch=%d, max_wait=%.0fms)",
                    port, pipeline.batch_size, max_wait_ms)
        old_term = signal.signal(signal.SIGTERM, _sigterm_to_exit)
        try:
            server.serve_forever()
        except (KeyboardInterrupt, SystemExit):
            logger.info("shutdown signal; draining in-flight batches")
        finally:
            signal.signal(signal.SIGTERM, old_term)
            server.shutdown()
