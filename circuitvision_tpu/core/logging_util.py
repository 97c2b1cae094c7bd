"""Logging + stage timing + optional device profiling.

Reference behavior ported: env-configurable level via LOG_LEVEL
(app.py:36-45), third-party logger suppression (app.py:47-57), per-stage
analysis summary (src/analysis_pipeline.py:328-347). Additions for the
TPU build (SURVEY.md §5 tracing): a `stage_timer` context manager and a
`device_trace` wrapper around jax.profiler for real device-time traces.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time

_NOISY_LOGGERS = ("urllib3", "PIL", "matplotlib", "httpx", "openai", "google")


def configure_logging(level: str | None = None) -> logging.Logger:
    level_name = (level or os.getenv("LOG_LEVEL", "INFO")).upper()
    logging.basicConfig(
        level=getattr(logging, level_name, logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    for name in _NOISY_LOGGERS:
        logging.getLogger(name).setLevel(logging.WARNING)
    return logging.getLogger("circuitvision_tpu")


@contextlib.contextmanager
def stage_timer(timings: dict, stage: str):
    """Record wall-clock for a pipeline stage into a timings dict
    (reference detailed_timings pattern, src/analysis_pipeline.py:99-113)."""
    start = time.time()
    try:
        yield
    finally:
        timings[stage] = time.time() - start


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/cv_tpu_trace"):
    """jax.profiler trace for device-time inspection (view with
    tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def log_analysis_summary(result, logger: logging.Logger) -> None:
    """Per-class component counts + node count at INFO
    (src/analysis_pipeline.py:328-347)."""
    if not result.netlist:
        return
    counts: dict[str, int] = {}
    for line in result.netlist:
        counts[line.class_name] = counts.get(line.class_name, 0) + 1
    logger.info("Analysis results summary:")
    logger.info("- Total components detected: %d", len(result.netlist))
    for cls, n in counts.items():
        logger.info("  - %s: %d", cls, n)
    if result.nodes:
        logger.info("- Total nodes: %d", len(result.nodes))
