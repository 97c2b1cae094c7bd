"""Semantic direction enrichment.

Re-implements _enrich_bboxes_with_directions
(src/circuit_analyzer.py:2145-2215) with one improvement over the
reference: eligible component crops are dispatched to the VLM
concurrently (a thread pool over HTTP round-trips) instead of serially —
the reference's loop costs one network RTT per source/diode.
"""
from __future__ import annotations

import concurrent.futures
import dataclasses
from typing import Optional, Sequence

import numpy as np

from ..core import taxonomy
from ..core.config import EnrichConfig
from ..core.types import BBox
from .client import VLMClient


def _collect_jobs(
    image_rgb: np.ndarray,
    out: list[BBox],
    cfg: EnrichConfig,
    debug_store: Optional[dict],
) -> list[tuple[int, np.ndarray, str]]:
    """Mark ineligible/degenerate boxes in place; return the VLM jobs
    (box index, padded crop, class) for the eligible ones."""
    h, w = image_rgb.shape[:2]
    jobs: list[tuple[int, np.ndarray, str]] = []
    for i, b in enumerate(out):
        if b.class_name not in taxonomy.DIRECTION_CLASSES:
            b.semantic_direction = None
            b.semantic_reason = None
            continue
        x0 = max(0, b.xmin - cfg.crop_padding)
        y0 = max(0, b.ymin - cfg.crop_padding)
        x1 = min(w, b.xmax + cfg.crop_padding)
        y1 = min(h, b.ymax + cfg.crop_padding)
        if x0 >= x1 or y0 >= y1:
            b.semantic_direction = "UNKNOWN"
            b.semantic_reason = "UNKNOWN"
            continue
        crop = image_rgb[y0:y1, x0:x1]
        if crop.size == 0:
            b.semantic_direction = "UNKNOWN"
            b.semantic_reason = "UNKNOWN"
            continue
        if debug_store is not None:
            debug_store[b.persistent_uid] = crop
        jobs.append((i, crop, b.class_name))
    return jobs


def enrich_directions(
    image_rgb: np.ndarray,
    bboxes: Sequence[BBox],
    client: Optional[VLMClient],
    cfg: Optional[EnrichConfig] = None,
    debug_store: Optional[dict] = None,
) -> list[BBox]:
    """Return new boxes with semantic_direction/reason filled.

    Eligible classes (taxonomy.DIRECTION_CLASSES) get a padded crop sent
    to the VLM; others get direction None (reference :2213-2215). With no
    client, everything is left unenriched (graceful degradation,
    src/analysis_pipeline.py:141-145). When `debug_store` is given, each
    VLM input crop is stored under its component's persistent_uid (the
    reference's last_vlm_input_images debug surface, app.py:643-683).
    """
    cfg = cfg or EnrichConfig()
    out = [dataclasses.replace(b) for b in bboxes]
    if client is None:
        return out

    jobs = _collect_jobs(image_rgb, out, cfg, debug_store)
    if not jobs:
        return out

    # Batched path: one device dispatch for ALL eligible crops of the
    # image (the on-TPU reader's decode loop is parameter-read-bound, so
    # batching is nearly free — a 166 ms batch-1 call per component would
    # otherwise dominate the pipeline). HTTP clients lack the method and
    # keep the concurrent per-crop dispatch below.
    batch_fn = getattr(client, "get_directions_batch", None)
    if batch_fn is not None:
        try:
            answers = batch_fn([c for _, c, _ in jobs], [k for _, _, k in jobs])
        except Exception:
            answers = [("UNKNOWN", "UNKNOWN")] * len(jobs)
        for (i, _, _), (direction, reason) in zip(jobs, answers):
            out[i].semantic_direction = direction
            out[i].semantic_reason = reason
        return out

    def run(job):
        i, crop, cls = job
        try:
            return i, client.get_direction(crop, cls)
        except Exception:
            return i, ("UNKNOWN", "UNKNOWN")

    max_workers = max(1, min(cfg.max_concurrency, len(jobs)))
    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        for i, (direction, reason) in pool.map(run, jobs):
            out[i].semantic_direction = direction
            out[i].semantic_reason = reason
    return out


def enrich_directions_many(
    images: Sequence[np.ndarray],
    boxes_lists: Sequence[Sequence[BBox]],
    client: Optional[VLMClient],
    cfg: Optional[EnrichConfig] = None,
    debug_stores: Optional[Sequence[Optional[dict]]] = None,
) -> list[list[BBox]]:
    """Chunk-level enrichment: every eligible crop of EVERY image in one
    get_directions_batch dispatch when the client supports it.

    With the on-TPU reader a direction read is a whole greedy-decode call
    (~166 ms at the 3B scale regardless of batch, PERF.md) — per-image
    batching still pays one call per image, which would bound the chunked
    pipeline at ~5 img/s. Across a chunk of 8 images the same work is ONE
    call. Clients without the batch method (HTTP) fall back to the
    per-image concurrent path; batch failure degrades every crop in the
    chunk to UNKNOWN (the reference's per-call ladder,
    src/circuit_analyzer.py:2140-2143)."""
    cfg = cfg or EnrichConfig()
    stores = debug_stores if debug_stores is not None else [None] * len(images)
    batch_fn = getattr(client, "get_directions_batch", None)
    if client is None or batch_fn is None:
        return [
            enrich_directions(img, bl, client, cfg, ds)
            for img, bl, ds in zip(images, boxes_lists, stores)
        ]
    outs = [[dataclasses.replace(b) for b in bl] for bl in boxes_lists]
    all_jobs: list[tuple[int, int, np.ndarray, str]] = []
    for k, (img, out, ds) in enumerate(zip(images, outs, stores)):
        all_jobs.extend(
            (k, i, crop, cls) for i, crop, cls in _collect_jobs(img, out, cfg, ds)
        )
    if not all_jobs:
        return outs
    try:
        answers = client.get_directions_batch(
            [c for _, _, c, _ in all_jobs], [cls for _, _, _, cls in all_jobs]
        )
    except Exception:
        answers = [("UNKNOWN", "UNKNOWN")] * len(all_jobs)
    for (k, i, _, _), (direction, reason) in zip(all_jobs, answers):
        outs[k][i].semantic_direction = direction
        outs[k][i].semantic_reason = reason
    return outs
