"""The COMPLETE product on one chip, measured: image → detect → crop →
SAM2 → topology → netlist → on-TPU VLM directions + values — zero
external calls.

Full-size models (YOLOv11-L@640, SAM2.1-L@1024, PaliGemma-3B int8
weight-only), oracle detections injected at the detection boundary (the
bench.py methodology: real device detect cost paid, GT boxes used so
topology is meaningful with random weights), random weights throughout
(timing is weight-independent; the reader's outputs are noise and the
parse-failure ladder keeps valueless values — the netlist/values MERGE
cost is negligible either way, the decode dispatches are what's being
measured).

Usage: python scripts/profile_values_e2e.py [--images 40] [--batch 8]
       [--no-int8]
"""
from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build_reader(int8: bool):
    import dataclasses

    from circuitvision_tpu.models.paligemma.config import PaliGemmaConfig
    from circuitvision_tpu.models.paligemma.model import PaliGemma
    from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_paligemma import device_random_params

    cfg = PaliGemmaConfig()
    model = PaliGemma(cfg, dtype=jnp.bfloat16)
    variables = device_random_params(model, cfg)
    if int8:
        from circuitvision_tpu.models.paligemma.quant import (
            quantize_variables_on_device,
        )

        variables = quantize_variables_on_device(variables)
        jax.block_until_ready(variables)
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, quant_int8=True)
        )
    # 32 new tokens ≈ the stage-2 JSON answer budget used in the VLM-head
    # profile; random weights never emit EOS, so this is the worst case.
    return PaliGemmaValueReader(
        cfg=cfg, variables=variables, max_new_tokens=32, dtype=jnp.bfloat16
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-int8", action="store_true")
    args = ap.parse_args()

    from circuitvision_tpu.core.config import PipelineConfig
    from circuitvision_tpu.eval.synth import make_circuits
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
    from circuitvision_tpu.pipeline.batch import BatchedPipeline

    print(f"backend: {jax.default_backend()}")
    reader = build_reader(int8=not args.no_int8)

    analyzer = CircuitAnalyzerTPU(
        config=PipelineConfig(use_sam2=True),
        use_sam2=True,
        vlm_client=reader,
    )

    circuits = make_circuits()[:2]
    gt_by_shape = {c.image.shape: c for c in circuits}

    class OraclePipeline(BatchedPipeline):
        def _detect_bboxes(self, chunk):
            BatchedPipeline._detect_bboxes(self, chunk)  # pay real detect
            return [copy.deepcopy(gt_by_shape[img.shape].boxes) for img in chunk]

    pipeline = OraclePipeline(analyzer, batch_size=args.batch)
    images = [circuits[i % len(circuits)].image for i in range(args.images)]

    # Warmup: one chunk through the WHOLE chain (compiles everything:
    # detect/SAM2 programs, direction-bucket prefill+decode, labels batch).
    warm = pipeline.analyze_many(images[: args.batch])
    warm = analyzer.finalize_netlists(warm, chunk_size=args.batch)
    print("warmup complete")

    # Serial split (pipeline, then a second finalize sweep) — kept for
    # the stage-level attribution.
    t0 = time.perf_counter()
    results = pipeline.analyze_many(images)
    t_pipe = time.perf_counter() - t0
    t0 = time.perf_counter()
    results = analyzer.finalize_netlists(results, chunk_size=args.batch)
    t_final = time.perf_counter() - t0
    n = len(results)
    assert all(r.netlist_text is not None for r in results)
    n_dirs = sum(
        1 for r in results for b in r.bboxes if b.semantic_direction is not None
    )
    total = t_pipe + t_final
    print(
        f"{n} images: pipeline {t_pipe:.2f}s ({n/t_pipe:.2f} img/s) + "
        f"values {t_final:.2f}s ({n/t_final:.2f} img/s) = "
        f"{total:.2f}s -> {n/total:.2f} img/s COMPLETE serial "
        f"(directions read for {n_dirs} components, "
        f"int8={not args.no_int8})"
    )

    # Interleaved: the value pass rides the pipeline per chunk
    # (analyze_many(finalize=True) — the production --final path).
    t0 = time.perf_counter()
    results = pipeline.analyze_many(images, finalize=True)
    t_int = time.perf_counter() - t0
    assert all(r.netlist_text is not None for r in results)
    print(
        f"{n} images interleaved: {t_int:.2f}s -> "
        f"{n/t_int:.2f} img/s COMPLETE"
    )


if __name__ == "__main__":
    main()
