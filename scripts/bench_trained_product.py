"""Throughput of the TRAINED complete product — zero oracle, zero
external calls: pixels → detect (ckpt/yolo) → crop → segment
(ckpt/sam2) → topology → netlist → values+directions (ckpt/reader).

This is the shipping configuration (what `cli.py analyze-batch --final`
runs with the trained checkpoints), as opposed to bench.py's
reference-parity configuration (YOLO-L@640 + SAM2-L@1024 random
weights, oracle boxes — the apples-to-apples device-path number vs
/root/reference's model sizes).

Usage: python scripts/bench_trained_product.py [--images 64] [--batch 8]
"""
import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--yolo", default="ckpt/yolo")
    ap.add_argument("--sam2", default="ckpt/sam2")
    ap.add_argument("--reader", default="ckpt/reader")
    ap.add_argument("--data", default="eval_data")
    args = ap.parse_args()

    from circuitvision_tpu.core.config import (
        DetectorConfig,
        PipelineConfig,
        sam2_hiera_preset,
    )
    from circuitvision_tpu.enrich.trained_reader import load_trained_reader
    from circuitvision_tpu.io.image_io import load_image
    from circuitvision_tpu.models.checkpoint import load_model_checkpoint
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
    from circuitvision_tpu.pipeline.batch import BatchedPipeline

    yolo_vars, yolo_meta = load_model_checkpoint(args.yolo)
    sam_vars, sam_meta = load_model_checkpoint(args.sam2)
    d = yolo_meta["detector"]
    s = sam_meta["sam2"]
    analyzer = CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(
                scale=d["scale"], img_size=d["img_size"],
                num_classes=d.get("num_classes", 62),
                reg_max=d.get("reg_max", 16),
            ),
            sam2=sam2_hiera_preset(
                s["preset"], dtype="float32", **s.get("overrides", {})
            ),
            use_sam2=True,
        ),
        yolo_variables=yolo_vars,
        sam2_variables=sam_vars,
        use_sam2=True,
        vlm_client=load_trained_reader(args.reader),
    )

    paths = sorted(glob.glob(os.path.join(args.data, "images", "*.png")))
    base = [load_image(p) for p in paths[:16]]
    images = [base[i % len(base)] for i in range(args.images)]

    pipeline = BatchedPipeline(analyzer, batch_size=args.batch)
    t0 = time.perf_counter()
    warm = pipeline.analyze_many(images[: args.batch], finalize=True)
    print(f"warmup (compiles): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    results = pipeline.analyze_many(images, finalize=True)
    dt = time.perf_counter() - t0
    n = len(results)
    assert all(r.netlist_text is not None for r in results)
    n_valued = sum(
        1 for r in results for line in (r.netlist_text or "").splitlines()
        if line and not line.endswith("None")
    )
    out = {
        "metric": "trained_product_throughput",
        "value": round(n / dt, 2),
        "unit": "img/s",
        "images": n,
        "batch": args.batch,
        "valued_lines": n_valued,
        "config": f"yolo-{d['scale']}@{d['img_size']} + "
                  f"sam2-{s['preset']} + reader",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
