"""End-to-end evaluation harness.

Scores the pipeline against an eval set once converted checkpoints are
available, reporting the three acceptance metrics of BASELINE.md:
detection mAP@50 (reference publishes 0.9313), segmentation pixel
accuracy (reference publishes 98.7%), and netlist text exact-match vs
reference netlists (the build's north-star fidelity metric).

Layout of --data:
    images/<name>.(png|jpg)          input circuit images
    netlists/<name>.cir              reference netlist text   (optional)
    boxes/<name>.json                GT detections            (optional)
        [{"class": ..., "xmin": ..., "ymin": ..., "xmax": ..., "ymax": ...}]
    masks/<name>.png                 GT wire masks (0/255)    (optional)

Usage:
    python scripts/eval_pipeline.py --data eval/ \
        --yolo-checkpoint ckpt/yolo --sam2-checkpoint ckpt/sam2
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--yolo-checkpoint")
    parser.add_argument("--sam2-checkpoint")
    parser.add_argument("--scale", default="l", choices=list("nsmlx"))
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
    from circuitvision_tpu.core.types import BBox
    from circuitvision_tpu.eval.metrics import (
        map50,
        mask_accuracy,
        mask_iou,
        netlist_exact_match,
    )
    from circuitvision_tpu.io.image_io import load_image
    from circuitvision_tpu.models.checkpoint import load_variables
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU

    yolo_vars = load_variables(args.yolo_checkpoint) if args.yolo_checkpoint else None
    sam_vars = load_variables(args.sam2_checkpoint) if args.sam2_checkpoint else None
    analyzer = CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale=args.scale), use_sam2=sam_vars is not None
        ),
        yolo_variables=yolo_vars,
        sam2_variables=sam_vars,
        use_sam2=sam_vars is not None,
    )

    image_paths = sorted(
        glob.glob(os.path.join(args.data, "images", "*.png"))
        + glob.glob(os.path.join(args.data, "images", "*.jpg"))
    )
    if args.limit:
        image_paths = image_paths[: args.limit]
    if not image_paths:
        print(f"no images under {args.data}/images")
        return 1

    pred_boxes, gt_boxes = [], []
    pred_netlists, ref_netlists = [], []
    ious, accs = [], []

    for path in image_paths:
        name = os.path.splitext(os.path.basename(path))[0]
        image = load_image(path)
        result = analyzer.analyze(image)

        gt_box_path = os.path.join(args.data, "boxes", f"{name}.json")
        if os.path.exists(gt_box_path):
            with open(gt_box_path) as f:
                gt = [BBox.from_dict(d) for d in json.load(f)]
            pred_boxes.append(result.bboxes_orig_nms)
            gt_boxes.append(gt)

        ref_net_path = os.path.join(args.data, "netlists", f"{name}.cir")
        if os.path.exists(ref_net_path):
            with open(ref_net_path) as f:
                ref_netlists.append(f.read())
            pred_netlists.append(result.netlist_text or "")

        gt_mask_path = os.path.join(args.data, "masks", f"{name}.png")
        if os.path.exists(gt_mask_path) and result.sam_mask is not None:
            from PIL import Image

            gt_mask = np.asarray(Image.open(gt_mask_path).convert("L"))
            ious.append(mask_iou(result.sam_mask, gt_mask))
            accs.append(mask_accuracy(result.sam_mask, gt_mask))

        print(f"{name}: {len(result.bboxes_orig_nms)} detections, "
              f"{len(result.nodes)} nodes")

    report = {"images": len(image_paths)}
    if gt_boxes:
        report["detection"] = map50(pred_boxes, gt_boxes)
    if ious:
        report["segmentation"] = {
            "mean_iou": float(np.mean(ious)),
            "pixel_accuracy": float(np.mean(accs)),
        }
    if ref_netlists:
        report["netlist_exact_match"] = netlist_exact_match(pred_netlists, ref_netlists)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
