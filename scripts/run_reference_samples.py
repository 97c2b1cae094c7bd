"""Run the reference repo's own sample images through the full model
path and record the outputs honestly (VERDICT r4 #3).

The two samples are the reference's real-photo domain:
  * static/images/circuits_1.jpg — hand-drawn red ink on lined yellow
    legal paper (photo);
  * static/images/Unbalanced_Wheatstone_bridge.png — clean textbook
    bridge schematic with diagonal wires.

For each image this script saves, under --out:
  <name>/detections.json   every detection with class + confidence
  <name>/annotated.png     boxes drawn on the image
  <name>/mask.png          the wire mask used for topology
  <name>/netlist.txt       valueless netlist (+ final if VLM given)
  <name>/report.json       stage outcomes summary

There is no GT for these images — the artifact is qualitative evidence
of how the synthetic-trained models behave on the real-photo domain,
good or bad (recorded either way).

Usage:
  python scripts/run_reference_samples.py \
      --yolo-checkpoint ckpt/yolo --sam2-checkpoint ckpt/sam2 \
      [--vlm reader:ckpt/reader] --out eval_artifacts/reference_samples
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = (
    "/root/reference/static/images/circuits_1.jpg",
    "/root/reference/static/images/Unbalanced_Wheatstone_bridge.png",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--yolo-checkpoint", default="ckpt/yolo")
    ap.add_argument("--sam2-checkpoint", default="ckpt/sam2")
    ap.add_argument("--vlm", default=None)
    ap.add_argument("--out", default="eval_artifacts/reference_samples")
    ap.add_argument("--images", nargs="*", default=list(SAMPLES))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import numpy as np
    from PIL import Image

    from circuitvision_tpu.core.config import (
        DetectorConfig,
        PipelineConfig,
        sam2_hiera_preset,
    )
    from circuitvision_tpu.core.viz import create_annotated_image
    from circuitvision_tpu.io.image_io import load_image
    from circuitvision_tpu.models.checkpoint import load_model_checkpoint
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU

    yolo_vars, yolo_meta = load_model_checkpoint(args.yolo_checkpoint)
    sam_vars, sam_meta = load_model_checkpoint(args.sam2_checkpoint)
    d = yolo_meta["detector"]
    s = sam_meta["sam2"]
    analyzer = CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(
                scale=d["scale"], img_size=d["img_size"],
                num_classes=d.get("num_classes", 62),
            ),
            sam2=sam2_hiera_preset(
                s["preset"], dtype="float32", **s.get("overrides", {})
            ),
            use_sam2=True,
        ),
        yolo_variables=yolo_vars,
        sam2_variables=sam_vars,
        use_sam2=True,
    )
    if args.vlm:
        from circuitvision_tpu.enrich.trained_reader import load_trained_reader

        analyzer.vlm_client = load_trained_reader(args.vlm.split(":", 1)[1])

    for path in args.images:
        name = os.path.splitext(os.path.basename(path))[0]
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        image = load_image(path)
        result = analyzer.analyze(image)
        if args.vlm:
            result = analyzer.generate_final_netlist(result)

        dets = [
            {
                "class": b.class_name,
                "confidence": round(float(b.confidence), 3),
                "xmin": b.xmin, "ymin": b.ymin,
                "xmax": b.xmax, "ymax": b.ymax,
            }
            for b in result.bboxes_orig_nms
        ]
        with open(os.path.join(out_dir, "detections.json"), "w") as f:
            json.dump(dets, f, indent=1)
        Image.fromarray(
            create_annotated_image(image, result.bboxes_orig_nms)
        ).save(os.path.join(out_dir, "annotated.png"))
        if result.sam_mask is not None:
            Image.fromarray(np.asarray(result.sam_mask, np.uint8)).save(
                os.path.join(out_dir, "mask.png")
            )
        with open(os.path.join(out_dir, "netlist.txt"), "w") as f:
            f.write("# valueless\n")
            f.write((result.valueless_netlist_text or "") + "\n")
            if result.netlist_text:
                f.write("# final\n")
                f.write(result.netlist_text + "\n")
        report = {
            "image": path,
            "detections": len(dets),
            "classes": sorted({d_["class"] for d_ in dets}),
            "crop_applied": bool(result.crop_info and result.crop_info.applied),
            "nodes": len(result.nodes),
            "netlist_lines": len(
                (result.valueless_netlist_text or "").splitlines()
            ),
            "yolo_meta": yolo_meta.get("train", {}),
            "sam2_meta": sam_meta.get("train", {}),
        }
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(f"{name}: {report}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
