"""Per-class detector diagnostics: full AP@50 table with GT support.

Loads a trained ckpt (scripts/train_detector.py --save) and scores it on
the tail of the training pool (the same held-out slice the trainer uses,
or --val-n to widen), printing EVERY class with its AP and GT count so
weak classes are visible — the trainer's log shows only the top-10.

Usage: python scripts/eval_detector.py --ckpt ckpt/yolo \
           --pool .train_cache/pool_v1 [--val-n 200]
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpt/yolo")
    ap.add_argument("--pool", default=".train_cache/pool_v1")
    ap.add_argument("--val-n", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from circuitvision_tpu.core.config import DetectorConfig
    from circuitvision_tpu.eval.metrics import map50
    from circuitvision_tpu.models.checkpoint import load_model_checkpoint
    from circuitvision_tpu.models.yolo.model import YOLOv11

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_detector import load_pool
    from train_yolo_demo import eval_map50

    variables, meta = load_model_checkpoint(args.ckpt)
    d = meta["detector"]
    det_cfg = DetectorConfig(
        scale=d["scale"], img_size=d["img_size"],
        num_classes=d.get("num_classes", 62), reg_max=d.get("reg_max", 16),
    )
    model = YOLOv11(
        num_classes=det_cfg.num_classes, scale=det_cfg.scale,
        reg_max=det_cfg.reg_max,
    )
    images, boxes_all, tiers = load_pool(args.pool, det_cfg.img_size)
    val = slice(len(images) - args.val_n, len(images))
    val_imgs_u8 = images[val]
    val_gt = boxes_all[val]
    val_tiers = tiers[val]

    imgs = jnp.asarray(val_imgs_u8, jnp.float32) / 255.0
    m = eval_map50(model, variables, det_cfg, imgs, val_gt,
                   det_cfg.img_size)

    counts = {}
    for bl in val_gt:
        for b in bl:
            counts[b.class_name] = counts.get(b.class_name, 0) + 1
    rows = sorted(m["per_class"].items(), key=lambda kv: kv[1])
    print(f"val images: {len(val_gt)}  "
          f"({sum(1 for t in val_tiers if t)} degraded)")
    print(f"mAP@50 all: {m['map']:.4f}")
    print(f"{'class':28s} {'AP@50':>7s} {'n_gt':>6s}")
    for cls, ap_v in rows:
        print(f"{cls:28s} {ap_v:7.3f} {counts.get(cls, 0):6d}")


if __name__ == "__main__":
    main()
