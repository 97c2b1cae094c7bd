"""Train the production detector checkpoint (VERDICT r4 #1).

Trains the first-party YOLOv11 on the pre-rendered pool
(scripts/gen_pool.py: glyph + hand-drawn renders, ~40% degrade-tier
corrupted with warp-consistent GT) and ships the result as a
`ckpt/yolo` model checkpoint (variables + meta.json) that
scripts/eval_pipeline.py consumes for the non-oracle pixels→netlist
eval.

The reference's counterpart is an offline ultralytics fine-tune
(mAP@50 0.9313 on its schematic set, /root/reference/README.md:113);
here the whole loop is first-party: ultralytics-formulation loss
(TAL + CIoU + DFL + BCE, train/yolo_loss.py), detect-prior bias init,
global-norm clip 10, cosine LR, and eval through the REAL serving
decode (DFL + device NMS + unletterbox).

Usage:
  python scripts/train_detector.py --pool .train_cache/pool_v1 \
      --steps 12000 --batch 16 --img-size 640 --scale s --save ckpt/yolo
"""
import argparse
import glob
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_pool(pool_dir: str, img_size: int, limit: int = 0):
    """Letterbox every pool item once into RAM (host PIL resize — the
    serving path's device letterbox differs by ±1 gray of bilinear
    rounding, irrelevant for training); cached on disk so restarts are
    instant.

    Returns (images (N,S,S,3) u8, boxes_per_image list[list[BBox]],
    tiers list[str])."""
    import pickle

    from PIL import Image

    from circuitvision_tpu.core.types import BBox

    # pool items only — sibling trainers drop their own "_"-prefixed
    # resize caches (.npz too) into the pool dir
    files = sorted(
        f for f in glob.glob(os.path.join(pool_dir, "*.npz"))
        if not os.path.basename(f).startswith("_")
    )
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no pool items under {pool_dir}")
    cache = os.path.join(pool_dir, f"_letterboxed_{img_size}_{len(files)}")
    if os.path.exists(cache + ".npy") and os.path.exists(cache + ".pkl"):
        images = np.load(cache + ".npy")
        with open(cache + ".pkl", "rb") as f:
            boxes_all, tiers = pickle.load(f)
        print(f"  loaded letterboxed cache {cache} ({len(images)} items)")
        return images, boxes_all, tiers
    images = np.full((len(files), img_size, img_size, 3), 114, np.uint8)
    boxes_all, tiers = [], []
    t0 = time.time()
    for i, f in enumerate(files):
        with np.load(f, allow_pickle=False) as z:
            img = z["image"]
            bxyxy = z["boxes"]
            cls = z["classes"]
            tiers.append(str(z["tier"]))
        h, w = img.shape[:2]
        s = min(img_size / h, img_size / w)
        nh, nw = int(round(h * s)), int(round(w * s))
        px, py = (img_size - nw) // 2, (img_size - nh) // 2
        images[i, py : py + nh, px : px + nw] = np.asarray(
            Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
        )
        boxes_all.append(
            [
                BBox(
                    class_name=str(c), confidence=1.0,
                    xmin=int(b[0] * s + px), ymin=int(b[1] * s + py),
                    xmax=int(b[2] * s + px), ymax=int(b[3] * s + py),
                )
                for b, c in zip(bxyxy, cls)
            ]
        )
        if (i + 1) % 500 == 0:
            print(f"  letterboxed {i + 1}/{len(files)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    np.save(cache + ".npy", images)
    with open(cache + ".pkl", "wb") as f:
        pickle.dump((boxes_all, tiers), f)
    return images, boxes_all, tiers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=".train_cache/pool_v1")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--scale", default="s", choices=list("nsmlx"))
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--warmup-steps", type=int, default=200)
    ap.add_argument("--max-gt", type=int, default=96)
    ap.add_argument("--val-n", type=int, default=96)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=2000)
    ap.add_argument("--limit", type=int, default=0, help="pool size cap")
    ap.add_argument("--save", default="ckpt/yolo")
    ap.add_argument("--ckpt-dir", default=".train_cache/yolo_run")
    ap.add_argument("--save-every", type=int, default=1000)
    args = ap.parse_args()

    from circuitvision_tpu.core.config import DetectorConfig
    from circuitvision_tpu.models.checkpoint import save_model_checkpoint
    from circuitvision_tpu.models.yolo.model import YOLOv11, init_params
    from circuitvision_tpu.train.checkpoint import (
        latest_checkpoint,
        prune_checkpoints,
        restore_train_state,
        save_train_state,
    )
    from circuitvision_tpu.train.yolo_loss import YOLOLossConfig
    from circuitvision_tpu.train.yolo_train import (
        init_detect_biases,
        make_yolo_optimizer,
        make_yolo_train_step,
        targets_from_boxes,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_yolo_demo import eval_map50

    from circuitvision_tpu.core.taxonomy import TRAIN_CLASSES

    # Trainable label space: reference ids + capacitor/current.dc
    # extension (taxonomy.TRAIN_EXTRA_CLASSES) — training with the bare
    # 62-class map sent every capacitor/current-source GT to background
    # (measured AP 0.000 for both).
    det_cfg = DetectorConfig(scale=args.scale, img_size=args.img_size,
                             num_classes=len(TRAIN_CLASSES))
    images, boxes_all, tiers = load_pool(args.pool, args.img_size, args.limit)
    n_val = min(args.val_n, len(images) // 4)
    n_train = len(images) - n_val
    print(f"pool: {n_train} train + {n_val} val images "
          f"({sum(1 for t in tiers if t)} degraded)")

    # Pre-pad all GT once (static (N, M) arrays index per batch).
    gb, gc, gv = targets_from_boxes(boxes_all, max_gt=args.max_gt)
    gb, gc, gv = np.asarray(gb), np.asarray(gc), np.asarray(gv)

    model = YOLOv11(num_classes=det_cfg.num_classes, scale=args.scale,
                    reg_max=det_cfg.reg_max)
    params = init_params(model, jax.random.PRNGKey(0), img_size=args.img_size)
    params = init_detect_biases(params, det_cfg.num_classes, args.img_size)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(f"YOLOv11-{args.scale}@{args.img_size}: {n_params:,} params, "
          f"{args.steps} steps x batch {args.batch}")

    loss_cfg = YOLOLossConfig(num_classes=det_cfg.num_classes,
                              reg_max=det_cfg.reg_max,
                              img_size=args.img_size)
    tx = make_yolo_optimizer(args.lr, warmup_steps=args.warmup_steps,
                             total_steps=args.steps)
    opt = tx.init(params)

    start_step = 0
    found = latest_checkpoint(args.ckpt_dir) if args.ckpt_dir else None
    if found:
        start_step = found[0]
        params, opt = restore_train_state(found[1], params, opt)
        print(f"resumed from {found[1]} (step {start_step})")

    # The whole pool lives in HBM as uint8 (3000x640² ≈ 3.7 GiB); batches
    # are device-side gathers + /255 normalization inside the jit step.
    # Streaming float batches from host cost ~78 MB/step over the tunnel
    # (measured 1.3 s/step — 8x the compute time).
    images_dev = jax.device_put(images)
    gb_dev, gc_dev, gv_dev = (jax.device_put(x) for x in (gb, gc, gv))

    raw_step = make_yolo_train_step(model, tx, loss_cfg)

    @jax.jit
    def gather_step(params, opt, pool_img, pool_gb, pool_gc, pool_gv, sel):
        x = pool_img[sel].astype(jnp.float32) / 255.0
        return raw_step(params, opt, x, pool_gb[sel], pool_gc[sel],
                        pool_gv[sel])

    val_imgs = jnp.asarray(images[n_train:], jnp.float32) / 255.0
    val_gt = boxes_all[n_train:]
    val_tiers = tiers[n_train:]

    def run_eval(tag: str):
        m = eval_map50(model, params, det_cfg, val_imgs, val_gt,
                       args.img_size)
        clean_idx = [i for i, t in enumerate(val_tiers) if not t]
        deg_idx = [i for i, t in enumerate(val_tiers) if t]
        parts = {"all": m["map"]}
        for name, idx in (("clean", clean_idx), ("degraded", deg_idx)):
            if idx:
                sub = eval_map50(
                    model, params, det_cfg, val_imgs[np.asarray(idx)],
                    [val_gt[i] for i in idx], args.img_size,
                )
                parts[name] = sub["map"]
        print(f"[{tag}] held-out mAP@50: " +
              "  ".join(f"{k} {v:.4f}" for k, v in parts.items()), flush=True)
        top = sorted(m["per_class"].items(), key=lambda kv: -kv[1])
        print("   per-class AP@50:",
              {k: round(v, 3) for k, v in top[:10]}, flush=True)
        return m

    run_eval(f"step {start_step}")

    rng = np.random.default_rng(1234 + start_step)
    t0 = time.time()
    loss = None
    for i in range(start_step, args.steps):
        sel = jnp.asarray(rng.integers(0, n_train, args.batch))
        params, opt, metrics = gather_step(
            params, opt, images_dev, gb_dev, gc_dev, gv_dev, sel
        )
        if i % args.log_every == 0 or i == args.steps - 1:
            loss = float(metrics["loss"])
            dt = time.time() - t0
            # apply_if_finite skips poisoned updates; surface how many
            # batches it dropped (a healthy run stays at 0).
            skipped = int(getattr(opt, "notfinite_count", 0))
            print(f"step {i:5d}  loss {loss:.4f}  "
                  f"box {float(metrics['box_loss']):.3f}  "
                  f"cls {float(metrics['cls_loss']):.3f}  "
                  f"dfl {float(metrics['dfl_loss']):.3f}  "
                  f"fg {int(metrics['n_fg'])}  "
                  f"skipped {skipped}  "
                  f"({dt:.0f}s, {dt / max(1, i - start_step + 1) * 1e3:.0f}"
                  " ms/step)", flush=True)
            if loss == 0.0 and int(metrics["n_fg"]) == 0:
                raise RuntimeError(
                    "collapsed run (loss 0, fg 0 — poisoned params); "
                    "aborting instead of burning the remaining steps"
                )
        if args.eval_every and i and i % args.eval_every == 0:
            run_eval(f"step {i}")
        if args.ckpt_dir and ((i + 1) % args.save_every == 0
                              or i == args.steps - 1):
            save_train_state(args.ckpt_dir, i + 1, params, opt)
            prune_checkpoints(args.ckpt_dir, keep=2)

    m = run_eval("final")
    if args.save:
        save_model_checkpoint(
            os.path.abspath(args.save), params,
            meta={
                "kind": "yolo",
                "detector": {
                    "scale": args.scale,
                    "img_size": args.img_size,
                    "num_classes": det_cfg.num_classes,
                    "reg_max": det_cfg.reg_max,
                },
                "train": {
                    "steps": args.steps, "batch": args.batch,
                    "pool": os.path.basename(args.pool.rstrip("/")),
                    "map50_holdout": float(m["map"]),
                },
            },
        )
        print(f"saved model checkpoint to {args.save} "
              f"(mAP@50 {m['map']:.4f})")


if __name__ == "__main__":
    main()
