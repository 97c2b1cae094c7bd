"""Pre-render the shared detector/segmenter/reader training pool.

The 1-core host cannot render fast enough to feed the chip during
training (VERDICT r4: pooled pre-generated data), so the pool is built
ONCE here and memory-mapped by the trainers. Contents per item:

  image   (H, W, 3) uint8   glyph or hand-drawn schematic render
  mask    (H, W)    uint8   GT wire mask (0/255), warped with the image
  boxes   (N, 4)    int32   GT detections xyxy (incl. value-text boxes)
  classes (N,)      str     class names aligned with `boxes`
  values  (N,)      str     printed value per box ('' = none)
  dirs    (N,)      str     drawn polarity direction per box ('' = none)
  tier    str               degradation tier applied ('' = clean)

Mix: --handdrawn-frac hand-drawn strokes (eval/handdrawn.py), the rest
straight glyph renders (eval/glyphs.py); --degrade-frac of all items
get one random degradation tier (eval/degrade.py) with GT warped
consistently — the robustness training data VERDICT r4 #2 asks for.

Seeds start at --seed0 (default 100000), far from the eval corpus
(seeds < 10000), so the eval set is never trained on.

Usage: python scripts/gen_pool.py --out .train_cache/pool_v1 --n 2600
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def render_item(seed: int, handdrawn_frac: float, degrade_frac: float):
    from circuitvision_tpu.eval.degrade import DEGRADE_TIERS, degrade
    from circuitvision_tpu.eval.glyphs import render_schematic
    from circuitvision_tpu.eval.handdrawn import handdrawn_circuit
    from circuitvision_tpu.eval.randomized import random_circuit

    rng = np.random.default_rng(seed)
    if rng.random() < handdrawn_frac:
        # photo style: ink colors, paper tints, notebook ruling lines,
        # ladder AND bridge layouts — the reference's real-photo domain
        img, mask, boxes, values, dirs, tb = handdrawn_circuit(
            seed, style="photo"
        )
    else:
        mask, boxes = random_circuit(seed)
        for b in boxes:
            b.semantic_direction = None
            b.semantic_reason = None
        img, values, dirs, tb = render_schematic(mask, boxes, rng)
    all_boxes = list(boxes) + list(tb)
    tier = ""
    if rng.random() < degrade_frac:
        tier = str(rng.choice(sorted(DEGRADE_TIERS)))
        img, all_boxes, mask = degrade(
            img, tier, seed, boxes=all_boxes, mask=mask
        )
    return {
        "image": np.asarray(img, np.uint8),
        "mask": np.asarray(mask, np.uint8),
        "boxes": np.asarray(
            [[b.xmin, b.ymin, b.xmax, b.ymax] for b in all_boxes], np.int32
        ).reshape(-1, 4),
        "classes": np.asarray([b.class_name for b in all_boxes]),
        "values": np.asarray(
            [values.get(b.persistent_uid, "") or "" for b in all_boxes]
        ),
        "dirs": np.asarray(
            [dirs.get(b.persistent_uid, "") or "" for b in all_boxes]
        ),
        "tier": tier,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".train_cache/pool_v1")
    ap.add_argument("--n", type=int, default=2600)
    ap.add_argument("--seed0", type=int, default=100000)
    ap.add_argument("--handdrawn-frac", type=float, default=0.25)
    ap.add_argument("--degrade-frac", type=float, default=0.40)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    for i in range(args.n):
        path = os.path.join(args.out, f"{i:06d}.npz")
        if os.path.exists(path):
            continue  # resumable
        item = render_item(args.seed0 + i, args.handdrawn_frac,
                           args.degrade_frac)
        np.savez_compressed(path, **item)
        if (i + 1) % 200 == 0:
            dt = time.time() - t0
            print(f"{i + 1}/{args.n} items ({dt:.0f}s, "
                  f"{dt / (i + 1) * 1e3:.0f} ms/item)", flush=True)
    with open(os.path.join(args.out, "pool_meta.json"), "w") as f:
        json.dump(vars(args), f, indent=1)
    print(f"pool complete: {args.n} items in {args.out} "
          f"({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
