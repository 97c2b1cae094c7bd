"""Train the production wire-segmenter checkpoint (VERDICT r4 #1/#2).

Trains the first-party SAM2 image segmenter (real Hiera architecture,
models/sam2/) FROM SCRATCH on the pre-rendered pool — no pretrained
SAM2 weights exist in this environment (reference downloads them at
runtime, /root/reference/download_models.py:47-58), so the from-scratch
run uses a right-sized Hiera family preset ('t' by default) rather than
the 224M-param L the reference fine-tunes. The architecture code is the
same parametric trunk the L converter targets; only the config differs.

The pool's ~40% degrade-tier items (blur/shadow/jpeg/perspective/wobble
with warped GT) make this the robustness fine-tune VERDICT r4 #2 calls
for: the blur tier's classical-mask IoU collapse (0.66 → 0.33,
EVAL_DEGRADED.json) is exactly what a learned segmenter fixes.

The wire mask is the TOPOLOGY input (component glyphs and value text
must be excluded — that is the learned task; the reference's fine-tuned
SAM2 does the same on hand-drawn photos, README.md:119).

Usage:
  python scripts/train_segmenter.py --pool .train_cache/pool_v1 \
      --steps 6000 --batch 8 --res 512 --arch t --save ckpt/sam2
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


def load_pool(pool_dir: str, res: int, limit: int = 0):
    """Resize every pool item once into RAM: (N, res, res, 3) uint8 RGB
    (normalization happens on device per batch) + (N, res, res) bool GT."""
    from PIL import Image

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
    cache = os.path.join(pool_dir, f"_seg_{res}_{len(files)}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        print(f"  loaded seg cache {cache} ({len(z['imgs'])} items)")
        return z["imgs"], z["masks"], [str(t) for t in z["tiers"]]
    imgs = np.zeros((len(files), res, res, 3), np.uint8)
    masks = np.zeros((len(files), res, res), bool)
    tiers = []
    t0 = time.time()
    for i, f in enumerate(files):
        with np.load(f, allow_pickle=False) as z:
            img, m = z["image"], z["mask"]
            tiers.append(str(z["tier"]))
        imgs[i] = np.asarray(
            Image.fromarray(img).resize((res, res), Image.BILINEAR)
        )
        masks[i] = (
            np.asarray(
                Image.fromarray(m).resize((res, res), Image.BILINEAR)
            ) > 127
        )
        if (i + 1) % 500 == 0:
            print(f"  resized {i + 1}/{len(files)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    np.savez(cache, imgs=imgs, masks=masks, tiers=np.asarray(tiers))
    return imgs, masks, tiers


def iou(pred: np.ndarray, gt: np.ndarray) -> float:
    inter = float(np.logical_and(pred, gt).sum())
    union = float(np.logical_or(pred, gt).sum())
    return inter / union if union else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=".train_cache/pool_v1")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--arch", default="t", choices=("t", "s", "b+", "l"))
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--warmup-steps", type=int, default=100)
    ap.add_argument("--val-n", type=int, default=64)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--save", default="ckpt/sam2")
    ap.add_argument("--ckpt-dir", default=".train_cache/sam2_run")
    ap.add_argument("--save-every", type=int, default=500)
    args = ap.parse_args()

    from circuitvision_tpu.core.config import TrainConfig, sam2_hiera_preset
    from circuitvision_tpu.models.checkpoint import save_model_checkpoint
    from circuitvision_tpu.models.sam2.wrapper import (
        SAM2ImageSegmenter,
        init_params,
    )
    from circuitvision_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
    from circuitvision_tpu.train.checkpoint import (
        latest_checkpoint,
        prune_checkpoints,
        restore_train_state,
        save_train_state,
    )
    from circuitvision_tpu.train.train_step import make_optimizer, make_train_step

    cfg = sam2_hiera_preset(args.arch, resolution=args.res, dtype="float32")
    imgs, masks, tiers = load_pool(args.pool, args.res, args.limit)
    n_val = min(args.val_n, len(imgs) // 4)
    n_train = len(imgs) - n_val
    print(f"pool: {n_train} train + {n_val} val "
          f"({sum(1 for t in tiers if t)} degraded)")

    model = SAM2ImageSegmenter(cfg=cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables))
    print(f"SAM2-{args.arch}@{args.res} from scratch: {n_params:,} params")

    tcfg = TrainConfig(
        learning_rate=args.lr, schedule="cosine",
        warmup_steps=args.warmup_steps, total_steps=args.steps,
    )
    mask_all = jax.tree.map(lambda _: True, variables)
    tx, _ = make_optimizer(variables, tcfg, mask=mask_all)
    opt = tx.init(variables)
    # Full-surface from-scratch training: whole-tree autodiff (the
    # selective path exists to freeze a pretrained trunk — no trunk to
    # freeze here).
    raw_step = make_train_step(model, tx, tcfg, mask=mask_all,
                               selective=False)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def normalize(u8):
        return (u8.astype(jnp.float32) / 255.0 - mean) / std

    @jax.jit
    def infer(variables, u8):
        return model.apply(variables, normalize(u8))[0][..., 0] > 0

    # Pool lives in HBM as uint8 (images ~2.4 GiB @512 + masks); batches
    # are device-side gathers — streaming float batches from host costs
    # ~25 MB/step over the tunnel (the detector trainer measured 8x
    # compute time for the equivalent).
    imgs_dev = jax.device_put(imgs)
    masks_dev = jax.device_put(masks)

    @jax.jit
    def gather_step(variables, opt, pool_img, pool_mask, sel):
        x = normalize(pool_img[sel])
        gt = pool_mask[sel].astype(jnp.float32)
        return raw_step(variables, opt, x, gt)

    start_step = 0
    found = latest_checkpoint(args.ckpt_dir) if args.ckpt_dir else None
    if found:
        start_step = found[0]
        variables, opt = restore_train_state(found[1], variables, opt)
        print(f"resumed from {found[1]} (step {start_step})")

    val_u8 = jnp.asarray(imgs[n_train:])
    val_gt = masks[n_train:]
    val_tiers = tiers[n_train:]

    def run_eval(tag: str) -> float:
        pred = np.asarray(infer(variables, val_u8))
        ious = np.asarray([iou(pred[i], val_gt[i]) for i in range(len(pred))])
        clean = [i for i, t in enumerate(val_tiers) if not t]
        deg = [i for i, t in enumerate(val_tiers) if t]
        msg = f"[{tag}] held-out wire IoU: all {ious.mean():.4f}"
        if clean:
            msg += f"  clean {ious[clean].mean():.4f}"
        if deg:
            msg += f"  degraded {ious[deg].mean():.4f}"
        print(msg, flush=True)
        return float(ious.mean())

    run_eval(f"step {start_step}")

    rng = np.random.default_rng(777 + start_step)
    t0 = time.time()
    for i in range(start_step, args.steps):
        sel = jnp.asarray(rng.integers(0, n_train, args.batch))
        variables, opt, metrics = gather_step(
            variables, opt, imgs_dev, masks_dev, sel
        )
        if i % args.log_every == 0 or i == args.steps - 1:
            dt = time.time() - t0
            print(f"step {i:5d}  loss {float(metrics['loss']):.4f}  "
                  f"({dt:.0f}s, "
                  f"{dt / max(1, i - start_step + 1) * 1e3:.0f} ms/step)",
                  flush=True)
        if args.eval_every and i and i % args.eval_every == 0:
            run_eval(f"step {i}")
        if args.ckpt_dir and ((i + 1) % args.save_every == 0
                              or i == args.steps - 1):
            save_train_state(args.ckpt_dir, i + 1, variables, opt)
            prune_checkpoints(args.ckpt_dir, keep=2)

    final_iou = run_eval("final")
    if args.save:
        import dataclasses

        save_model_checkpoint(
            os.path.abspath(args.save), variables,
            meta={
                "kind": "sam2",
                "sam2": {
                    "preset": args.arch,
                    "overrides": {"resolution": args.res},
                },
                "sam2_config": {
                    k: (list(v) if isinstance(v, (tuple, list)) else v)
                    for k, v in dataclasses.asdict(cfg).items()
                },
                "train": {
                    "steps": args.steps, "batch": args.batch,
                    "pool": os.path.basename(args.pool.rstrip("/")),
                    "iou_holdout": final_iou,
                },
            },
        )
        print(f"saved model checkpoint to {args.save} (IoU {final_iou:.4f})")


if __name__ == "__main__":
    main()
