"""Train the on-TPU value/class/direction reader and measure held-out
semantics (VERDICT r3 #2).

Pre-generates a crop dataset from random glyph schematics with printed
values (eval/glyphs), trains train/reader.CropReader on the chip, and
reports held-out per-head accuracy plus the product-level metric:
exact-match of the full `[{id, class, value}]` extraction through the
serving client (enrich/trained_reader.TrainedReaderClient) on UNSEEN
circuits.

Usage: python scripts/train_reader_demo.py [--steps 2000] [--batch 256]
         [--train-circuits 1200] [--out ckpt/reader]
CPU smoke: --steps 30 --train-circuits 40 --val-circuits 8 --batch 32
"""
import argparse
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


def evaluate_product(params, val_circuits: int, seed0: int) -> dict:
    """Product metric on UNSEEN circuits: render → enumerate-style crops
    through the serving client → exact-match of {id, class, value} rows
    vs ground truth."""
    from circuitvision_tpu.core import taxonomy
    from circuitvision_tpu.core.types import BBox
    from circuitvision_tpu.enrich.trained_reader import TrainedReaderClient
    from circuitvision_tpu.eval.glyphs import render_schematic
    from circuitvision_tpu.eval.randomized import random_circuit

    client = TrainedReaderClient(params)
    n_rows = n_rows_ok = n_imgs = n_imgs_ok = 0
    n_dirs = n_dirs_ok = 0
    for i in range(val_circuits):
        mask, boxes = random_circuit(seed0 + i)
        rng = np.random.default_rng(seed0 + i)
        img, values, dirs, _tb = render_schematic(mask, boxes, rng)
        import dataclasses

        enum_boxes, gt_rows = [], []
        vid = 1
        for b in boxes:
            if b.class_name in taxonomy.NETLIST_IGNORE_CLASSES or \
                    b.class_name == "circuit":
                continue
            enum_boxes.append(dataclasses.replace(b, visual_id=vid))
            gt_rows.append(
                {
                    "id": str(vid),
                    "class": b.class_name,
                    "value": values.get(b.persistent_uid),
                }
            )
            vid += 1
        out = client.get_labels_batch_boxes([img], [enum_boxes])[0]
        img_ok = True
        by_id = {r["id"]: r for r in out}
        for gt in gt_rows:
            got = by_id.get(gt["id"])
            ok = (
                got is not None
                and got["class"] == gt["class"]
                and got["value"] == gt["value"]
            )
            n_rows += 1
            n_rows_ok += int(ok)
            img_ok &= ok
        n_imgs += 1
        n_imgs_ok += int(img_ok)

        # direction reads through the serving hook on the raw crops
        from circuitvision_tpu.train.reader import make_crop

        djobs = [
            (b, dirs[b.persistent_uid])
            for b in boxes
            if b.persistent_uid in dirs
        ]
        if djobs:
            answers = client.get_directions_batch(
                [make_crop(img, b, pad=15) for b, _ in djobs],
                [b.class_name for b, _ in djobs],
            )
            for (_, want), (got, _reason) in zip(djobs, answers):
                n_dirs += 1
                n_dirs_ok += int(got == want)
    return {
        "row_exact_match": n_rows_ok / max(1, n_rows),
        "image_exact_match": n_imgs_ok / max(1, n_imgs),
        "rows": n_rows,
        "direction_accuracy": n_dirs_ok / max(1, n_dirs),
        "direction_reads": n_dirs,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--train-circuits", type=int, default=1200)
    ap.add_argument("--val-circuits", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--out", default=None,
                    help="save the trained reader checkpoint here (orbax)")
    args = ap.parse_args()

    import optax

    from circuitvision_tpu.train.reader import (
        CropReader,
        ReaderConfig,
        generate_reader_dataset,
        init_reader,
        make_reader_train_step,
    )

    cfg = ReaderConfig()
    t0 = time.time()
    data = generate_reader_dataset(args.train_circuits, seed0=50_000)
    n = data["crops"].shape[0]
    print(f"dataset: {n} crops from {args.train_circuits} circuits "
          f"({time.time() - t0:.0f}s)")

    model = CropReader(cfg)
    params = init_reader(cfg, jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(f"reader: {n_params:,} params, {args.steps} steps x batch {args.batch}")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=max(1, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.05,
    )
    tx = optax.adamw(sched, weight_decay=1e-4)
    opt = tx.init(params)
    step = jax.jit(make_reader_train_step(model, tx))

    # Dataset lives on DEVICE; batches are jit gathers by index. Per-step
    # host uploads (256×160²×3 ≈ 20 MB each) leaked their transfer
    # staging buffers on the tunnel-attached backend — an 8000-step run
    # grew to 130 GB RSS and was OOM-killed at step ~6500. Device-side
    # gather uploads 256 int32 indices per step instead (the detector
    # trainer's pattern, scripts/train_detector.py).
    data_dev = {k: jax.device_put(v) for k, v in data.items()}

    @jax.jit
    def gather_step(params, opt, crops, cls, val, dirs, val_w, sel):
        return step(params, opt, crops[sel], cls[sel], val[sel],
                    dirs[sel], val_w[sel])

    rng = np.random.default_rng(0)
    t0 = time.time()
    loss_first = loss = None
    for i in range(args.steps):
        sel = jnp.asarray(rng.integers(0, n, args.batch))
        params, opt, metrics = gather_step(
            params, opt,
            data_dev["crops"], data_dev["cls"], data_dev["val"],
            data_dev["dir"], data_dev["val_w"], sel,
        )
        if i % args.log_every == 0 or i == args.steps - 1:
            loss = float(metrics["loss"])
            if loss_first is None:
                loss_first = loss
            print(
                f"step {i:5d}  loss {loss:.4f}  "
                f"cls {float(metrics['cls_loss']):.3f}  "
                f"val {float(metrics['val_loss']):.3f}  "
                f"dir {float(metrics['dir_loss']):.3f}  "
                f"({time.time() - t0:.1f}s)"
            )
    dt = time.time() - t0
    print(f"trained in {dt:.0f}s ({dt / max(1, args.steps) * 1e3:.1f} ms/step)")

    report = evaluate_product(params, args.val_circuits, seed0=990_000)
    print("held-out product metrics:", {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in report.items()
    })

    if args.out:
        from circuitvision_tpu.models.checkpoint import save_variables

        save_variables(args.out, params)
        print(f"saved reader checkpoint to {args.out}")

    if args.steps >= 1000:
        assert loss < loss_first, "loss did not decrease"
        assert report["row_exact_match"] >= 0.9, (
            f"row exact-match {report['row_exact_match']:.3f} < 0.9"
        )
        print("READER DEMO OK (>=90% held-out row exact-match)")
    else:
        print(f"(short run: {args.steps} steps — bars skipped)")


if __name__ == "__main__":
    main()
