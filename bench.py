"""End-to-end device-path benchmark.

Measures the full per-image device compute of the pipeline — YOLOv11-L
detect (640², decode + NMS on device) plus SAM 2.1 Hiera-L segmentation
(1024²) — in bfloat16 with random weights, batched, on every available
chip of the default backend (batch sharded over a data mesh when more
than one device is present).

Prints ONE JSON line:
  {"metric": ..., "value": images/sec, "unit": "images/sec",
   "vs_baseline": value / 6.25}

Baseline normalization: the build target is ≥50 images/s on a v5e-8
(BASELINE.json north_star) → 6.25 images/s per chip; vs_baseline ≥ 1.0 on
a single chip means the per-chip share of the target is met. (The
reference app itself runs 15–20 s per image on CPU, BASELINE.md.)
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_models(smoke: bool):
    from circuitvision_tpu.core.config import DetectorConfig, SAM2Config
    from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter
    from circuitvision_tpu.models.sam2.wrapper import init_params as sam2_init
    from circuitvision_tpu.models.yolo.model import YOLOv11
    from circuitvision_tpu.models.yolo.model import init_params as yolo_init

    if smoke:
        det_cfg = DetectorConfig(scale="n", img_size=64)
        sam_cfg = SAM2Config(
            resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
            global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
            backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
            dtype="float32",
        )
        dt = jnp.float32
    else:
        det_cfg = DetectorConfig(scale="l", img_size=640, dtype="bfloat16")
        sam_cfg = SAM2Config(dtype="bfloat16")
        dt = jnp.bfloat16

    yolo = YOLOv11(
        num_classes=det_cfg.num_classes, scale=det_cfg.scale,
        reg_max=det_cfg.reg_max, dtype=dt,
    )
    yolo_vars = yolo_init(yolo, jax.random.PRNGKey(0), img_size=det_cfg.img_size)
    sam = SAM2ImageSegmenter(cfg=sam_cfg, dtype=dt)
    sam_vars = sam2_init(sam, jax.random.PRNGKey(1))
    if dt == jnp.bfloat16:
        # Store weights bf16 at rest: with f32 params and a bf16 compute
        # dtype, XLA re-converts every parameter on every step (~137 ms of
        # copy-start per batch-4 step traced on v5e).
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        yolo_vars, sam_vars = cast(yolo_vars), cast(sam_vars)
    return det_cfg, sam_cfg, yolo, yolo_vars, sam, sam_vars


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4, help="per-device batch")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--smoke", action="store_true", help="tiny models for CI")
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from circuitvision_tpu.models.yolo.decode import decode_predictions, postprocess

    det_cfg, sam_cfg, yolo, yolo_vars, sam, sam_vars = build_models(args.smoke)

    devices = jax.devices()
    n_dev = len(devices)
    batch = args.batch * n_dev

    def device_step(yv, sv, det_imgs, seg_imgs):
        outs = yolo.apply(yv, det_imgs)
        boxes, scores = decode_predictions(outs, det_cfg.reg_max, det_cfg.num_classes)
        dets = postprocess(
            boxes, scores,
            max_detections=det_cfg.max_detections,
            conf_threshold=det_cfg.conf_threshold,
            iou_threshold=det_cfg.iou_threshold,
        )
        high, low, iou = sam.apply(sv, seg_imgs)
        mask = (high[..., 0] > 0).astype(jnp.uint8)
        return dets.boxes, dets.scores, dets.classes, dets.valid, mask

    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(devices).reshape(n_dev, 1), ("data", "model"))
        bsh = NamedSharding(mesh, PartitionSpec("data"))
        rep = NamedSharding(mesh, PartitionSpec())
        step = jax.jit(
            device_step,
            in_shardings=(rep, rep, bsh, bsh),
            out_shardings=(bsh, bsh, bsh, bsh, bsh),
        )
    else:
        step = jax.jit(device_step)
        bsh = None

    rng = np.random.default_rng(0)
    det_imgs = jnp.asarray(
        rng.random((batch, det_cfg.img_size, det_cfg.img_size, 3), np.float32)
    )
    seg_imgs = jnp.asarray(
        rng.random((batch, sam_cfg.resolution, sam_cfg.resolution, 3), np.float32)
    )
    if bsh is not None:
        det_imgs = jax.device_put(det_imgs, bsh)
        seg_imgs = jax.device_put(seg_imgs, bsh)

    # Warmup/compile — including the scalar-readback gather used after the
    # timing loop, so its compile never lands inside the measurement.
    out = step(yolo_vars, sam_vars, det_imgs, seg_imgs)
    _ = np.asarray(out[-1][0, 0, 0])
    out = step(yolo_vars, sam_vars, det_imgs, seg_imgs)
    _ = np.asarray(out[-1][0, 0, 0])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(yolo_vars, sam_vars, det_imgs, seg_imgs)
    jax.block_until_ready(out)
    # Force a real host readback: over remote-device tunnels
    # block_until_ready alone can under-wait; fetching bytes cannot.
    # Index on-device first — fetching the full mask tensor would drag
    # ~16 MB through the ~14 MB/s tunnel and pollute the measurement.
    _ = np.asarray(out[-1][0, 0, 0])
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * args.iters / dt

    per_chip_target = 50.0 / 8.0  # v5e-8 north-star split per chip
    label = (
        "device-path images/sec (smoke-size models)"
        if args.smoke
        else "device-path images/sec (YOLOv11-L 640 detect+NMS + SAM2.1-L 1024 segment, bf16)"
    )
    result = {
        "metric": label,
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / (per_chip_target * n_dev), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
