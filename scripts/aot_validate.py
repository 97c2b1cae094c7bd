"""Full-size sharded AOT validation against a real v5e-8 topology
(VERDICT r3 #5).

`__graft_entry__.dryrun_multichip` proves the sharding code paths
compile+execute on a tiny config over 8 virtual CPU devices; this
script closes the remaining gap — memory/layout validation of the FULL
Hiera-L programs under the production v5e-8 mesh — without needing 8
physical chips: JAX topology-AOT (`jax.experimental.topologies`)
compiles against a compile-only "v5e:2x4" device topology and reports
per-chip memory from the real XLA TPU compilation.

Programs compiled at full scale:
  1. detect step    — YOLOv11-L @640, decode+NMS, batch 8/chip (64
                      global), data-sharded, params replicated
  2. segment step   — SAM2.1 Hiera-L @1024 bf16, batch 8/chip,
                      data-sharded (the serving configuration)
  3. train step     — SAM2.1-L selective fine-tune (reference LoRA
                      surface), batch 4/chip (the measured single-chip
                      sweet spot, PERF.md), (data=4, model=2) mesh with
                      FSDP param/optimizer shardings

Writes AOT_V5E8.json: per-program generated-code/argument/output/temp
bytes and a pass/fail against the 16 GB/chip HBM budget.

Usage: python scripts/aot_validate.py  [--skip-train]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

HBM_PER_CHIP = 16 * 1024**3  # v5e: 16 GiB


def _abs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x,
        tree,
    )


def _mem_report(name, compiled, t_compile):
    ma = compiled.memory_analysis()
    peak = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.generated_code_size_in_bytes
        - ma.alias_size_in_bytes
    )
    rep = {
        "generated_code_bytes": int(ma.generated_code_size_in_bytes),
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "peak_estimate_bytes": int(peak),
        "peak_estimate_gib": round(peak / 1024**3, 3),
        "fits_16gib_hbm": bool(peak < HBM_PER_CHIP),
        "compile_seconds": round(t_compile, 1),
    }
    print(f"{name}: peak ≈ {rep['peak_estimate_gib']} GiB/chip, "
          f"fits={rep['fits_16gib_hbm']}, compile {t_compile:.0f}s")
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--per-chip-batch", type=int, default=8)
    ap.add_argument("--train-per-chip-batch", type=int, default=4)
    args = ap.parse_args()

    from jax.experimental import topologies

    from circuitvision_tpu.core.config import (
        DetectorConfig,
        SAM2Config,
        TrainConfig,
    )
    from circuitvision_tpu.models.sam2.wrapper import (
        SAM2ImageSegmenter,
        init_params as sam2_init,
    )
    from circuitvision_tpu.models.yolo.decode import decode_predictions, postprocess
    from circuitvision_tpu.models.yolo.model import YOLOv11, init_params as yolo_init

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devs = np.asarray(topo.devices)
    assert devs.size == 8, devs
    print(f"topology: {devs.size}× {topo.devices[0].device_kind}")

    report = {"topology": "v5e:2x4", "n_devices": 8, "programs": {}}

    # ---- 1. detect step (pure DP) -------------------------------------
    det_cfg = DetectorConfig(scale="l", img_size=640, dtype="bfloat16")
    yolo = YOLOv11(
        num_classes=det_cfg.num_classes, scale=det_cfg.scale,
        reg_max=det_cfg.reg_max, dtype=jnp.bfloat16,
    )
    yolo_vars = _abs(yolo_init(yolo, jax.random.PRNGKey(0), img_size=64))
    # init at 64 for speed — variables are shape-polymorphic in img_size
    mesh = Mesh(devs.reshape(8, 1), ("data", "model"))
    bsh = NamedSharding(mesh, PartitionSpec("data"))
    rep = NamedSharding(mesh, PartitionSpec())
    B = args.per_chip_batch * 8

    def detect_step(yv, imgs):
        outs = yolo.apply(yv, imgs)
        boxes, scores = decode_predictions(outs, det_cfg.reg_max, det_cfg.num_classes)
        return postprocess(
            boxes, scores,
            max_detections=det_cfg.max_detections,
            conf_threshold=det_cfg.conf_threshold,
            iou_threshold=det_cfg.iou_threshold,
        )

    imgs = jax.ShapeDtypeStruct((B, det_cfg.img_size, det_cfg.img_size, 3), jnp.float32)
    t0 = time.time()
    compiled = (
        jax.jit(detect_step, in_shardings=(rep, bsh))
        .lower(yolo_vars, imgs)
        .compile()
    )
    report["programs"]["detect_yolo_l_640_b8"] = _mem_report(
        "detect", compiled, time.time() - t0
    )

    # ---- 2. segment step (pure DP, serving config) --------------------
    sam_cfg = SAM2Config(dtype="bfloat16")
    sam = SAM2ImageSegmenter(cfg=sam_cfg, dtype=jnp.bfloat16)
    sam_vars_concrete = sam2_init(sam, jax.random.PRNGKey(1))
    sam_vars_bf16 = jax.tree.map(
        lambda x: np.asarray(x, np.float32).astype(jnp.bfloat16)
        if np.asarray(x).dtype == np.float32 else x,
        sam_vars_concrete,
    )
    sam_vars = _abs(sam_vars_bf16)

    def segment_step(sv, imgs):
        high, _low, _iou = sam.apply(sv, imgs)
        return (high[..., 0] > 0).astype(jnp.uint8)

    # shard_map, not bare pjit: the fused Mosaic kernels in the trunk
    # cannot be auto-partitioned by SPMD (this AOT run is what surfaced
    # that — the production wrapper is pipeline/batch._wrap_data_parallel)
    from jax.experimental.shard_map import shard_map

    seg_sharded = shard_map(
        segment_step, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec("data")),
        out_specs=PartitionSpec("data"),
        check_rep=False,
    )
    seg_imgs = jax.ShapeDtypeStruct(
        (B, sam_cfg.resolution, sam_cfg.resolution, 3), jnp.float32
    )
    t0 = time.time()
    compiled = (
        jax.jit(seg_sharded, in_shardings=(rep, bsh), out_shardings=bsh)
        .lower(sam_vars, seg_imgs)
        .compile()
    )
    report["programs"]["segment_sam2_l_1024_b8"] = _mem_report(
        "segment", compiled, time.time() - t0
    )

    # ---- 3. full-size sharded fine-tune step --------------------------
    if not args.skip_train:
        from circuitvision_tpu.parallel.mesh import fsdp_param_shardings
        from circuitvision_tpu.train.train_step import (
            make_optimizer,
            make_train_step,
        )

        tmesh = Mesh(devs.reshape(4, 2), ("data", "model"))
        # f32 master params for training (the serving cast is inference-only)
        train_vars = sam_vars_concrete
        tcfg = TrainConfig()
        tx, mask = make_optimizer(train_vars, tcfg)
        opt_state = jax.eval_shape(tx.init, _abs(train_vars))
        # multichip: module path throughout — FSDP-sharded params cannot
        # feed Mosaic custom calls under SPMD partitioning
        step = make_train_step(sam, tx, tcfg, mask=mask, multichip=True)

        param_sh = fsdp_param_shardings(train_vars, tmesh, axis="model", min_size=1024)
        opt_sh = fsdp_param_shardings(opt_state, tmesh, axis="model", min_size=1024)
        tbsh = NamedSharding(tmesh, PartitionSpec("data"))
        trep = NamedSharding(tmesh, PartitionSpec())
        TB = args.train_per_chip_batch * 4  # data axis = 4

        timgs = jax.ShapeDtypeStruct(
            (TB, sam_cfg.resolution, sam_cfg.resolution, 3), jnp.float32
        )
        tmasks = jax.ShapeDtypeStruct(
            (TB, sam_cfg.resolution, sam_cfg.resolution), jnp.float32
        )
        t0 = time.time()
        compiled = (
            jax.jit(
                step,
                in_shardings=(param_sh, opt_sh, tbsh, tbsh),
                out_shardings=(param_sh, opt_sh, trep),
            )
            .lower(_abs(train_vars), _abs(opt_state), timgs, tmasks)
            .compile()
        )
        report["programs"]["train_sam2_l_selective_b4_fsdp"] = _mem_report(
            "train", compiled, time.time() - t0
        )

    report["ok"] = all(p["fits_16gib_hbm"] for p in report["programs"].values())
    out_path = os.path.join(REPO, "AOT_V5E8.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path}; ok={report['ok']}")


if __name__ == "__main__":
    main()
