"""Per-component device timings for the bench path (YOLO / SAM2 / stages)."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.core.config import DetectorConfig, SAM2Config
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter
from circuitvision_tpu.models.sam2.wrapper import init_params as sam2_init
from circuitvision_tpu.models.yolo.decode import decode_predictions, postprocess
from circuitvision_tpu.models.yolo.model import YOLOv11
from circuitvision_tpu.models.yolo.model import init_params as yolo_init

B = 4
det_cfg = DetectorConfig(scale="l", img_size=640, dtype="bfloat16")
sam_cfg = SAM2Config(dtype="bfloat16")
dt = jnp.bfloat16

yolo = YOLOv11(num_classes=62, scale="l", dtype=dt)
yv = yolo_init(yolo, jax.random.PRNGKey(0), img_size=640)
sam = SAM2ImageSegmenter(cfg=sam_cfg, dtype=dt)
sv = sam2_init(sam, jax.random.PRNGKey(1))

rng = np.random.default_rng(0)
det_imgs = jnp.asarray(rng.random((B, 640, 640, 3), np.float32))
seg_imgs = jnp.asarray(rng.random((B, 1024, 1024, 3), np.float32))

def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt_s = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt_s*1000:8.2f} ms/step   {dt_s*1000/B:7.2f} ms/img")
    return dt_s

yolo_fwd = jax.jit(lambda v, x: yolo.apply(v, x))
timeit("yolo forward only", yolo_fwd, yv, det_imgs)

def yolo_full(v, x):
    outs = yolo.apply(v, x)
    boxes, scores = decode_predictions(outs, 16, 62)
    return postprocess(boxes, scores, max_detections=128,
                       conf_threshold=0.25, iou_threshold=0.7)
timeit("yolo fwd+decode+nms", jax.jit(yolo_full), yv, det_imgs)

sam_fwd = jax.jit(lambda v, x: sam.apply(v, x))
timeit("sam2 forward", sam_fwd, sv, seg_imgs)
