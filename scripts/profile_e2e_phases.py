"""Phase-level wall profile of the end-to-end analyze_many path.

Times each sub-phase of BatchedPipeline._device_phase and the consumer
host phases separately (producer/consumer overlap hidden), on the same
oracle workload as bench.py's end-to-end metric.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import copy

from bench import build_models
from circuitvision_tpu.core.config import MeshConfig, PipelineConfig
from circuitvision_tpu.enrich.client import FakeVLMClient
from circuitvision_tpu.eval.synth import make_circuits
from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
from circuitvision_tpu.pipeline.batch import BatchedPipeline

SMOKE = "--smoke" in sys.argv
BATCH = 8

det_cfg, sam_cfg, yolo, yolo_vars, sam, sam_vars = build_models(SMOKE)

circuits = make_circuits()
gt_by_shape = {c.image.shape: c for c in circuits}

analyzer = CircuitAnalyzerTPU(
    config=PipelineConfig(
        detector=det_cfg, sam2=sam_cfg,
        mesh=MeshConfig(batch_per_device=BATCH), use_sam2=True,
    ),
    yolo_variables=yolo_vars,
    sam2_variables=sam_vars,
    use_sam2=True,
    vlm_client=FakeVLMClient(
        directions={"voltage.dc": ("UP", "SIGN"), "voltage.ac": ("UP", "SIGN")}
    ),
)

T = {}


def clock(name):
    class _C:
        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            T[name] = T.get(name, 0.0) + time.perf_counter() - self.t0

    return _C()


class ProfiledPipeline(BatchedPipeline):
    def _detect_bboxes(self, chunk):
        with clock("detect"):
            super()._detect_bboxes(chunk)
        return [copy.deepcopy(gt_by_shape[img.shape].boxes) for img in chunk]

    def _device_phase(self, chunk):
        from circuitvision_tpu.topology.crop import crop_image_and_adjust_bboxes
        from circuitvision_tpu.pipeline.batch import _Staged, _seg_prep_program

        per_image = self._detect_bboxes(chunk)
        staged, seg_inputs = [], []
        with clock("crop"):
            for img, nms_boxes in zip(chunk, per_image):
                crop, bboxes, info = crop_image_and_adjust_bboxes(
                    img, nms_boxes, self.cfg.crop
                )
                staged.append(_Staged(img, crop, nms_boxes, bboxes, info, None))
        with clock("sam2_preprocess+upload"):
            s = self.cfg.sam2.resolution
            crops_dev = jax.device_put([st.crop for st in staged])
            for crop_dev in crops_dev:
                hc, wc = crop_dev.shape[:2]
                seg_inputs.append(_seg_prep_program(hc, wc, s)(crop_dev))
            while len(seg_inputs) < self.batch_size:
                seg_inputs.append(jnp.zeros((s, s, 3), jnp.float32))
            seg_batch = jax.device_put(jnp.stack(seg_inputs), self._bsh)
            jax.block_until_ready(seg_batch)
        with clock("segment_dispatch"):
            logits = self._segment(self.analyzer.sam2_variables or {}, seg_batch)
        with clock("mask_finalize+fetch"):
            packed_dev = []
            for i, st in enumerate(staged):
                hc, wc = st.crop.shape[:2]
                packed, mask_dev = self._mask_program(hc, wc)(logits[i])
                packed_dev.append(packed)
                st.mask_dev = mask_dev
            for st, packed in zip(staged, jax.device_get(packed_dev)):
                wc = st.crop.shape[1]
                st.mask = (
                    np.unpackbits(packed, axis=1)[:, :wc].astype(np.uint8) * 255
                )
        # oracle mask injection (keeps host stages representative)
        for st in staged:
            gt = gt_by_shape[st.image.shape]
            mask = gt.wire_mask
            info = st.crop_info
            if info is not None and info.applied and info.window:
                x0, y0, x1, y1 = info.window
                mask = mask[y0:y1, x0:x1]
            st.mask = mask
            st.mask_dev = None
        return staged

    def analyze_many(self, images, prefetch: int = 2):
        # serial version: no producer thread, so phase times don't overlap
        chunks = [
            list(images[i : i + self.batch_size])
            for i in range(0, len(images), self.batch_size)
        ]
        results = []
        for chunk in chunks:
            item = self._device_phase(chunk)
            with clock("pre_topology(reclassify+enrich)"):
                chunk_results = [self._pre_topology(st) for st in item]
            with clock("extract_nodes"):
                self._extract_nodes_chunk(item, chunk_results)
            with clock("post_topology(netlist+enum)"):
                for st, r in zip(item, chunk_results):
                    results.append(self._post_topology(st, r))
        return results


pipeline = ProfiledPipeline(analyzer)
images = [c.image for c in circuits]
n_images = pipeline.batch_size * 6
workload = [images[i % len(images)] for i in range(n_images)]

pipeline.analyze_many(workload[: pipeline.batch_size])  # warm/compile
T.clear()
t0 = time.perf_counter()
results = pipeline.analyze_many(workload)
dt = time.perf_counter() - t0
n = len(workload)
print(f"serial e2e: {n/dt:.2f} img/s ({dt/n*1000:.1f} ms/img) over {n} images")
for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
    print(f"  {k:36s} {v/n*1000:7.2f} ms/img  {v:6.2f} s total")
print(f"  {'(untimed)':36s} {(dt-sum(T.values()))/n*1000:7.2f} ms/img")
