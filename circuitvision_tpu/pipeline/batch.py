"""Batched multi-image inference sharded over a TPU mesh.

The throughput path for the ≥50 images/s north star (BASELINE.json):
host threads decode/letterbox images and fill fixed-shape device batches;
one jit program per batch runs YOLO detect (+device NMS) and SAM2
segmentation with the batch dim sharded over the mesh's data axis (pure
DP — both models fit on one chip, SURVEY.md §2.4); host post-processing
(topology → netlist) overlaps with the next batch's device step.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PipelineConfig
from ..core.types import AnalysisResult, BBox
from ..models.yolo.decode import decode_predictions, postprocess
from ..ops.image import letterbox, sam2_preprocess
from ..parallel.mesh import make_mesh
from jax.sharding import Mesh, NamedSharding, PartitionSpec


@dataclasses.dataclass
class BatchOutputs:
    """Per-batch device outputs, already on host."""

    boxes: np.ndarray  # (B, MAX_DET, 4) in letterbox pixels
    scores: np.ndarray
    classes: np.ndarray
    valid: np.ndarray
    masks: np.ndarray  # (B, S, S) uint8 at SAM resolution
    scales: np.ndarray  # (B,) letterbox scale per image
    pads: np.ndarray  # (B, 2)


class BatchedPipeline:
    """Fixed-batch detect+segment executor over a device mesh."""

    def __init__(
        self,
        analyzer,
        mesh: Optional[Mesh] = None,
        batch_size: Optional[int] = None,
    ):
        self.analyzer = analyzer
        self.cfg: PipelineConfig = analyzer.cfg
        self.mesh = mesh if mesh is not None else make_mesh(self.cfg.mesh)
        n_data = self.mesh.shape[self.cfg.mesh.data_axis]
        self.batch_size = batch_size or (self.cfg.mesh.batch_per_device * n_data)
        if self.batch_size % n_data != 0:
            raise ValueError(
                f"batch {self.batch_size} not divisible by data axis {n_data}"
            )
        self._bsh = NamedSharding(self.mesh, PartitionSpec(self.cfg.mesh.data_axis))
        self._rep = NamedSharding(self.mesh, PartitionSpec())
        self._step = jax.jit(
            self._device_step,
            in_shardings=(self._rep, self._rep, self._bsh, self._bsh),
            out_shardings=self._bsh,
        )

    # -- device program -------------------------------------------------
    def _device_step(self, yolo_vars, sam_vars, det_imgs, seg_imgs):
        det = self.cfg.detector
        outs = self.analyzer.yolo.apply(yolo_vars, det_imgs)
        boxes, scores = decode_predictions(outs, det.reg_max, det.num_classes)
        dets = postprocess(
            boxes,
            scores,
            max_detections=det.max_detections,
            conf_threshold=det.conf_threshold,
            iou_threshold=det.iou_threshold,
        )
        if self.analyzer.sam2 is not None:
            high, _low, _iou = self.analyzer.sam2.apply(sam_vars, seg_imgs)
            masks = (high[..., 0] > self.cfg.sam2.mask_threshold).astype(jnp.uint8)
        else:
            s = self.cfg.sam2.resolution
            masks = jnp.zeros((det_imgs.shape[0], s, s), jnp.uint8)
        return dets.boxes, dets.scores, dets.classes, dets.valid, masks

    # -- host staging ---------------------------------------------------
    def _prepare(self, images: Sequence[np.ndarray]):
        det = self.cfg.detector
        s = self.cfg.sam2.resolution
        b = self.batch_size
        det_batch = np.zeros((b, det.img_size, det.img_size, 3), np.float32)
        seg_batch = np.zeros((b, s, s, 3), np.float32)
        scales = np.ones(b, np.float32)
        pads = np.zeros((b, 2), np.float32)
        for i, img in enumerate(images):
            canvas, scale, pad = letterbox(jnp.asarray(img), det.img_size)
            det_batch[i] = np.asarray(canvas) / 255.0
            seg_batch[i] = np.asarray(sam2_preprocess(jnp.asarray(img), s))
            scales[i] = float(scale)
            pads[i] = np.asarray(pad)
        return det_batch, seg_batch, scales, pads

    def run_batch(self, images: Sequence[np.ndarray]) -> BatchOutputs:
        """Detect + segment up to batch_size images in one device step."""
        assert len(images) <= self.batch_size
        det_batch, seg_batch, scales, pads = self._prepare(images)
        det_dev = jax.device_put(jnp.asarray(det_batch), self._bsh)
        seg_dev = jax.device_put(jnp.asarray(seg_batch), self._bsh)
        boxes, scores, classes, valid, masks = self._step(
            self.analyzer.yolo_variables,
            self.analyzer.sam2_variables or {},  # {} when SAM2 disabled
            det_dev,
            seg_dev,
        )
        return BatchOutputs(
            boxes=np.asarray(boxes),
            scores=np.asarray(scores),
            classes=np.asarray(classes),
            valid=np.asarray(valid),
            masks=np.asarray(masks),
            scales=scales,
            pads=pads,
        )

    def analyze_many(
        self, images: Sequence[np.ndarray], prefetch: int = 2
    ) -> list[AnalysisResult]:
        """Full pipeline over many images: double-buffered device batches
        with host topology/netlist overlapped on the previous batch."""
        from ..core import taxonomy, geometry
        from ..netlist.generate import generate_netlist_from_nodes, stringify_netlist
        from ..topology.nodes import extract_nodes

        results: list[AnalysisResult] = []
        chunks = [
            list(images[i : i + self.batch_size])
            for i in range(0, len(images), self.batch_size)
        ]

        out_q: "queue.Queue" = queue.Queue(maxsize=prefetch)

        def producer():
            for chunk in chunks:
                out_q.put((chunk, self.run_batch(chunk)))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        det = self.cfg.detector
        while True:
            item = out_q.get()
            if item is None:
                break
            chunk, out = item
            for i, img in enumerate(chunk):
                h, w = img.shape[:2]
                bxs = []
                for d in range(det.max_detections):
                    if not out.valid[i, d]:
                        continue
                    sc, (px, py) = out.scales[i], out.pads[i]
                    x0 = (out.boxes[i, d, 0] - px) / sc
                    y0 = (out.boxes[i, d, 1] - py) / sc
                    x1 = (out.boxes[i, d, 2] - px) / sc
                    y1 = (out.boxes[i, d, 3] - py) / sc
                    name = taxonomy.ID_TO_NAME.get(int(out.classes[i, d]), "unknown")
                    bxs.append(
                        BBox(
                            class_name=name,
                            confidence=float(out.scores[i, d]),
                            xmin=round(max(0.0, min(float(x0), w))),
                            ymin=round(max(0.0, min(float(y0), h))),
                            xmax=round(max(0.0, min(float(x1), w))),
                            ymax=round(max(0.0, min(float(y1), h))),
                            class_id=int(out.classes[i, d]),
                        )
                    )
                bxs = geometry.nms_by_confidence(bxs, self.cfg.nms.iou_threshold)
                mask_full = np.asarray(
                    jax.image.resize(
                        jnp.asarray(out.masks[i], jnp.float32), (h, w), method="nearest"
                    )
                ).astype(np.uint8) * 255

                result = AnalysisResult(
                    original_image=img, image_for_analysis=img,
                    bboxes_orig_nms=bxs, bboxes=bxs, sam_mask=mask_full,
                )
                try:
                    extraction = extract_nodes(mask_full, bxs, self.cfg.topology, fetch_viz=False)
                    result.nodes = extraction.nodes
                    result.netlist = generate_netlist_from_nodes(result.nodes)
                    result.netlist_text = stringify_netlist(result.netlist)
                    result.valueless_netlist_text = result.netlist_text
                except Exception:
                    pass
                results.append(result)
        t.join()
        return results
