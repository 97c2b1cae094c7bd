"""Batched multi-image inference sharded over a TPU mesh.

The throughput path for the ≥50 images/s north star (BASELINE.json),
with the SAME stage semantics as `CircuitAnalyzerTPU.analyze()`
(reference ordering: src/analysis_pipeline.py:97-326):

  device detect (batched, data-sharded) → host confidence-NMS + cluster
  crop → device SAM2 on the CROPPED images (batched) → bilinear logit
  upsample + threshold per crop shape → host reclassify / enrich /
  node-extraction / netlist.

TPU-native design choices:
  * detect and segment are two fixed-shape jit programs with the batch
    dim sharded over the mesh's data axis (pure DP — both models fit on
    one chip, SURVEY.md §2.4);
  * images upload once as uint8; letterboxing, crop slicing and SAM2
    preprocessing run on device so no float canvas ever crosses the
    host↔device link;
  * final masks come back bit-packed (8 pixels/byte) — the mask is the
    only large fetch in the loop and links to remote chips are slow;
  * host post-processing of batch N overlaps the device work of batch
    N+1 via a producer thread.

The only per-image artifact `analyze()` produces that this path skips is
`sam_mask_display` (a full-resolution RGB visualization); everything
that feeds the netlist is identical.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import queue
import threading
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry, taxonomy
from ..core.config import PipelineConfig
from ..core.types import AnalysisResult, BBox
from ..models.yolo.decode import decode_predictions, postprocess
from ..ops.image import letterbox, sam2_preprocess
from ..parallel.mesh import make_mesh
from ..topology.crop import crop_image_and_adjust_bboxes
from ..topology.nodes import extract_nodes
from ..topology.reclassify import reclassify_terminals, segment_classical
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

# Bit weights matching np.unpackbits' big-endian bit order.
_BIT_WEIGHTS = (128, 64, 32, 16, 8, 4, 2, 1)

#: Max images per batched node-extraction call when the DEVICE CC path is
#: in use (the vmapped CC program's compile time and peak memory grow
#: linearly with batch). The default host-CC path has no such constraint
#: and takes whole chunks.
_EXTRACT_SUB_BATCH = 4


@functools.lru_cache(maxsize=128)
def _det_prep_program(h: int, w: int, img_size: int):
    """Jitted uint8 image → normalized letterbox canvas, cached per input
    shape. Run eagerly this chain is ~6 Python-dispatched ops per image —
    at ~0.5 ms of host overhead each on a 1-core host that alone was
    ~16 ms/img of the batched detect stage; jitted it is ONE async
    dispatch (~0.03 ms)."""

    def prep(img_u8):
        canvas, _s, _p = letterbox(img_u8, img_size)
        return canvas / 255.0

    return jax.jit(prep)


@functools.lru_cache(maxsize=128)
def _seg_prep_program(h: int, w: int, resolution: int):
    """Jitted uint8 crop → SAM2-normalized (res, res, 3), cached per crop
    shape (same rationale as _det_prep_program)."""
    return jax.jit(lambda img_u8: sam2_preprocess(img_u8, resolution))


@functools.lru_cache(maxsize=256)
def _seg_crop_prep_program(img_h: int, img_w: int, crop_h: int, crop_w: int,
                           resolution: int):
    """Jitted device-side crop + SAM2 preprocess: slices the crop window
    out of the ALREADY-UPLOADED full image (the detect phase's uint8
    upload) instead of re-uploading the crop pixels from host — the crop
    is most of the image, so this removes the second-largest h→d
    transfer in the loop. Window position is a traced scalar (one
    compile per (image shape, crop shape), not per position)."""

    def prep(img_u8, y0, x0):
        crop = jax.lax.dynamic_slice(
            img_u8, (y0, x0, jnp.int32(0)), (crop_h, crop_w, 3)
        )
        return sam2_preprocess(crop, resolution)

    return jax.jit(prep)


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


@dataclasses.dataclass
class _Staged:
    """Per-image state carried from the device phase to the host phase."""

    image: np.ndarray
    crop: np.ndarray
    bboxes_orig_nms: list
    bboxes: list
    crop_info: object
    mask: Optional[np.ndarray]  # (hc, wc) uint8 0/255 or None
    #: device-resident full image (the detect phase's uint8 upload),
    #: reused by the segment phase to slice the crop ON DEVICE instead
    #: of re-uploading it; None when detection was overridden without a
    #: device upload (host-crop upload fallback).
    image_dev: Optional[object] = None
    #: device-resident copy of `mask` (same values) — feeds the batched
    #: topology stage without a host→device re-upload. None when the mask
    #: came from the host (classical fallback) or was overridden.
    mask_dev: Optional[object] = None
    #: stage-A analysis raster prepared in the segment thread with an
    #: async host copy already in flight (topology.nodes.PackedRaster) —
    #: the consumer's node extraction then skips its own device round
    #: trip (~6 ms/img of d2h tunnel time off the critical path).
    packed_raster: Optional[object] = None
    #: bit-packed full-res mask with an async host copy in flight; the
    #: consumer materializes `mask` from it (same overlap rationale).
    mask_packed_dev: Optional[object] = None


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
        n_data_axis = self.mesh.shape[self.cfg.mesh.data_axis]
        if n_data_axis > 1:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            dp = P(self.cfg.mesh.data_axis)
            combined = shard_map(
                self._device_step, mesh=self.mesh,
                in_specs=(P(), P(), dp, dp),
                out_specs=(dp, dp, dp, dp, dp),
                check_rep=False,
            )
        else:
            combined = self._device_step
        self._step = jax.jit(
            combined,
            in_shardings=(self._rep, self._rep, self._bsh, self._bsh),
            out_shardings=self._bsh,
        )
        self._detect = jax.jit(
            self._detect_step,
            in_shardings=(self._rep, self._bsh),
            out_shardings=self._bsh,
        )
        self._segment = (
            jax.jit(
                self._wrap_data_parallel(self._segment_step),
                in_shardings=(self._rep, self._bsh),
                out_shardings=self._bsh,
            )
            if self.analyzer.sam2 is not None
            else None
        )
        self._mask_fns: dict = {}  # (h, w) → jitted finalize program
        self._chunk_imgs_dev = None  # detect-upload handoff (crop-on-device)

    def _wrap_data_parallel(self, step_fn):
        """Make a (replicated_params, batch) step partitionable over the
        data axis. With >1 device in the data axis, the SAM2 trunk's
        fused Mosaic kernels cannot be auto-partitioned by XLA's SPMD
        pass ("Mosaic kernels cannot be automatically partitioned") —
        shard_map runs the whole step per-device on its local batch
        shard, which is exactly the pure-DP serving scheme anyway. One
        device: plain jit (no wrapper overhead)."""
        n_data = self.mesh.shape[self.cfg.mesh.data_axis]
        if n_data <= 1:
            return step_fn
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        return shard_map(
            step_fn,
            mesh=self.mesh,
            in_specs=(P(), P(self.cfg.mesh.data_axis)),
            out_specs=P(self.cfg.mesh.data_axis),
            check_rep=False,
        )

    # -- device programs -------------------------------------------------
    def _detect_step(self, yolo_vars, det_imgs):
        """YOLO forward + DFL decode + device NMS on a letterboxed batch."""
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
        return dets.boxes, dets.scores, dets.classes, dets.valid

    def _segment_step(self, sam_vars, seg_imgs):
        """SAM2 forward: (B, S, S, 3) preprocessed → (B, S, S) mask logits."""
        high, _low, _iou = self.analyzer.sam2.apply(sam_vars, seg_imgs)
        return high[..., 0].astype(jnp.float32)

    def _device_step(self, yolo_vars, sam_vars, det_imgs, seg_imgs):
        """Legacy combined step for `run_batch`: detect + S-resolution mask."""
        boxes, scores, classes, valid = self._detect_step(yolo_vars, det_imgs)
        if self.analyzer.sam2 is not None:
            logits = self._segment_step(sam_vars, seg_imgs)
            masks = (logits > self.cfg.sam2.mask_threshold).astype(jnp.uint8)
        else:
            s = self.cfg.sam2.resolution
            masks = jnp.zeros((det_imgs.shape[0], s, s), jnp.uint8)
        return boxes, scores, classes, valid, masks

    def _mask_program(self, h: int, w: int):
        """Jitted per-crop-shape finalize: S² logits → bilinear upsample to
        (h, w) → threshold → (bit-packed rows, device mask).

        The bilinear-then-threshold order matches `segment_with_sam2`
        (analyzer.py) and the reference's SAM2Transforms postprocessing
        (src/sam2_infer.py:117-121); packing (np.unpackbits order) is
        lossless and cuts the only large device→host fetch in the loop by
        8×. The unpacked 0/255 mask is returned as a second output that
        stays device-resident for the batched topology stage.
        """
        fn = self._mask_fns.get((h, w))
        if fn is None:
            thr = self.cfg.sam2.mask_threshold
            w8 = (w + 7) // 8

            def finalize(logits):
                full = jax.image.resize(
                    logits, (h, w), method="linear", antialias=False
                )  # torch F.interpolate default (src/sam2_infer.py:117)
                m = (full > thr).astype(jnp.uint32)
                padded = jnp.pad(m, ((0, 0), (0, w8 * 8 - w)))
                bits = padded.reshape(h, w8, 8)
                weights = jnp.asarray(_BIT_WEIGHTS, jnp.uint32)
                packed = (bits * weights).sum(-1).astype(jnp.uint8)
                return packed, (m * 255).astype(jnp.uint8)

            fn = jax.jit(finalize)
            self._mask_fns[(h, w)] = fn
        return fn

    # -- host staging ---------------------------------------------------
    def _prepare(self, images: Sequence[np.ndarray]):
        det = self.cfg.detector
        s = self.cfg.sam2.resolution
        b = self.batch_size
        det_batch = np.zeros((b, det.img_size, det.img_size, 3), np.float32)
        seg_batch = np.zeros((b, s, s, 3), np.float32)
        scales = np.ones(b, np.float32)
        pads = np.zeros((b, 2), np.float32)
        sam2_on = self.analyzer.sam2 is not None
        for i, img in enumerate(images):
            canvas, scale, pad = letterbox(jnp.asarray(img), det.img_size)
            det_batch[i] = np.asarray(canvas) / 255.0
            if sam2_on:  # the device step ignores seg input when disabled
                seg_batch[i] = np.asarray(sam2_preprocess(jnp.asarray(img), s))
            scales[i] = float(scale)
            pads[i] = np.asarray(pad)
        return det_batch, seg_batch, scales, pads

    def run_batch(self, images: Sequence[np.ndarray]) -> BatchOutputs:
        """Detect + segment up to batch_size images in one device step.

        Low-level API: full-image segmentation at SAM resolution, no crop
        or host topology. `analyze_many` is the full-pipeline path.
        """
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

    # -- full-pipeline phases --------------------------------------------
    def _detect_bboxes(self, chunk: Sequence[np.ndarray]) -> list[list[BBox]]:
        """Batched device detection → per-image confidence-NMS'd BBoxes.

        Mirrors analyze() stage [1]: letterbox (device, from the uint8
        upload) → YOLO+decode+NMS (one sharded program) → unletterbox →
        rounded BBoxes → dict-level confidence NMS.
        """
        det = self.cfg.detector
        # One device_put for all uploads: the per-image transfers overlap
        # instead of paying a serial round trip each. Retained on self so
        # the crop phase can hand the device-resident images to the
        # segment phase (crop-on-device; see _seg_crop_prep_program).
        imgs_dev = jax.device_put(list(chunk))
        self._chunk_imgs_dev = imgs_dev
        canvases = []
        meta = []  # (scale, pad_x, pad_y, w, h)
        for img, img_dev in zip(chunk, imgs_dev):
            h, w = img.shape[:2]
            scale = min(det.img_size / h, det.img_size / w)
            canvases.append(_det_prep_program(h, w, det.img_size)(img_dev))
            pad_y = (det.img_size - int(round(h * scale))) // 2
            pad_x = (det.img_size - int(round(w * scale))) // 2
            meta.append((scale, pad_x, pad_y, w, h))
        while len(canvases) < self.batch_size:
            canvases.append(jnp.zeros_like(canvases[0]))
        det_batch = jax.device_put(jnp.stack(canvases), self._bsh)
        boxes, scores, classes, valid = jax.device_get(
            self._detect(self.analyzer.yolo_variables, det_batch)
        )
        out: list[list[BBox]] = []
        for i, (scale, px, py, w, h) in enumerate(meta):
            # Vectorized unletterbox (models/yolo/decode.py:105 semantics)
            # over only the valid rows — a Python walk of all
            # max_detections rows costs several ms/img on a 1-core host.
            vi = np.nonzero(valid[i])[0]
            # float32 throughout: analyze() runs unletterbox_boxes inside
            # the f32 jit program with f32(scale); doing this in float64
            # can land round() on a different integer near .5 boundaries
            # and break batch-vs-single netlist equality by one pixel.
            b = boxes[i, vi].astype(np.float32)
            s32, px32, py32 = np.float32(scale), np.float32(px), np.float32(py)
            x0 = np.clip((b[:, 0] - px32) / s32, np.float32(0), np.float32(w))
            y0 = np.clip((b[:, 1] - py32) / s32, np.float32(0), np.float32(h))
            x1 = np.clip((b[:, 2] - px32) / s32, np.float32(0), np.float32(w))
            y1 = np.clip((b[:, 3] - py32) / s32, np.float32(0), np.float32(h))
            bxs = [
                BBox(
                    class_name=taxonomy.ID_TO_NAME.get(int(classes[i, d]), "unknown"),
                    confidence=float(scores[i, d]),
                    xmin=round(float(x0[j])),
                    ymin=round(float(y0[j])),
                    xmax=round(float(x1[j])),
                    ymax=round(float(y1[j])),
                    class_id=int(classes[i, d]),
                )
                for j, d in enumerate(vi)
            ]
            out.append(
                geometry.nms_by_confidence(bxs, iou_threshold=self.cfg.nms.iou_threshold)
            )
        return out

    def _detect_crop_phase(self, chunk: Sequence[np.ndarray]) -> list[_Staged]:
        """Stages [1]-[2a] for one chunk: detect → cluster crop."""
        self._chunk_imgs_dev = None
        per_image = self._detect_bboxes(chunk)
        imgs_dev = self._chunk_imgs_dev or [None] * len(chunk)
        self._chunk_imgs_dev = None

        staged: list[_Staged] = []
        for img, img_dev, nms_boxes in zip(chunk, imgs_dev, per_image):
            crop, bboxes, info = crop_image_and_adjust_bboxes(
                img, nms_boxes, self.cfg.crop
            )
            if img_dev is not None and tuple(img_dev.shape) != img.shape:
                img_dev = None  # detection override skipped the upload
            staged.append(
                _Staged(img, crop, nms_boxes, bboxes, info, None,
                        image_dev=img_dev)
            )
        return staged

    def _segment_phase(self, staged: list[_Staged]) -> list[_Staged]:
        """Stage [2b] for one chunk: SAM2 on the crops (or classical
        fallback), masks fetched bit-packed."""
        logits = None
        if self._segment is not None:
            try:
                # Crops slice on device from the detect phase's uploads
                # where available; only images whose upload was skipped
                # (detection overrides) pay a host crop upload.
                s = self.cfg.sam2.resolution
                pend = [st for st in staged if st.image_dev is None]
                pend_dev = iter(
                    jax.device_put([st.crop for st in pend]) if pend else []
                )
                seg_inputs = []
                for st in staged:
                    hc, wc = st.crop.shape[:2]
                    if st.image_dev is not None:
                        ih, iw = st.image.shape[:2]
                        y0 = x0 = 0
                        info = st.crop_info
                        if info is not None and getattr(info, "applied", False) \
                                and getattr(info, "window", None):
                            x0, y0 = int(info.window[0]), int(info.window[1])
                        seg_inputs.append(
                            _seg_crop_prep_program(ih, iw, hc, wc, s)(
                                st.image_dev,
                                jnp.int32(y0), jnp.int32(x0),
                            )
                        )
                    else:
                        seg_inputs.append(
                            _seg_prep_program(hc, wc, s)(next(pend_dev))
                        )
                while len(seg_inputs) < self.batch_size:
                    seg_inputs.append(jnp.zeros((s, s, 3), jnp.float32))
                seg_batch = jax.device_put(jnp.stack(seg_inputs), self._bsh)
                logits = self._segment(
                    self.analyzer.sam2_variables or {}, seg_batch
                )
            except Exception:
                logger.exception("batched SAM2 segmentation failed")
                logits = None

        if logits is not None:
            # Dispatch every per-crop finalize program and start async
            # host copies of the packed masks; the consumer materializes
            # them (_materialize_masks) after the transfer has overlapped
            # with this thread's next chunk of device work.
            for i, st in enumerate(staged):
                hc, wc = st.crop.shape[:2]
                packed, mask_dev = self._mask_program(hc, wc)(logits[i])
                st.mask_dev = mask_dev
                st.mask_packed_dev = packed
                try:
                    packed.copy_to_host_async()
                except Exception:  # pragma: no cover
                    pass
        elif self.analyzer.classical_fallback:
            for st in staged:
                st.mask = np.asarray(segment_classical(st.crop, self.cfg.topology))
        self._prepare_packed_rasters(staged)
        return staged

    def _prepare_packed_rasters(self, staged: Sequence[_Staged]) -> None:
        """Dispatch the topology stage-A program per image and start the
        async packed-raster fetches (see _Staged.packed_raster). Safe to
        run before reclassify/enrich: stage-A only subtracts non-preserved
        boxes, and those stages never change preserve-set membership or
        coordinates (prepare_packed_raster docstring)."""
        from ..topology.nodes import prepare_packed_raster

        for st in staged:
            mask = st.mask_dev if st.mask_dev is not None else st.mask
            if mask is None:
                continue
            try:
                st.packed_raster = prepare_packed_raster(
                    mask, st.bboxes, self.cfg.topology
                )
            except Exception:
                logger.exception("stage-A raster prep failed; deferring")
                st.packed_raster = None

    def _materialize_masks(self, staged: Sequence[_Staged]) -> None:
        """Batched get of the (already async-copied) packed masks →
        unpack into st.mask."""
        pend = [
            st for st in staged
            if st.mask is None and st.mask_packed_dev is not None
        ]
        if not pend:
            return
        packed_host = jax.device_get([st.mask_packed_dev for st in pend])
        for st, packed in zip(pend, packed_host):
            wc = st.crop.shape[1]
            st.mask = (
                np.unpackbits(packed, axis=1)[:, :wc].astype(np.uint8) * 255
            )

    def _device_phase(self, chunk: Sequence[np.ndarray]) -> list[_Staged]:
        """Stages [1]-[2b] for one chunk: detect → crop → SAM2 on crops."""
        staged = self._segment_phase(self._detect_crop_phase(chunk))
        self._materialize_masks(staged)
        return staged

    def _pre_topology(self, st: _Staged) -> AnalysisResult:
        """Stage [3] for one image: reclassify. Same degradation ladders
        and logging as analyze() — no silent failures. Stage [4]
        (direction enrichment) runs per CHUNK in _enrich_chunk."""
        cfg = self.cfg
        result = AnalysisResult(
            original_image=st.image,
            image_for_analysis=st.crop,
            bboxes_orig_nms=st.bboxes_orig_nms,
            bboxes=st.bboxes,
            crop_info=st.crop_info,
            sam_mask=st.mask,
        )

        try:
            result.bboxes = reclassify_terminals(st.crop, result.bboxes, cfg.topology)
        except Exception:
            logger.exception("terminal reclassification failed; continuing")

        return result

    def _enrich_chunk(
        self, staged: Sequence[_Staged], results: Sequence[AnalysisResult]
    ) -> None:
        """Stage [4] for a whole chunk: ONE get_directions_batch dispatch
        for every eligible crop of every image when the client batches
        (the on-TPU reader — a per-image call would cost a full decode
        dispatch each); per-image concurrent path otherwise
        (enrich_directions_many)."""
        from ..enrich.directions import enrich_directions_many

        try:
            enriched = enrich_directions_many(
                [st.crop for st in staged],
                [r.bboxes for r in results],
                self.analyzer.vlm_client,
                self.cfg.enrich,
                debug_stores=[r.vlm_direction_crops for r in results],
            )
            for r, boxes in zip(results, enriched):
                r.bboxes = boxes
        except Exception:
            logger.exception("direction enrichment failed; continuing")

    def _extract_nodes_chunk(
        self, staged: Sequence[_Staged], results: Sequence[AnalysisResult]
    ) -> None:
        """Stage [5] for a whole chunk: ONE batched device program + fetch
        for every image with a wire mask (extract_nodes_batched); masks
        produced by the SAM2 finalize program are consumed device-resident
        (no re-upload). Falls back to per-image extraction on error."""
        from ..topology.nodes import extract_nodes_batched, finish_from_packed

        idx = [i for i, r in enumerate(results) if r.sam_mask is not None]
        for i, r in enumerate(results):
            if r.sam_mask is None:
                logger.warning("node analysis skipped: no wire mask available")
        if not idx:
            return
        try:
            pre = [i for i in idx if staged[i].packed_raster is not None]
            rest = [i for i in idx if staged[i].packed_raster is None]
            if pre:
                # Rasters were prepared in the segment thread with async
                # host copies in flight; this get is (near-)instant.
                packed_host = jax.device_get(
                    [staged[i].packed_raster.packed_dev for i in pre]
                )
                for i, ph in zip(pre, packed_host):
                    ex = finish_from_packed(
                        ph,
                        staged[i].packed_raster,
                        results[i].bboxes,
                        self.cfg.topology,
                    )
                    results[i].nodes = ex.nodes
            if rest:
                extractions = extract_nodes_batched(
                    [
                        staged[i].mask_dev
                        if staged[i].mask_dev is not None
                        else results[i].sam_mask
                        for i in rest
                    ],
                    [results[i].bboxes for i in rest],
                    self.cfg.topology,
                    pad_to=min(len(rest), self.batch_size),
                )
                for i, ex in zip(rest, extractions):
                    results[i].nodes = ex.nodes
        except Exception:
            logger.exception("batched node analysis failed; per-image fallback")
            for i in idx:
                try:
                    ex = extract_nodes(
                        results[i].sam_mask,
                        results[i].bboxes,
                        self.cfg.topology,
                        fetch_viz=False,
                    )
                    results[i].nodes = ex.nodes
                except Exception:
                    logger.exception("node analysis failed; continuing")

    def _post_topology(self, st: _Staged, result: AnalysisResult) -> AnalysisResult:
        """Stage [6] for one image: netlist + enumeration + stats
        (delegates to the analyzer's shared netlist_stage so the batched
        and per-image paths cannot diverge)."""
        self.analyzer.netlist_stage(result, st.crop)
        result.component_stats = self.analyzer._component_stats(result.bboxes_orig_nms)
        return result

    def analyze_many(
        self,
        images: Sequence[np.ndarray],
        prefetch: int = 2,
        finalize: bool = False,
    ) -> list[AnalysisResult]:
        """Full pipeline over many images with analyze() semantics, run as
        a three-stage thread pipeline over chunks:

          [detect+crop thread] → [segment thread] → [host topology, here]

        Splitting detect and segment into separate threads matters on
        remote-attached chips: each stage ends in a blocking fetch (boxes,
        packed masks), and within one chunk detect → crop → segment is
        serial (crop needs boxes). With two stages, SAM2 compute of chunk
        N overlaps the detect round trip of chunk N+1, so steady-state
        throughput is max(stage) rather than sum(stages).

        ``finalize=True`` additionally runs the batched VLM stage-2 value
        pass (analyzer.finalize_netlists) on each CHUNK inside the
        consumer loop instead of as a serial second sweep: the value-read
        decode of chunk N rides the same device queue as chunk N+1's
        SAM2 compute, and its host half (enum-image staging, response
        parse, fix_netlist merge) overlaps device work that a serial
        finalize pays for twice. Netlist output is identical to
        analyze_many() + finalize_netlists() — same per-chunk batching,
        same failure ladder (pinned by tests/test_batch_parity.py)."""
        chunks = [
            list(images[i : i + self.batch_size])
            for i in range(0, len(images), self.batch_size)
        ]

        q1: "queue.Queue" = queue.Queue(maxsize=prefetch)
        q2: "queue.Queue" = queue.Queue(maxsize=prefetch)
        # Error-path shutdown: once the consumer sees an exception it stops
        # draining, so unconditional blocking put/get would deadlock the
        # workers on the bounded queues (and then the joins below). All
        # worker queue ops therefore poll `stop`.
        stop = threading.Event()

        def _put(q, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def _get(q):
            while True:
                try:
                    return q.get(timeout=0.1)
                except queue.Empty:
                    if stop.is_set():
                        return None

        def detect_worker():
            try:
                for chunk in chunks:
                    if stop.is_set():
                        break
                    if not _put(q1, self._detect_crop_phase(chunk)):
                        return
            except Exception as e:  # surfaced to caller
                _put(q1, e)
            _put(q1, None)

        def segment_worker():
            while True:
                item = _get(q1)
                if item is None or isinstance(item, Exception):
                    _put(q2, item)
                    if item is None:
                        return
                    continue
                try:
                    if not _put(q2, self._segment_phase(item)):
                        return
                except Exception as e:  # surfaced to caller
                    _put(q2, e)

        t1 = threading.Thread(target=detect_worker, daemon=True)
        t2 = threading.Thread(target=segment_worker, daemon=True)
        t1.start()
        t2.start()

        results: list[AnalysisResult] = []
        try:
            while True:
                item = q2.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                self._materialize_masks(item)
                chunk_results = [self._pre_topology(st) for st in item]
                self._enrich_chunk(item, chunk_results)
                self._extract_nodes_chunk(item, chunk_results)
                chunk_results = [
                    self._post_topology(st, r)
                    for st, r in zip(item, chunk_results)
                ]
                if finalize:
                    chunk_results = self.analyzer.finalize_netlists(
                        chunk_results, chunk_size=self.batch_size
                    )
                results.extend(chunk_results)
        finally:
            # Consumer-raised exceptions (host topology stages) must stop
            # the workers too, or they spin on the bounded queues forever
            # (two leaked threads pinning staged device buffers).
            stop.set()
            t1.join()
            t2.join()
        return results
