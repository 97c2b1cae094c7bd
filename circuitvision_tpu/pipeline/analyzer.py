"""CircuitAnalyzerTPU — the end-to-end image → netlist pipeline.

The TPU-native counterpart of the reference's CircuitAnalyzer
(src/circuit_analyzer.py:38) + analysis_pipeline stage functions
(src/analysis_pipeline.py:97-393), restructured as an explicit dataflow
over `AnalysisResult` instead of a mutated session dict:

  [1] detect        — YOLOv11 jit forward + device decode/NMS (+ the
                      reference's dict-level confidence NMS at IoU 0.6)
  [2] crop+segment  — cluster crop (host box math), SAM2 jit forward
  [3] reclassify    — terminal→source reclassification (classical mask)
  [4] enrich        — VLM polarity directions (batched; optional)
  [5] nodes         — device topology extraction
  [6] netlist       — valueless netlist + enumerated image
  [7] final netlist — VLM values merge (fix_netlist)
  [8] simulate      — DC/AC via the MNA engine

Every degradation ladder of the reference is preserved (SURVEY.md §5):
no SAM2 → optional classical-mask fallback or skipped node analysis;
node-analysis exception → continue; no nodes → components-only netlist;
VLM failure → keep the valueless netlist; no VLM client → UNKNOWN
directions.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry, taxonomy
from ..core.config import PipelineConfig, compute_dtype
from ..core.types import AnalysisResult, BBox, StageTimings
from ..enrich.client import VLMClient, default_client
from ..enrich.directions import enrich_directions
from ..models.sam2.wrapper import SAM2ImageSegmenter
from ..models.sam2.wrapper import init_params as sam2_init
from ..models.yolo.decode import decode_predictions, postprocess, unletterbox_boxes
from ..models.yolo.model import YOLOv11
from ..models.yolo.model import init_params as yolo_init
from ..netlist.fix import fix_netlist
from ..netlist.generate import (
    generate_fallback_netlist,
    generate_netlist_from_nodes,
    stringify_netlist,
)
from ..ops.image import letterbox, sam2_preprocess
from ..sim.engine import perform_ac_analysis, perform_dc_analysis
from ..netlist.values import detect_analysis_mode
from ..topology.crop import crop_image_and_adjust_bboxes
from ..topology.enumerate_components import enumerate_components
from ..topology.nodes import extract_nodes
from ..topology.reclassify import reclassify_terminals, segment_classical

logger = logging.getLogger(__name__)


class CircuitAnalyzerTPU:
    """Image-of-circuit → SPICE netlist, TPU-resident compute path."""

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        yolo_variables: Optional[dict] = None,
        sam2_variables: Optional[dict] = None,
        vlm_client: Optional[VLMClient] = None,
        use_sam2: Optional[bool] = None,
        classical_fallback: bool = True,
        seed: int = 0,
    ):
        self.cfg = config or PipelineConfig()
        self.use_sam2 = self.cfg.use_sam2 if use_sam2 is None else use_sam2
        #: when SAM2 is unavailable, run node analysis on the classical
        #: adaptive-threshold mask instead of skipping it (the reference
        #: skips; set False for strict parity with that behavior).
        self.classical_fallback = classical_fallback
        self.vlm_client = (
            vlm_client
            if vlm_client is not None
            else default_client(self.cfg.enrich)
        )

        dt = compute_dtype(self.cfg.detector.dtype)
        self.yolo = YOLOv11(
            num_classes=self.cfg.detector.num_classes,
            scale=self.cfg.detector.scale,
            reg_max=self.cfg.detector.reg_max,
            dtype=dt,
        )
        rng = jax.random.PRNGKey(seed)
        self.yolo_variables = (
            yolo_variables
            if yolo_variables is not None
            else yolo_init(self.yolo, rng, img_size=self.cfg.detector.img_size)
        )
        # Converted checkpoints (and flax init) hold float32 params even
        # for bf16 models; cast once here instead of every step on device.
        from ..models.initialization import cast_float_params

        self.yolo_variables = cast_float_params(self.yolo_variables, dt)

        self.sam2 = None
        self.sam2_variables = None
        if self.use_sam2:
            try:
                sdt = compute_dtype(self.cfg.sam2.dtype)
                self.sam2 = SAM2ImageSegmenter(cfg=self.cfg.sam2, dtype=sdt)
                if sam2_variables is not None:
                    # Native-width checkpoints auto-pad when the config
                    # asks for MXU channel padding (ADVICE r2 #1).
                    from ..models.sam2.padding import maybe_pad_trunk_variables

                    self.sam2_variables = maybe_pad_trunk_variables(
                        sam2_variables, self.cfg.sam2
                    )
                else:
                    self.sam2_variables = sam2_init(
                        self.sam2, jax.random.fold_in(rng, 1)
                    )
                self.sam2_variables = cast_float_params(
                    self.sam2_variables, sdt
                )
            except Exception:
                logger.exception("SAM2 initialization failed; disabling SAM2")
                self.use_sam2 = False
                self.sam2 = None
                self.sam2_variables = None

        self._jit_detect = jax.jit(self._detect_device)
        # The heavy SAM2 forward compiles once at the fixed model
        # resolution; the shape-varying pre/post resizes run as separate
        # tiny programs so new crop sizes never recompile the trunk.
        self._jit_segment_core = (
            jax.jit(self._segment_core) if self.sam2 else None
        )

    # ------------------------------------------------------------------
    # Device programs
    # ------------------------------------------------------------------
    def _detect_device(self, variables, img_u8):
        """letterbox → YOLO → decode → device NMS. One jit program."""
        det = self.cfg.detector
        canvas, scale, pads = letterbox(img_u8, det.img_size)
        outs = self.yolo.apply(variables, (canvas / 255.0)[None])
        boxes, scores = decode_predictions(outs, det.reg_max, det.num_classes)
        dets = postprocess(
            boxes,
            scores,
            max_detections=det.max_detections,
            conf_threshold=det.conf_threshold,
            iou_threshold=det.iou_threshold,
        )
        h, w = img_u8.shape[:2]
        mapped = unletterbox_boxes(dets.boxes[0], scale, pads, w, h)
        return mapped, dets.scores[0], dets.classes[0], dets.valid[0]

    def _segment_core(self, variables, x):
        """Fixed-shape SAM2 forward on a preprocessed (1, S, S, 3) batch."""
        high, low, iou = self.sam2.apply(variables, x)
        return high[..., 0], iou

    # ------------------------------------------------------------------
    # Stage API (mirrors the reference public surface)
    # ------------------------------------------------------------------
    def bboxes(self, image_rgb: np.ndarray) -> list[BBox]:
        """YOLO detections as BBoxes with rounded coords + persistent uids
        (reference CircuitAnalyzer.bboxes, src/circuit_analyzer.py:267-287)."""
        boxes, scores, classes, valid = self._jit_detect(
            self.yolo_variables, jnp.asarray(image_rgb)
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        classes = np.asarray(classes)
        valid = np.asarray(valid)
        out = []
        for i in range(len(valid)):
            if not valid[i]:
                continue
            name = taxonomy.ID_TO_NAME.get(int(classes[i]), "unknown")
            out.append(
                BBox(
                    class_name=name,
                    confidence=float(scores[i]),
                    xmin=round(float(boxes[i, 0])),
                    ymin=round(float(boxes[i, 1])),
                    xmax=round(float(boxes[i, 2])),
                    ymax=round(float(boxes[i, 3])),
                    class_id=int(classes[i]),
                )
            )
        return out

    def segment_with_sam2(
        self, image_rgb: np.ndarray
    ) -> tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """Binary wire mask (0/255) + green display copy at original
        resolution (reference segment_with_sam2,
        src/circuit_analyzer.py:321-386)."""
        if not self.use_sam2 or self.sam2 is None:
            return None, None
        try:
            h, w = image_rgb.shape[:2]
            x = sam2_preprocess(jnp.asarray(image_rgb), self.cfg.sam2.resolution)[None]
            logits_sq, _iou = self._jit_segment_core(self.sam2_variables, x)
            logits = jax.image.resize(
                logits_sq, (1, h, w), method="linear", antialias=False
            )[0]  # torch F.interpolate default (src/sam2_infer.py:117)
            mask = (np.asarray(logits) > self.cfg.sam2.mask_threshold).astype(
                np.uint8
            ) * 255
            display = np.zeros((h, w, 3), np.uint8)
            display[:, :, 1] = mask  # green channel
            return mask, display
        except Exception:
            logger.exception("SAM2 segmentation failed")
            return None, None

    def segment_circuit(self, image_rgb: np.ndarray) -> np.ndarray:
        """Classical adaptive-threshold mask (src/circuit_analyzer.py:313-319)."""
        return segment_classical(image_rgb, self.cfg.topology)

    def enhance_lines(self, mask: np.ndarray) -> np.ndarray:
        """Blur + close to reconnect broken wires (src/circuit_analyzer.py:289-311)."""
        from ..ops.morphology import enhance_lines as _enhance

        t = self.cfg.topology
        return np.asarray(
            _enhance(jnp.asarray(mask, jnp.float32), t.blur_kernel, t.blur_sigma,
                     t.morph_kernel, t.morph_iterations)
        )

    def get_emptied_mask(self, image_rgb: np.ndarray, bboxes: list[BBox]) -> np.ndarray:
        """Classical mask with component boxes subtracted
        (src/circuit_analyzer.py:848-882)."""
        from ..topology.nodes import subtract_component_boxes

        return subtract_component_boxes(self.segment_circuit(image_rgb), bboxes)

    def get_node_connections(self, wire_mask: np.ndarray, bboxes: list[BBox]):
        """Node extraction on an explicit mask (src/circuit_analyzer.py:1286)."""
        return extract_nodes(wire_mask, bboxes, self.cfg.topology)

    def crop_image_and_adjust_bboxes(self, image_rgb: np.ndarray, bboxes: list[BBox]):
        """Cluster crop (src/circuit_analyzer.py:937-1284)."""
        return crop_image_and_adjust_bboxes(image_rgb, bboxes, self.cfg.crop)

    def enumerate_components(self, image_rgb: np.ndarray, bboxes: list[BBox]):
        """Red visual-id annotation for the VLM image
        (src/circuit_analyzer.py:479-785)."""
        return enumerate_components(image_rgb, bboxes)

    def reclassify_terminals_based_on_connectivity(
        self, image_rgb: np.ndarray, bboxes: list[BBox]
    ) -> list[BBox]:
        """Terminal → voltage.dc reclassification (src/circuit_analyzer.py:2217)."""
        return reclassify_terminals(image_rgb, bboxes, self.cfg.topology)

    def generate_netlist_from_nodes(self, nodes):
        return generate_netlist_from_nodes(nodes)

    def fix_netlist(self, netlist, vlm_out, enum_bboxes):
        return fix_netlist(netlist, vlm_out, enum_bboxes)

    @staticmethod
    def stringify_line(line) -> str:
        return line.stringify()

    # ------------------------------------------------------------------
    # Full pipeline
    # ------------------------------------------------------------------
    def analyze(self, image_rgb: np.ndarray) -> AnalysisResult:
        result = AnalysisResult(original_image=image_rgb, timings=StageTimings())
        cfg = self.cfg

        # [1] Detection + confidence NMS (src/analysis_pipeline.py:97-115).
        t0 = time.time()
        raw = self.bboxes(image_rgb)
        result.bboxes_orig_nms = geometry.nms_by_confidence(
            raw, iou_threshold=cfg.nms.iou_threshold
        )
        result.timings.record("YOLO Component Detection", time.time() - t0)

        # [2] Cluster crop (src/analysis_pipeline.py:168-195).
        t0 = time.time()
        image_for_analysis, bboxes, crop_info = crop_image_and_adjust_bboxes(
            image_rgb, result.bboxes_orig_nms, cfg.crop
        )
        result.image_for_analysis = image_for_analysis
        result.bboxes = bboxes
        result.crop_info = crop_info
        result.timings.record("YOLO-based Image Cropping", time.time() - t0)

        # [2b] SAM2 segmentation on the cropped image (:197-221).
        t0 = time.time()
        mask, display = self.segment_with_sam2(image_for_analysis)
        if mask is None and self.classical_fallback:
            mask = np.asarray(self.segment_circuit(image_for_analysis))
        result.sam_mask = mask
        result.sam_mask_display = display
        result.timings.record(
            "SAM2 Segmentation on YOLO-Cropped Image", time.time() - t0
        )

        # [3] Terminal reclassification (src/analysis_pipeline.py:117-137).
        t0 = time.time()
        try:
            result.bboxes = reclassify_terminals(
                image_for_analysis, result.bboxes, cfg.topology
            )
        except Exception:
            logger.exception("terminal reclassification failed; continuing")
        result.timings.record("Terminal Reclassification", time.time() - t0)

        # [4] VLM direction enrichment (:139-166).
        t0 = time.time()
        try:
            result.bboxes = enrich_directions(
                image_for_analysis, result.bboxes, self.vlm_client, cfg.enrich,
                debug_store=result.vlm_direction_crops,
            )
            self.last_vlm_input_images = result.vlm_direction_crops
        except Exception:
            logger.exception("direction enrichment failed; continuing")
        result.timings.record("VLM Direction Enrichment", time.time() - t0)

        # [5] Node analysis (:227-260).
        t0 = time.time()
        if result.sam_mask is not None:
            try:
                extraction = extract_nodes(result.sam_mask, result.bboxes, cfg.topology)
                result.nodes = extraction.nodes
                result.node_mask = extraction.emptied_mask
                result.enhanced_mask = extraction.enhanced_mask
                result.contour_visualization = extraction.contour_viz
                result.connection_points_visualization = extraction.connection_viz
                result.node_visualization = extraction.node_viz
            except Exception:
                logger.exception("node analysis failed; continuing")
        else:
            logger.warning("node analysis skipped: no wire mask available")
        result.timings.record("Node Analysis", time.time() - t0)

        # [6] Initial netlist + enumeration (:262-326).
        t0 = time.time()
        self.netlist_stage(result, image_for_analysis)
        result.timings.record("Netlist Generation", time.time() - t0)

        result.component_stats = self._component_stats(result.bboxes_orig_nms)
        return result

    def netlist_stage(self, result: AnalysisResult, image_for_enum) -> None:
        """Stage [6] on one result: initial netlist, the no-VLM-direction
        comparison netlist (:280-292), component enumeration, and the
        components-only fallback ladder (:310-323). Shared by analyze()
        and the batched path so their semantics cannot diverge."""
        if result.nodes:
            result.netlist = generate_netlist_from_nodes(result.nodes)
            result.valueless_netlist_text = stringify_netlist(result.netlist)
            result.netlist_text = result.valueless_netlist_text
            nodes_unknown = [
                dataclasses.replace(
                    n,
                    components=[
                        dataclasses.replace(c, semantic_direction="UNKNOWN")
                        for c in n.components
                    ],
                )
                for n in result.nodes
            ]
            result.valueless_netlist_text_no_vlm_dir = stringify_netlist(
                generate_netlist_from_nodes(nodes_unknown)
            )
            if self.vlm_client is not None and hasattr(
                self.vlm_client, "get_labels_batch_boxes"
            ):
                # Box-driven readers are handed the id'd boxes and read
                # value windows straight off the pixels — no digit OCR,
                # so skip the ~4 ms/img host draw (and serve windows
                # from the UNDRAWN image, the reader's exact training
                # distribution). enum_image aliases the analysis image.
                from ..topology.enumerate_components import assign_visual_ids

                result.enum_image = np.asarray(image_for_enum)
                result.enum_bboxes = assign_visual_ids(result.bboxes)
            else:
                result.enum_image, result.enum_bboxes = enumerate_components(
                    image_for_enum, result.bboxes
                )
        else:
            logger.warning("no nodes; generating components-only fallback netlist")
            result.netlist = generate_fallback_netlist(result.bboxes)
            result.valueless_netlist_text = stringify_netlist(result.netlist)
            result.netlist_text = result.valueless_netlist_text

    def analyze_batch(
        self,
        images,
        mesh=None,
        batch_size: Optional[int] = None,
        finalize: bool = False,
    ) -> list[AnalysisResult]:
        """Batched multi-image analysis sharded over a device mesh
        (SURVEY.md §7.8). Device detect+segment run in fixed-shape batches
        with the batch dim on the mesh's data axis; host topology overlaps
        the next batch (see pipeline/batch.py). ``finalize=True``
        interleaves the batched VLM stage-2 value pass per chunk (same
        output as a trailing finalize_netlists, better overlap)."""
        from .batch import BatchedPipeline

        pipeline = BatchedPipeline(self, mesh=mesh, batch_size=batch_size)
        return pipeline.analyze_many(list(images), finalize=finalize)

    def generate_final_netlist(self, result: AnalysisResult) -> AnalysisResult:
        """VLM value extraction + fix_netlist merge
        (handle_final_netlist_generation, src/analysis_pipeline.py:349-393)."""
        t0 = time.time()
        if self.vlm_client is None or result.enum_image is None:
            logger.warning("no VLM client or enum image; keeping valueless netlist")
            return result
        try:
            # Box-driven readers (enrich/trained_reader.py) skip the
            # red-digit OCR the black-box VLM needs: the pipeline drew
            # the enumeration, so it hands over the visual-id boxes.
            boxes_fn = getattr(self.vlm_client, "get_labels_batch_boxes", None)
            if boxes_fn is not None and result.enum_bboxes is not None:
                vlm_out = boxes_fn([result.enum_image], [result.enum_bboxes])[0]
            else:
                vlm_out = self.vlm_client.get_labels(result.enum_image)
            result.vlm_stage2_output = vlm_out
            fix_netlist(result.netlist, vlm_out, result.enum_bboxes)
            result.netlist_text = stringify_netlist(result.netlist)
        except Exception as e:
            logger.error("VLM labeling failed: %s; keeping valueless netlist", e)
        result.timings.record("Final Netlist Generation", time.time() - t0)
        return result

    def finalize_netlists(
        self, results: Sequence[AnalysisResult], chunk_size: Optional[int] = None
    ) -> list[AnalysisResult]:
        """Batched twin of generate_final_netlist for the throughput path.

        When the VLM client implements get_labels_batch (the on-TPU
        PaliGemma reader: one greedy-decode device dispatch per chunk —
        batching is nearly free because the decode loop is bound by the
        parameter read, PERF.md), enumerated images are read in chunks;
        otherwise falls back to the per-image call. Failure ladder per
        image matches the reference (src/analysis_pipeline.py:368-371):
        any VLM/parse failure keeps that image's valueless netlist."""
        results = list(results)
        boxes_fn = getattr(self.vlm_client, "get_labels_batch_boxes", None)
        batch_fn = getattr(self.vlm_client, "get_labels_batch", None)
        if boxes_fn is None and batch_fn is None:
            return [self.generate_final_netlist(r) for r in results]
        chunk = chunk_size or 8
        idx = [i for i, r in enumerate(results) if r.enum_image is not None]
        for i, r in enumerate(results):
            if r.enum_image is None:
                logger.warning(
                    "no enum image for result %d; keeping valueless netlist", i
                )
        for base in range(0, len(idx), chunk):
            sel = idx[base : base + chunk]
            t0 = time.time()
            try:
                if boxes_fn is not None:
                    outs = boxes_fn(
                        [results[i].enum_image for i in sel],
                        [results[i].enum_bboxes for i in sel],
                    )
                else:
                    outs = batch_fn([results[i].enum_image for i in sel])
            except Exception as e:
                logger.error(
                    "batched VLM labeling failed: %s; keeping valueless netlists", e
                )
                outs = [None] * len(sel)
            dt = (time.time() - t0) / max(len(sel), 1)
            for i, vlm_out in zip(sel, outs):
                r = results[i]
                if vlm_out is not None:
                    # Same per-image ladder as generate_final_netlist: a
                    # malformed-but-parseable VLM row keeps THIS image's
                    # valueless netlist instead of aborting the batch.
                    r.vlm_stage2_output = vlm_out
                    try:
                        fix_netlist(r.netlist, vlm_out, r.enum_bboxes)
                        r.netlist_text = stringify_netlist(r.netlist)
                    except Exception as e:
                        logger.error(
                            "VLM merge failed for result %d: %s; keeping "
                            "valueless netlist", i, e,
                        )
                r.timings.record("Final Netlist Generation", dt)
        return results

    def simulate(
        self,
        result_or_text,
        frequency_hz: Optional[float] = None,
    ):
        """Auto-detected DC/AC simulation (app.py:839-874 + simulator calls)."""
        if isinstance(result_or_text, AnalysisResult):
            text = result_or_text.netlist_text
            netlist = result_or_text.netlist
        else:
            text = str(result_or_text)
            netlist = None
        mode = detect_analysis_mode(text)
        if mode == "AC":
            freq = frequency_hz or self.cfg.sim.default_ac_frequency_hz
            if netlist is not None:
                return perform_ac_analysis(netlist, freq, self.cfg.sim)
            from ..sim.engine import perform_ac_analysis_text

            return perform_ac_analysis_text(text, freq, self.cfg.sim)
        return perform_dc_analysis(text, self.cfg.sim)

    @staticmethod
    def _component_stats(bboxes: list[BBox]) -> dict:
        """Per-class counts + confidence totals (src/utils.py:410-430)."""
        stats: dict[str, dict] = {}
        for b in bboxes:
            entry = stats.setdefault(b.class_name, {"count": 0, "total_conf": 0.0})
            entry["count"] += 1
            entry["total_conf"] += b.confidence
        return stats
