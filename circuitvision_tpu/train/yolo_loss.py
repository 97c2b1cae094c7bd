"""YOLO detection loss: Task-Aligned assignment + CIoU + DFL + BCE.

The reference's detector is a fine-tuned YOLOv11 produced offline with
ultralytics (capability cited at /root/reference/README.md:113, mAP@50
0.9313); the framework must be able to PRODUCE that model, not just
serve it. This module is the training half for models/yolo: the
ultralytics v8 detection-loss formulation (TaskAlignedAssigner with
topk=10/alpha=0.5/beta=6.0; CIoU box loss; Distribution Focal Loss on
the ltrb bin distributions; BCE classification against task-aligned
soft targets; gains box 7.5 / cls 0.5 / dfl 1.5) re-derived TPU-first:

  - everything is static-shape and fully vectorized: ground truth pads
    to (B, M) with a validity mask, the assigner is one (B, M, A)
    einsum-shaped tensor program — no per-image Python, no dynamic
    shapes, jit/pjit-able and shardable over the batch axis;
  - the assigner consumes the SAME decode path inference uses
    (models/yolo/decode._dfl expectation), so train and serve cannot
    drift.

Coordinates: all boxes in input-image pixels (letterboxed space);
anchor centers at (x + 0.5) * stride like decode.decode_predictions.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.yolo.decode import STRIDES, _dfl


@dataclasses.dataclass(frozen=True)
class YOLOLossConfig:
    """ultralytics v8DetectionLoss hyper-parameters."""

    num_classes: int = 62
    reg_max: int = 16
    img_size: int = 640
    #: TaskAlignedAssigner(topk, alpha, beta)
    topk: int = 10
    alpha: float = 0.5
    beta: float = 6.0
    #: loss gains (ultralytics default hyp: box, cls, dfl)
    gain_box: float = 7.5
    gain_cls: float = 0.5
    gain_dfl: float = 1.5
    eps: float = 1e-9


def anchor_grid(img_size: int, strides: Sequence[int] = STRIDES):
    """(A, 2) anchor centers in pixels + (A,) stride per anchor, matching
    the flatten order of decode.decode_predictions (row-major per scale,
    scales concatenated in stride order)."""
    pts, sts = [], []
    for s in strides:
        n = img_size // s
        ys = (jnp.arange(n, dtype=jnp.float32) + 0.5) * s
        xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) * s
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        sts.append(jnp.full((n * n,), float(s), jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(sts, axis=0)


def pairwise_ciou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Complete IoU between aligned boxes (…, 4) xyxy → (…,).

    CIoU = IoU − ρ²/c² − αv  (center distance over enclosing diagonal,
    plus the aspect-ratio consistency term)."""
    ax0, ay0, ax1, ay1 = (boxes_a[..., i] for i in range(4))
    bx0, by0, bx1, by1 = (boxes_b[..., i] for i in range(4))
    aw, ah = ax1 - ax0, ay1 - ay0
    bw, bh = bx1 - bx0, by1 - by0
    ix = jnp.clip(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    iy = jnp.clip(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = ix * iy
    union = aw * ah + bw * bh - inter
    iou = inter / (union + 1e-9)
    # enclosing box diagonal
    cw = jnp.maximum(ax1, bx1) - jnp.minimum(ax0, bx0)
    ch = jnp.maximum(ay1, by1) - jnp.minimum(ay0, by0)
    c2 = cw * cw + ch * ch + 1e-9
    rho2 = ((ax0 + ax1 - bx0 - bx1) ** 2 + (ay0 + ay1 - by0 - by1) ** 2) / 4.0
    v = (4.0 / jnp.pi**2) * (
        jnp.arctan(bw / (bh + 1e-9)) - jnp.arctan(aw / (ah + 1e-9))
    ) ** 2
    # ultralytics: alpha is computed outside the gradient tape
    alpha = jax.lax.stop_gradient(v / (v - iou + 1.0 + 1e-9))
    return iou - rho2 / c2 - alpha * v


def iou_matrix_xyxy(gt: jax.Array, pred: jax.Array) -> jax.Array:
    """Plain IoU between (B, M, 4) gt and (B, A, 4) pred → (B, M, A)."""
    g = gt[:, :, None, :]  # (B, M, 1, 4)
    p = pred[:, None, :, :]  # (B, 1, A, 4)
    ix = jnp.clip(
        jnp.minimum(g[..., 2], p[..., 2]) - jnp.maximum(g[..., 0], p[..., 0]),
        0.0,
    )
    iy = jnp.clip(
        jnp.minimum(g[..., 3], p[..., 3]) - jnp.maximum(g[..., 1], p[..., 1]),
        0.0,
    )
    inter = ix * iy
    ga = (g[..., 2] - g[..., 0]) * (g[..., 3] - g[..., 1])
    pa = (p[..., 2] - p[..., 0]) * (p[..., 3] - p[..., 1])
    return inter / (ga + pa - inter + 1e-9)


def task_aligned_assign(
    pred_scores: jax.Array,  # (B, A, C) sigmoid class scores
    pred_boxes: jax.Array,  # (B, A, 4) decoded xyxy pixels
    anchor_points: jax.Array,  # (A, 2)
    gt_boxes: jax.Array,  # (B, M, 4) xyxy pixels
    gt_classes: jax.Array,  # (B, M) int32
    gt_valid: jax.Array,  # (B, M) bool
    cfg: YOLOLossConfig,
):
    """Task-Aligned label assignment (TOOD/ultralytics).

    Returns (fg_mask (B, A) bool, assigned_gt (B, A) int32,
    target_scores (B, A, C) soft targets). Per GT: candidate anchors are
    those whose center lies inside the GT box; the top-k by alignment
    t = score^alpha · IoU^beta are assigned; anchors claimed by multiple
    GTs resolve to the highest-IoU GT; per-anchor class target is the
    assigned GT's class scaled by t / max_t(gt) · max_iou(gt)."""
    B, A, C = pred_scores.shape
    M = gt_boxes.shape[1]
    valid = gt_valid[..., None]  # (B, M, 1)

    # candidates: anchor center strictly inside the gt box
    ax = anchor_points[None, None, :, 0]  # (1, 1, A)
    ay = anchor_points[None, None, :, 1]
    in_gt = (
        (ax > gt_boxes[..., 0:1])
        & (ax < gt_boxes[..., 2:3])
        & (ay > gt_boxes[..., 1:2])
        & (ay < gt_boxes[..., 3:4])
    ) & valid  # (B, M, A)

    # alignment metric
    iou = jnp.clip(iou_matrix_xyxy(gt_boxes, pred_boxes), 0.0)  # (B, M, A)
    cls_idx = jnp.clip(gt_classes, 0, C - 1)  # (B, M)
    score = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),  # (B, C, A)
        cls_idx[:, :, None],  # (B, M, 1) gathered over C
        axis=1,
    )  # (B, M, A)
    align = (score**cfg.alpha) * (iou**cfg.beta)
    align = jnp.where(in_gt, align, 0.0)

    # top-k candidates per gt — exact-k scatter (a `>= kth value` test
    # would over-select on exact ties, e.g. identical predictions)
    k = min(cfg.topk, A)
    topk_vals, topk_idx = jax.lax.top_k(align, k)  # (B, M, k)
    bi = jnp.arange(B)[:, None, None]
    mi = jnp.arange(M)[None, :, None]
    cand = (
        jnp.zeros((B, M, A), bool).at[bi, mi, topk_idx].set(True)
        & in_gt
        & (align > 0.0)
    )  # (B, M, A)

    # conflict resolution: an anchor claimed by >1 gt keeps the max-IoU gt
    claims = cand.sum(axis=1)  # (B, A)
    iou_masked = jnp.where(cand, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=1).astype(jnp.int32)  # (B, A)
    fg_mask = claims > 0
    only = jax.nn.one_hot(best_gt, M, axis=1, dtype=bool)  # (B, M, A)
    cand = jnp.where((claims > 1)[:, None, :], cand & only, cand)

    # normalized soft targets: t_hat = t / max_t(gt) * max_iou(gt)
    max_align = jnp.max(jnp.where(cand, align, 0.0), axis=2, keepdims=True)
    max_iou = jnp.max(jnp.where(cand, iou, 0.0), axis=2, keepdims=True)
    norm = align * max_iou / (max_align + cfg.eps)  # (B, M, A)
    per_anchor_t = jnp.max(jnp.where(cand, norm, 0.0), axis=1)  # (B, A)

    assigned_gt = jnp.argmax(cand, axis=1).astype(jnp.int32)  # (B, A)
    assigned_cls = jnp.take_along_axis(cls_idx, assigned_gt, axis=1)  # (B, A)
    target_scores = (
        jax.nn.one_hot(assigned_cls, C, dtype=pred_scores.dtype)
        * per_anchor_t[..., None]
        * fg_mask[..., None]
    )
    return fg_mask, assigned_gt, target_scores


def _dfl_loss(
    pred_dist: jax.Array,  # (B, A, 4*reg_max) raw bin logits
    target_ltrb: jax.Array,  # (B, A, 4) in stride units
    reg_max: int,
) -> jax.Array:
    """Distribution focal loss: CE against the two bins bracketing the
    continuous target (per ltrb side). Returns (B, A) summed over sides,
    averaged over the 4 sides (ultralytics keepdim mean)."""
    B, A, _ = pred_dist.shape
    logits = pred_dist.reshape(B, A, 4, reg_max)
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = jnp.clip(target_ltrb, 0.0, reg_max - 1 - 0.01)
    tl = jnp.floor(t).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(t.dtype) - t
    wr = 1.0 - wl
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1
    )[..., 0]
    return (wl * ce_l + wr * ce_r).mean(axis=-1)  # (B, A)


def yolo_detection_loss(
    head_outputs: list,  # per-scale (B, Hs, Ws, 4*reg_max + C)
    gt_boxes: jax.Array,  # (B, M, 4) xyxy pixels (letterboxed space)
    gt_classes: jax.Array,  # (B, M) int32
    gt_valid: jax.Array,  # (B, M) bool
    cfg: YOLOLossConfig,
):
    """Total loss + metrics dict. Fully static shapes; jit/pjit-able."""
    C, R = cfg.num_classes, cfg.reg_max
    flats = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in head_outputs]
    flat = jnp.concatenate(flats, axis=1).astype(jnp.float32)  # (B, A, ·)
    pred_dist = flat[..., : 4 * R]
    pred_cls_logits = flat[..., 4 * R :]
    anchor_points, strides_a = anchor_grid(cfg.img_size)

    # decode with the inference DFL expectation (shared code path)
    ltrb = _dfl(pred_dist, R)  # (B, A, 4) stride units
    x0 = anchor_points[None, :, 0] - ltrb[..., 0] * strides_a[None]
    y0 = anchor_points[None, :, 1] - ltrb[..., 1] * strides_a[None]
    x1 = anchor_points[None, :, 0] + ltrb[..., 2] * strides_a[None]
    y1 = anchor_points[None, :, 1] + ltrb[..., 3] * strides_a[None]
    pred_boxes = jnp.stack([x0, y0, x1, y1], axis=-1)  # pixels

    pred_scores = jax.nn.sigmoid(pred_cls_logits)
    fg_mask, assigned_gt, target_scores = task_aligned_assign(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes),
        anchor_points,
        gt_boxes.astype(jnp.float32),
        gt_classes,
        gt_valid,
        cfg,
    )
    ts_sum = jnp.maximum(target_scores.sum(), 1.0)

    # classification: BCE against the soft aligned targets, ALL anchors
    cls_loss = (
        optax_sigmoid_bce(pred_cls_logits, target_scores).sum() / ts_sum
    )

    # box + dfl on foreground anchors, weighted by per-anchor target score
    tboxes = jnp.take_along_axis(
        gt_boxes.astype(jnp.float32),
        assigned_gt[..., None],
        axis=1,
    )  # (B, A, 4)
    weight = target_scores.sum(axis=-1) * fg_mask  # (B, A)
    ciou = pairwise_ciou(pred_boxes, tboxes)
    box_loss = ((1.0 - ciou) * weight).sum() / ts_sum

    # dfl targets: ltrb distances of the assigned gt in stride units
    tl_ = (anchor_points[None, :, 0] - tboxes[..., 0]) / strides_a[None]
    tt_ = (anchor_points[None, :, 1] - tboxes[..., 1]) / strides_a[None]
    tr_ = (tboxes[..., 2] - anchor_points[None, :, 0]) / strides_a[None]
    tb_ = (tboxes[..., 3] - anchor_points[None, :, 1]) / strides_a[None]
    t_ltrb = jnp.stack([tl_, tt_, tr_, tb_], axis=-1)
    dfl_loss = (_dfl_loss(pred_dist, t_ltrb, R) * weight).sum() / ts_sum

    total = (
        cfg.gain_box * box_loss + cfg.gain_cls * cls_loss + cfg.gain_dfl * dfl_loss
    )
    metrics = {
        "loss": total,
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss,
        "n_fg": fg_mask.sum(),
    }
    return total, metrics


def optax_sigmoid_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise sigmoid binary cross-entropy (numerically stable)."""
    return (
        jnp.clip(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
