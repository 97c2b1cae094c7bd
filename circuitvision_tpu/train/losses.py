"""Segmentation fine-tune losses.

The reference configures its SAM2 fine-tune with weighted dice + focal +
IoU + frequency losses (weight_dice=0.5, weight_focal=0.4, weight_iou=0.3,
weight_freq=0.1, focal_alpha=0.25 — src/circuit_analyzer.py:218-222,
src/sam2_infer.py:297-301) but does not ship the loss implementations.
These are standard formulations matching those hyper-parameters; the
frequency term is an L1 over FFT magnitudes of predicted vs target masks
(penalizing missing thin-wire high-frequency structure).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import TrainConfig


def dice_loss(logits: jax.Array, targets: jax.Array, smooth: float = 1e-5) -> jax.Array:
    """Soft dice over the full batch. logits/targets: (B, H, W)."""
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * targets, axis=(-1, -2))
    denom = jnp.sum(probs, axis=(-1, -2)) + jnp.sum(targets, axis=(-1, -2))
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def focal_loss(
    logits: jax.Array, targets: jax.Array, alpha: float = 0.25, gamma: float = 2.0
) -> jax.Array:
    """Binary focal loss with logits (numerically stable)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(alpha_t * ((1 - p_t) ** gamma) * ce)


def iou_prediction_loss(
    iou_pred: jax.Array, logits: jax.Array, targets: jax.Array,
    threshold: float = 0.5, smooth: float = 1e-5,
) -> jax.Array:
    """MSE between the decoder's IoU head output and the actual IoU of the
    thresholded prediction (SAM-style IoU supervision)."""
    pred_mask = (jax.nn.sigmoid(logits) > threshold).astype(jnp.float32)
    inter = jnp.sum(pred_mask * targets, axis=(-1, -2))
    union = jnp.sum(jnp.maximum(pred_mask, targets), axis=(-1, -2))
    actual_iou = (inter + smooth) / (union + smooth)
    return jnp.mean((iou_pred.reshape(actual_iou.shape) - actual_iou) ** 2)


def frequency_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """L1 over 2-D FFT magnitudes of predicted vs target masks."""
    probs = jax.nn.sigmoid(logits)
    f_pred = jnp.abs(jnp.fft.rfft2(probs))
    f_true = jnp.abs(jnp.fft.rfft2(targets))
    return jnp.mean(jnp.abs(f_pred - f_true))


def combined_loss(
    logits: jax.Array,
    iou_pred: jax.Array,
    targets: jax.Array,
    cfg: Optional[TrainConfig] = None,
) -> tuple[jax.Array, dict]:
    """Weighted sum per the reference fine-tune configuration."""
    cfg = cfg or TrainConfig()
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    l_dice = dice_loss(logits, targets, cfg.dice_smooth)
    l_focal = focal_loss(logits, targets, cfg.focal_alpha, cfg.focal_gamma)
    l_iou = iou_prediction_loss(iou_pred, logits, targets, smooth=cfg.iou_smooth)
    l_freq = frequency_loss(logits, targets)
    total = (
        cfg.weight_dice * l_dice
        + cfg.weight_focal * l_focal
        + cfg.weight_iou * l_iou
        + cfg.weight_freq * l_freq
    )
    return total, {
        "loss": total,
        "dice": l_dice,
        "focal": l_focal,
        "iou": l_iou,
        "freq": l_freq,
    }
