"""Core image ops: color conversion, resize, letterbox, thresholding.

TPU-native replacements for the cv2 calls in the reference:
  - cv2.cvtColor RGB→GRAY            (src/circuit_analyzer.py:316)
  - cv2.resize (INTER_LINEAR)        (src/circuit_analyzer.py:806)
  - cv2.adaptiveThreshold MEAN_C/INV (src/circuit_analyzer.py:318)
  - SAM2Transforms resize+normalize  (src/sam2_infer.py:41-51)
  - YOLO letterbox preprocessing     (ultralytics internal)

All functions are jit-compatible, operate in float32, and accept
(H, W[, C]) or batched (B, H, W[, C]) arrays via vmap-friendly shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# ImageNet statistics used by SAM2Transforms (src/sam2_infer.py:41-42).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma, matching cv2.cvtColor(..., COLOR_RGB2GRAY)."""
    img = img.astype(jnp.float32)
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def resize_bilinear(
    img: jax.Array, out_hw: tuple[int, int], antialias: bool = True
) -> jax.Array:
    """Bilinear resize with half-pixel centers.

    antialias matters only when DOWNSCALING and selects between the two
    conventions the pipeline needs:
      * False → plain 2-tap bilinear == cv2.resize INTER_LINEAR (the
        topology chain, reference resize_image_keep_aspect,
        src/circuit_analyzer.py:787-809) and torch F.interpolate's
        default (the mask upsample/postprocess, src/sam2_infer.py:117).
      * True → triangle-filtered == torchvision Resize's tensor default
        (SAM2 preprocessing, src/sam2_infer.py:44-47).
    """
    h, w = out_hw
    shape = (h, w) + img.shape[2:]
    return jax.image.resize(
        img.astype(jnp.float32), shape, method="linear", antialias=antialias
    )


def resize_nearest(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    h, w = out_hw
    shape = (h, w) + img.shape[2:]
    return jax.image.resize(img, shape, method="nearest")


def keep_aspect_size(h: int, w: int, new_height: int) -> tuple[int, int]:
    """Target size for resize-to-height-keeping-aspect
    (src/circuit_analyzer.py:799-803: new_width = int(new_height * w/h))."""
    return new_height, int(new_height * (w / h))


def _box_filter_mean(img: jax.Array, ksize: int) -> jax.Array:
    """Mean filter with edge-replicate padding (cv2 BORDER_REPLICATE)."""
    pad = ksize // 2
    x = jnp.pad(img.astype(jnp.float32), ((pad, pad), (pad, pad)), mode="edge")
    summed = lax.reduce_window(
        x, 0.0, lax.add, (ksize, ksize), (1, 1), padding="VALID"
    )
    return summed / float(ksize * ksize)


@functools.partial(jax.jit, static_argnames=("block_size", "c"))
def adaptive_threshold_mean_inv(
    gray: jax.Array, block_size: int = 31, c: float = 21.0
) -> jax.Array:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_MEAN_C, THRESH_BINARY_INV).

    dst = 255 where src <= mean(block) - C else 0
    (reference `segment_circuit`, src/circuit_analyzer.py:313-319).
    """
    mean = _box_filter_mean(gray, block_size)
    return jnp.where(gray.astype(jnp.float32) <= mean - c, 255.0, 0.0).astype(jnp.uint8)


def normalize_imagenet(img01: jax.Array) -> jax.Array:
    """Channel-wise ImageNet normalization of a [0,1] RGB image (..., 3)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (img01.astype(jnp.float32) - mean) / std


def sam2_preprocess(img_rgb_u8: jax.Array, resolution: int = 1024) -> jax.Array:
    """uint8 RGB (H, W, 3) → normalized (resolution, resolution, 3) float32.

    Mirrors SAM2Transforms.__call__ (src/sam2_infer.py:43-51):
    ToTensor (→[0,1]) → Resize(res², bilinear) → ImageNet Normalize.
    """
    img01 = img_rgb_u8.astype(jnp.float32) / 255.0
    resized = resize_bilinear(img01, (resolution, resolution))
    return normalize_imagenet(resized)


def letterbox(
    img_rgb_u8: jax.Array,
    out_size: int = 640,
    pad_value: float = 114.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Aspect-preserving resize + centered pad (YOLO letterbox).

    Returns (letterboxed float32 (out, out, 3), scale, (pad_x, pad_y)).
    Shapes are static; the scale/pads are scalars for box back-mapping.
    """
    h, w = img_rgb_u8.shape[:2]
    scale = min(out_size / h, out_size / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    # ultralytics letterboxes with cv2.resize INTER_LINEAR → no antialias
    resized = resize_bilinear(
        img_rgb_u8.astype(jnp.float32), (new_h, new_w), antialias=False
    )
    pad_y, pad_x = (out_size - new_h) // 2, (out_size - new_w) // 2
    canvas = jnp.full((out_size, out_size, 3), pad_value, dtype=jnp.float32)
    canvas = lax.dynamic_update_slice(canvas, resized, (pad_y, pad_x, 0))
    return canvas, jnp.float32(scale), jnp.asarray([pad_x, pad_y], dtype=jnp.float32)
