"""Grayscale morphology and blur as XLA reduce-windows.

TPU-native replacement for the reference's line-enhancement stack
(src/circuit_analyzer.py:289-311): Gaussian blur (5×5, σ=1) → dilate ×2 →
erode ×2 with a 3×3 ones kernel — a morphological close that reconnects
broken wires. Dilation/erosion map exactly onto `lax.reduce_window`
max/min, which XLA lowers to fused VPU loops; the Gaussian is a separable
pair of 1-D convolutions.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def _replicate_pad(img: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")


def dilate(img: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Grayscale dilation with a ksize×ksize ones kernel (cv2.dilate).

    cv2 uses BORDER_CONSTANT(-inf semantics)=replicate for dilate default
    border (BORDER_REPLICATE is cv2's default for morphology).
    """
    out = img.astype(jnp.float32)
    pad = ksize // 2
    for _ in range(iterations):
        out = lax.reduce_window(
            _replicate_pad(out, pad),
            -jnp.inf,
            lax.max,
            (ksize, ksize),
            (1, 1),
            padding="VALID",
        )
    return out


def erode(img: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Grayscale erosion with a ksize×ksize ones kernel (cv2.erode)."""
    out = img.astype(jnp.float32)
    pad = ksize // 2
    for _ in range(iterations):
        out = lax.reduce_window(
            _replicate_pad(out, pad),
            jnp.inf,
            lax.min,
            (ksize, ksize),
            (1, 1),
            padding="VALID",
        )
    return out


def gaussian_kernel_1d(ksize: int, sigma: float) -> jnp.ndarray:
    """cv2.getGaussianKernel: symmetric, normalized; sigma<=0 derives from k."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    xs = jnp.arange(ksize, dtype=jnp.float32) - half
    k = jnp.exp(-(xs**2) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jax.Array, ksize: int = 5, sigma: float = 1.0) -> jax.Array:
    """Separable Gaussian blur with replicate borders (cv2.GaussianBlur)."""
    k = gaussian_kernel_1d(ksize, sigma)
    pad = ksize // 2
    x = _replicate_pad(img.astype(jnp.float32), pad)
    # Horizontal then vertical 1-D convolutions via dot over unrolled taps —
    # XLA fuses these into a single pass.
    h = sum(k[i] * x[:, i : i + img.shape[1]] for i in range(ksize))
    v = sum(k[i] * h[i : i + img.shape[0], :] for i in range(ksize))
    return v


@functools.partial(jax.jit, static_argnames=("blur_ksize", "blur_sigma", "morph_ksize", "iterations"))
def enhance_lines(
    mask: jax.Array,
    blur_ksize: int = 5,
    blur_sigma: float = 1.0,
    morph_ksize: int = 3,
    iterations: int = 2,
) -> jax.Array:
    """Blur → dilate×N → erode×N (reference enhance_lines,
    src/circuit_analyzer.py:289-311). Input/output are 0..255 grayscale."""
    blurred = gaussian_blur(mask, blur_ksize, blur_sigma)
    dilated = dilate(blurred, morph_ksize, iterations)
    eroded = erode(dilated, morph_ksize, iterations)
    return eroded


def boundary_mask(fg: jax.Array) -> jax.Array:
    """Foreground pixels with at least one 8-neighbor background pixel.

    The device-side equivalent of the reference's contour point walks:
    cv2.findContours boundary pixels are exactly fg & ~erode3x3(fg)
    (with border pixels counting as boundary, as cv2 treats the image
    edge as background).
    """
    f = fg.astype(jnp.float32)
    padded = jnp.pad(f, ((1, 1), (1, 1)), mode="constant", constant_values=0.0)
    interior = lax.reduce_window(
        padded, jnp.inf, lax.min, (3, 3), (1, 1), padding="VALID"
    )
    return (f > 0) & (interior == 0)
