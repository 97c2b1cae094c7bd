"""Shared Flax building blocks for the detector/segmenter models.

Architecture follows the YOLOv11 component family (Conv-BN-SiLU, C3k2,
SPPF, C2PSA — see PAPERS.md: "YOLOv11: An Overview of the Key
Architectural Enhancements"), implemented NHWC for TPU: convolutions and
attention contractions land on the MXU, BatchNorm folds into the conv at
inference, and all activations fuse into the surrounding XLA computation.

The reference delegates these to ultralytics/torch
(src/circuit_analyzer.py:45,268); here they are first-party.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + SiLU (ultralytics `Conv`)."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = autopad(self.kernel, None, self.dilation)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.97,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class DWConvBN(ConvBN):
    """Depthwise Conv (groups == features)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = autopad(self.kernel, None, self.dilation)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=x.shape[-1],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.97,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """Standard YOLO bottleneck: two convs with optional residual."""

    features: int
    shortcut: bool = True
    kernels: Sequence[int] = (3, 3)
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.features * self.expansion)
        y = ConvBN(hidden, self.kernels[0], dtype=self.dtype, name="cv1")(x)
        y = ConvBN(self.features, self.kernels[1], dtype=self.dtype, name="cv2")(y)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP block with 3 convs and n inner bottlenecks (ultralytics C3k)."""

    features: int
    n: int = 2
    shortcut: bool = True
    expansion: float = 0.5
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.features * self.expansion)
        a = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x)
        b = ConvBN(hidden, 1, dtype=self.dtype, name="cv2")(x)
        for i in range(self.n):
            a = Bottleneck(
                hidden, self.shortcut, (self.kernel, self.kernel), 1.0,
                dtype=self.dtype, name=f"m_{i}",
            )(a)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1)
        )


class C3k2(nn.Module):
    """C2f-style split block whose inner units are C3k blocks (YOLOv11).

    cv1 splits into two halves; n units transform the running half; all
    intermediate halves concatenate into cv2.
    """

    features: int
    n: int = 2
    c3k: bool = True
    expansion: float = 0.5
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.features * self.expansion)
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        cur = b
        for i in range(self.n):
            if self.c3k:
                cur = C3k(hidden, 2, self.shortcut, dtype=self.dtype, name=f"m_{i}")(cur)
            else:
                # ultralytics C3k2 builds Bottleneck(self.c, self.c,
                # shortcut, g) with the DEFAULT e=0.5 — the inner width is
                # half the running channel width. Validated against the
                # published yolo11{n,s,l,x} parameter counts and the torch
                # twin (tests/torch_twin_yolo.py).
                cur = Bottleneck(
                    hidden, self.shortcut, (3, 3), 0.5, dtype=self.dtype, name=f"m_{i}"
                )(cur)
            outs.append(cur)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1)
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5×5 max-pools."""

    features: int
    pool: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = x.shape[-1] // 2
        y = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x)
        pools = [y]
        p = self.pool // 2
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (self.pool, self.pool), strides=(1, 1),
                    padding=((p, p), (p, p)),
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1)
        )


class PSAAttention(nn.Module):
    """Position-sensitive attention used inside C2PSA.

    Single fused qkv 1×1 conv; attention over the flattened spatial dim
    (one (HW × HW) MXU contraction per head); depthwise 3×3 positional
    branch on V.
    """

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        qkv = ConvBN(self.dim + nh_kd * 2, 1, act=False, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, self.num_heads, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        pe = DWConvBN(self.dim, 3, act=False, dtype=self.dtype, name="pe")(
            v.reshape(b, h, w, self.dim)
        )
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out + pe)


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + PSAAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(x)
        y = ConvBN(self.dim * 2, 1, dtype=self.dtype, name="ffn_0")(x)
        y = ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="ffn_1")(y)
        return x + y


class C2PSA(nn.Module):
    """Cross-stage partial block with PSA attention units (YOLOv11)."""

    features: int
    n: int = 2
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.features * self.expansion)
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(hidden, max(1, hidden // 64), dtype=self.dtype, name=f"m_{i}")(b)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1)
        )


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2× upsample (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class MLP(nn.Module):
    """Simple MLP with configurable depth (SAM-style hypernetwork heads)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, dtype=self.dtype, name=f"layers_{self.num_layers - 1}")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x
