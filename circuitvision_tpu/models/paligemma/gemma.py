"""Gemma decoder (PaliGemma's language model) with a static KV cache.

Architecture per the HF reference (transformers/models/gemma/
modeling_gemma.py): RMSNorm with (1+weight) applied in f32, full-head-dim
rotary embeddings (rotate_half convention, θ=10000), grouped-query
attention (Gemma-2B is MQA: 1 kv head), GeGLU MLP with tanh-GELU, token
embeddings scaled by sqrt(hidden) (cast to the compute dtype first — the
bf16 rounding of the normalizer is part of the published numerics), and
a weight-tied LM head.

TPU design:
- The KV cache is a pair of static-shape (L, B, T_max, n_kv, head_dim)
  arrays updated with lax.dynamic_update_slice — no dynamic shapes under
  jit, so prefill and every decode step compile once per (B, T_max).
- MQA k/v are broadcast (not materialized) across the 8 q heads by
  einsum; head_dim 256 spans exactly two 128-lane MXU tiles.
- Attention softmax runs in f32 and additive masks use finfo.min,
  matching the torch reference bit-for-bit at f32 (tests/test_paligemma.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import GemmaTextConfig


class QuantDense(nn.Module):
    """Weight-only int8 linear: y = (x @ kernel_q) * scale.

    The decode loop is bandwidth-bound reading the parameters every step
    (PERF.md: batching is nearly free because the 2.5 B decoder params
    dominate); int8 storage halves that HBM traffic vs bf16. Per-output-
    channel scales; the scale multiply runs AFTER the dot (mathematically
    identical to scaling the kernel, and exact when the scale is a power
    of two), so XLA reads the int8 kernel directly into the matmul with
    a fused upcast instead of materializing a dequantized copy.
    quantize_variables (quant.py) builds the (kernel_q, scale) pair from
    a float checkpoint."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        kq = self.param(
            "kernel_q",
            lambda _key, shape: jnp.zeros(shape, jnp.int8),
            (in_dim, self.features),
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        y = jnp.dot(x, kq.astype(self.dtype))
        return (y.astype(jnp.float32) * scale).astype(self.dtype)


def _dense_factory(quant: bool, dtype):
    if quant:
        return lambda feat, name: QuantDense(feat, dtype=dtype, name=name)
    return lambda feat, name: nn.Dense(
        feat, use_bias=False, dtype=dtype, name=name
    )


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.zeros, (self.dim,))
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + self.eps)
        y = y * (1.0 + w.astype(jnp.float32))
        return y.astype(x.dtype)


def rope_cos_sin(
    position_ids: jax.Array, head_dim: int, theta: float, dtype
) -> tuple[jax.Array, jax.Array]:
    """(B, S) int positions → cos/sin (B, S, head_dim), f32 math."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (B,S,hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, S, H, D); cos/sin (B, S, D) broadcast over heads."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return x * cos + _rotate_half(x) * sin


class GemmaAttention(nn.Module):
    cfg: GemmaTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, S, C)
        bias: jax.Array,  # (B, 1, S, T) additive mask over cache slots
        cos: jax.Array,
        sin: jax.Array,
        k_cache: jax.Array,  # (B, T, n_kv, hd)
        v_cache: jax.Array,
        cache_index,  # scalar: first cache slot this call writes
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        c = self.cfg
        b, s, _ = x.shape
        h, n_kv, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        dense = _dense_factory(c.quant_int8, self.dtype)
        q = dense(h * hd, "q_proj")(x).reshape(b, s, h, hd)
        k = dense(n_kv * hd, "k_proj")(x).reshape(b, s, n_kv, hd)
        v = dense(n_kv * hd, "v_proj")(x).reshape(b, s, n_kv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, cache_index, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, cache_index, 0, 0))

        groups = h // n_kv
        qg = q.reshape(b, s, n_kv, groups, hd)
        # (B,S,n_kv,groups,T): kv heads broadcast across their q groups
        logits = jnp.einsum("bsngd,btnd->bsngt", qg, k_cache) * (hd**-0.5)
        logits = logits.astype(jnp.float32) + bias[:, 0][:, :, None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bsngt,btnd->bsngd", w, v_cache)
        out = out.reshape(b, s, h * hd)
        return dense(c.hidden_size, "o_proj")(out), k_cache, v_cache


class GemmaDecoderLayer(nn.Module):
    cfg: GemmaTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias, cos, sin, k_cache, v_cache, cache_index):
        c = self.cfg
        attn_out, k_cache, v_cache = GemmaAttention(
            c, dtype=self.dtype, name="self_attn"
        )(
            RMSNorm(c.hidden_size, c.rms_norm_eps, name="input_layernorm")(x),
            bias, cos, sin, k_cache, v_cache, cache_index,
        )
        x = x + attn_out
        y = RMSNorm(c.hidden_size, c.rms_norm_eps, name="post_attention_layernorm")(x)
        dense = _dense_factory(c.quant_int8, self.dtype)
        gate = jax.nn.gelu(dense(c.intermediate_size, "gate_proj")(y), approximate=True)
        y = dense(c.hidden_size, "down_proj")(gate * dense(c.intermediate_size, "up_proj")(y))
        return x + y, k_cache, v_cache


class GemmaDecoder(nn.Module):
    """Runs the layer stack over (possibly image-substituted) embeddings.

    Call with inputs_embeds (B, S, C) UNSCALED (the sqrt(hidden)
    normalizer is applied here, after any image substitution — matching
    the reference composition order), a (B, 1, S, T) additive bias over
    cache slots, (B, S) position ids (PaliGemma: cache position + 1),
    and the (L, B, T, n_kv, hd) k/v cache pair. Returns final-norm
    hidden states + updated caches. Logits are computed by the caller
    against the tied embedding."""

    cfg: GemmaTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jax.Array,
        bias: jax.Array,
        position_ids: jax.Array,
        k_caches: jax.Array,
        v_caches: jax.Array,
        cache_index,
    ):
        c = self.cfg
        cos, sin = rope_cos_sin(position_ids, c.head_dim, c.rope_theta, self.dtype)
        normalizer = jnp.asarray(c.hidden_size**0.5, dtype=self.dtype)
        x = inputs_embeds.astype(self.dtype) * normalizer
        new_k, new_v = [], []
        for i in range(c.num_hidden_layers):
            x, k, v = GemmaDecoderLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, bias, cos, sin, k_caches[i], v_caches[i], cache_index
            )
            new_k.append(k)
            new_v.append(v)
        x = RMSNorm(c.hidden_size, c.rms_norm_eps, name="norm")(x)
        return x, jnp.stack(new_k), jnp.stack(new_v)


def make_kv_cache(
    cfg: GemmaTextConfig, batch: int, max_len: int, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    shape = (
        cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim,
    )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
