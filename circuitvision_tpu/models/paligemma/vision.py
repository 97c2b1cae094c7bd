"""SigLIP vision tower (PaliGemma's image encoder).

Architecture per the HF reference implementation
(transformers/models/siglip/modeling_siglip.py — SiglipVisionTransformer
with vision_use_head=False, the PaliGemma configuration): valid-padded
patch conv, learned position embeddings, pre-LN transformer blocks with
biased qkv/out projections and tanh-GELU MLPs, and a final post
layernorm. No CLS token; all patch tokens are emitted.

TPU notes: everything is dense matmul at static shapes — XLA fuses the
LN/GELU chains into the matmuls; at So400m scale (27×1152) the MXU is
already well fed without custom kernels, so this stays pure Flax.
Parity with the torch reference is pinned by tests/test_paligemma.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import SiglipVisionConfig


def _gelu_tanh(x: jax.Array) -> jax.Array:
    # torch's gelu(approximate='tanh'); matches HF ACT2FN["gelu_pytorch_tanh"].
    return jax.nn.gelu(x, approximate=True)


class VisionAttention(nn.Module):
    cfg: SiglipVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        b, s, _ = x.shape
        h, hd = c.num_attention_heads, c.head_dim
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(b, s, h, hd)
        k = dense("k_proj")(x).reshape(b, s, h, hd)
        v = dense("v_proj")(x).reshape(b, s, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        # softmax in f32, cast back (HF eager_attention_forward)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, c.hidden_size)
        return dense("out_proj")(out)


class VisionBlock(nn.Module):
    cfg: SiglipVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name=name
        )
        x = x + VisionAttention(c, dtype=self.dtype, name="self_attn")(
            ln("layer_norm1")(x)
        )
        y = ln("layer_norm2")(x)
        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = _gelu_tanh(y)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(y)
        return x + y


class SiglipVisionTower(nn.Module):
    """pixel_values (B, H, W, 3), SigLIP-normalized → (B, P, hidden)."""

    cfg: SiglipVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        c = self.cfg
        p = c.patch_size
        x = nn.Conv(
            c.hidden_size, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(1.0 / (c.hidden_size**0.5)),
            (c.num_patches, c.hidden_size),
        )
        x = x + pos.astype(x.dtype)[None]
        for i in range(c.num_hidden_layers):
            x = VisionBlock(c, dtype=self.dtype, name=f"layer_{i}")(x)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(x)
