"""FPN neck + sine position encoding (SAM 2.1 image encoder).

Mirrors models/configs/sam2.1_hiera_l.yaml:17-28 in the reference:
d_model 256 over backbone channels (1152, 576, 288, 144), nearest-neighbor
top-down fusion only at levels 2-3 (levels 0-1 use lateral 1×1 convs
directly), and scalp=1 discarding the lowest-resolution output.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 256, temperature: float = 10000.0
) -> jnp.ndarray:
    """(H, W, num_pos_feats) sine embedding (sam2 PositionEmbeddingSine,
    normalize=True, scale=2π)."""
    half = num_pos_feats // 2
    scale = 2.0 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(h, w, half)
    pos_y = pos_y.reshape(h, w, half)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class FpnNeck(nn.Module):
    """Laterals + selective top-down. Takes trunk outputs high-res-first;
    returns (features, position encodings) high-res-first."""

    d_model: int = 256
    backbone_channel_list: Sequence[int] = (1152, 576, 288, 144)  # low-res first
    fpn_top_down_levels: Sequence[int] = (2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: list[jax.Array]) -> tuple[list[jax.Array], list[jax.Array]]:
        n = len(self.backbone_channel_list) - 1
        out: list = [None] * len(xs)
        pos: list = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):  # low-res → high-res
            lateral = nn.Conv(
                self.d_model, (1, 1), dtype=self.dtype, name=f"convs_{n - i}_conv"
            )(xs[i].astype(self.dtype))
            if i in self.fpn_top_down_levels and prev is not None:
                b, h, w, c = prev.shape
                top_down = jax.image.resize(
                    prev.astype(jnp.float32), (b, h * 2, w * 2, c), method="nearest"
                ).astype(lateral.dtype)
                prev = lateral + top_down
            else:
                prev = lateral
            out[i] = prev
            pe = position_embedding_sine(prev.shape[1], prev.shape[2], self.d_model)
            pos[i] = pe[None].astype(prev.dtype)
        return out, pos
