"""SAM mask decoder: two-way transformer + upscaling + hypernetworks.

Mirrors the decoder path the reference drives through
SAM2ImageWrapper.forward (src/sam2_infer.py:252-260): output tokens
(object-score, IoU, 4 mask tokens) + a trainable 32-token sparse prompt
attend to the 64×64 image embedding over two TwoWayAttention blocks;
masks come from hypernetwork MLPs against a 4×-upscaled feature map with
high-resolution skip connections (conv_s0/conv_s1 features).

Includes the dynamic single/multi-mask stability fallback SAM2 applies in
eval mode, reproduced because the reference runs its fine-tuned model in
eval() (src/circuit_analyzer.py:234).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import MLP


class Attention(nn.Module):
    """SAM attention with internal-dim downsampling."""

    embedding_dim: int = 256
    num_heads: int = 8
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / (head_dim**0.5), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(out.shape[0], out.shape[1], internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)

        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.embedding_dim, dtype=self.dtype, name="mlp_lin2")(y)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), (b, h * w, c))
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads, 2, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """SAM2 mask decoder (object-score token variant)."""

    transformer_dim: int = 256
    mlp_dim: int = 2048  # two-way transformer MLP width
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    use_high_res_features: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    dtype: Any = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (B, 64, 64, 256)
        image_pe: jax.Array,  # (1, 64, 64, 256)
        sparse_prompt_embeddings: jax.Array,  # (B or 1, T, 256)
        dense_prompt_embeddings: jax.Array,  # (B or 1, 64, 64, 256)
        high_res_features: Optional[tuple] = None,  # ((B,256,256,32),(B,128,128,64))
        multimask_output: bool = False,
        deterministic_single_mask: bool = False,
    ):
        b = image_embeddings.shape[0]
        dim = self.transformer_dim
        nm = self.num_mask_tokens

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, dim))
        tokens_list = [iou_token, mask_tokens]
        s = 0
        if self.pred_obj_scores:
            obj_token = self.param("obj_score_token", nn.initializers.normal(1.0), (1, dim))
            tokens_list = [obj_token] + tokens_list
            s = 1
        output_tokens = jnp.concatenate(tokens_list, axis=0)  # (s+1+nm, dim)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b, output_tokens.shape[0], dim)
        ).astype(self.dtype)
        sparse = jnp.broadcast_to(
            sparse_prompt_embeddings,
            (b, sparse_prompt_embeddings.shape[1], dim),
        ).astype(self.dtype)
        tokens = jnp.concatenate([output_tokens, sparse], axis=1)

        src = image_embeddings + dense_prompt_embeddings.astype(image_embeddings.dtype)
        hs, src_out = TwoWayTransformer(
            embedding_dim=self.transformer_dim, mlp_dim=self.mlp_dim,
            dtype=self.dtype, name="transformer",
        )(
            src, image_pe, tokens
        )
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1 : s + 1 + nm]

        # Upscaling with high-res skips (MaskDecoder.predict_masks).
        h = w = image_embeddings.shape[1]
        src_img = src_out.reshape(b, h, w, dim)
        up1 = nn.ConvTranspose(
            dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="output_upscaling_0"
        )(src_img)
        if self.use_high_res_features and high_res_features is not None:
            feat_s0, feat_s1 = high_res_features
            up1 = up1 + feat_s1.astype(up1.dtype)
        up1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="output_upscaling_1")(up1)
        up1 = nn.gelu(up1, approximate=False)
        up2 = nn.ConvTranspose(
            dim // 8, (2, 2), strides=(2, 2), dtype=self.dtype, name="output_upscaling_3"
        )(up1)
        if self.use_high_res_features and high_res_features is not None:
            up2 = up2 + feat_s0.astype(up2.dtype)
        upscaled = nn.gelu(up2, approximate=False)  # (B, 256, 256, 32)

        hyper = jnp.stack(
            [
                MLP(dim, dim // 8, 3, dtype=self.dtype, name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in range(nm)
            ],
            axis=1,
        )  # (B, nm, 32)
        hq, wq = upscaled.shape[1], upscaled.shape[2]
        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper, upscaled, preferred_element_type=jnp.float32
        )  # (B, nm, 256, 256)

        iou_pred = MLP(
            self.iou_head_hidden_dim, nm, self.iou_head_depth, sigmoid_output=True,
            dtype=self.dtype, name="iou_prediction_head",
        )(iou_token_out).astype(jnp.float32)

        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                obj_logits = MLP(dim, 1, 3, dtype=self.dtype, name="pred_obj_score_head")(
                    hs[:, 0]
                )
            else:
                obj_logits = nn.Dense(1, dtype=self.dtype, name="pred_obj_score_head")(hs[:, 0])
        else:
            obj_logits = 10.0 * jnp.ones((b, 1), jnp.float32)

        masks = masks.astype(jnp.float32)
        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability and not deterministic_single_mask:
            out_masks, out_iou = self._stability_select(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]
        return out_masks, out_iou, mask_tokens_out, obj_logits

    def _stability_select(self, masks: jax.Array, iou_pred: jax.Array):
        """Eval-mode fallback: replace an unstable single-mask output with
        the best multimask (sam2 _dynamic_multimask_via_stability)."""
        delta = self.dynamic_multimask_stability_delta
        multi_masks = masks[:, 1:]
        multi_iou = iou_pred[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        best_masks = jnp.take_along_axis(multi_masks, best[:, None, None, None], axis=1)
        best_iou = jnp.take_along_axis(multi_iou, best[:, None], axis=1)

        single = masks[:, 0:1]
        area_i = jnp.sum(single > delta, axis=(-1, -2)).astype(jnp.float32)
        area_u = jnp.sum(single > -delta, axis=(-1, -2)).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)
        is_stable = stability >= self.dynamic_multimask_stability_thresh  # (B, 1)

        out_masks = jnp.where(is_stable[..., None, None], single, best_masks)
        out_iou = jnp.where(is_stable, iou_pred[:, 0:1], best_iou)
        return out_masks, out_iou
