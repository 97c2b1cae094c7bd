"""Prompt-free SAM 2.1 image segmenter — the full device path.

Re-implements SAM2ImageWrapper.forward (src/sam2_infer.py:220-275) as one
Flax module / one jit program:

  Hiera trunk → FPN neck (scalp=1) → conv_s0/s1 high-res projections →
  mask decoder with trainable dense (rank-r factored) and sparse prompt
  embeddings → bilinear upsample to 1024² → MultiKernelRefinement.

The dense prompt is E1 (1, 256, r) @ E2 (1, r, 64·64) reshaped to a
64×64×256 map, and the sparse prompt is a learned (1, 32, 256) token
block — the net-new parameters of the reference fine-tune
(src/sam2_infer.py:206-209), ported via convert.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.config import SAM2Config
from .decoder import MaskDecoder
from .hiera import Hiera
from .neck import FpnNeck


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier dense positional encoding (SAM prompt encoder).

    Only get_dense_pe() of the reference prompt encoder is exercised
    (src/sam2_infer.py:254); the gaussian matrix ports from the checkpoint.
    """

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, h: int, w: int) -> jax.Array:
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.num_pos_feats),
        )
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.tile(xs[None, :], (h, 1)), jnp.tile(ys[:, None], (1, w))], axis=-1
        )  # (H, W, 2) in [0,1]
        coords = (2.0 * grid - 1.0) @ gauss
        coords = 2.0 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)  # (H,W,256)


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's param names/shapes, so the
    fused-kernel path and the XLA path share one checkpoint layout."""

    features: int
    kernel_size: tuple

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MultiKernelRefinement(nn.Module):
    """Parallel odd-kernel conv branches + GELU, 1×1 combiner
    (src/sam2_infer.py:130-189). Input/output (B, H, W, 1) logits.

    On TPU the whole head runs as one fused Pallas kernel (the C_in=1
    convs are MXU-degenerate; XLA's generic path costs ~15 ms per batch-4
    step on v5e — see ops/pallas/refinement_fused.py). Elsewhere it runs
    as plain XLA convs. Both paths share the same parameters.
    """

    kernel_sizes: tuple = (3, 5, 7, 11)
    intermediate_channels: int = 4
    dtype: Any = jnp.float32
    use_fused: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ic = self.intermediate_channels
        branch_params = [
            _ConvParams(ic, (k, k), name=f"conv_branches_{i}")(1)
            for i, k in enumerate(self.kernel_sizes)
        ]
        comb_w, comb_b = _ConvParams(1, (1, 1), name="combiner_conv")(
            ic * len(self.kernel_sizes)
        )

        from . import hiera as _hiera

        # Respect the trace-time fused-gate override (hiera.force_fused):
        # the kernel is forward-only, so training traces the conv path —
        # including under the selective-training int cutoff, where every
        # non-trunk kernel site is part of the differentiable tail.
        _on_tpu = _hiera._fused_gate(None)
        fused_ok = (
            self.use_fused
            and tuple(self.kernel_sizes) == (3, 5, 7, 11)
            and ic == 4
            and _on_tpu
        )
        if fused_ok:
            from ...ops.pallas.refinement_fused import refinement_fused

            return refinement_fused(
                x,
                tuple(w for w, _ in branch_params),
                tuple(b for _, b in branch_params),
                comb_w,
                comb_b,
            ).astype(self.dtype)

        dn = ("NHWC", "HWIO", "NHWC")
        dt = self.dtype
        branches = []
        for w, b in branch_params:
            y = jax.lax.conv_general_dilated(
                x.astype(dt), w.astype(dt), (1, 1), "SAME", dimension_numbers=dn
            ) + b.astype(dt)
            branches.append(nn.gelu(y, approximate=False))
        cat = jnp.concatenate(branches, axis=-1)
        return (
            jax.lax.conv_general_dilated(
                cat, comb_w.astype(dt), (1, 1), "SAME", dimension_numbers=dn
            )
            + comb_b.astype(dt)
        )


class SAM2ImageSegmenter(nn.Module):
    """End-to-end prompt-free segmenter. Input: normalized (B, S, S, 3).

    Returns (high_res_logits (B, S, S, 1), low_res_logits (B, 256, 256, 1),
    iou_predictions (B, 1)).
    """

    cfg: SAM2Config = SAM2Config()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array):
        cfg = self.cfg
        dt = self.dtype

        # 1. Trunk + neck (image_encoder; scalp drops the lowest-res level).
        feats = Hiera(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.num_heads,
            stages=tuple(cfg.stages),
            global_att_blocks=tuple(cfg.global_att_blocks),
            window_pos_embed_bkg_spatial_size=tuple(cfg.window_pos_embed_bkg_spatial_size),
            window_spec=tuple(cfg.window_spec),
            dtype=dt,
            pad_multiple=cfg.trunk_pad_multiple,
            name="trunk",
        )(images)
        fpn, _pos = FpnNeck(
            d_model=cfg.d_model,
            backbone_channel_list=tuple(cfg.backbone_channel_list),
            fpn_top_down_levels=tuple(cfg.fpn_top_down_levels),
            dtype=dt,
            name="neck",
        )(feats)
        fpn = fpn[: len(fpn) - cfg.scalp] if cfg.scalp else fpn
        # fpn: [256² d256, 128² d256, 64² d256] high-res-first.

        # 2. High-res skip projections (sam_mask_decoder.conv_s0/s1,
        #    applied by the wrapper before decoding, src/sam2_infer.py:227-232).
        feat_s0 = nn.Conv(cfg.d_model // 8, (1, 1), dtype=dt, name="conv_s0")(fpn[0])
        feat_s1 = nn.Conv(cfg.d_model // 4, (1, 1), dtype=dt, name="conv_s1")(fpn[1])
        image_embed = fpn[2]  # (B, 64, 64, 256)

        # 3. Prompts: dense PE grid + trainable embeddings.
        grid = image_embed.shape[1]
        pe = PositionEmbeddingRandom(cfg.d_model // 2, name="dense_pe")(grid, grid)
        image_pe = pe[None].astype(dt)  # (1, 64, 64, 256)

        r = cfg.trainable_embedding_r
        e1 = self.param("dense_embedding1", nn.initializers.normal(1.0), (1, cfg.d_model, r))
        e2 = self.param(
            "dense_embedding2", nn.initializers.normal(1.0), (1, r, grid * grid)
        )
        dense = jnp.matmul(e1, e2).reshape(1, cfg.d_model, grid, grid)
        dense = jnp.transpose(dense, (0, 2, 3, 1))  # NHWC
        sparse = self.param(
            "sparse_embedding", nn.initializers.normal(1.0),
            (1, cfg.sparse_embedding_len, cfg.d_model),
        )

        # 4. Mask decoder (single-mask path with stability fallback).
        low_res, iou_pred, _tokens, _obj = MaskDecoder(
            transformer_dim=cfg.d_model,
            mlp_dim=cfg.decoder_mlp_dim,
            num_multimask_outputs=cfg.num_multimask_outputs,
            iou_head_depth=cfg.iou_head_depth,
            iou_head_hidden_dim=cfg.iou_head_hidden_dim,
            pred_obj_scores=cfg.pred_obj_scores,
            pred_obj_scores_mlp=cfg.pred_obj_scores_mlp,
            use_high_res_features=cfg.use_high_res_features,
            dynamic_multimask_via_stability=cfg.dynamic_multimask_via_stability,
            dynamic_multimask_stability_delta=cfg.dynamic_multimask_stability_delta,
            dynamic_multimask_stability_thresh=cfg.dynamic_multimask_stability_thresh,
            dtype=dt,
            name="sam_mask_decoder",
        )(
            image_embed,
            image_pe,
            sparse.astype(dt),
            dense.astype(dt),
            high_res_features=(feat_s0, feat_s1),
            multimask_output=False,
        )
        # low_res: (B, 1, 256, 256) float32 logits.

        # 5. Upsample to full resolution + refinement (src/sam2_infer.py:263-272).
        low_res_nhwc = jnp.transpose(low_res, (0, 2, 3, 1))
        b = low_res_nhwc.shape[0]
        high_res = jax.image.resize(
            low_res_nhwc, (b, cfg.resolution, cfg.resolution, 1), method="linear"
        )
        if cfg.use_refinement:
            high_res = MultiKernelRefinement(
                tuple(cfg.refinement_kernels), cfg.refinement_channels,
                dtype=dt, name="refinement_layer",
            )(high_res.astype(dt)).astype(jnp.float32)
        return high_res, low_res_nhwc, iou_pred


def init_params(model: SAM2ImageSegmenter, rng: jax.Array, resolution=None) -> dict:
    from ..initialization import fast_init

    res = resolution or model.cfg.resolution
    dummy = jnp.zeros((1, res, res, 3), jnp.float32)
    return fast_init(model, rng, dummy)
