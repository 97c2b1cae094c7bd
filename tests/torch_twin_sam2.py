"""Minimal PyTorch twin of the prompt-free SAM2 image wrapper.

Implements the OFFICIAL SAM2 architecture semantics (facebookresearch/
sam2: hieradet window partitioning and q-pooling, FpnNeck top-down,
random-Fourier dense PE, two-way-attention mask decoder with high-res
skips and the dynamic-stability single-mask path) plus the reference
wrapper's additions (E1@E2 dense prompt, 32-token sparse prompt,
bilinear upsample, MultiKernelRefinement — src/sam2_infer.py:130-275),
with module names matching circuitvision_tpu's `export_torch_state`
exactly, so `load_state_dict(strict=True)` doubles as a naming/shape
completeness check of the converter.

Used by tests/test_full_model_parity.py to diff the COMPOSED forward
(window order, q-pool geometry, pos-embed interpolation, decoder wiring)
against the converted Flax model at a tiny config — the places a
converted real checkpoint would silently diverge (VERDICT r2 missing #2).
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- hiera


def do_pool(x: torch.Tensor, pool: nn.Module) -> torch.Tensor:
    # (B, H, W, C) -> (B, H', W', C)
    x = x.permute(0, 3, 1, 2)
    x = pool(x)
    return x.permute(0, 2, 3, 1)


def window_partition(x, window_size):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = (
        x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, window_size, window_size, C)
    )
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.view(
        B, Hp // window_size, Wp // window_size, window_size, window_size, -1
    )
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    if Hp > H or Wp > W:
        x = x[:, :H, :W, :].contiguous()
    return x


class MultiScaleAttention(nn.Module):
    def __init__(self, dim, dim_out, num_heads, q_pool=None):
        super().__init__()
        self.dim_out = dim_out
        self.num_heads = num_heads
        self.q_pool = q_pool
        self.qkv = nn.Linear(dim, dim_out * 3)
        self.proj = nn.Linear(dim_out, dim_out)

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.num_heads, -1)
        q, k, v = torch.unbind(qkv, 2)
        if self.q_pool is not None:
            q = do_pool(q.reshape(B, H, W, -1), self.q_pool)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.num_heads, -1)
        x = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        )
        x = x.transpose(1, 2).reshape(B, H, W, -1)
        return self.proj(x)


class MLP(nn.Module):
    """sam2_utils.MLP: Linear chain named layers.N, ReLU between."""

    def __init__(self, input_dim, hidden_dim, output_dim, num_layers,
                 sigmoid_output=False):
        super().__init__()
        self.num_layers = num_layers
        dims = [input_dim] + [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [output_dim])
        )
        self.sigmoid_output = sigmoid_output

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
        if self.sigmoid_output:
            x = torch.sigmoid(x)
        return x


class HieraMLP(nn.Module):
    """hieradet MLP: layers.0 / layers.1 with GELU (exact)."""

    def __init__(self, dim, hidden, dim_out):
        super().__init__()
        self.layers = nn.ModuleList([nn.Linear(dim, hidden), nn.Linear(hidden, dim_out)])

    def forward(self, x):
        return self.layers[1](F.gelu(self.layers[0](x), approximate="none"))


class MultiScaleBlock(nn.Module):
    def __init__(self, dim, dim_out, num_heads, q_stride=None, window_size=0):
        super().__init__()
        self.dim = dim
        self.dim_out = dim_out
        self.window_size = window_size
        self.q_stride = q_stride
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.pool = (
            nn.MaxPool2d(kernel_size=q_stride, stride=q_stride) if q_stride else None
        )
        self.attn = MultiScaleAttention(dim, dim_out, num_heads, q_pool=self.pool)
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        self.mlp = HieraMLP(dim_out, int(dim_out * 4.0), dim_out)
        if dim != dim_out:
            self.proj = nn.Linear(dim, dim_out)

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.dim != self.dim_out:
            shortcut = do_pool(self.proj(x), self.pool)

        window_size = self.window_size
        if window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, window_size)

        x = self.attn(x)
        if self.q_stride:
            # official hieradet: recompute pad from the shortcut dims
            window_size = self.window_size // self.q_stride[0]
            H, W = shortcut.shape[1:3]
            pad_h = (window_size - H % window_size) % window_size
            pad_w = (window_size - W % window_size) % window_size
            pad_hw = (H + pad_h, W + pad_w)

        if self.window_size > 0:
            x = window_unpartition(x, window_size, pad_hw, (H, W))

        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class Hiera(nn.Module):
    def __init__(self, embed_dim, num_heads, stages, global_att_blocks,
                 window_pos_embed_bkg_spatial_size, window_spec, q_pool=3):
        super().__init__()
        depth = sum(stages)
        self.window_spec = window_spec
        self.stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
        assert 0 <= q_pool <= len(self.stage_ends[:-1])
        self.q_pool_blocks = [x + 1 for x in self.stage_ends[:-1]][:q_pool]

        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            3, embed_dim, kernel_size=7, stride=4, padding=3
        )
        self.pos_embed = nn.Parameter(
            torch.zeros(1, embed_dim, *window_pos_embed_bkg_spatial_size)
        )
        self.pos_embed_window = nn.Parameter(
            torch.zeros(1, embed_dim, window_spec[0], window_spec[0])
        )

        cur_stage = 1
        self.blocks = nn.ModuleList()
        dim = embed_dim
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if global_att_blocks is not None:
                window_size = 0 if i in global_att_blocks else window_size
            if i - 1 in self.stage_ends:
                dim_out = dim * 2
                cur_stage += 1
                num_heads = num_heads * 2
                # window_size stays the PREVIOUS stage's spec: hieradet
                # reads window_spec before the stage bump (transformers
                # Sam2MultiScaleBlock: "take window size from previous
                # stage if first block of stage").
            self.blocks.append(
                MultiScaleBlock(
                    dim=dim,
                    dim_out=dim_out,
                    num_heads=num_heads,
                    q_stride=(2, 2) if i in self.q_pool_blocks else None,
                    window_size=window_size,
                )
            )
            dim = dim_out

    def _get_pos_embed(self, hw):
        h, w = hw
        window_embed = self.pos_embed_window
        pos_embed = F.interpolate(self.pos_embed, size=(h, w), mode="bicubic")
        pos_embed = pos_embed + window_embed.tile(
            [x // y for x, y in zip(pos_embed.shape, window_embed.shape)]
        )
        return pos_embed.permute(0, 2, 3, 1)

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)  # (B, H, W, C)
        x = x + self._get_pos_embed(x.shape[1:3])
        outputs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.stage_ends:
                outputs.append(x.permute(0, 3, 1, 2))
        return outputs  # high-res first, (B, C, H, W)


# ----------------------------------------------------------------- neck


class FpnNeck(nn.Module):
    def __init__(self, d_model, backbone_channel_list, fpn_top_down_levels):
        super().__init__()
        self.convs = nn.ModuleList()
        for dim in backbone_channel_list:
            current = nn.Sequential()
            current.add_module("conv", nn.Conv2d(dim, d_model, kernel_size=1))
            self.convs.append(current)
        self.fpn_top_down_levels = list(fpn_top_down_levels)

    def forward(self, xs):
        # xs: high-res first; convs built lowest-res(in=max channels) first
        out = [None] * len(self.convs)
        prev = None
        n = len(self.convs) - 1
        for i in range(n, -1, -1):
            x = xs[i]
            lateral = self.convs[n - i](x)
            if i in self.fpn_top_down_levels and prev is not None:
                top_down = F.interpolate(
                    prev.to(torch.float32), scale_factor=2.0, mode="nearest"
                )
                prev = lateral + top_down
            else:
                prev = lateral
            out[i] = prev
        return out


# -------------------------------------------------------------- decoder


class Attention(nn.Module):
    """SAM decoder attention with optional internal downsampling."""

    def __init__(self, embedding_dim, num_heads, downsample_rate=1):
        super().__init__()
        self.internal_dim = embedding_dim // downsample_rate
        self.num_heads = num_heads
        self.q_proj = nn.Linear(embedding_dim, self.internal_dim)
        self.k_proj = nn.Linear(embedding_dim, self.internal_dim)
        self.v_proj = nn.Linear(embedding_dim, self.internal_dim)
        self.out_proj = nn.Linear(self.internal_dim, embedding_dim)

    def _split(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads).transpose(1, 2)

    def forward(self, q, k, v):
        q = self._split(self.q_proj(q))
        k = self._split(self.k_proj(k))
        v = self._split(self.v_proj(v))
        out = F.scaled_dot_product_attention(q, k, v)
        b, h, n, d = out.shape
        return self.out_proj(out.transpose(1, 2).reshape(b, n, h * d))


class TwoWayAttentionBlock(nn.Module):
    def __init__(self, embedding_dim, num_heads, mlp_dim,
                 attention_downsample_rate=2, skip_first_layer_pe=False):
        super().__init__()
        self.self_attn = Attention(embedding_dim, num_heads)
        self.norm1 = nn.LayerNorm(embedding_dim)
        self.cross_attn_token_to_image = Attention(
            embedding_dim, num_heads, attention_downsample_rate
        )
        self.norm2 = nn.LayerNorm(embedding_dim)
        self.mlp = MLP(embedding_dim, mlp_dim, embedding_dim, 2)
        self.norm3 = nn.LayerNorm(embedding_dim)
        self.norm4 = nn.LayerNorm(embedding_dim)
        self.cross_attn_image_to_token = Attention(
            embedding_dim, num_heads, attention_downsample_rate
        )
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)

        queries = queries + self.mlp(queries)
        queries = self.norm3(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, embedding_dim, num_heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList(
            TwoWayAttentionBlock(
                embedding_dim, num_heads, mlp_dim, skip_first_layer_pe=(i == 0)
            )
            for i in range(depth)
        )
        self.final_attn_token_to_image = Attention(embedding_dim, num_heads, 2)
        self.norm_final_attn = nn.LayerNorm(embedding_dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        image_embedding = image_embedding.flatten(2).permute(0, 2, 1)
        image_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        keys = image_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        queries = self.norm_final_attn(queries)
        return queries, keys


class LayerNorm2d(nn.Module):
    def __init__(self, num_channels, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(num_channels))
        self.bias = nn.Parameter(torch.zeros(num_channels))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MaskDecoder(nn.Module):
    def __init__(self, transformer_dim, num_multimask_outputs=3,
                 iou_head_depth=3, iou_head_hidden_dim=256, mlp_dim=2048,
                 stability_delta=0.05, stability_thresh=0.98):
        super().__init__()
        self.num_mask_tokens = num_multimask_outputs + 1
        self.stability_delta = stability_delta
        self.stability_thresh = stability_thresh
        self.iou_token = nn.Embedding(1, transformer_dim)
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, transformer_dim)
        self.obj_score_token = nn.Embedding(1, transformer_dim)
        self.transformer = TwoWayTransformer(2, transformer_dim, 8, mlp_dim)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(transformer_dim, transformer_dim // 4, 2, 2),
            LayerNorm2d(transformer_dim // 4),
            nn.GELU(),
            nn.ConvTranspose2d(transformer_dim // 4, transformer_dim // 8, 2, 2),
            nn.GELU(),
        )
        self.conv_s0 = nn.Conv2d(transformer_dim, transformer_dim // 8, 1)
        self.conv_s1 = nn.Conv2d(transformer_dim, transformer_dim // 4, 1)
        self.output_hypernetworks_mlps = nn.ModuleList(
            MLP(transformer_dim, transformer_dim, transformer_dim // 8, 3)
            for _ in range(self.num_mask_tokens)
        )
        # sam2.1_hiera_l.yaml: iou_prediction_use_sigmoid: True
        self.iou_prediction_head = MLP(
            transformer_dim, iou_head_hidden_dim, self.num_mask_tokens,
            iou_head_depth, sigmoid_output=True,
        )
        self.pred_obj_score_head = MLP(transformer_dim, transformer_dim, 1, 3)

    def _stability(self, mask_logits):
        flat = mask_logits.flatten(-2)
        area_i = torch.sum(flat > self.stability_delta, dim=-1).float()
        area_u = torch.sum(flat > -self.stability_delta, dim=-1).float()
        return torch.where(area_u > 0, area_i / area_u, torch.ones_like(area_i))

    def _dynamic_single(self, all_masks, all_iou):
        multimask = all_masks[:, 1:]
        multi_iou = all_iou[:, 1:]
        best = torch.argmax(multi_iou, dim=-1)
        bidx = torch.arange(multimask.size(0), device=multimask.device)
        best_masks = multimask[bidx, best].unsqueeze(1)
        best_iou = multi_iou[bidx, best].unsqueeze(1)
        single = all_masks[:, 0:1]
        single_iou = all_iou[:, 0:1]
        stable = (self._stability(single) >= self.stability_thresh)[..., None]
        masks = torch.where(stable[..., None], single, best_masks)
        iou = torch.where(stable, single_iou, best_iou)
        return masks, iou

    def forward(self, image_embeddings, image_pe, sparse, dense,
                high_res_features, multimask_output=False):
        out_tokens = torch.cat(
            [self.obj_score_token.weight, self.iou_token.weight,
             self.mask_tokens.weight], dim=0
        )
        out_tokens = out_tokens.unsqueeze(0).expand(sparse.size(0), -1, -1)
        tokens = torch.cat((out_tokens, sparse), dim=1)
        s = 1

        src = image_embeddings + dense
        pos_src = image_pe.expand(tokens.size(0), -1, -1, -1)
        b, c, h, w = src.shape

        hs, src = self.transformer(src, pos_src, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens]

        src = src.transpose(1, 2).view(b, c, h, w)
        dc1, ln1, act1, dc2, act2 = self.output_upscaling
        feat_s0, feat_s1 = high_res_features
        upscaled = act1(ln1(dc1(src) + feat_s1))
        upscaled = act2(dc2(upscaled) + feat_s0)

        hyper_in = torch.stack(
            [
                self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
                for i in range(self.num_mask_tokens)
            ],
            dim=1,
        )
        b, c, h, w = upscaled.shape
        masks = (hyper_in @ upscaled.view(b, c, h * w)).view(b, -1, h, w)
        iou_pred = self.iou_prediction_head(iou_token_out)

        if multimask_output:
            masks = masks[:, 1:]
            iou_pred = iou_pred[:, 1:]
        else:
            # eval-mode dynamic stability path (mask_decoder.py; the
            # reference wrapper runs the model in eval())
            masks, iou_pred = self._dynamic_single(masks, iou_pred)
        return masks, iou_pred


class PositionEmbeddingRandom(nn.Module):
    def __init__(self, num_pos_feats=128):
        super().__init__()
        self.positional_encoding_gaussian_matrix = nn.Parameter(
            torch.randn(2, num_pos_feats)
        )

    def forward(self, size):
        h, w = size
        device = self.positional_encoding_gaussian_matrix.device
        grid = torch.ones(h, w, device=device, dtype=torch.float32)
        y_embed = (grid.cumsum(dim=0) - 0.5) / h
        x_embed = (grid.cumsum(dim=1) - 0.5) / w
        coords = torch.stack([x_embed, y_embed], dim=-1)
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * math.pi * coords
        pe = torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)
        return pe.permute(2, 0, 1)  # (C, H, W)


class MultiKernelRefinement(nn.Module):
    def __init__(self, kernel_sizes=(3, 5, 7, 11), intermediate_channels=4):
        super().__init__()
        self.conv_branches = nn.ModuleList(
            nn.Conv2d(1, intermediate_channels, k, padding=k // 2)
            for k in kernel_sizes
        )
        self.combiner_conv = nn.Conv2d(
            intermediate_channels * len(kernel_sizes), 1, 1
        )

    def forward(self, x):
        branches = [
            F.gelu(conv(x), approximate="none") for conv in self.conv_branches
        ]
        return self.combiner_conv(torch.cat(branches, dim=1))


class TorchSam2Twin(nn.Module):
    """Composed twin of SAM2ImageSegmenter (src/sam2_infer.py:220-275)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.image_encoder = nn.Module()
        self.image_encoder.trunk = Hiera(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.num_heads,
            stages=tuple(cfg.stages),
            global_att_blocks=tuple(cfg.global_att_blocks),
            window_pos_embed_bkg_spatial_size=tuple(
                cfg.window_pos_embed_bkg_spatial_size
            ),
            window_spec=tuple(cfg.window_spec),
        )
        self.image_encoder.neck = FpnNeck(
            cfg.d_model, tuple(cfg.backbone_channel_list),
            tuple(cfg.fpn_top_down_levels),
        )
        self.sam_mask_decoder = MaskDecoder(
            cfg.d_model,
            num_multimask_outputs=cfg.num_multimask_outputs,
            iou_head_depth=cfg.iou_head_depth,
            iou_head_hidden_dim=cfg.iou_head_hidden_dim,
            mlp_dim=cfg.decoder_mlp_dim,
            stability_delta=cfg.dynamic_multimask_stability_delta,
            stability_thresh=cfg.dynamic_multimask_stability_thresh,
        )
        self.sam_prompt_encoder = nn.Module()
        self.sam_prompt_encoder.pe_layer = PositionEmbeddingRandom(cfg.d_model // 2)
        self.refinement_layer = MultiKernelRefinement(
            tuple(cfg.refinement_kernels), cfg.refinement_channels
        )
        grid = cfg.resolution // 16
        self.dense_embedding1 = nn.Parameter(
            torch.zeros(1, cfg.d_model, cfg.trainable_embedding_r)
        )
        self.dense_embedding2 = nn.Parameter(
            torch.zeros(1, cfg.trainable_embedding_r, grid * grid)
        )
        self.sparse_embedding = nn.Parameter(
            torch.zeros(1, cfg.sparse_embedding_len, cfg.d_model)
        )

    @torch.no_grad()
    def forward(self, images):  # (B, 3, S, S) normalized
        cfg = self.cfg
        feats = self.image_encoder.trunk(images)
        fpn = self.image_encoder.neck(feats)
        fpn = fpn[: len(fpn) - cfg.scalp] if cfg.scalp else fpn

        feat_s0 = self.sam_mask_decoder.conv_s0(fpn[0])
        feat_s1 = self.sam_mask_decoder.conv_s1(fpn[1])
        image_embed = fpn[2]

        grid = image_embed.shape[-1]
        image_pe = self.sam_prompt_encoder.pe_layer((grid, grid)).unsqueeze(0)

        dense = (self.dense_embedding1 @ self.dense_embedding2).reshape(
            1, cfg.d_model, grid, grid
        )
        b = images.shape[0]
        sparse = self.sparse_embedding.expand(b, -1, -1)

        low_res, iou_pred = self.sam_mask_decoder(
            image_embed, image_pe, sparse, dense.expand(b, -1, -1, -1),
            high_res_features=(feat_s0, feat_s1), multimask_output=False,
        )
        high_res = F.interpolate(
            low_res, size=(cfg.resolution, cfg.resolution), mode="bilinear",
            align_corners=False,
        )
        if cfg.use_refinement:
            high_res = self.refinement_layer(high_res)
        return high_res, low_res, iou_pred
