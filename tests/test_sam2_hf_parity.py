"""Hiera trunk parity against the transformers Sam2HieraDetModel.

transformers ≥4.57 ships SAM2 (a parity-tested port of
facebookresearch/sam2), giving this repo an AUTHORITATIVE torch
reference for the trunk — stronger than the self-consistent hand-written
twin in torch_twin_sam2.py. This pins the subtle geometry the twin
cannot arbitrate, in particular the round-3 architecture fix: the FIRST
block of a stage uses the PREVIOUS stage's window size
(Sam2MultiScaleBlock: "take window size from previous stage if first
block of stage"), the q-pooled unpartition geometry, padding on
non-divisible maps (window 14 on small maps), the global-attention
block, and the bicubic+tiled positional embedding.

Weights flow OUR Flax init → HF state_dict with strict load, so the
name/layout map is completeness-checked in both directions.
"""
from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # L-scale trunk compiles vs transformers (~4 min cold)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from circuitvision_tpu.models.sam2.hiera import Hiera

# stages (1,2,2,1) at 128² input (32² map): transitions at blocks 1/3/5
# run windows 8/4/14 (the PREVIOUS stage's spec) with q-pool; block 5's
# window 14 on an 8² map exercises the padding path; block 4 is global.
KW = dict(
    embed_dim=16,
    num_heads=1,
    stages=(1, 2, 2, 1),
    global_att_blocks=(4,),
    window_spec=(8, 4, 14, 7),
    window_pos_embed_bkg_spatial_size=(7, 7),
)
RES = 128


def _hf_trunk():
    from transformers.models.sam2.configuration_sam2 import Sam2HieraDetConfig
    from transformers.models.sam2.modeling_sam2 import Sam2HieraDetModel

    dims = [KW["embed_dim"] * 2**i for i in range(4)]
    cfg = Sam2HieraDetConfig(
        hidden_size=KW["embed_dim"],
        num_attention_heads=KW["num_heads"],
        image_size=[RES, RES],
        blocks_per_stage=list(KW["stages"]),
        embed_dim_per_stage=dims,
        num_attention_heads_per_stage=[KW["num_heads"] * 2**i for i in range(4)],
        window_size_per_stage=list(KW["window_spec"]),
        global_attention_blocks=list(KW["global_att_blocks"]),
        num_query_pool_stages=3,
        window_positional_embedding_background_size=list(
            KW["window_pos_embed_bkg_spatial_size"]
        ),
        hidden_act="gelu",
        attn_implementation="eager",
    )
    return Sam2HieraDetModel(cfg).eval()


def _flax_to_hf_state(params: dict) -> dict:
    """Our trunk tree → Sam2HieraDetModel state_dict (strict-load ready)."""
    t = lambda a: torch.from_numpy(np.array(a, copy=True))
    out = {
        # conv (kh,kw,in,out) → (out,in,kh,kw)
        "patch_embed.projection.weight": t(
            params["patch_embed_proj"]["kernel"]
        ).permute(3, 2, 0, 1),
        "patch_embed.projection.bias": t(params["patch_embed_proj"]["bias"]),
        # (1,h,w,C) → (1,C,h,w)
        "pos_embed": t(params["pos_embed"]).permute(0, 3, 1, 2),
        "pos_embed_window": t(params["pos_embed_window"]).permute(0, 3, 1, 2),
    }
    n_blocks = sum(KW["stages"])
    for i in range(n_blocks):
        b = params[f"blocks_{i}"]
        p = f"blocks.{i}"
        out[f"{p}.layer_norm1.weight"] = t(b["norm1"]["scale"])
        out[f"{p}.layer_norm1.bias"] = t(b["norm1"]["bias"])
        out[f"{p}.layer_norm2.weight"] = t(b["norm2"]["scale"])
        out[f"{p}.layer_norm2.bias"] = t(b["norm2"]["bias"])
        out[f"{p}.attn.qkv.weight"] = t(b["attn"]["qkv"]["kernel"]).T
        out[f"{p}.attn.qkv.bias"] = t(b["attn"]["qkv"]["bias"])
        out[f"{p}.attn.proj.weight"] = t(b["attn"]["proj"]["kernel"]).T
        out[f"{p}.attn.proj.bias"] = t(b["attn"]["proj"]["bias"])
        out[f"{p}.mlp.proj_in.weight"] = t(b["mlp_layers_0"]["kernel"]).T
        out[f"{p}.mlp.proj_in.bias"] = t(b["mlp_layers_0"]["bias"])
        out[f"{p}.mlp.proj_out.weight"] = t(b["mlp_layers_1"]["kernel"]).T
        out[f"{p}.mlp.proj_out.bias"] = t(b["mlp_layers_1"]["bias"])
        if "proj" in b:  # stage-transition shortcut projection
            out[f"{p}.proj.weight"] = t(b["proj"]["kernel"]).T
            out[f"{p}.proj.bias"] = t(b["proj"]["bias"])
    return out


class TestHieraTrunkMatchesTransformersSam2:
    def test_stage_outputs_match(self):
        model = Hiera(**KW)
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, RES, RES, 3)).astype(np.float32)
        # real random params (not zeros) so any geometry slip shows up
        variables = model.init(jax.random.PRNGKey(2), jnp.asarray(x))

        hf = _hf_trunk()
        missing, unexpected = hf.load_state_dict(
            _flax_to_hf_state(variables["params"]), strict=False
        )
        assert not missing and not unexpected, (missing, unexpected)

        with torch.no_grad():
            hf_out = hf(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)))
        with jax.default_matmul_precision("highest"):
            feats = model.apply(variables, jnp.asarray(x))

        hf_feats = hf_out.intermediate_hidden_states
        assert len(hf_feats) == len(feats) == 4
        for k, (ours, theirs) in enumerate(zip(feats, hf_feats)):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy(), atol=2e-5, rtol=1e-4,
                err_msg=f"stage {k} diverges",
            )

    def test_old_window_selection_would_fail(self):
        """Guard the regression: a Hiera wired the pre-fix way (transition
        blocks using the NEW stage's window) must NOT reproduce the HF
        reference — this asserts the test has discriminating power."""
        model = Hiera(**KW)
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, RES, RES, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(2), jnp.asarray(x))

        # simulate the old behavior by swapping the window_spec so the
        # transition into stage 2 sees window 4 (the NEW stage's spec
        # under the old rule) while plain stage-1 blocks are unaffected
        # (stage 1 has exactly one block, the non-transition block 0).
        old_style = Hiera(**{**KW, "window_spec": (8, 8, 14, 7)})
        # (8,8,...) vs (8,4,...): under CORRECT semantics the stage-2
        # transition uses spec[0]=8 in both, but stage-2's own block 2
        # uses 8 instead of 4 — a pure window-extent change, no shapes.
        v2 = {"params": variables["params"]}
        with jax.default_matmul_precision("highest"):
            a = model.apply(v2, jnp.asarray(x))
            b = old_style.apply(v2, jnp.asarray(x))
        assert not np.allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-5)


class TestFpnNeckMatchesTransformersSam2:
    def test_features_and_position_encodings_match(self):
        """FpnNeck vs Sam2VisionNeck on identical multi-scale inputs:
        lateral convs, selective nearest top-down fusion, and the
        normalized sine position encodings."""
        from transformers.models.sam2.configuration_sam2 import Sam2VisionConfig
        from transformers.models.sam2.modeling_sam2 import Sam2VisionNeck

        from circuitvision_tpu.models.sam2.neck import FpnNeck

        d_model = 32
        chans = (128, 64, 32, 16)  # low-res first (backbone_channel_list)
        neck = FpnNeck(d_model=d_model, backbone_channel_list=chans)
        rng = np.random.default_rng(3)
        # high-res-first trunk outputs: strides 4/8/16/32 of a 128 input
        xs = [
            jnp.asarray(rng.standard_normal((2, s, s, c)).astype(np.float32))
            for s, c in zip((32, 16, 8, 4), reversed(chans))
        ]
        variables = neck.init(jax.random.PRNGKey(0), xs)

        hf_cfg = Sam2VisionConfig(
            backbone_channel_list=list(chans),
            fpn_hidden_size=d_model,
            backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]],
        )
        hf_neck = Sam2VisionNeck(hf_cfg).eval()
        state = {}
        for j in range(4):
            k = variables["params"][f"convs_{j}_conv"]["kernel"]
            state[f"convs.{j}.weight"] = torch.from_numpy(
                np.array(k, copy=True)
            ).permute(3, 2, 0, 1)
            state[f"convs.{j}.bias"] = torch.from_numpy(
                np.array(variables["params"][f"convs_{j}_conv"]["bias"], copy=True)
            )
        missing, unexpected = hf_neck.load_state_dict(state, strict=False)
        assert not missing and not unexpected, (missing, unexpected)

        with torch.no_grad():
            hf_feats, hf_pos = hf_neck(
                [torch.from_numpy(np.array(x, copy=True)) for x in xs]
            )
        with jax.default_matmul_precision("highest"):
            feats, pos = neck.apply(variables, xs)

        # HF emits low-res→high-res; ours is high-res-first
        for k in range(4):
            np.testing.assert_allclose(
                np.asarray(feats[k]).transpose(0, 3, 1, 2),
                hf_feats[3 - k].numpy(), atol=2e-5, rtol=1e-4,
                err_msg=f"neck level {k}",
            )
            # ours is batch-1 (PE is batch-invariant); HF emits batch-B
            np.testing.assert_allclose(
                np.asarray(pos[k]).transpose(0, 3, 1, 2)[0],
                hf_pos[3 - k].numpy()[0], atol=2e-5, rtol=1e-4,
                err_msg=f"pos encoding level {k}",
            )
