"""SAM 2.1 segmenter: architecture shapes, decoder behaviors, converter."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.core.config import SAM2Config
from circuitvision_tpu.models.sam2.convert import (
    expected_torch_keys,
    normalize_and_fold,
)
from circuitvision_tpu.models.sam2.hiera import (
    Hiera,
    window_partition,
    window_unpartition,
)
from circuitvision_tpu.models.sam2.neck import position_embedding_sine
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter, init_params

TINY = SAM2Config(
    resolution=128,
    embed_dim=32,
    num_heads=1,
    stages=(1, 2, 4, 1),
    global_att_blocks=(5,),
    window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32),
    decoder_mlp_dim=128,
)


@pytest.fixture(scope="module")
def tiny_sam():
    model = SAM2ImageSegmenter(cfg=TINY)
    variables = init_params(model, jax.random.PRNGKey(0))
    return model, variables


class TestWindows:
    def test_partition_round_trip(self):
        x = jnp.arange(2 * 12 * 12 * 3, dtype=jnp.float32).reshape(2, 12, 12, 3)
        wins, pad_hw = window_partition(x, 4)
        assert wins.shape == (2 * 9, 4, 4, 3)
        back = window_unpartition(wins, 4, pad_hw, (12, 12))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_partition_with_padding(self):
        x = jnp.ones((1, 10, 14, 2))
        wins, pad_hw = window_partition(x, 4)
        assert pad_hw == (12, 16)
        back = window_unpartition(wins, 4, pad_hw, (10, 14))
        assert back.shape == (1, 10, 14, 2)


class TestHiera:
    def test_feature_pyramid_shapes(self):
        model = Hiera(
            embed_dim=32, num_heads=1, stages=(1, 2, 4, 1),
            global_att_blocks=(5,), window_spec=(4, 2, 4, 2),
        )
        from circuitvision_tpu.models.initialization import fast_init

        x = jnp.zeros((1, 128, 128, 3))
        variables = fast_init(model, jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        assert [f.shape for f in feats] == [
            (1, 32, 32, 32),
            (1, 16, 16, 64),
            (1, 8, 8, 128),
            (1, 4, 4, 256),
        ]


class TestSegmenter:
    @pytest.mark.slow
    def test_forward_shapes(self, tiny_sam):
        model, variables = tiny_sam
        x = jnp.zeros((2, 128, 128, 3))
        high, low, iou = model.apply(variables, x)
        assert high.shape == (2, 128, 128, 1)
        # low-res mask = 4× the 8×8 embedding grid
        assert low.shape == (2, 32, 32, 1)
        assert iou.shape == (2, 1)
        assert np.isfinite(np.asarray(high)).all()

    def test_jit_and_binarize(self, tiny_sam):
        model, variables = tiny_sam
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        high, _, _ = fwd(variables, jnp.zeros((1, 128, 128, 3)))
        mask = np.asarray(high[0, :, :, 0] > 0)
        assert mask.shape == (128, 128)

    def test_hiera_l_param_count(self):
        # Full SAM2.1 Hiera-L image path ≈ 224M params (SURVEY.md §2.4).
        model = SAM2ImageSegmenter(cfg=SAM2Config())
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3)))
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert 190e6 < n < 260e6, f"param count {n}"


class TestPositionEncodings:
    def test_sine_shape_and_range(self):
        pe = position_embedding_sine(8, 16, 256)
        assert pe.shape == (8, 16, 256)
        arr = np.asarray(pe)
        assert arr.min() >= -1.0001 and arr.max() <= 1.0001


class TestConvTransposeParity:
    def test_matches_torch(self):
        """flax ConvTranspose(k=2, s=2) ↔ torch ConvTranspose2d weight layout."""
        import torch
        import flax.linen as fnn

        rng = np.random.default_rng(0)
        w_t = rng.normal(size=(6, 4, 2, 2)).astype(np.float32)  # (in, out, kh, kw)
        b_t = rng.normal(size=(4,)).astype(np.float32)
        x = rng.normal(size=(1, 5, 5, 6)).astype(np.float32)

        tconv = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w_t))
            tconv.bias.copy_(torch.from_numpy(b_t))
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        ref = ref.transpose(0, 2, 3, 1)

        from circuitvision_tpu.models.sam2.convert import _to_flax

        mod = fnn.ConvTranspose(4, (2, 2), strides=(2, 2))
        variables = {"params": {"kernel": jnp.asarray(_to_flax(w_t, "convT")),
                                "bias": jnp.asarray(b_t)}}
        out = np.asarray(mod.apply(variables, jnp.asarray(x)))
        # XLA CPU's default conv precision leaves ~1e-3 relative residue;
        # layout correctness is what this asserts.
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-2)


class TestConverter:
    def test_expected_keys_shape(self, tiny_sam):
        _, variables = tiny_sam
        keys = expected_torch_keys(variables)
        assert "image_encoder.trunk.patch_embed.proj.weight" in keys
        assert "sam_mask_decoder.transformer.layers.0.self_attn.q_proj.weight" in keys
        assert "sam_mask_decoder.iou_token.weight" in keys
        assert "dense_embedding1" in keys
        assert "refinement_layer.combiner_conv.weight" in keys
        assert "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix" in keys
        assert "image_encoder.neck.convs.0.conv.weight" in keys

    def test_lora_folding_linear(self):
        w = np.eye(4, dtype=np.float32)
        a = np.ones((2, 4), np.float32)
        b = np.ones((4, 2), np.float32)
        state = {
            "sam2_model.base_model.model.m.base_layer.weight": w,
            "sam2_model.base_model.model.m.lora_A.default.weight": a,
            "sam2_model.base_model.model.m.lora_B.default.weight": b,
        }
        folded = normalize_and_fold(state, lora_alpha=16.0)
        # scale = 16/2 = 8; B@A = 2*ones(4,4)
        np.testing.assert_allclose(folded["m.weight"], w + 8.0 * 2.0 * np.ones((4, 4)))

    def test_lora_folding_conv(self):
        w = np.zeros((4, 3, 1, 1), np.float32)
        a = np.ones((2, 3, 1, 1), np.float32)
        b = np.ones((4, 2, 1, 1), np.float32)
        state = {
            "x.base_layer.weight": w,
            "x.lora_A.default.weight": a,
            "x.lora_B.default.weight": b,
        }
        folded = normalize_and_fold(state, lora_alpha=16.0)
        np.testing.assert_allclose(folded["x.weight"], 8.0 * 2.0 * np.ones((4, 3, 1, 1)))

    def test_round_trip_conversion(self, tiny_sam):
        from circuitvision_tpu.models.sam2.convert import (
            _flax_path_to_torch_key,
            _to_flax,
            convert_state_dict,
        )

        _, variables = tiny_sam
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        rng = np.random.default_rng(0)
        fake = {}
        for path, leaf in flat:
            names = [str(getattr(p, "key", p)) for p in path]
            tkey, kind = _flax_path_to_torch_key(tuple(names[1:]))
            arr = rng.normal(size=leaf.shape).astype(np.float32)
            # invert the flax-ward transform
            if kind == "conv" and arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))
            elif kind == "conv" and arr.ndim == 2:
                arr = arr.T
            elif kind == "convT":
                arr = np.transpose(arr[::-1, ::-1], (2, 3, 0, 1))
            elif kind == "nchw":
                arr = np.transpose(arr, (0, 3, 1, 2))
            fake[tkey] = arr
        converted = convert_state_dict(fake, variables)
        flat2 = jax.tree_util.tree_flatten_with_path(converted)[0]
        assert len(flat2) == len(flat)

    def test_missing_raises(self, tiny_sam):
        from circuitvision_tpu.models.sam2.convert import convert_state_dict

        _, variables = tiny_sam
        with pytest.raises(KeyError):
            convert_state_dict({}, variables)


class TestLayoutPersistentWindows:
    @pytest.mark.slow
    def test_partitioned_block_equals_windowed_block(self):
        """A window=0 block on the partitioned tensor is numerically
        identical to the windowed block in full layout — the invariant the
        Hiera layout-persistent optimization rests on."""
        from circuitvision_tpu.models.initialization import fast_init
        from circuitvision_tpu.models.sam2.hiera import MultiScaleBlock

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
        blk = MultiScaleBlock(dim=32, dim_out=32, num_heads=2, window_size=4)
        variables = fast_init(blk, jax.random.PRNGKey(0), x)
        ref = blk.apply(variables, x)

        blk0 = MultiScaleBlock(dim=32, dim_out=32, num_heads=2, window_size=0)
        xp, pad = window_partition(x, 4)
        out = window_unpartition(blk0.apply(variables, xp), 4, pad, (16, 16))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.slow
    def test_indivisible_input_still_works(self):
        """Feature maps that don't divide by the window fall back to
        per-block partitioning (with padding) inside MultiScaleBlock."""
        from circuitvision_tpu.models.initialization import fast_init
        from circuitvision_tpu.models.sam2.hiera import Hiera

        # Transition blocks use the PREVIOUS stage's window (hieradet
        # semantics), so windows of stages followed by a q-pool must be
        # even (window//2 geometry). Here the stage-3 transition runs
        # window 4 on a 10×10 map (pad→12) and the stage-4 transition
        # window 6 on a 5×5 map (pad→6) — both indivisible per-block
        # padding paths.
        model = Hiera(
            embed_dim=16, num_heads=1, stages=(1, 1, 1, 1),
            global_att_blocks=(), window_spec=(4, 4, 6, 3),
        )
        x = jnp.zeros((1, 80, 80, 3))  # 20×20 after patch
        variables = fast_init(model, jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        assert feats[0].shape == (1, 20, 20, 16)
        assert feats[1].shape == (1, 10, 10, 32)
        assert feats[2].shape == (1, 5, 5, 64)
        assert feats[3].shape == (1, 2, 2, 128)


@pytest.mark.slow
class TestChannelPadding:
    """MXU channel padding (hiera.pad_multiple + padding.pad_trunk_params):
    the padded trunk with zero-padded weights must reproduce the native
    trunk's outputs exactly (modulo fp accumulation order)."""

    KW = dict(
        embed_dim=24,
        num_heads=2,
        stages=(1, 1, 2, 1),
        global_att_blocks=(3,),
        window_spec=(4, 2, 4, 2),
    )

    def test_padded_trunk_matches_native(self):
        from circuitvision_tpu.models.sam2.padding import pad_trunk_params

        base = Hiera(**self.KW)
        padded = Hiera(**self.KW, pad_multiple=32)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
        )
        vb = base.init(jax.random.PRNGKey(7), x)
        pt = pad_trunk_params(
            jax.tree.map(np.asarray, vb["params"]),
            embed_dim=24, num_heads=2, stages=(1, 1, 2, 1), pad_multiple=32,
        )
        vp = {"params": jax.tree.map(jnp.asarray, pt)}

        # padded shapes agree with a fresh padded init
        ref_shapes = jax.tree.map(lambda a: a.shape, padded.init(jax.random.PRNGKey(0), x)["params"])
        assert jax.tree.map(lambda a: a.shape, vp["params"]) == ref_shapes

        with jax.default_matmul_precision("highest"):
            ob = base.apply(vb, x)
            op = padded.apply(vp, x)
        for a, b in zip(ob, op):
            assert a.shape == b.shape  # outputs sliced back to true widths
            err = float(jnp.abs(a - b).max())
            scale = float(jnp.abs(a).max())
            assert err / max(scale, 1e-9) < 1e-4

    def test_native_checkpoint_autopads_on_load(self):
        """A native-width variables tree loads into a pad-configured model
        via maybe_pad_trunk_variables (the checkpoint-load wiring of
        ADVICE r2 #1) and produces finite outputs."""
        from circuitvision_tpu.models.sam2.padding import maybe_pad_trunk_variables

        native = SAM2ImageSegmenter(cfg=TINY)
        v_native = init_params(native, jax.random.PRNGKey(0))

        cfg_p = dataclasses.replace(TINY, trunk_pad_multiple=64)
        padded_model = SAM2ImageSegmenter(cfg=cfg_p)
        v_padded = maybe_pad_trunk_variables(v_native, cfg_p)
        # idempotent on an already-padded tree
        again = maybe_pad_trunk_variables(v_padded, cfg_p)
        assert again is v_padded or jax.tree.all(
            jax.tree.map(lambda a, b: a.shape == b.shape, again, v_padded)
        )
        high, low, iou = padded_model.apply(
            v_padded,
            jnp.zeros((1, cfg_p.resolution, cfg_p.resolution, 3), jnp.float32),
        )
        assert np.isfinite(np.asarray(high)).all()

    def test_padded_segmenter_forward(self):
        """Full segmenter with trunk padding compiles and runs (the neck
        consumes true-width features, so only the trunk changes)."""
        cfg = dataclasses.replace(TINY, trunk_pad_multiple=64)
        model = SAM2ImageSegmenter(cfg=cfg)
        variables = init_params(model, jax.random.PRNGKey(0))
        high, low, iou = model.apply(
            variables, jnp.zeros((1, cfg.resolution, cfg.resolution, 3), jnp.float32)
        )
        assert high.shape == (1, cfg.resolution, cfg.resolution, 1)
        assert np.isfinite(np.asarray(high)).all()


@pytest.mark.slow
class TestHieraFamilyPresets:
    """The non-L Hiera family members (published sam2.1_hiera_{t,s,b+}
    configs) are pure configuration: structure checks via eval_shape at
    full 1024² (no compute) and a REAL forward for the tiny preset at a
    reduced resolution that still exercises the non-divisible window-14
    padding path."""

    def test_structures_at_full_resolution(self):
        import jax

        from circuitvision_tpu.core.config import sam2_hiera_preset
        from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter

        for size, n_blocks, dims in (
            ("t", 12, (96, 192, 384, 768)),
            ("s", 16, (96, 192, 384, 768)),
            ("b+", 24, (112, 224, 448, 896)),
            ("l", 48, (144, 288, 576, 1152)),
        ):
            cfg = sam2_hiera_preset(size)
            assert sum(cfg.stages) == n_blocks
            assert cfg.stage_dims == dims
            assert cfg.backbone_channel_list == tuple(reversed(dims))
            model = SAM2ImageSegmenter(cfg=cfg)
            x = jnp.zeros((1, cfg.resolution, cfg.resolution, 3), jnp.float32)
            shapes = jax.eval_shape(
                lambda m=model, xx=x: m.init(jax.random.PRNGKey(0), xx)
            )
            trunk = shapes["params"]["trunk"]
            blocks = [k for k in trunk if k.startswith("blocks_")]
            assert len(blocks) == n_blocks, size
            # patch embed emits the stage-0 width
            assert trunk["patch_embed_proj"]["kernel"].shape[-1] == dims[0]

    def test_tiny_preset_forward_runs(self):
        import jax

        from circuitvision_tpu.core.config import sam2_hiera_preset
        from circuitvision_tpu.models.initialization import fast_init
        from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter

        # 256² → stage-3 map is 16×16, NOT divisible by window 14: the
        # padding fallback path must produce finite masks end-to-end.
        cfg = sam2_hiera_preset("t", resolution=256, dtype="float32")
        model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.float32)
        x = jnp.zeros((1, 256, 256, 3), jnp.float32)
        variables = fast_init(model, jax.random.PRNGKey(0), x)
        high, low, iou = jax.jit(model.apply)(variables, x)
        assert high.shape == (1, 256, 256, 1)
        assert bool(jnp.isfinite(high).all())

    def test_unknown_size_rejected(self):
        import pytest as _pytest

        from circuitvision_tpu.core.config import sam2_hiera_preset

        with _pytest.raises(ValueError, match="unknown Hiera size"):
            sam2_hiera_preset("xl")
