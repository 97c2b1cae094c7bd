"""Rank-r LoRA adapter training (train/lora.py).

Pins: target-surface identity with the reference's 36 PEFT modules
(src/circuit_analyzer.py:156-199), zero-delta init, fold/merge
equivalence, round-trip through the converter's normalize_and_fold on
the reference's own checkpoint naming, and an end-to-end train step
that moves only the adapter state.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.core.config import SAM2Config, TrainConfig
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter, init_params
from circuitvision_tpu.train import lora


def _tiny_cfg():
    return SAM2Config(
        resolution=64,
        embed_dim=16,
        num_heads=2,
        stages=(1, 1, 1, 1),
        global_att_blocks=(2,),
        window_spec=(4, 2, 4, 2),
        backbone_channel_list=(128, 64, 32, 16),
        decoder_mlp_dim=32,
    )


@pytest.fixture(scope="module")
def tiny():
    cfg = _tiny_cfg()
    model = SAM2ImageSegmenter(cfg=cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    return cfg, model, variables


class TestTargetSurface:
    def test_reference_paths_count_36(self):
        assert len(lora.reference_lora_paths(48)) == 36

    def test_reference_paths_map_onto_converter_targets(self):
        """flax target paths ↔ convert.REFERENCE_LORA_TARGETS 1:1 via the
        same name translation the checkpoint converter uses."""
        from circuitvision_tpu.models.sam2.convert import (
            REFERENCE_LORA_TARGETS,
            _flax_path_to_torch_key,
        )

        got = set()
        for p in lora.reference_lora_paths(48):
            tkey, _ = _flax_path_to_torch_key((*p.split("/"), "kernel"))
            got.add(tkey.removesuffix(".weight"))
        assert got == set(REFERENCE_LORA_TARGETS)

    def test_tiny_tree_targets_present(self, tiny):
        _cfg, _model, variables = tiny
        present = lora.lora_target_paths(variables, n_trunk_blocks=4)
        # blocks_0 is not a stage transition in the tiny config, so its
        # `proj` drops out; everything else must resolve.
        assert len(present) == 35
        assert "trunk/blocks_0/attn/qkv" in present
        assert "trunk/blocks_3/mlp_layers_0" in present


class TestMergeFold:
    @pytest.mark.slow
    def test_zero_init_is_identity(self, tiny):
        _cfg, model, variables = tiny
        adapters = lora.init_lora(variables, jax.random.PRNGKey(1), n_trunk_blocks=4)
        merged = lora.merge_lora(variables, adapters)
        img = jnp.zeros((1, 64, 64, 3))
        base_out = model.apply(variables, img)[0]
        merged_out = model.apply(merged, img)[0]
        np.testing.assert_array_equal(np.asarray(base_out), np.asarray(merged_out))

    def _random_b(self, adapters, seed=2):
        rng = jax.random.PRNGKey(seed)
        out = {}
        for k, ab in adapters.items():
            rng, sub = jax.random.split(rng)
            out[k] = {
                "a": ab["a"],
                "b": 0.02 * jax.random.normal(sub, ab["b"].shape, jnp.float32),
            }
        return out

    @pytest.mark.slow
    def test_fold_equals_merge_and_changes_forward(self, tiny):
        _cfg, model, variables = tiny
        adapters = self._random_b(
            lora.init_lora(variables, jax.random.PRNGKey(1), n_trunk_blocks=4)
        )
        merged = lora.merge_lora(variables, adapters)
        folded = lora.fold_lora(variables, adapters)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            ),
            merged,
            folded,
        )
        img = jnp.ones((1, 64, 64, 3)) * 0.5
        base_out = np.asarray(model.apply(variables, img)[0])
        new_out = np.asarray(model.apply(folded, img)[0])
        assert np.abs(base_out - new_out).max() > 0

    def test_delta_math_matches_reference_scaling(self, tiny):
        """delta = (alpha/r) * A @ B on a probed dense kernel."""
        _cfg, _model, variables = tiny
        cfg = TrainConfig()
        path = "sam_mask_decoder/transformer/layers_0/self_attn/q_proj"
        adapters = self._random_b(
            lora.init_lora(variables, jax.random.PRNGKey(1), n_trunk_blocks=4)
        )
        folded = lora.fold_lora(variables, adapters)
        base_k = variables["params"]["sam_mask_decoder"]["transformer"][
            "layers_0"]["self_attn"]["q_proj"]["kernel"]
        new_k = folded["params"]["sam_mask_decoder"]["transformer"][
            "layers_0"]["self_attn"]["q_proj"]["kernel"]
        ab = adapters[path]
        want = np.asarray(base_k) + (cfg.lora_alpha / cfg.lora_rank) * (
            np.asarray(ab["a"]) @ np.asarray(ab["b"])
        )
        np.testing.assert_allclose(np.asarray(new_k), want, atol=1e-6)


class TestPeftRoundTrip:
    def test_fold_matches_converter_on_peft_named_state(self, tiny):
        """export_torch_state(base) + export_peft_state(adapters) through
        convert.normalize_and_fold + convert_state_dict == fold_lora:
        the adapters speak the reference checkpoint's exact dialect."""
        from circuitvision_tpu.models.sam2.convert import (
            convert_state_dict,
            export_torch_state,
        )

        _cfg, _model, variables = tiny
        adapters = TestMergeFold()._random_b(
            lora.init_lora(variables, jax.random.PRNGKey(1), n_trunk_blocks=4)
        )
        torch_state = export_torch_state(variables)
        torch_state.update(lora.export_peft_state(adapters))
        converted = convert_state_dict(
            torch_state, variables, lora_alpha=TrainConfig().lora_alpha
        )
        folded = lora.fold_lora(variables, adapters)
        flat_c = jax.tree_util.tree_flatten_with_path(converted)[0]
        flat_f = dict(
            ("/".join(str(getattr(p, "key", p)) for p in path), leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(folded)[0]
        )
        assert len(flat_c) == len(flat_f)
        for path, leaf in flat_c:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_f[key]), atol=1e-5,
                err_msg=key,
            )


class TestLoraTrainStep:
    def _setup(self, tiny):
        import optax

        _cfg, model, variables = tiny
        cfg = TrainConfig(learning_rate=3e-3)
        tstate = lora.init_train_state(
            variables, jax.random.PRNGKey(3), cfg, n_trunk_blocks=4
        )
        tx = lora.make_lora_optimizer(cfg)
        opt_state = tx.init(tstate)
        step = jax.jit(lora.make_lora_train_step(model, tx, cfg))
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        masks = jnp.asarray(rng.random((2, 64, 64)) > 0.7, jnp.float32)
        return variables, tstate, opt_state, step, images, masks

    def test_loss_decreases_and_base_untouched(self, tiny):
        variables, tstate, opt_state, step, images, masks = self._setup(tiny)
        base_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), variables)
        losses = []
        for _ in range(5):
            tstate, opt_state, metrics = step(
                variables, tstate, opt_state, images, masks
            )
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            variables,
            base_snapshot,
        )

    @pytest.mark.slow
    def test_materialize_serves_trained_state(self, tiny):
        variables, tstate, opt_state, step, images, masks = self._setup(tiny)
        _cfg, model, _v = tiny
        tstate, opt_state, _ = step(variables, tstate, opt_state, images, masks)
        served = lora.materialize(variables, tstate)
        out_served = np.asarray(model.apply(served, images)[0])
        out_base = np.asarray(model.apply(variables, images)[0])
        assert np.abs(out_served - out_base).max() > 0
        # direct leaves really landed (sparse embedding moved)
        np.testing.assert_array_equal(
            np.asarray(served["params"]["sparse_embedding"]),
            np.asarray(tstate["direct"]["params/sparse_embedding"]),
        )

    def test_step_lowers_over_8dev_mesh(self, tiny):
        """dp sharding: base+adapters replicated, batch sharded over
        data — the step must lower with explicit shardings (no compile,
        lowering only) on the 8-device CPU mesh."""
        import optax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        _cfg, model, variables = tiny
        cfg = TrainConfig()
        tstate = lora.init_train_state(
            variables, jax.random.PRNGKey(3), cfg, n_trunk_blocks=4
        )
        tx = lora.make_lora_optimizer(cfg)
        opt_state = tx.init(tstate)
        devs = np.asarray(jax.devices("cpu")[:8]).reshape(8)
        mesh = Mesh(devs, ("data",))
        repl = NamedSharding(mesh, PartitionSpec())
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        step = jax.jit(
            lora.make_lora_train_step(model, tx, cfg),
            in_shardings=(
                jax.tree.map(lambda _: repl, variables),
                jax.tree.map(lambda _: repl, tstate),
                jax.tree.map(lambda _: repl, opt_state),
                batch_sh,
                batch_sh,
            ),
        )
        images = jnp.zeros((8, 64, 64, 3))
        masks = jnp.zeros((8, 64, 64))
        step.lower(variables, tstate, opt_state, images, masks)

    @pytest.mark.slow
    def test_adapter_grads_match_folded_kernel_grads(self, tiny):
        """d loss/dA == (alpha/r) * Gw @ Bᵀ and d loss/dB == (alpha/r) *
        Aᵀ @ Gw — the PEFT gradient, derived through the merged kernel."""
        _cfg, model, variables = tiny
        cfg = TrainConfig()
        adapters = TestMergeFold()._random_b(
            lora.init_lora(variables, jax.random.PRNGKey(1), n_trunk_blocks=4)
        )
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        masks = jnp.asarray(rng.random((1, 64, 64)) > 0.7, jnp.float32)

        from circuitvision_tpu.train.losses import combined_loss

        def loss_from_adapters(ad):
            merged = lora.merge_lora(variables, ad, cfg)
            high, _low, iou = model.apply(merged, images)
            return combined_loss(high[..., 0], iou, masks, cfg)[0]

        def loss_from_params(v):
            high, _low, iou = model.apply(v, images)
            return combined_loss(high[..., 0], iou, masks, cfg)[0]

        path = "sam_mask_decoder/transformer/layers_0/self_attn/q_proj"
        g_ad = jax.grad(loss_from_adapters)(adapters)[path]
        gw_tree = jax.grad(loss_from_params)(lora.merge_lora(variables, adapters, cfg))
        gw = gw_tree["params"]["sam_mask_decoder"]["transformer"]["layers_0"][
            "self_attn"]["q_proj"]["kernel"]
        scale = cfg.lora_alpha / cfg.lora_rank
        np.testing.assert_allclose(
            np.asarray(g_ad["a"]),
            scale * np.asarray(gw) @ np.asarray(adapters[path]["b"]).T,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(g_ad["b"]),
            scale * np.asarray(adapters[path]["a"]).T @ np.asarray(gw),
            atol=1e-5,
        )
