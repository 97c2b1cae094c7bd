"""Mesh/sharding helpers, losses, trainable-mask selection, multi-chip dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_param_shardings,
    make_mesh,
    shard_batch,
)
from circuitvision_tpu.train.losses import (
    combined_loss,
    dice_loss,
    focal_loss,
    frequency_loss,
    iou_prediction_loss,
)
from circuitvision_tpu.train.train_step import trainable_mask


def cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return devs[:n]


class TestMesh:
    def test_make_mesh_all_devices(self):
        devs = cpu_devices(8)
        from circuitvision_tpu.core.config import MeshConfig

        mesh = make_mesh(MeshConfig(), devices=devs)
        assert mesh.shape["data"] == 8
        assert mesh.shape["model"] == 1

    def test_data_model_split(self):
        devs = cpu_devices(8)
        from circuitvision_tpu.core.config import MeshConfig

        mesh = make_mesh(MeshConfig(model_parallel=2), devices=devs)
        assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    def test_model_parallel_exceeding_devices_raises(self):
        """model_parallel > device count floored data to 0 and built an
        empty mesh; it must raise the module's own error instead."""
        import pytest

        from circuitvision_tpu.core.config import MeshConfig

        devs = cpu_devices(4)
        with pytest.raises(ValueError, match="exceeds"):
            make_mesh(MeshConfig(model_parallel=8), devices=devs)

    def test_shard_batch_places_data(self):
        devs = cpu_devices(8)
        from circuitvision_tpu.core.config import MeshConfig

        mesh = make_mesh(MeshConfig(), devices=devs)
        x = jnp.zeros((16, 4))
        sharded = shard_batch(x, mesh)
        assert sharded.sharding == batch_sharding(mesh)

    def test_fsdp_shardings_split_large_params(self):
        devs = cpu_devices(8)
        from circuitvision_tpu.core.config import MeshConfig

        mesh = make_mesh(MeshConfig(model_parallel=2), devices=devs)
        params = {"big": jnp.zeros((512, 512)), "small": jnp.zeros((3,))}
        sh = fsdp_param_shardings(params, mesh, min_size=1024)
        assert sh["big"].spec == jax.sharding.PartitionSpec(None, "model")
        assert sh["small"].spec == jax.sharding.PartitionSpec()


class TestLosses:
    def _data(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
        targets = jnp.asarray((rng.random((2, 16, 16)) > 0.5).astype(np.float32))
        return logits, targets

    def test_dice_perfect_prediction(self):
        targets = jnp.ones((1, 8, 8))
        logits = jnp.full((1, 8, 8), 20.0)  # sigmoid ≈ 1
        assert float(dice_loss(logits, targets)) < 1e-3

    def test_focal_zero_for_confident_correct(self):
        targets = jnp.ones((1, 8, 8))
        logits = jnp.full((1, 8, 8), 20.0)
        assert float(focal_loss(logits, targets)) < 1e-6

    def test_iou_prediction_loss(self):
        targets = jnp.ones((1, 8, 8))
        logits = jnp.full((1, 8, 8), 20.0)
        iou_pred = jnp.asarray([[1.0]])
        assert float(iou_prediction_loss(iou_pred, logits, targets)) < 1e-6
        iou_bad = jnp.asarray([[0.0]])
        assert float(iou_prediction_loss(iou_bad, logits, targets)) > 0.9

    def test_frequency_loss_zero_on_match(self):
        logits = jnp.full((1, 8, 8), 20.0)
        targets = jnp.ones((1, 8, 8))
        assert float(frequency_loss(logits, targets)) < 1e-2

    def test_combined_weights(self):
        logits, targets = self._data()
        iou_pred = jnp.asarray([[0.5], [0.5]])
        total, metrics = combined_loss(logits, iou_pred, targets)
        expect = (
            0.5 * metrics["dice"]
            + 0.4 * metrics["focal"]
            + 0.3 * metrics["iou"]
            + 0.1 * metrics["freq"]
        )
        np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)


class TestTrainableMask:
    def test_reference_fine_tune_surface(self):
        params = {
            "params": {
                "dense_embedding1": jnp.zeros((1, 4, 4)),
                "trunk": {
                    "blocks_44": {"attn": {"qkv": {"kernel": jnp.zeros((4, 4))}}},
                    "blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((4, 4))}}},
                },
                "sam_mask_decoder": {
                    "transformer": {
                        "layers_0": {"self_attn": {"q_proj": {"kernel": jnp.zeros((4, 4))}}}
                    },
                    "iou_prediction_head": {
                        "layers_2": {"kernel": jnp.zeros((4, 4))},
                        "layers_0": {"kernel": jnp.zeros((4, 4))},
                    },
                },
            }
        }
        mask = trainable_mask(params)
        p = mask["params"]
        assert p["dense_embedding1"] is True
        assert p["trunk"]["blocks_44"]["attn"]["qkv"]["kernel"] is True
        assert p["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"] is False
        assert p["sam_mask_decoder"]["transformer"]["layers_0"]["self_attn"]["q_proj"]["kernel"] is True
        assert p["sam_mask_decoder"]["iou_prediction_head"]["layers_2"]["kernel"] is True
        assert p["sam_mask_decoder"]["iou_prediction_head"]["layers_0"]["kernel"] is False


@pytest.mark.slow
class TestDryRun:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g

        cpu_devices(8)
        g.dryrun_multichip(8)


class TestTrainStepDifferentiable:
    def test_traces_grad_with_fused_gate_forced_on(self):
        """The first-party Pallas kernels are forward-only; make_train_step
        must trace the forward under hiera.force_fused(False) so autodiff
        works on TPU (where the gate would otherwise pick the kernels).
        Forcing the gate ON here reproduces the TPU trace on CPU — without
        the override inside train_step, linearization fails."""
        from circuitvision_tpu.core.config import SAM2Config, TrainConfig
        from circuitvision_tpu.models.sam2 import hiera
        from circuitvision_tpu.models.sam2.wrapper import (
            SAM2ImageSegmenter,
            init_params,
        )
        from circuitvision_tpu.train.train_step import (
            make_optimizer,
            make_train_step,
        )

        cfg = SAM2Config(
            resolution=64,
            embed_dim=16,
            num_heads=2,
            stages=(1, 1, 1, 1),
            global_att_blocks=(2,),
            window_spec=(4, 2, 4, 2),
            backbone_channel_list=(128, 64, 32, 16),
            decoder_mlp_dim=32,
        )
        model = SAM2ImageSegmenter(cfg=cfg)
        variables = init_params(model, jax.random.PRNGKey(0))
        tx, _ = make_optimizer(variables, TrainConfig())
        opt_state = tx.init(variables)
        step = make_train_step(model, tx, TrainConfig())
        images = jnp.zeros((2, cfg.resolution, cfg.resolution, 3))
        masks = jnp.zeros((2, cfg.resolution, cfg.resolution))

        old = hiera._FORCE_FUSED
        hiera._FORCE_FUSED = True
        try:
            out = jax.eval_shape(step, variables, opt_state, images, masks)
        finally:
            hiera._FORCE_FUSED = old
        assert out[2]["loss"].shape == ()


def _tiny_cfg():
    from circuitvision_tpu.core.config import SAM2Config

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


class TestSelectiveGrad:
    """make_train_step(selective=True) differentiates only the trainable
    leaves: frozen params enter the loss as non-differentiated arguments
    (no stored activations for the frozen trunk prefix, fused inference
    kernels kept there via the hiera._fused_gate int cutoff)."""

    def _setup(self, mask=None):
        import optax

        from circuitvision_tpu.models.sam2.wrapper import (
            SAM2ImageSegmenter,
            init_params,
        )
        from circuitvision_tpu.train.train_step import trainable_mask

        cfg = _tiny_cfg()
        model = SAM2ImageSegmenter(cfg=cfg)
        variables = init_params(model, jax.random.PRNGKey(0))
        m = trainable_mask(variables) if mask is None else mask
        # SGD so post-step params are params - lr*grad exactly: comparing
        # params compares gradients (adam would amplify near-zero-grad
        # roundoff into visible sign flips). Frozen leaves route to
        # set_to_zero like make_optimizer — optax.masked would pass the
        # raw frozen grads through as updates, which differ by design
        # between the two paths (selective computes zeros there).
        labels = jax.tree.map(lambda t: "train" if t else "freeze", m)
        tx = optax.multi_transform(
            {"train": optax.sgd(0.1), "freeze": optax.set_to_zero()},
            param_labels=labels,
        )
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        targets = jnp.asarray((rng.random((2, 64, 64)) > 0.7).astype(np.float32))
        return model, variables, m, tx, images, targets

    def test_selective_matches_whole_tree_grads(self):
        """On CPU both paths trace identical module-path forwards, so the
        selective split must reproduce the whole-tree gradients bitwise
        on every trainable leaf (frozen leaves: zeros, params frozen)."""
        import jax.tree_util as jtu

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import make_train_step

        model, variables, m, tx, images, targets = self._setup()
        opt_state = tx.init(variables)
        sel = jax.jit(
            make_train_step(model, tx, TrainConfig(), mask=m, selective=True)
        )
        full = jax.jit(
            make_train_step(model, tx, TrainConfig(), mask=m, selective=False)
        )
        p_sel, _, met_sel = sel(variables, opt_state, images, targets)
        p_full, _, met_full = full(variables, opt_state, images, targets)
        np.testing.assert_array_equal(
            np.asarray(met_sel["loss"]), np.asarray(met_full["loss"])
        )
        for (path, a), (_, b) in zip(
            jtu.tree_leaves_with_path(p_sel), jtu.tree_leaves_with_path(p_full)
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"selective/full divergence at {jtu.keystr(path)}",
            )

    def test_all_true_mask_trains_everything(self):
        """train_demo --surface all passes an all-True mask; the selective
        path must then differentiate the whole tree (cutoff 0), not
        silently fall back to the reference surface."""
        import jax.tree_util as jtu

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import make_train_step

        all_true = None
        model, variables, _, _, images, targets = self._setup()
        all_true = jax.tree.map(lambda _: True, variables)
        import optax

        tx = optax.masked(optax.sgd(0.1), all_true)
        opt_state = tx.init(variables)
        step = jax.jit(
            make_train_step(
                model, tx, TrainConfig(), mask=all_true, selective=True
            )
        )
        new_vars, _, metrics = step(variables, opt_state, images, targets)
        assert np.isfinite(float(metrics["loss"]))
        # A leaf OUTSIDE the reference surface must move: patch embed.
        old = variables["params"]["trunk"]["patch_embed_proj"]["kernel"]
        new = new_vars["params"]["trunk"]["patch_embed_proj"]["kernel"]
        assert not np.array_equal(np.asarray(old), np.asarray(new))

    def test_trunk_diff_cutoff(self):
        from circuitvision_tpu.train.train_step import _trunk_diff_cutoff

        mask = {
            "params": {
                "dense_embedding1": True,
                "trunk": {
                    "blocks_44": {"attn": {"qkv": {"kernel": True}}},
                    "blocks_47": {"mlp": {"layers_0": {"kernel": True}}},
                    "blocks_0": {"attn": {"qkv": {"kernel": False}}},
                },
            }
        }
        assert _trunk_diff_cutoff(mask) == 44
        no_trunk = {"params": {"dense_embedding1": True,
                               "trunk": {"blocks_3": {"w": False}}}}
        assert _trunk_diff_cutoff(no_trunk) == 1 << 30
        all_on = jax.tree.map(lambda _: True, mask)
        assert _trunk_diff_cutoff(all_on) == 0

    def test_fused_gate_int_semantics(self):
        """Int cutoff N: trunk blocks < N keep backend auto-detection,
        blocks >= N and non-trunk sites (block_index None) take the
        module path."""
        from unittest import mock

        from circuitvision_tpu.models.sam2 import hiera

        with mock.patch.object(hiera.jax, "default_backend",
                               return_value="tpu"):
            with hiera.force_fused(44):
                assert hiera._fused_gate(0) is True
                assert hiera._fused_gate(43) is True
                assert hiera._fused_gate(44) is False
                assert hiera._fused_gate(100) is False
                assert hiera._fused_gate(None) is False
            with hiera.force_fused(None):
                assert hiera._fused_gate(0) is True
                assert hiera._fused_gate(None) is True
            with hiera.force_fused(False):
                assert hiera._fused_gate(0) is False
            with hiera.force_fused(True):
                assert hiera._fused_gate(None) is True
        # CPU backend: int cutoff never turns kernels on.
        with hiera.force_fused(44):
            assert hiera._fused_gate(0) is False

    def test_selective_traces_fused_prefix_forward_only(self):
        """THE regression this feature exists for: on TPU, the frozen
        trunk prefix keeps the forward-only fused Pallas kernels during
        fine-tuning. Emulate the TPU gate on CPU (mock backend) and
        abstractly trace the selective step — linearization must never
        reach the VJP-less kernels. With the reference mask on the tiny
        config no trunk block trains, so the WHOLE trunk stays fused."""
        from unittest import mock

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.models.sam2 import hiera
        from circuitvision_tpu.train.train_step import make_train_step

        model, variables, m, tx, images, targets = self._setup()
        opt_state = tx.init(variables)
        step = make_train_step(model, tx, TrainConfig(), mask=m, selective=True)
        with mock.patch.object(hiera.jax, "default_backend",
                               return_value="tpu"):
            out = jax.eval_shape(step, variables, opt_state, images, targets)
        assert out[2]["loss"].shape == ()


class TestFrozenParamsStayFrozen:
    def test_two_steps_only_move_trainable_surface(self):
        """make_optimizer must hard-freeze the non-trainable leaves.
        optax.masked(adam, mask) does NOT do this — it passes the raw
        gradient through as the update for unmasked leaves (gradient
        ascent at lr 1.0), which explodes the loss within a few steps;
        caught live by scripts/train_demo.py on TPU."""
        import jax.tree_util as jtu

        from circuitvision_tpu.core.config import SAM2Config, TrainConfig
        from circuitvision_tpu.models.sam2.wrapper import (
            SAM2ImageSegmenter,
            init_params,
        )
        from circuitvision_tpu.train.train_step import (
            make_optimizer,
            make_train_step,
        )

        cfg = SAM2Config(
            resolution=64,
            embed_dim=16,
            num_heads=2,
            stages=(1, 1, 1, 1),
            global_att_blocks=(2,),
            window_spec=(4, 2, 4, 2),
            backbone_channel_list=(128, 64, 32, 16),
            decoder_mlp_dim=32,
        )
        model = SAM2ImageSegmenter(cfg=cfg)
        variables = init_params(model, jax.random.PRNGKey(0))
        tx, mask = make_optimizer(variables, TrainConfig())
        opt_state = tx.init(variables)
        step = jax.jit(make_train_step(model, tx, TrainConfig()))

        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        targets = jnp.asarray(
            (rng.random((2, 64, 64)) > 0.7).astype(np.float32)
        )
        new_vars, opt_state, metrics = step(variables, opt_state, images, targets)
        new_vars, opt_state, metrics = step(new_vars, opt_state, images, targets)
        assert np.isfinite(float(metrics["loss"]))

        moved_trainable = 0
        for (path, old), (_, new), (_, m) in zip(
            jtu.tree_leaves_with_path(variables),
            jtu.tree_leaves_with_path(new_vars),
            jtu.tree_leaves_with_path(mask),
        ):
            if m:
                moved_trainable += int(
                    not np.array_equal(np.asarray(old), np.asarray(new))
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(old), np.asarray(new),
                    err_msg=f"frozen param moved: {jtu.keystr(path)}",
                )
        assert moved_trainable > 0


class TestLearningRateSchedule:
    """learning_rate_schedule (train_step.py): constant default stays a
    float; warmup ramps from 0; cosine decays to min_lr_ratio·peak."""

    def test_constant_default_is_float(self):
        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import learning_rate_schedule

        assert learning_rate_schedule(TrainConfig(learning_rate=3e-4)) == 3e-4

    def test_warmup_ramps_then_holds(self):
        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import learning_rate_schedule

        sched = learning_rate_schedule(
            TrainConfig(learning_rate=1e-3, warmup_steps=10)
        )
        assert float(sched(0)) == 0.0
        assert 0 < float(sched(5)) < 1e-3
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(1000)), 1e-3, rtol=1e-6)

    def test_cosine_decays_to_floor(self):
        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import learning_rate_schedule

        sched = learning_rate_schedule(TrainConfig(
            learning_rate=1e-3, schedule="cosine", warmup_steps=10,
            total_steps=100, min_lr_ratio=0.1,
        ))
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
        assert float(sched(55)) < 1e-3

    def test_cosine_requires_total_steps(self):
        import pytest

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import learning_rate_schedule

        with pytest.raises(ValueError, match="total_steps"):
            learning_rate_schedule(TrainConfig(schedule="cosine"))

    def test_optimizer_first_update_is_zero_under_warmup(self):
        """With warmup the step-0 update must be exactly zero on the
        trainable surface too (adam's moment state still advances)."""
        import optax

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import learning_rate_schedule

        tx = optax.adam(learning_rate_schedule(
            TrainConfig(learning_rate=1e-3, warmup_steps=5)
        ))
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        grads = {"w": jnp.full((4,), 0.5)}
        updates, state = tx.update(grads, state, params)
        np.testing.assert_array_equal(np.asarray(updates["w"]), 0.0)
        updates, state = tx.update(grads, state, params)
        assert float(np.abs(np.asarray(updates["w"])).max()) > 0.0


class TestGradAccumulation:
    """cfg.grad_accum_steps wraps the trainable branch in optax.MultiSteps
    (train_step.make_optimizer): k micro-batches average into one
    optimizer update, frozen leaves stay zero-routed, and the
    accumulation buffer exists only for the trainable leaves."""

    def _toy(self):
        # a fake two-leaf "model": one trainable, one frozen
        params = {"train_w": jnp.ones((3,)), "frozen_w": jnp.ones((3,))}
        mask = {"train_w": True, "frozen_w": False}
        return params, mask

    @staticmethod
    def _find_multisteps_state(opt_state):
        """The MultiStepsState buried inside the multi_transform state."""
        found = []

        def walk(o):
            if found:
                return
            if hasattr(o, "acc_grads") and hasattr(o, "mini_step"):
                found.append(o)
            elif hasattr(o, "_fields"):
                for f in o._fields:
                    walk(getattr(o, f))
            elif isinstance(o, dict):
                for v in o.values():
                    walk(v)
            elif isinstance(o, (list, tuple)):
                for v in o:
                    walk(v)

        walk(opt_state)
        assert found, "no MultiSteps state in the optimizer tree"
        return found[0]

    def test_k_microbatches_equal_one_meangrad_step(self):
        """Param equality vs a single mean-grad Adam step cannot by
        itself pin MEAN accumulation — Adam's update is invariant to a
        uniform gradient scale (sum = mean × k scales m by k and v by
        k², canceling in m/√v up to eps), so a summing accumulator
        would pass that check too. The discriminating assertion is on
        the MultiSteps accumulation buffer itself mid-cycle: after two
        of k=3 micro-steps it must hold the running MEAN of the
        micro-gradients, not their sum."""
        import optax

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import make_optimizer

        params, mask = self._toy()
        g1 = {"train_w": jnp.full((3,), 0.2), "frozen_w": jnp.full((3,), 9.0)}
        g2 = {"train_w": jnp.full((3,), 0.6), "frozen_w": jnp.full((3,), -9.0)}

        # --- discriminating check: the accumulator is a running mean ---
        tx3, _ = make_optimizer(
            params, TrainConfig(grad_accum_steps=3), mask=mask
        )
        st3 = tx3.init(params)
        _, st3 = tx3.update(g1, st3, params)
        _, st3 = tx3.update(g2, st3, params)
        ms = self._find_multisteps_state(st3)
        acc = np.asarray(jax.tree_util.tree_leaves(ms.acc_grads)[0])
        np.testing.assert_allclose(acc, 0.4, rtol=1e-6)  # mean, not 0.8 sum

        # --- end-to-end: k micro-steps == one step on the mean grad ---
        tx_acc, _ = make_optimizer(
            params, TrainConfig(grad_accum_steps=2), mask=mask
        )
        st = tx_acc.init(params)
        p = params
        for g in (g1, g2):
            up, st = tx_acc.update(g, st, p)
            p = optax.apply_updates(p, up)

        tx_ref, _ = make_optimizer(params, TrainConfig(), mask=mask)
        st_ref = tx_ref.init(params)
        gmean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
        up_ref, _ = tx_ref.update(gmean, st_ref, params)
        p_ref = optax.apply_updates(params, up_ref)

        np.testing.assert_allclose(
            np.asarray(p["train_w"]), np.asarray(p_ref["train_w"]), rtol=1e-6
        )

    def test_params_frozen_between_flushes(self):
        import optax

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import make_optimizer

        params, mask = self._toy()
        g = {"train_w": jnp.full((3,), 0.5), "frozen_w": jnp.full((3,), 2.0)}
        tx, _ = make_optimizer(
            params, TrainConfig(grad_accum_steps=3), mask=mask
        )
        st = tx.init(params)
        up, st = tx.update(g, st, params)  # micro-step 1 of 3: no update
        p1 = optax.apply_updates(params, up)
        np.testing.assert_array_equal(
            np.asarray(p1["train_w"]), np.asarray(params["train_w"])
        )
        np.testing.assert_array_equal(
            np.asarray(p1["frozen_w"]), np.asarray(params["frozen_w"])
        )

    def test_frozen_leaves_never_move_across_flush(self):
        import optax

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.train_step import make_optimizer

        params, mask = self._toy()
        g = {"train_w": jnp.full((3,), 0.5), "frozen_w": jnp.full((3,), 2.0)}
        tx, _ = make_optimizer(
            params, TrainConfig(grad_accum_steps=2), mask=mask
        )
        st = tx.init(params)
        p = params
        for _ in range(4):  # two full flush cycles
            up, st = tx.update(g, st, p)
            p = optax.apply_updates(p, up)
        np.testing.assert_array_equal(
            np.asarray(p["frozen_w"]), np.asarray(params["frozen_w"])
        )
        assert float(np.abs(np.asarray(p["train_w"] - params["train_w"])).max()) > 0

    def test_lora_optimizer_accumulates(self):
        import optax

        from circuitvision_tpu.core.config import TrainConfig
        from circuitvision_tpu.train.lora import make_lora_optimizer

        tx = make_lora_optimizer(TrainConfig(grad_accum_steps=2))
        params = {"a": jnp.ones((2,))}
        st = tx.init(params)
        up, st = tx.update({"a": jnp.full((2,), 0.3)}, st, params)
        np.testing.assert_array_equal(np.asarray(up["a"]), 0.0)  # buffered
        up, st = tx.update({"a": jnp.full((2,), 0.3)}, st, params)
        assert float(np.abs(np.asarray(up["a"])).max()) > 0.0  # flushed


class TestEMA:
    """init_ema/update_ema/ema_params (train_step.py): a shadow of the
    TRAINABLE leaves only, merged back over the live tree for eval."""

    def _toy(self):
        params = {"train_w": jnp.ones((3,)), "frozen_w": jnp.full((3,), 7.0)}
        mask = {"train_w": True, "frozen_w": False}
        return params, mask

    def test_shadow_covers_trainable_leaves_only(self):
        from circuitvision_tpu.train.train_step import init_ema

        params, mask = self._toy()
        ema = init_ema(params, mask)
        assert len(ema) == 1
        np.testing.assert_array_equal(np.asarray(ema[0]), 1.0)

    def test_update_math_and_merge(self):
        from circuitvision_tpu.train.train_step import (
            ema_params,
            init_ema,
            update_ema,
        )

        params, mask = self._toy()
        ema = init_ema(params, mask)
        moved = {
            "train_w": jnp.full((3,), 2.0),
            "frozen_w": params["frozen_w"],
        }
        ema = update_ema(ema, moved, mask, decay=0.9)
        # 0.9·1 + 0.1·2 = 1.1
        np.testing.assert_allclose(np.asarray(ema[0]), 1.1, rtol=1e-6)
        merged = ema_params(moved, ema, mask)
        np.testing.assert_allclose(np.asarray(merged["train_w"]), 1.1)
        # frozen leaf comes from the live tree untouched
        np.testing.assert_array_equal(np.asarray(merged["frozen_w"]), 7.0)

    def test_jittable(self):
        from circuitvision_tpu.train.train_step import init_ema, update_ema

        params, mask = self._toy()
        ema = init_ema(params, mask)
        f = jax.jit(lambda e, p: update_ema(e, p, mask, 0.5))
        out = f(ema, params)
        np.testing.assert_allclose(np.asarray(out[0]), 1.0)

    def test_default_mask_is_reference_surface(self):
        """init_ema with no mask uses trainable_mask — on the real tiny
        SAM2 tree the shadow is a strict subset of the leaves."""
        from circuitvision_tpu.models.sam2.wrapper import (
            SAM2ImageSegmenter,
            init_params,
        )
        from circuitvision_tpu.train.train_step import init_ema

        cfg = _tiny_cfg()
        variables = init_params(
            SAM2ImageSegmenter(cfg=cfg), jax.random.PRNGKey(0)
        )
        ema = init_ema(variables)
        n_all = len(jax.tree.leaves(variables))
        assert 0 < len(ema) < n_all
