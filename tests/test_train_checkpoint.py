"""Training checkpoint/resume: bit-exact continuation, commit markers,
template-driven sharded restore (train/checkpoint.py).

The reference has no training loop (SURVEY §5 — its checkpoint story is
weight loading only, src/circuit_analyzer.py:226-234); this is a
framework-native capability, so the tests pin the properties a
preemptible TPU fine-tune needs: resuming from step k reproduces the
uninterrupted run exactly, partial writes are never picked up, and
restore places leaves on the templates' shardings.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from circuitvision_tpu.core.config import SAM2Config, TrainConfig
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter, init_params
from circuitvision_tpu.train.checkpoint import (
    latest_checkpoint,
    prune_checkpoints,
    restore_train_state,
    save_train_state,
)
from circuitvision_tpu.train.train_step import make_optimizer, make_train_step

TINY = SAM2Config(
    resolution=64,
    embed_dim=16,
    num_heads=2,
    stages=(1, 1, 1, 1),
    global_att_blocks=(2,),
    window_spec=(4, 2, 4, 2),
    backbone_channel_list=(128, 64, 32, 16),
    decoder_mlp_dim=32,
)


def _setup(seed: int):
    model = SAM2ImageSegmenter(cfg=TINY)
    variables = init_params(model, jax.random.PRNGKey(seed))
    tx, _ = make_optimizer(variables, TrainConfig())
    opt_state = tx.init(variables)
    step = jax.jit(make_train_step(model, tx, TrainConfig()))
    return variables, opt_state, step


def _data(n_steps: int):
    rng = np.random.default_rng(7)
    return [
        (
            jnp.asarray(rng.random((2, 64, 64, 3), np.float32)),
            jnp.asarray((rng.random((2, 64, 64)) > 0.7).astype(np.float32)),
        )
        for _ in range(n_steps)
    ]


def _assert_trees_equal(a, b, what):
    for (path, la), lb in zip(
        jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves(b)
    ):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg=f"{what} diverged at {jax.tree_util.keystr(path)}",
        )


class TestResumeBitExact:
    @pytest.mark.slow
    def test_resume_matches_uninterrupted_run(self, tmp_path):
        """Train 4 steps straight; separately train 2, checkpoint, restore
        into a DIFFERENT fresh init, train 2 more — identical state."""
        data = _data(4)

        params, opt_state, step = _setup(seed=0)
        for images, masks in data:
            params, opt_state, _ = step(params, opt_state, images, masks)
        straight_params, straight_opt = params, opt_state

        params, opt_state, step = _setup(seed=0)
        for images, masks in data[:2]:
            params, opt_state, _ = step(params, opt_state, images, masks)
        save_train_state(tmp_path, 2, params, opt_state)

        # resume into a template tree initialized with a DIFFERENT seed:
        # every leaf must come from the checkpoint, not the template
        params2, opt2, step2 = _setup(seed=1)
        found = latest_checkpoint(tmp_path)
        assert found is not None and found[0] == 2
        params2, opt2 = restore_train_state(found[1], params2, opt2)
        for images, masks in data[2:]:
            params2, opt2, _ = step2(params2, opt2, images, masks)

        _assert_trees_equal(straight_params, params2, "params")
        _assert_trees_equal(straight_opt, opt2, "opt_state")


class TestCommitAndPrune:
    def _tiny_state(self):
        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
        tx = optax.adam(1e-3)
        return params, tx.init(params)

    def test_uncommitted_checkpoint_is_invisible(self, tmp_path):
        params, opt_state = self._tiny_state()
        path = save_train_state(tmp_path, 5, params, opt_state)
        os.remove(path + ".DONE")  # simulate a crash before commit
        assert latest_checkpoint(tmp_path) is None

    def test_latest_picks_highest_step(self, tmp_path):
        params, opt_state = self._tiny_state()
        for s in (1, 10, 3):
            save_train_state(tmp_path, s, params, opt_state)
        found = latest_checkpoint(tmp_path)
        assert found is not None and found[0] == 10

    def test_prune_keeps_newest(self, tmp_path):
        params, opt_state = self._tiny_state()
        for s in (1, 2, 3, 4):
            save_train_state(tmp_path, s, params, opt_state)
        prune_checkpoints(tmp_path, keep=2)
        remaining = sorted(
            int(n[5:]) for n in os.listdir(tmp_path)
            if n.startswith("step_") and not n.endswith(".DONE")
        )
        assert remaining == [3, 4]
        assert latest_checkpoint(tmp_path)[0] == 4

    def test_optimizer_mismatch_raises(self, tmp_path):
        params, opt_state = self._tiny_state()
        path = save_train_state(tmp_path, 1, params, opt_state)
        other_opt = optax.sgd(1e-3, momentum=0.9).init(params)
        with pytest.raises(ValueError, match="optimizer"):
            restore_train_state(path, params, other_opt)


class TestShardedRestore:
    def test_restore_places_on_template_shardings(self, tmp_path):
        """Restore onto FSDP-sharded templates: values from the
        checkpoint, placement from the template."""
        from circuitvision_tpu.core.config import MeshConfig
        from circuitvision_tpu.parallel.mesh import (
            fsdp_param_shardings,
            make_mesh,
        )

        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("need 8 cpu devices")
        mesh = make_mesh(MeshConfig(model_parallel=2), devices=devs[:8])

        rng = np.random.default_rng(3)
        host = {"big": rng.random((512, 512)).astype(np.float32),
                "small": rng.random((3,)).astype(np.float32)}
        params = {k: jnp.asarray(v) for k, v in host.items()}
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        save_train_state(tmp_path, 1, params, opt_state)

        sh = fsdp_param_shardings(params, mesh, min_size=1024)
        templ = {k: jax.device_put(jnp.zeros_like(v), sh[k])
                 for k, v in params.items()}
        templ_opt = tx.init(templ)
        restored, restored_opt = restore_train_state(
            os.path.join(tmp_path, "step_00000001"), templ, templ_opt
        )
        assert restored["big"].sharding == sh["big"]
        np.testing.assert_array_equal(np.asarray(restored["big"]), host["big"])
        np.testing.assert_array_equal(np.asarray(restored["small"]), host["small"])
        # adam moments restored too (zeros here, but structure/placement hold)
        assert jax.tree_util.tree_structure(restored_opt) == \
            jax.tree_util.tree_structure(templ_opt)


class TestExtraState:
    """save/restore_train_state(extra=...): auxiliary loop state (the EMA
    shadow) round-trips alongside (params, opt_state); save and restore
    must agree on whether it exists."""

    def _tiny_state(self):
        params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
        tx = optax.adam(1e-3)
        return params, tx.init(params)

    def test_extra_round_trips(self, tmp_path):
        params, opt_state = self._tiny_state()
        ema = [jnp.full((4,), 2.5), jnp.full((2,), 0.5)]
        save_train_state(str(tmp_path), 3, params, opt_state, extra=ema)
        found = latest_checkpoint(str(tmp_path))
        template = [jnp.zeros((4,)), jnp.zeros((2,))]
        p2, o2, e2 = restore_train_state(
            found[1], params, opt_state, extra=template
        )
        np.testing.assert_array_equal(np.asarray(e2[0]), 2.5)
        np.testing.assert_array_equal(np.asarray(e2[1]), 0.5)
        np.testing.assert_array_equal(np.asarray(p2["w"]), np.arange(4.0))

    def test_without_extra_still_two_tuple(self, tmp_path):
        params, opt_state = self._tiny_state()
        save_train_state(str(tmp_path), 1, params, opt_state)
        found = latest_checkpoint(str(tmp_path))
        out = restore_train_state(found[1], params, opt_state)
        assert len(out) == 2

    def test_extra_leaf_count_mismatch_raises(self, tmp_path):
        params, opt_state = self._tiny_state()
        ema = [jnp.zeros((4,))]
        save_train_state(str(tmp_path), 1, params, opt_state, extra=ema)
        found = latest_checkpoint(str(tmp_path))
        with pytest.raises(ValueError):
            restore_train_state(
                found[1], params, opt_state,
                extra=[jnp.zeros((4,)), jnp.zeros((2,))],
            )

    def test_restore_missing_extra_raises(self, tmp_path):
        params, opt_state = self._tiny_state()
        save_train_state(str(tmp_path), 1, params, opt_state)
        found = latest_checkpoint(str(tmp_path))
        with pytest.raises(ValueError):
            restore_train_state(
                found[1], params, opt_state, extra=[jnp.zeros((4,))]
            )

    def test_saved_extra_restored_without_raises(self, tmp_path):
        """The other direction of the agreement contract: a checkpoint
        written WITH extra state restored WITHOUT it must fail loudly
        (silently dropping the EMA shadow on resume would be the bug) —
        orbax's template-driven restore rejects the key mismatch."""
        params, opt_state = self._tiny_state()
        ema = [jnp.full((4,), 2.5), jnp.full((2,), 0.5)]
        save_train_state(str(tmp_path), 1, params, opt_state, extra=ema)
        found = latest_checkpoint(str(tmp_path))
        with pytest.raises(ValueError, match="extra"):
            restore_train_state(found[1], params, opt_state)
