"""Pallas kernels in interpreter mode vs their XLA references.

Compiled-mode parity + timing runs on real TPU via
scripts/profile_refinement.py and the bench; these tests pin numerics on
CPU through the Pallas interpreter.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitvision_tpu.ops.morphology import enhance_lines
from circuitvision_tpu.ops.pallas.fused_morphology import enhance_lines_fused


class TestFusedMorphology:
    def test_matches_xla_reference(self):
        rng = np.random.default_rng(0)
        mask = (rng.random((300, 400)) > 0.9).astype(np.float32) * 255
        ref = np.round(np.asarray(enhance_lines(jnp.asarray(mask))))
        fused = np.asarray(
            enhance_lines_fused(jnp.asarray(mask), tile_h=64, interpret=True)
        )
        np.testing.assert_array_equal(fused, ref)

    def test_unaligned_shape(self):
        rng = np.random.default_rng(1)
        mask = (rng.random((97, 130)) > 0.9).astype(np.float32) * 255
        ref = np.round(np.asarray(enhance_lines(jnp.asarray(mask))))
        fused = np.asarray(
            enhance_lines_fused(jnp.asarray(mask), tile_h=32, interpret=True)
        )
        np.testing.assert_array_equal(fused, ref)


class TestRefinementFused:
    """Loop-based fused refinement head vs the XLA conv formulation."""

    def _params(self, seed=0):
        rng = np.random.default_rng(seed)
        ws = tuple(
            jnp.asarray(rng.standard_normal((k, k, 1, 4)) * 0.2, jnp.float32)
            for k in (3, 5, 7, 11)
        )
        bs = tuple(
            jnp.asarray(rng.standard_normal((4,)) * 0.1, jnp.float32)
            for _ in range(4)
        )
        wc = jnp.asarray(rng.standard_normal((1, 1, 16, 1)) * 0.3, jnp.float32)
        bc = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
        return ws, bs, wc, bc

    def _xla_ref(self, x, ws, bs, wc, bc):
        dn = ("NHWC", "HWIO", "NHWC")
        outs = []
        for w, b in zip(ws, bs):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn
            ) + b
            outs.append(jax.nn.gelu(y, approximate=False))
        cat = jnp.concatenate(outs, -1)
        return jax.lax.conv_general_dilated(
            cat, wc, (1, 1), "SAME", dimension_numbers=dn
        ) + bc

    def test_matches_xla_reference(self):
        from circuitvision_tpu.ops.pallas.refinement_fused import refinement_fused

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 96, 160, 1)), jnp.float32)
        ws, bs, wc, bc = self._params()
        ref = np.asarray(self._xla_ref(x, ws, bs, wc, bc))
        fused = np.asarray(
            refinement_fused(x, ws, bs, wc, bc, tile_h=32, interpret=True)
        )
        assert np.abs(ref - fused).max() < 1e-4

    def test_unaligned_shape(self):
        from circuitvision_tpu.ops.pallas.refinement_fused import refinement_fused

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 70, 130, 1)), jnp.float32)
        ws, bs, wc, bc = self._params(3)
        ref = np.asarray(self._xla_ref(x, ws, bs, wc, bc))
        fused = np.asarray(
            refinement_fused(x, ws, bs, wc, bc, tile_h=32, interpret=True)
        )
        assert np.abs(ref - fused).max() < 1e-4

    def test_module_xla_path_matches_nn_conv_layout(self):
        """MultiKernelRefinement's param tree keeps nn.Conv naming so
        checkpoints load identically through either compute path."""
        from circuitvision_tpu.models.sam2.wrapper import MultiKernelRefinement

        m = MultiKernelRefinement()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
        p = v["params"]
        for i in range(4):
            assert p[f"conv_branches_{i}"]["kernel"].shape[2:] == (1, 4)
            assert p[f"conv_branches_{i}"]["bias"].shape == (4,)
        assert p["combiner_conv"]["kernel"].shape == (1, 1, 16, 1)
        out = m.apply(v, jnp.ones((1, 32, 32, 1)))
        assert out.shape == (1, 32, 32, 1)
        assert np.isfinite(np.asarray(out)).all()


class TestFusedLayerNorm:
    """ops/pallas/fused_ln vs the trunk's XLA LayerNorm math."""

    def _ref(self, x, s, b, n):
        xf = jnp.asarray(x, jnp.float32)
        s1 = jnp.sum(xf, -1, keepdims=True)
        s2 = jnp.sum(xf * xf, -1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return (xf - mean) * jax.lax.rsqrt(var + 1e-6) * s + b

    def test_matches_reference(self):
        from circuitvision_tpu.ops.pallas.fused_ln import fused_layernorm

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((384, 144)), jnp.float32)
        s = jnp.asarray(rng.standard_normal((144,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((144,)), jnp.float32)
        got = fused_layernorm(x, s, b, interpret=True)
        assert float(jnp.abs(got - self._ref(x, s, b, 144)).max()) < 1e-5

    def test_padded_stats_and_row_remainder(self):
        """true_dim < C (MXU padding) with a row count that doesn't
        divide the tile."""
        from circuitvision_tpu.ops.pallas.fused_ln import fused_layernorm

        rng = np.random.default_rng(1)
        x = np.zeros((101, 160), np.float32)
        x[:, :144] = rng.standard_normal((101, 144))
        s = np.zeros((160,), np.float32)
        s[:144] = rng.standard_normal(144)
        b = np.zeros((160,), np.float32)
        got = fused_layernorm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b),
                              true_dim=144, interpret=True)
        ref = self._ref(x, s, b, 144)
        assert got.shape == (101, 160)
        assert float(jnp.abs(got - ref).max()) < 1e-5

    def test_add_layernorm(self):
        from circuitvision_tpu.ops.pallas.fused_ln import fused_add_layernorm

        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.standard_normal((96, 288)), jnp.float32)
        c = jnp.asarray(rng.standard_normal((96, 288)), jnp.float32)
        s = jnp.asarray(rng.standard_normal((288,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((288,)), jnp.float32)
        resid, out = fused_add_layernorm(a, c, s, b, interpret=True)
        assert float(jnp.abs(resid - (a + c)).max()) == 0.0
        assert float(jnp.abs(out - self._ref(a + c, s, b, 288)).max()) < 1e-5

    def test_trunk_layernorm_module_fused_flag(self):
        """TrunkLayerNorm keeps nn.LayerNorm param names and the residual
        join returns (resid, ln) in both code paths."""
        from circuitvision_tpu.models.sam2.hiera import TrunkLayerNorm

        m = TrunkLayerNorm()
        x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4, 4, 32)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        assert set(v["params"].keys()) == {"scale", "bias"}
        y = m.apply(v, x)
        resid, y2 = m.apply(v, x, residual=x)
        assert resid.shape == x.shape and y2.shape == x.shape
        assert np.allclose(np.asarray(resid), 2 * np.asarray(x))
