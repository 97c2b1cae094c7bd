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


class TestWindowAttnBlock:
    """ops/pallas/window_attn vs the MultiScaleAttention einsum math."""

    def test_matches_einsum_reference(self):
        from circuitvision_tpu.ops.pallas.window_attn import window_attn_block

        rng = np.random.default_rng(0)
        WT, T, C, H = 8, 16, 48, 2
        hd = C // H
        x = jnp.asarray(rng.standard_normal((WT, T, C)), jnp.float32)
        lns = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        lnb = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.05, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean, 0.0)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        qkv = (xn @ wqkv + bqkv).reshape(WT, T, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5), axis=-1
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(WT, T, C)
        ref = x + (o @ wproj + bproj)

        got = window_attn_block(
            x, lns, lnb, wqkv, bqkv, wproj, bproj, heads=H, gw=4, interpret=True
        )
        err = float(jnp.abs(ref - got).max())
        assert err / float(jnp.abs(ref).max()) < 1e-5

    def test_hiera_fused_flag_params_match_module_path(self):
        """A MultiScaleBlock with fused_window_attn declares the same
        parameter tree as the module path (checkpoint compatibility).

        The fused path is forced ON via hiera._FORCE_FUSED so the check is
        NOT vacuous on CPU CI (the gate otherwise requires the TPU
        backend, ADVICE r2 #2); jax.eval_shape traces the init without
        executing the Pallas kernels, which cannot run on CPU."""
        from circuitvision_tpu.models.sam2 import hiera
        from circuitvision_tpu.models.sam2.hiera import MultiScaleBlock

        x = jnp.zeros((4, 4, 4, 32), jnp.float32)  # 4 windows of 4x4, C=32
        kw = dict(dim=32, dim_out=32, num_heads=2)
        v_mod = MultiScaleBlock(**kw).init(jax.random.PRNGKey(0), x)
        old = hiera._FORCE_FUSED
        hiera._FORCE_FUSED = True
        try:
            v_fused = jax.eval_shape(
                lambda k: MultiScaleBlock(**kw, fused_window_attn=True).init(k, x),
                jax.random.PRNGKey(0),
            )
        finally:
            hiera._FORCE_FUSED = old
        shapes = lambda t: jax.tree.map(lambda a: a.shape, t)
        # the fused tree must exist (non-vacuous) and match the module path
        assert v_fused["params"], "fused param tree is empty"
        assert shapes(v_mod["params"]) == shapes(v_fused["params"])


    def test_merged_subwindow_path(self):
        """gw divisible by nm=128//T exercises the block-diagonal-mask
        merged attention tiles; result must equal per-window attention."""
        from circuitvision_tpu.ops.pallas.window_attn import window_attn_block

        rng = np.random.default_rng(7)
        WT, T, C, H = 8, 16, 48, 2
        hd = C // H
        x = jnp.asarray(rng.standard_normal((WT, T, C)), jnp.float32)
        lns = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        lnb = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * C,)) * 0.05, jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

        per_window = window_attn_block(
            x, lns, lnb, wqkv, bqkv, wproj, bproj, heads=H, gw=1, interpret=True
        )
        merged = window_attn_block(
            x, lns, lnb, wqkv, bqkv, wproj, bproj, heads=H, gw=8, interpret=True
        )
        err = float(jnp.abs(per_window - merged).max())
        assert err / float(jnp.abs(per_window).max()) < 1e-5


class TestQPoolAttnBlock:
    """ops/pallas/window_attn.qpool_attn_block vs the MultiScaleBlock
    q_stride module math (LN → skip proj+pool2x → windowed attention with
    2×2-pooled q → proj → residual)."""

    def _make(self, seed=0, WIN=4, S=8):
        rng = np.random.default_rng(seed)
        B, CI, CO, H = 2, 32, 64, 2
        arr = lambda shp, s: jnp.asarray(rng.standard_normal(shp) * s, jnp.float32)
        return (
            B, S, WIN, CI, CO, H,
            arr((B, S, S, CI), 1.0),
            arr((CI,), 1.0), arr((CI,), 1.0),        # ln scale/bias
            arr((CI, CO), 0.1), arr((CO,), 0.05),     # skip proj
            arr((CI, 3 * CO), 0.1), arr((3 * CO,), 0.05),  # qkv
            arr((CO, CO), 0.1), arr((CO,), 0.05),     # attn proj
        )

    def _reference(self, B, S, WIN, CI, CO, H, x, lns, lnb, wsk, bsk, wqkv, bqkv, wpr, bpr):
        from circuitvision_tpu.models.sam2.hiera import (
            _pool2x, window_partition, window_unpartition,
        )

        hd = CO // H
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean, 0.0)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        shortcut = _pool2x(xn @ wsk + bsk)
        xw, _ = window_partition(xn, WIN)
        nw = xw.shape[0]
        qkv = (xw.reshape(nw, WIN * WIN, CI) @ wqkv + bqkv).reshape(
            nw, WIN * WIN, 3, H, hd
        )
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _pool2x(q.reshape(nw, WIN, WIN, CO)).reshape(nw, -1, H, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5), axis=-1
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nw, WIN // 2, WIN // 2, CO)
        o = window_unpartition(o, WIN // 2, (S // 2, S // 2), (S // 2, S // 2))
        return shortcut + (o @ wpr + bpr)

    @pytest.mark.parametrize("win,s", [(4, 8), (8, 16), (16, 16)])
    def test_matches_module_math(self, win, s):
        """All three window extents the L config's transition blocks run
        after the round-3 stage-window fix (prev-stage windows 8/4/16)."""
        from circuitvision_tpu.models.sam2.hiera import (
            window_partition, window_unpartition,
        )
        from circuitvision_tpu.ops.pallas.window_attn import qpool_attn_block

        vals = self._make(WIN=win, S=s)
        B, S, WIN, CI, CO, H, x, lns, lnb, wsk, bsk, wqkv, bqkv, wpr, bpr = vals
        ref = self._reference(*vals)

        xw, _ = window_partition(x, WIN)
        nw = xw.shape[0]
        out = qpool_attn_block(
            xw.reshape(nw * WIN * WIN, CI),
            lns, lnb, wsk, bsk, wqkv, bqkv, wpr, bpr,
            heads=H, win=WIN, interpret=True,
        ).reshape(nw, WIN // 2, WIN // 2, CO)
        got = window_unpartition(out, WIN // 2, (S // 2, S // 2), (S // 2, S // 2))
        err = float(jnp.abs(ref - got).max())
        assert err / float(jnp.abs(ref).max()) < 1e-5

    def test_merged_equals_per_window(self):
        """gw=8 exercises the nm=8 block-diagonal merged tiles; result
        must equal gw=1 per-window attention."""
        from circuitvision_tpu.models.sam2.hiera import window_partition
        from circuitvision_tpu.ops.pallas.window_attn import qpool_attn_block

        vals = self._make(seed=3)
        B, S, WIN, CI, CO, H, x, lns, lnb, wsk, bsk, wqkv, bqkv, wpr, bpr = vals
        xw, _ = window_partition(x, WIN)
        nw = xw.shape[0]
        args = (
            xw.reshape(nw * WIN * WIN, CI),
            lns, lnb, wsk, bsk, wqkv, bqkv, wpr, bpr,
        )
        a = qpool_attn_block(*args, heads=H, win=WIN, gw=1, interpret=True)
        b = qpool_attn_block(*args, heads=H, win=WIN, gw=8, interpret=True)
        err = float(jnp.abs(a - b).max())
        assert err / float(jnp.abs(a).max()) < 1e-5

    def test_qpool_fused_params_match_module_path(self):
        """A q_stride MultiScaleBlock with the fused path forced declares
        the same parameter tree as the module path (checkpoint compat)."""
        from circuitvision_tpu.models.sam2 import hiera
        from circuitvision_tpu.models.sam2.hiera import MultiScaleBlock

        x = jnp.zeros((2, 8, 8, 32), jnp.float32)
        kw = dict(dim=32, dim_out=64, num_heads=2, q_stride=True, window_size=4)
        v_mod = MultiScaleBlock(**kw).init(jax.random.PRNGKey(0), x)
        old = hiera._FORCE_FUSED
        hiera._FORCE_FUSED = True
        try:
            v_fused = jax.eval_shape(
                lambda k: MultiScaleBlock(**kw).init(k, x), jax.random.PRNGKey(0)
            )
        finally:
            hiera._FORCE_FUSED = old
        shapes = lambda t: jax.tree.map(lambda a: a.shape, t)
        assert v_fused["params"], "fused param tree is empty"
        assert shapes(v_mod["params"]) == shapes(v_fused["params"])


class TestGlobalAttnKernels:
    """ops/pallas/global_attn vs the XLA LN/qkv/pad and proj/residual
    formulation used by the module-path global blocks."""

    def _params(self, seed, B, N, C, H):
        rng = np.random.default_rng(seed)
        arr = lambda shp, s: jnp.asarray(rng.standard_normal(shp) * s, jnp.float32)
        return (
            arr((B, N, C), 1.0),
            arr((C,), 1.0), arr((C,), 1.0),
            arr((C, 3 * C), 0.1), arr((3 * C,), 0.05),
            arr((C, C), 0.1), arr((C,), 0.05),
        )

    def test_ln_qkv_flash_layout(self):
        from circuitvision_tpu.ops.pallas.global_attn import ln_qkv_flash

        B, N, C, H = 2, 64, 48, 2
        hd = C // H
        x, lns, lnb, wqkv, bqkv, wproj, bproj = self._params(0, B, N, C, H)

        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean, 0.0)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        qkv = (xn @ wqkv + bqkv).reshape(B, N, 3, H, hd)
        refs = [jnp.swapaxes(qkv[:, :, i], 1, 2) for i in range(3)]  # (B, H, N, hd)

        q, k, v = ln_qkv_flash(
            x, lns, lnb, wqkv, bqkv, heads=H, row_tile=32, interpret=True
        )
        for got, ref in zip((q, k, v), refs):
            assert got.shape == (B, H, N, 128)
            err = float(jnp.abs(got[..., :hd] - ref).max())
            assert err / float(jnp.abs(ref).max()) < 1e-5
            assert float(jnp.abs(got[..., hd:]).max()) == 0.0  # padded lanes zero

    def test_attn_proj_residual(self):
        from circuitvision_tpu.ops.pallas.global_attn import attn_proj_residual

        B, N, C, H = 2, 64, 48, 2
        hd = C // H
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        o_true = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
        o = jnp.pad(o_true, ((0, 0), (0, 0), (0, 0), (0, 128 - hd)))
        wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
        bproj = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

        concat = jnp.swapaxes(o_true, 1, 2).reshape(B, N, C)
        ref = x + concat @ wproj + bproj

        got = attn_proj_residual(x, o, wproj, bproj, row_tile=32, interpret=True)
        err = float(jnp.abs(ref - got).max())
        assert err / float(jnp.abs(ref).max()) < 1e-5

    def test_padded_lanes_ignored(self):
        """Garbage in the flash output's padded lanes must not leak into
        the projection (the weight rows there are zero)."""
        from circuitvision_tpu.ops.pallas.global_attn import attn_proj_residual

        B, N, C, H = 1, 32, 32, 2
        hd = C // H
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        o_true = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
        pad_garbage = jnp.asarray(
            rng.standard_normal((B, H, N, 128 - hd)) * 100.0, jnp.float32
        )
        o_clean = jnp.pad(o_true, ((0, 0), (0, 0), (0, 0), (0, 128 - hd)))
        o_dirty = jnp.concatenate([o_true, pad_garbage], axis=-1)
        wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
        bproj = jnp.zeros((C,), jnp.float32)

        a = attn_proj_residual(x, o_clean, wproj, bproj, row_tile=32, interpret=True)
        b = attn_proj_residual(x, o_dirty, wproj, bproj, row_tile=32, interpret=True)
        assert float(jnp.abs(a - b).max()) == 0.0


class TestMlpBlock:
    """ops/pallas/mlp_block vs the XLA MLP-half formulation."""

    def test_matches_reference_with_chunking(self):
        from circuitvision_tpu.ops.pallas.mlp_block import mlp_block

        rng = np.random.default_rng(0)
        T, C, HID = 100, 48, 192
        x = jnp.asarray(rng.standard_normal((T, C)), jnp.float32)
        lns = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        lnb = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
        w0 = jnp.asarray(rng.standard_normal((C, HID)) * 0.1, jnp.float32)
        b0 = jnp.asarray(rng.standard_normal((HID,)) * 0.05, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((HID, C)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, -1, keepdims=True) - mean * mean, 0.0)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        ref = x + (jax.nn.gelu(xn @ w0 + b0, approximate=False) @ w1 + b1)

        # 3 hidden chunks + a row remainder exercises both grid dims
        got = mlp_block(x, lns, lnb, w0, b0, w1, b1,
                        row_tile=32, hidden_chunk=64, interpret=True)
        assert float(jnp.abs(ref - got).max()) < 1e-4
