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
