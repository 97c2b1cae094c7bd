"""FLOP accounting (models/flops.py): the MFU denominator must be exact
for the primitives it counts, and the model counters must land near
independently-known totals."""
import jax
import jax.numpy as jnp
import pytest


class TestMatmulFlops:
    def test_plain_matmul(self):
        from circuitvision_tpu.models.flops import matmul_flops

        f = matmul_flops(
            lambda a, b: a @ b, jnp.zeros((64, 32)), jnp.zeros((32, 16))
        )
        assert f == 2 * 64 * 32 * 16

    def test_batched_dot_general(self):
        from circuitvision_tpu.models.flops import matmul_flops

        # (B, M, K) @ (B, K, N) via einsum → batch dims counted once
        f = matmul_flops(
            lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b),
            jnp.zeros((3, 8, 5)),
            jnp.zeros((3, 5, 7)),
        )
        assert f == 2 * 3 * 8 * 5 * 7

    def test_conv(self):
        import flax.linen as nn

        from circuitvision_tpu.models.flops import matmul_flops

        conv = nn.Conv(16, (3, 3), padding="SAME")
        v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 10, 8)))
        f = matmul_flops(
            lambda v, x: conv.apply(v, x), v, jnp.zeros((1, 10, 10, 8))
        )
        assert f == 2 * 10 * 10 * 16 * 8 * 9

    def test_grouped_conv_divides_cin(self):
        import flax.linen as nn

        from circuitvision_tpu.models.flops import matmul_flops

        conv = nn.Conv(16, (3, 3), padding="SAME", feature_group_count=8)
        v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 10, 8)))
        f = matmul_flops(
            lambda v, x: conv.apply(v, x), v, jnp.zeros((1, 10, 10, 8))
        )
        assert f == 2 * 10 * 10 * 16 * (8 / 8) * 9

    def test_jit_boundary_recursed(self):
        from circuitvision_tpu.models.flops import matmul_flops

        inner = jax.jit(lambda a, b: a @ b)
        f = matmul_flops(
            lambda a, b: inner(a, b), jnp.zeros((4, 4)), jnp.zeros((4, 4))
        )
        assert f == 2 * 4 * 4 * 4


class TestModelFlops:
    def test_yolo_l_640_matches_published_scale(self):
        """ultralytics publishes YOLOv11-L at ~87 GFLOPs @640 (their
        convention: 2×MACs). The first-party model differs in the head's
        class count (62 vs 80) so allow a generous band — the point is
        catching order-of-magnitude counting bugs, not a parity pin."""
        from circuitvision_tpu.core.config import DetectorConfig
        from circuitvision_tpu.models.flops import yolo_forward_flops

        f = yolo_forward_flops(DetectorConfig(scale="l", img_size=640))
        assert 60e9 < f < 120e9, f / 1e9

    @pytest.mark.slow
    def test_sam2_l_1024_in_vit_large_band(self):
        """Hiera-L at 1024² (trunk ~212 M params over 4096+ tokens) runs
        ~1.2-1.8 TFLOP/img counting attention + decoder + refinement."""
        from circuitvision_tpu.core.config import SAM2Config
        from circuitvision_tpu.models.flops import sam2_forward_flops

        f = sam2_forward_flops(SAM2Config(dtype="bfloat16"))
        assert 0.8e12 < f < 3e12, f / 1e12

    def test_peak_lookup(self):
        from circuitvision_tpu.models.flops import PEAK_FLOPS_BY_KIND

        assert PEAK_FLOPS_BY_KIND["TPU v5 lite"] == 197e12
