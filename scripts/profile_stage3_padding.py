"""Measure whether padding the stage-3 channel width 576 -> 640 (5 full
128-lane tiles) inside the fused kernels would pay.

PERF.md round-2: the XLA-level trunk-wide padding experiment was
NEGATIVE (+11% FLOPs outweighed alignment at stage 3). Now that the
matmuls live in first-party kernels, this re-tests the trade at the
kernel level on the stage-3 shapes (36 blocks, t=256-token windows,
heads 8).

Methodology: a naive per-call dispatch loop over the axon tunnel reads
~90 ms for a ~1.2 ms kernel (dispatch-bound, see PERF.md timing gotcha),
so here the 36-block stage is CHAINED inside one jit -- attn block then
MLP block, output feeding the next iteration -- giving one dispatch per
measured step and in-model-like kernel back-to-back execution:

  step(x) = (mlp_block . window_attn_block)^36 (x)

Padded variants run C=640/hidden=2560 with real zero-padded weights (an
upper bound on padded cost: MXU time is shape-determined).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.ops.pallas.mlp_block import mlp_block
from circuitvision_tpu.ops.pallas.window_attn import window_attn_block

BATCH = 8
# Stage 3 feature map at 1024 input: 64x64 -> 16 windows of 16x16 per img.
WT = BATCH * 16
T = 256
N_BLOCKS = 36


def make_step(c: int, heads: int = 8, true_dim: int = 576):
    rng = np.random.default_rng(0)
    hidden = 4 * c
    lns = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.02, jnp.bfloat16)
    b0 = jnp.zeros((hidden,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
    bproj = jnp.zeros((c,), jnp.float32)

    @jax.jit
    def step(x3):
        for _ in range(N_BLOCKS):
            x3 = window_attn_block(
                x3, lns, lnb, wqkv, bqkv, wproj, bproj, heads=heads,
                true_dim=true_dim, scale_dim=72,
            )
            x2 = x3.reshape(-1, c)
            x2 = mlp_block(x2, lns, lnb, w0, b0, w1, b1, true_dim=true_dim)
            x3 = x2.reshape(WT, T, c)
        return x3

    x = jnp.asarray(rng.standard_normal((WT, T, c)) * 0.1, jnp.bfloat16)
    return step, x


def time_step(step, x, steps=30):
    # Tiny-slice readback: np.asarray(out) would drag the full 37 MB
    # activation through the ~14 MB/s tunnel and dominate the timing.
    out = step(x)
    jax.block_until_ready(out)
    _ = float(out[0, 0, 0])
    t0 = time.perf_counter()
    y = x
    for _ in range(steps):
        y = step(y)
    _ = float(y[0, 0, 0])
    return (time.perf_counter() - t0) / steps


def main():
    for c in (576, 640):
        step, x = make_step(c)
        dt = time_step(step, x)
        per_block = dt / N_BLOCKS * 1e3
        print(
            f"C={c}: stage-3 chain {dt*1e3:7.1f} ms/step "
            f"({per_block:5.2f} ms/block, {N_BLOCKS} blocks)",
            flush=True,
        )


if __name__ == "__main__":
    main()
