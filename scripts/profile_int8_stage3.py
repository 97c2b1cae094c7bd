"""Would int8 serving quantization pay on the stage-3 matmuls?

v5e peak is 394 int8 TOPS vs 197 bf16 TFLOPS; stage-3 (36 blocks at
C=576) owns ~70 ms of the 162 ms SAM2 step at 62-72% bf16 MFU, so a
working int8 path bounds at roughly -25 ms/step. This measures the REAL
chain a quantized MLP would run — dynamic per-tensor activation
quantization (f32->s8 + scale), s8xs8->s32 MXU dot, dequant, exact GELU,
requantize, second dot — against the bf16 XLA chain at identical shapes,
36 blocks chained in one jit (one dispatch per step; per-call loops over
the tunnel are dispatch-bound, PERF.md timing gotcha).

Run: python scripts/profile_int8_stage3.py
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

BATCH = 8
TOKENS = BATCH * 4096  # stage-3 feature map 64x64
C = 576
HIDDEN = 4 * C
N_BLOCKS = 36


def quant_s8(x, axis=None):
    """Symmetric per-tensor s8 quantization; returns (q, scale)."""
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32) + 1e-8
    scale = amax / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def make_bf16():
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.standard_normal((C, HIDDEN)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((HIDDEN, C)) * 0.02, jnp.bfloat16)

    @jax.jit
    def step(x):
        for _ in range(N_BLOCKS):
            h = jax.nn.gelu(x @ w0, approximate=False)
            x = (h @ w1).astype(jnp.bfloat16)
        return x

    x = jnp.asarray(rng.standard_normal((TOKENS, C)) * 0.1, jnp.bfloat16)
    return step, x


def make_int8():
    rng = np.random.default_rng(0)
    w0f = rng.standard_normal((C, HIDDEN)).astype(np.float32) * 0.02
    w1f = rng.standard_normal((HIDDEN, C)).astype(np.float32) * 0.02
    # static per-output-channel weight scales (serving-style)
    s0 = np.abs(w0f).max(axis=0) / 127.0 + 1e-12
    s1 = np.abs(w1f).max(axis=0) / 127.0 + 1e-12
    q0 = jnp.asarray(np.clip(np.round(w0f / s0), -127, 127), jnp.int8)
    q1 = jnp.asarray(np.clip(np.round(w1f / s1), -127, 127), jnp.int8)
    s0 = jnp.asarray(s0, jnp.float32)
    s1 = jnp.asarray(s1, jnp.float32)

    @jax.jit
    def step(x):
        for _ in range(N_BLOCKS):
            qx, sx = quant_s8(x)
            acc = jax.lax.dot_general(
                qx, q0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            h = acc.astype(jnp.float32) * (sx * s0)[None, :]
            h = jax.nn.gelu(h, approximate=False)
            qh, sh = quant_s8(h)
            acc2 = jax.lax.dot_general(
                qh, q1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            x = (acc2.astype(jnp.float32) * (sh * s1)[None, :]).astype(jnp.bfloat16)
        return x

    x = jnp.asarray(rng.standard_normal((TOKENS, C)) * 0.1, jnp.bfloat16)
    return step, x


def time_step(step, x, steps=30):
    out = step(x)
    jax.block_until_ready(out)
    _ = float(out[0, 0])  # tiny-slice readback (not the full activation)
    t0 = time.perf_counter()
    y = x
    for _ in range(steps):
        y = step(y)
    _ = float(y[0, 0])
    return (time.perf_counter() - t0) / steps


def main():
    print(f"backend: {jax.default_backend()}  tokens={TOKENS} C={C} hid={HIDDEN}")
    flops = 2 * TOKENS * C * HIDDEN * 2 * N_BLOCKS
    for name, mk in (("bf16 XLA", make_bf16), ("int8 dyn-act", make_int8)):
        step, x = mk()
        dt = time_step(step, x)
        print(
            f"{name:14s}: {dt*1e3:7.1f} ms/step  "
            f"{flops/dt/1e12:6.1f} TFLOP/s-equiv  "
            f"({dt/N_BLOCKS*1e3:5.2f} ms/block)",
            flush=True,
        )


if __name__ == "__main__":
    main()
