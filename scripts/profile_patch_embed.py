"""Microbench: 7x7 s4 patch-embed conv — direct XLA conv (C_in=3,
MXU-degenerate) vs space-to-depth-4 + 2x2 s1 conv (C_in=48, K=192).

Both compute the identical sums (rearranged weights, zero taps for the
8th row/col); prints ms/step for each and the max abs diff.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, H, C_in, C_out = 8, 1024, 3, 144
dt = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, H, H, C_in), np.float32) - 0.5, dt)
k = jnp.asarray(rng.random((7, 7, C_in, C_out), np.float32) - 0.5, dt)
bias = jnp.asarray(rng.random((C_out,), np.float32), dt)


def direct(x, k, bias):
    y = lax.conv_general_dilated(
        x, k, window_strides=(4, 4), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def s2d(x, k, bias):
    b, h, w, c = x.shape
    h_out = (h - 1) // 4 + 1
    w_out = (w - 1) // 4 + 1
    pr_h = 4 * (h_out + 1) - h - 3
    pr_w = 4 * (w_out + 1) - w - 3
    xp = jnp.pad(x, ((0, 0), (3, pr_h), (3, pr_w), (0, 0)))
    nb_h = xp.shape[1] // 4
    nb_w = xp.shape[2] // 4
    x2 = xp.reshape(b, nb_h, 4, nb_w, 4, c).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(b, nb_h, nb_w, 16 * c)
    k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = k8.reshape(2, 4, 2, 4, c, C_out).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(2, 2, 16 * c, C_out)
    y = lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


fd = jax.jit(direct)
fs = jax.jit(s2d)
yd = fd(x, k, bias); jax.block_until_ready(yd)
ys = fs(x, k, bias); jax.block_until_ready(ys)
print("shapes:", yd.shape, ys.shape)
diff = float(jnp.max(jnp.abs(yd.astype(jnp.float32) - ys.astype(jnp.float32))))
print("max abs diff:", diff)

for name, f in [("direct", fd), ("s2d", fs)]:
    # warm
    y = f(x, k, bias); _ = np.asarray(y[0, 0, 0, :1])
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        y = f(x, k, bias)
    jax.block_until_ready(y)
    _ = np.asarray(y[0, 0, 0, :1])
    print(f"{name}: {(time.perf_counter()-t0)/N*1000:.3f} ms/step")
