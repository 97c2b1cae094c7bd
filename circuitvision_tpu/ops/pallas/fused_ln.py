"""Fused LayerNorm Pallas kernels for the Hiera trunk.

XLA lowers the trunk's LayerNorms (flax: f32 statistics over a bf16
activation) as convert→reduce→broadcast chains that round-trip the full
activation through HBM several times — 37 ms of a 241 ms batch-4 SAM2-L
step on v5e (traced, PERF.md). These kernels do one HBM read and one HBM
write per tensor:

- `fused_layernorm(x2d, scale, bias)`: y = LN(x) with f32 stats computed
  in VMEM, output in the input dtype.
- `fused_add_layernorm(a2d, b2d, scale, bias)`: the Hiera block's
  residual join `x = a + b; y = LN(x)` in one pass, returning both.

Both take `true_dim`: the channel count the statistics divide by. For
MXU-padded trunks (hiera.pad_multiple) the padded tail lanes are zero and
scale's tail is zero, so passing the true width reproduces
hiera.PaddedLayerNorm; for native widths true_dim == C and the math is
flax's use_fast_variance LayerNorm.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ln_rows(xf: jax.Array, scale, bias, n: int, eps: float) -> jax.Array:
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _ln_kernel(x_ref, s_ref, b_ref, out_ref, *, n, eps):
    xf = x_ref[:].astype(jnp.float32)
    y = _ln_rows(xf, s_ref[:], b_ref[:], n, eps)
    out_ref[:] = y.astype(out_ref.dtype)


def _add_ln_kernel(a_ref, b_ref, s_ref, bias_ref, resid_ref, out_ref, *, n, eps):
    resid = a_ref[:] + b_ref[:]
    resid_ref[:] = resid
    xf = resid.astype(jnp.float32)
    y = _ln_rows(xf, s_ref[:], bias_ref[:], n, eps)
    out_ref[:] = y.astype(out_ref.dtype)


def _row_tile(t: int, c: int) -> int:
    """Rows per grid step: cap the f32 working set at ~2.5 MB."""
    tile = max(8, min(1024, (2_500_000 // max(c * 4, 1)) // 8 * 8))
    while t % tile:
        tile //= 2
        tile = max(tile, 8)
        if tile == 8:
            break
    return tile


@functools.partial(jax.jit, static_argnames=("true_dim", "eps", "interpret"))
def fused_layernorm(
    x: jax.Array,  # (T, C), any float dtype
    scale: jax.Array,  # (C,)
    bias: jax.Array,  # (C,)
    true_dim: int = 0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, c = x.shape
    n = true_dim or c
    tile = _row_tile(t, c)
    pad_t = (-t) % tile
    if pad_t:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
    grid = (x.shape[0] // tile,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, n=n, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out[:t] if pad_t else out


@functools.partial(jax.jit, static_argnames=("true_dim", "eps", "interpret"))
def fused_add_layernorm(
    a: jax.Array,  # (T, C)
    b: jax.Array,  # (T, C)
    scale: jax.Array,
    bias: jax.Array,
    true_dim: int = 0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (a + b, LN(a + b)) in one HBM pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, c = a.shape
    n = true_dim or c
    tile = _row_tile(t, c)
    pad_t = (-t) % tile
    if pad_t:
        a = jnp.pad(a, ((0, pad_t), (0, 0)))
        b = jnp.pad(b, ((0, pad_t), (0, 0)))
    grid = (a.shape[0] // tile,)
    spec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    resid, out = pl.pallas_call(
        functools.partial(_add_ln_kernel, n=n, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(a.shape, a.dtype),
            jax.ShapeDtypeStruct(a.shape, a.dtype),
        ),
        grid=grid,
        in_specs=[
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec),
        interpret=interpret,
    )(a, b, scale.astype(jnp.float32), bias.astype(jnp.float32))
    if pad_t:
        return resid[:t], out[:t]
    return resid, out
