"""Fused MLP-half kernel for Hiera blocks.

One pallas_call computes the second half of a MultiScaleBlock:

    out = x + mlp1(gelu(mlp0(LN2(x))))

for row-wise activations (any layout flattened to (T, C)). The hidden
width streams in chunks through a second grid dimension so stage 4's
(1152, 4608) weights never need to fit in VMEM at once: for each row
tile, chunk 0 computes the LayerNorm into scratch and initializes a f32
accumulator with the residual + bias; every chunk adds its
gelu(xn @ W0ᶜ + b0ᶜ) @ W1ᶜ partial; the last chunk writes the tile.

GELU is the exact erf form (torch nn.GELU default; reference
src/sam2_infer.py uses approximate=False) via the Abramowitz–Stegun
polynomial — Mosaic lowers neither erf nor erfc.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .refinement_fused import _gelu_exact


def _kernel(
    x_ref, lns_ref, lnb_ref, w0_ref, b0_ref, w1_ref, b1_ref,
    out_ref, xn_ref, acc_ref,
    *, true_dim, eps, n_chunks, dtype,
):
    from jax.experimental import pallas as pl

    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _():
        x = x_ref[:]
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=-1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
        mean = s1 / true_dim
        var = jnp.maximum(s2 / true_dim - mean * mean, 0.0)
        xn_ref[:] = (
            (xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]
        ).astype(dtype)
        acc_ref[:] = xf + b1_ref[:].astype(jnp.float32)

    h = (
        jnp.dot(xn_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
        + b0_ref[chunk].astype(jnp.float32)  # (1, hidden_chunk) row broadcast
    )
    h = _gelu_exact(h).astype(dtype)
    acc_ref[:] = acc_ref[:] + jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)

    @pl.when(chunk == n_chunks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("true_dim", "eps", "row_tile", "hidden_chunk", "interpret"),
)
def mlp_block(
    x: jax.Array,  # (T, C)
    ln_scale: jax.Array,  # (C,)
    ln_bias: jax.Array,  # (C,)
    w0: jax.Array,  # (C, hidden)
    b0: jax.Array,  # (hidden,)
    w1: jax.Array,  # (hidden, C)
    b1: jax.Array,  # (C,)
    true_dim: int = 0,
    eps: float = 1e-6,
    row_tile: int = 0,
    hidden_chunk: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused `x + mlp(LN(x))` over rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, c = x.shape
    hidden = w0.shape[1]
    true_dim = true_dim or c
    dtype = x.dtype
    if not hidden_chunk:
        # Largest divisor of `hidden` whose W0/W1 chunk pair fits a
        # ~9 MB bf16 budget — fewer chunks win decisively (stage-3:
        # whole-hidden 2.7 ms vs 256-chunks 3.6 ms standalone; each
        # extra chunk pass re-streams the row tile and accumulator).
        # 9 MB (down from 11) keeps stage 3 (C=576) whole-hidden while
        # dropping stage 4 (C=1152) to 4 chunks: at 2 chunks the
        # double-buffered weight pair + the (rows, chunk) f32 GELU
        # intermediate measured 33.9 MB of scoped VMEM against the 32 MB
        # stack limit once upstream layouts shifted (q-pool kernel).
        cap = max(128, 9_000_000 // (2 * c * 2))
        hidden_chunk = hidden
        while hidden_chunk > cap and hidden_chunk % 2 == 0:
            hidden_chunk //= 2
    if hidden % hidden_chunk != 0:
        raise ValueError(
            f"hidden_chunk {hidden_chunk} must divide hidden {hidden} "
            "(a non-divisor would silently truncate the hidden dimension)"
        )
    n_chunks = hidden // hidden_chunk
    if not row_tile:
        row_tile = min(t, 512)
    pad_t = (-t) % row_tile
    if pad_t:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
    rows = x.shape[0]

    wf = lambda a: a.astype(dtype)
    out = pl.pallas_call(
        functools.partial(
            _kernel, true_dim=true_dim, eps=eps, n_chunks=n_chunks, dtype=dtype
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        grid=(rows // row_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden_chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            # b0 rides whole as (n_chunks, 1, hidden_chunk) and the kernel
            # indexes the untiled leading dim — 1-D/2-D chunked specs hit
            # XLA/Mosaic tiling-layout and divisibility constraints.
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden_chunk, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((row_tile, c), dtype),
            pltpu.VMEM((row_tile, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wf(w0), b0.reshape(n_chunks, 1, hidden_chunk), wf(w1), b1,
    )
    return out[:t] if pad_t else out
