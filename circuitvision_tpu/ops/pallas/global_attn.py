"""Fused shell kernels for the Hiera global-attention blocks.

The 3 global blocks (Hiera-L 23/33/43; reference config
models/configs/sam2.1_hiera_l.yaml:14) run flash attention over
N = 64² = 4096 tokens at C = 576, heads 8, head_dim 72. The flash kernel
itself is fast (tuned blocks, hiera._flash_block_sizes), but XLA's shell
around it — qkv reshape/strided-slice into q/k/v, (B, N, H, D) →
(B, H, N, D) transposes, and the 72 → 128 lane pad of all three tensors —
round-trips the full activation through HBM ~7 ms/step at batch 8
(PERF.md trace).

Two kernels remove the shell entirely:

- `ln_qkv_flash`: LN1 + qkv projection emitting q, k, v DIRECTLY in the
  flash layout (B, H, N, 128). The weight matrix is pre-padded per head
  (72 → 128 zero columns), so each head's projection is one full-tile
  (tn, C) @ (C, 128) matmul and the padded lanes are exactly zero — zero
  k-lanes cancel in q·kᵀ and zero v-lanes produce zero output columns,
  the same invariant the XLA pad path relied on.
- `attn_proj_residual`: the output projection folded with the residual:
  out = x + Σ_h o_h @ Wproj[h·72:(h+1)·72, :], with Wproj pre-padded to
  (H, 128, C) zero rows so the flash output's padded lanes are killed by
  the matmul instead of a slice.

Numerics match MultiScaleAttention: LN stats in f32 over the true
channel width, matmuls accumulate f32, softmax scale (true head
dim)**-0.5 is applied inside flash attention by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ln_qkv_kernel(
    x_ref, lns_ref, lnb_ref, w_ref, b_ref, q_ref, k_ref, v_ref,
    *, heads, true_dim, eps, dtype,
):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mean = s1 / true_dim
    var = jnp.maximum(s2 / true_dim - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]).astype(dtype)

    for s, out in enumerate((q_ref, k_ref, v_ref)):
        for h in range(heads):
            col = (s * heads + h) * 128
            out[0, h] = (
                jnp.dot(xn, w_ref[:, col : col + 128], preferred_element_type=jnp.float32)
                + b_ref[s * heads + h].astype(jnp.float32)
            ).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "true_dim", "eps", "row_tile", "interpret")
)
def ln_qkv_flash(
    x: jax.Array,  # (B, N, C)
    ln_scale: jax.Array,  # (C,)
    ln_bias: jax.Array,  # (C,)
    wqkv: jax.Array,  # (C, 3C), columns [q|k|v] × heads × head_dim
    bqkv: jax.Array,  # (3C,)
    heads: int,
    true_dim: int = 0,
    eps: float = 1e-6,
    row_tile: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """LN + qkv projection emitting (B, H, N, 128) q/k/v for flash
    attention, head_dim zero-padded to the 128-lane tile in the weights."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    true_dim = true_dim or c
    hd = c // heads
    dtype = x.dtype
    row_tile = min(row_tile, n)
    while n % row_tile:
        row_tile //= 2

    # Pre-pad the weights per (qkv, head) column group: (C, 3, H, hd) →
    # zero-pad hd → 128 → (C, 3·H·128). Constant-folds under jit when the
    # weights are donated/cached; costs one tiny (C × 3C) pass otherwise.
    w4 = wqkv.astype(dtype).reshape(c, 3, heads, hd)
    w_pad = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, 128 - hd))).reshape(
        c, 3 * heads * 128
    )
    b_pad = jnp.pad(
        bqkv.astype(jnp.float32).reshape(3, heads, hd),
        ((0, 0), (0, 0), (0, 128 - hd)),
    ).reshape(3 * heads, 128)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, heads, row_tile, 128), lambda bi, i: (bi, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, heads, n, 128), dtype)
    q, k, v = pl.pallas_call(
        functools.partial(
            _ln_qkv_kernel, heads=heads, true_dim=true_dim, eps=eps, dtype=dtype
        ),
        out_shape=(out_shape, out_shape, out_shape),
        grid=(b, n // row_tile),
        in_specs=[
            pl.BlockSpec(
                (1, row_tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
            ),
            wspec, wspec, wspec, wspec,
        ],
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32), w_pad, b_pad)
    return q, k, v


def _proj_res_kernel(x_ref, o_ref, wp_ref, bp_ref, out_ref, *, heads, dtype):
    acc = x_ref[0].astype(jnp.float32) + bp_ref[:].astype(jnp.float32)
    for h in range(heads):
        acc = acc + jnp.dot(
            o_ref[0, h], wp_ref[h], preferred_element_type=jnp.float32
        )
    out_ref[0] = acc.astype(dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def attn_proj_residual(
    x: jax.Array,  # (B, N, C) residual input
    o: jax.Array,  # (B, H, N, 128) flash output, lanes ≥ head_dim zero
    wproj: jax.Array,  # (C, C), rows ordered heads × head_dim
    bproj: jax.Array,  # (C,)
    row_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x + concat_heads(o)[..., :head_dim] @ wproj + bproj, with the head
    concat/slice replaced by per-head row-padded matmul accumulation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    heads = o.shape[1]
    hd = c // heads
    dtype = x.dtype
    row_tile = min(row_tile, n)
    while n % row_tile:
        row_tile //= 2

    # (C, C) → (H, hd, C) → zero-pad rows hd → 128 → (H, 128, C): the
    # flash output's zero-padded lanes hit zero weight rows.
    wp = jnp.pad(
        wproj.astype(dtype).reshape(heads, hd, c), ((0, 0), (0, 128 - hd), (0, 0))
    )

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_proj_res_kernel, heads=heads, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        grid=(b, n // row_tile),
        in_specs=[
            pl.BlockSpec(
                (1, row_tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, heads, row_tile, 128), lambda bi, i: (bi, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec, wspec,
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x, o, wp, bproj.astype(jnp.float32))
