"""Fused windowed-attention block kernel for the Hiera trunk.

One pallas_call computes the attention half of a Hiera MultiScaleBlock in
layout-persistent windowed form (hiera.py: x is (B·nW, win, win, C) and
each "image" IS one window):

    out = x + proj(attention(qkv(LN1(x))))

XLA runs this as LN convert→reduce chains, a qkv matmul, 5-D reshapes,
batched small attention einsums and a proj matmul — each pass
round-tripping the full activation through HBM. Here the x tile is read
once, everything happens in VMEM (weights stay resident across grid
steps), and the residual sum is written once.

Numerics match hiera.MultiScaleAttention: LayerNorm statistics in f32
(optionally over a true channel width < C for MXU-padded trunks,
hiera.TrunkLayerNorm), scores q·kᵀ accumulated in f32, softmax(scale·s)
in f32 with the softmax scale taken from the TRUE head dim, probabilities
cast to the compute dtype for the p·v contraction with f32 accumulation.

Grid: one program per GW windows. Static per-(window, head) inner loops —
all slices static; T must be a multiple of 8 (sublane tile).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, out_ref,
    *, gw, t, c, heads, true_dim, scale_dim, eps, dtype,
):
    rows = gw * t
    hd = c // heads
    x = x_ref[:].reshape(rows, c)

    # LayerNorm (f32 stats over the true channel width).
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mean = s1 / true_dim
    var = jnp.maximum(s2 / true_dim - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]).astype(dtype)

    # qkv projection: (rows, C) @ (C, 3C), f32 accumulation.
    qkv = (
        jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(dtype)

    scale = scale_dim**-0.5
    # Sub-window merging: windows shorter than the 128-sublane MXU tile
    # (stage 1/2: 64/16 tokens) are packed nm-at-a-time into one
    # 128-row attention tile with a block-diagonal mask — one (128, 128)
    # score matmul instead of nm tiny MXU-starved ones. The extra masked
    # score FLOPs are negligible next to the qkv projection (measured:
    # stage-2 blocks 2.95 → ~1 ms).
    nm = max(1, 128 // t) if gw % max(1, 128 // t) == 0 else 1
    rows_g = nm * t
    mask_bias = None
    if nm > 1:
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows_g, rows_g), 0) // t
        cj = jax.lax.broadcasted_iota(jnp.int32, (rows_g, rows_g), 1) // t
        mask_bias = jnp.where(ri == cj, 0.0, -1e30).astype(jnp.float32)
    group_outs = []
    for g in range(gw // nm):
        r0 = g * rows_g
        head_outs = []
        for h in range(heads):
            q = qkv[r0 : r0 + rows_g, h * hd : (h + 1) * hd]
            k = qkv[r0 : r0 + rows_g, c + h * hd : c + (h + 1) * hd]
            v = qkv[r0 : r0 + rows_g, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if mask_bias is not None:
                s = s + mask_bias
            p = jax.nn.softmax(s, axis=-1).astype(dtype)
            head_outs.append(
                jnp.dot(p, v, preferred_element_type=jnp.float32).astype(dtype)
            )
        # lane-aligned assembly: heads concat to (rows_g, C), groups to rows
        group_outs.append(jnp.concatenate(head_outs, axis=1))
    attn_out = jnp.concatenate(group_outs, axis=0) if len(group_outs) > 1 else group_outs[0]

    proj = (
        jnp.dot(attn_out, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).astype(dtype)
    out_ref[:] = (x + proj).reshape(gw, t, c)


def _qpool_kernel(
    x_ref, lns_ref, lnb_ref, wskip_ref, bskip_ref, wqkv_ref, bqkv_ref,
    wproj_ref, bproj_ref, out_ref,
    *, gw, t, win, c_in, c_out, heads, true_dim, scale_dim, eps, dtype,
):
    rows = gw * t
    qt = t // 4
    hd = c_out // heads
    x = x_ref[:]

    # LayerNorm (f32 stats over the true channel width).
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mean = s1 / true_dim
    var = jnp.maximum(s2 / true_dim - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]).astype(dtype)

    # Stage-transition shortcut: proj then 2×2 max-pool (pooling within
    # even windows == pooling the full map, so it lives in-window here).
    skip = (
        jnp.dot(xn, wskip_ref[:], preferred_element_type=jnp.float32)
        + bskip_ref[:].astype(jnp.float32)
    ).astype(dtype)

    qkv = (
        jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(dtype)

    def pool2x2(a, c):
        # Rows are window-major (w, i, j) with j fastest. Max-pool j via
        # adjacent row pairs, then i via the two win/2-row halves of each
        # (w, pi) group — static middle-dim slices only (Mosaic-safe).
        m = win // 2
        a = a.reshape(rows // 2, 2, c)
        a = jnp.maximum(a[:, 0, :], a[:, 1, :])  # (gw·win·m,) order (w, i, pj)
        a = a.reshape(gw * m, 2 * m, c)
        return jnp.maximum(a[:, :m, :], a[:, m:, :]).reshape(gw * qt, c)

    skip = pool2x2(skip, c_out)
    qp = pool2x2(qkv[:, :c_out], c_out)

    scale = scale_dim**-0.5
    # Merge windows until the k-side tile reaches the 128-sublane MXU
    # tile (block-diagonal masked, same scheme as _kernel above).
    nm = max(1, 128 // t) if gw % max(1, 128 // t) == 0 else 1
    qg, kg = nm * qt, nm * t
    mask_bias = None
    if nm > 1:
        ri = jax.lax.broadcasted_iota(jnp.int32, (qg, kg), 0) // qt
        cj = jax.lax.broadcasted_iota(jnp.int32, (qg, kg), 1) // t
        mask_bias = jnp.where(ri == cj, 0.0, -1e30).astype(jnp.float32)
    group_outs = []
    for g in range(gw // nm):
        head_outs = []
        for h in range(heads):
            q = qp[g * qg : (g + 1) * qg, h * hd : (h + 1) * hd]
            k = qkv[g * kg : (g + 1) * kg, c_out + h * hd : c_out + (h + 1) * hd]
            v = qkv[g * kg : (g + 1) * kg, 2 * c_out + h * hd : 2 * c_out + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if mask_bias is not None:
                s = s + mask_bias
            p = jax.nn.softmax(s, axis=-1).astype(dtype)
            head_outs.append(
                jnp.dot(p, v, preferred_element_type=jnp.float32).astype(dtype)
            )
        group_outs.append(jnp.concatenate(head_outs, axis=1))
    attn_out = jnp.concatenate(group_outs, axis=0) if len(group_outs) > 1 else group_outs[0]

    proj = (
        jnp.dot(attn_out, wproj_ref[:], preferred_element_type=jnp.float32)
        + bproj_ref[:].astype(jnp.float32)
    ).astype(dtype)
    out_ref[:] = skip + proj


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "win", "true_dim", "scale_dim", "gw", "eps", "interpret"
    ),
)
def qpool_attn_block(
    x: jax.Array,  # (W_total·win², C_in) — window-major rows, (i, j) order
    ln_scale: jax.Array,  # (C_in,)
    ln_bias: jax.Array,  # (C_in,)
    wskip: jax.Array,  # (C_in, C_out) stage-transition proj
    bskip: jax.Array,  # (C_out,)
    wqkv: jax.Array,  # (C_in, 3·C_out)
    bqkv: jax.Array,  # (3·C_out,)
    wproj: jax.Array,  # (C_out, C_out)
    bproj: jax.Array,  # (C_out,)
    heads: int,
    win: int,
    true_dim: int = 0,
    scale_dim: int = 0,
    gw: int = 0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Fused q-pool transition block (Hiera blocks 2/8/44):

        xn   = LN1(x)
        skip = pool2x2(xn @ Wskip + bskip)
        q    = pool2x2(q(xn));  k, v = k(xn), v(xn)
        out  = skip + proj(attention(q, k, v))

    over independent win×win windows; returns (W_total·win²/4, C_out)
    pooled rows in the same window-major order. Matches the reference's
    MultiScaleBlock q_stride path (hieradet: q 2×2 max-pooled after qkv,
    shortcut projected then pooled)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = win * win
    total_rows, c_in = x.shape
    wt = total_rows // t
    c_out = wproj.shape[0]
    true_dim = true_dim or c_in
    scale_dim = scale_dim or c_out // heads
    if not gw:
        rows_max = min(1024, max(t, 20_000_000 // (30 * c_out) // 128 * 128))
        gw = max(1, min(wt, rows_max // t))
        nm_ = max(1, 128 // t)
        while gw > nm_ and max(1, gw // nm_) * heads > 64:
            gw //= 2
    while wt % gw:
        gw -= 1
    dtype = x.dtype

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _qpool_kernel,
            gw=gw, t=t, win=win, c_in=c_in, c_out=c_out, heads=heads,
            true_dim=true_dim, scale_dim=scale_dim, eps=eps, dtype=dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((wt * t // 4, c_out), dtype),
        grid=(wt // gw,),
        in_specs=[
            pl.BlockSpec((gw * t, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec(
            (gw * t // 4, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wskip.astype(dtype),
        bskip,
        wqkv.astype(dtype),
        bqkv,
        wproj.astype(dtype),
        bproj,
    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "true_dim", "scale_dim", "gw", "eps", "interpret"),
)
def window_attn_block(
    x: jax.Array,  # (W_total, T, C) — each leading entry is one window
    ln_scale: jax.Array,  # (C,)
    ln_bias: jax.Array,  # (C,)
    wqkv: jax.Array,  # (C, 3C), columns ordered [q|k|v] × heads × head_dim
    bqkv: jax.Array,  # (3C,)
    wproj: jax.Array,  # (C, C)
    bproj: jax.Array,  # (C,)
    heads: int,
    true_dim: int = 0,
    scale_dim: int = 0,
    gw: int = 0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Fused `x + proj(attn(qkv(LN(x))))` over independent windows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wt, t, c = x.shape
    true_dim = true_dim or c
    scale_dim = scale_dim or true_dim // heads
    if not gw:
        # Rows per program: 1024 (best measured at C=576) shrunk when the
        # ~30 B/row·channel of live intermediates would exceed the raised
        # 32 MB scoped-VMEM limit (C=1152 → 512 rows). The static
        # (group × head) attention unroll is then capped so the program
        # compiles quickly — sub-window merging (see kernel) makes a
        # group one 128-row tile, so small windows no longer explode it.
        rows_max = min(1024, max(t, 20_000_000 // (30 * c) // 128 * 128))
        gw = max(1, min(wt, rows_max // t))
        nm_ = max(1, 128 // t)
        while gw > nm_ and max(1, gw // nm_) * heads > 64:
            gw //= 2
    while wt % gw:
        gw -= 1
    dtype = x.dtype

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            gw=gw, t=t, c=c, heads=heads, true_dim=true_dim,
            scale_dim=scale_dim, eps=eps, dtype=dtype,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        grid=(wt // gw,),
        in_specs=[
            pl.BlockSpec((gw, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((gw, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wqkv.astype(dtype),
        bqkv,
        wproj.astype(dtype),
        bproj,
    )
    return out
