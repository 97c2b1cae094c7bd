"""Fused MultiKernelRefinement Pallas kernel (EXPERIMENTAL - not wired).

Status: numerically specified and unit-testable in interpreter mode, but
the ~820-vector-op unrolled Mosaic program hangs this environment's
remote TPU compile helper (>1 h with no progress; normal kernels compile
in seconds). Left unwired from the model pending a tap-loop formulation
with pltpu.roll-based shifts or an upstream fix; the XLA path costs
~15 ms/step at batch 4 (see PERF.md).

The refinement head (src/sam2_infer.py:130-189 in the reference) runs
four parallel convs (k = 3,5,7,11, C_in=1, C_out=4) + GELU + a 1×1
combiner over the full-resolution 1024² logit map. With C_in=1 these
convs are degenerate for the MXU, and XLA's generic path costs ~15 ms/step
at batch 4 on v5e (measured). This kernel computes the whole head as
shifted multiply-adds on the VPU, one row band at a time, all
intermediates VMEM-resident: one HBM read of the logits and one write of
the refined logits.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

KERNELS = (3, 5, 7, 11)
HALO = 8  # max needed is 5 (k=11); padded to the sublane tile


def _erf_as(x: jax.Array) -> jax.Array:
    """erf via Abramowitz–Stegun 7.1.26 (|error| ≤ 1.5e-7). Mosaic lowers
    neither erf nor erfc, so the exact-GELU path needs a polynomial form."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU (torch nn.GELU default), accurate to ~1e-7."""
    return 0.5 * x * (1.0 + _erf_as(x * 0.7071067811865476))


def _kernel(x_hbm, w3, b3, w5, b5, w7, b7, w11, b11, wc, bc, out_ref, scratch, sem,
            *, tile_h, width):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bidx = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[bidx, pl.ds(i * tile_h, tile_h + 2 * HALO), :], scratch, sem
    )
    copy.start()
    copy.wait()
    x = scratch[:]  # (tile_h + 2*HALO, width + 2*HALO)

    weights = {3: w3[:], 5: w5[:], 7: w7[:], 11: w11[:]}
    biases = {3: b3[:], 5: b5[:], 7: b7[:], 11: b11[:]}
    wc_v = wc[:]  # (16,)
    acc_out = jnp.full((tile_h, width), bc[0], jnp.float32)

    # All compute stays on 2-D (sublane, lane) tiles — Mosaic's layout
    # inference rejects 3-D broadcasts/contractions here. Shifted windows
    # of x are hoisted so the four channels of a branch share them.
    ch = 0
    for ksize in KERNELS:
        w = weights[ksize]  # (k, k, 4) — squeezed C_in
        r = ksize // 2
        accs = [
            jnp.full((tile_h, width), biases[ksize][c], jnp.float32)
            for c in range(4)
        ]
        for dy in range(ksize):
            for dx in range(ksize):
                shifted = x[
                    HALO - r + dy : HALO - r + dy + tile_h,
                    HALO - r + dx : HALO - r + dx + width,
                ]
                for c in range(4):
                    accs[c] = accs[c] + w[dy, dx, c] * shifted
        for c in range(4):
            acc_out = acc_out + wc_v[ch + c] * _gelu_exact(accs[c])
        ch += 4
    out_ref[0] = acc_out


@functools.partial(jax.jit, static_argnames=("tile_h",))
def refinement_fused(
    logits: jax.Array,  # (B, H, W, 1) float32/bf16
    branch_weights: list[jax.Array],  # [(k,k,1,4)] for k in 3,5,7,11
    branch_biases: list[jax.Array],  # [(4,)]
    combiner_weight: jax.Array,  # (1,1,16,1)
    combiner_bias: jax.Array,  # (1,)
    tile_h: int = 128,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = logits.shape
    n_tiles = -(-h // tile_h)
    padded_h = n_tiles * tile_h
    padded_w = -(-w // 128) * 128

    x = logits[..., 0].astype(jnp.float32)
    # Width pads to padded_w + 128 so full-width DMA rows stay lane-aligned
    # (2*HALO alone would leave a 16-column remainder).
    x = jnp.pad(
        x,
        ((0, 0), (HALO, HALO + padded_h - h), (HALO, 128 - HALO + padded_w - w)),
        mode="constant",
    )

    ws = [jnp.asarray(wt, jnp.float32)[:, :, 0, :] for wt in branch_weights]
    bs = [jnp.asarray(bt, jnp.float32) for bt in branch_biases]
    wc = jnp.asarray(combiner_weight, jnp.float32).reshape(16)
    bc = jnp.asarray(combiner_bias, jnp.float32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=padded_w),
        out_shape=jax.ShapeDtypeStruct((b, padded_h, padded_w), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec((1, tile_h, padded_w), lambda bi, i: (bi, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO, padded_w + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3], wc, bc)
    return out[:, :h, :w, None]
