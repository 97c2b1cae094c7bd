"""Fused line-enhancement Pallas kernel.

`enhance_lines` (blur 5×5 σ1 → dilate 3×3 ×2 → erode 3×3 ×2,
src/circuit_analyzer.py:289-311) is five elementwise/window passes; run
as separate XLA ops each pass round-trips the raster through HBM. This
kernel keeps a row band (plus an 8-row halo) resident in VMEM and applies
the whole chain in one pass: one HBM read + one HBM write per pixel
instead of five of each.

Border semantics match cv2 exactly: every stage re-replicates the
*current stage input* at the true image boundary (not the tile or padded
boundary) — the kernel clamps halo rows/columns to the image edge before
each stage, selected dynamically from the band's position in the grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..morphology import enhance_lines as _xla_enhance_lines

HALO = 8  # 6 needed (2 blur + 2 dilate + 2 erode), padded to the
          # TPU sublane tile (8) so DMA row slices stay aligned


def _make_clamp(i, tile_h: int, img_h: int, img_w: int, rows: int, cols: int):
    """Returns clamp(x): replicate the image-edge row/col over halo and
    alignment padding, emulating cv2 BORDER_REPLICATE per stage.

    Tile row r holds global image row g = i*tile_h + r - HALO; rows with
    g < 0 take image row 0, rows with g > img_h-1 take the last image row.
    Columns beyond img_w take the last image column.
    """
    row_ids = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    g = i * tile_h + row_ids - HALO

    # In-tile indices of the image's first/last rows (clipped to the band).
    first_r = jnp.clip(HALO - i * tile_h, 0, rows - 1)
    last_r = jnp.clip(img_h - 1 + HALO - i * tile_h, 0, rows - 1)

    def clamp(x: jax.Array) -> jax.Array:
        # Mosaic can't lower dynamic_slice on values; select the edge rows
        # with masked reductions instead (first_r/last_r are traced).
        top_row = jnp.sum(
            jnp.where(row_ids == first_r, x, 0.0), axis=0, keepdims=True
        )
        bot_row = jnp.sum(
            jnp.where(row_ids == last_r, x, 0.0), axis=0, keepdims=True
        )
        x = jnp.where(g < 0, top_row, x)
        x = jnp.where(g > img_h - 1, bot_row, x)
        right_col = x[:, img_w - 1 : img_w]
        x = jnp.where(col_ids > img_w - 1, right_col, x)
        return x

    return clamp


def _chain(tile: jax.Array, taps, clamp) -> jax.Array:
    """Blur → dilate×2 → erode×2, clamping to image-edge replicate
    before every stage (cv2 semantics: each op re-pads its own input)."""
    h, w = tile.shape

    def pad_cols(x, p):
        left = jnp.repeat(x[:, :1], p, axis=1)
        right = jnp.repeat(x[:, -1:], p, axis=1)
        return jnp.concatenate([left, x, right], axis=1)

    x = clamp(tile)
    xp = pad_cols(x, 2)
    horiz = sum(taps[i] * xp[:, i : i + w] for i in range(5))
    xp = jnp.concatenate(
        [jnp.repeat(horiz[:1], 2, axis=0), horiz, jnp.repeat(horiz[-1:], 2, axis=0)],
        axis=0,
    )
    blur = sum(taps[i] * xp[i : i + h] for i in range(5))
    # cv2 operates on uint8: round after the blur so the faint Gaussian
    # halo below 0.5 never becomes foreground (max/min commute with round).
    out = jnp.round(blur)

    def pool3(x, op):
        x = clamp(x)
        xp = pad_cols(x, 1)
        hpool = op(op(xp[:, :w], xp[:, 1 : w + 1]), xp[:, 2 : w + 2])
        xp = jnp.concatenate([hpool[:1], hpool, hpool[-1:]], axis=0)
        return op(op(xp[:h], xp[1 : h + 1]), xp[2 : h + 2])

    for _ in range(2):
        out = pool3(out, jnp.maximum)
    for _ in range(2):
        out = pool3(out, jnp.minimum)
    return out


def _kernel(in_hbm_ref, out_ref, scratch, sem, *, taps, tile_h, img_h, img_w):
    """Overlapping halo tiles can't be expressed as BlockSpecs (index maps
    are block-granular), so the input stays in HBM/ANY and each program
    DMAs its haloed row band into a VMEM scratch buffer explicitly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        in_hbm_ref.at[pl.ds(i * tile_h, tile_h + 2 * HALO), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()
    rows, cols = scratch.shape
    clamp = _make_clamp(i, tile_h, img_h, img_w, rows, cols)
    result = _chain(scratch[:], taps, clamp)
    out_ref[:] = result[HALO : HALO + tile_h]


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def enhance_lines_fused(
    mask: jax.Array, tile_h: int = 152, interpret: bool = False
) -> jax.Array:
    """Fused enhance_lines. mask: (H, W) float32 0..255; result matches
    round(ops.morphology.enhance_lines(mask)) exactly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = mask.shape
    # 5-tap Gaussian, sigma=1 (static host values).
    import numpy as _np

    xs = _np.arange(5, dtype=_np.float64) - 2.0
    k = _np.exp(-(xs**2) / 2.0)
    taps = tuple((k / k.sum()).astype(float))

    n_tiles = -(-h // tile_h)
    padded_h = n_tiles * tile_h
    padded_w = -(-w // 128) * 128  # lane-tile alignment for DMA slices
    x = jnp.pad(
        mask.astype(jnp.float32),
        ((HALO, HALO + padded_h - h), (0, padded_w - w)),
        mode="constant",
    )

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, tile_h=tile_h, img_h=h, img_w=w),
        out_shape=jax.ShapeDtypeStruct((padded_h, padded_w), jnp.float32),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile_h, padded_w), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO, padded_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out[:h, :w]


def enhance_lines_best(mask: jax.Array, **cfg_kwargs) -> jax.Array:
    """Fused kernel on TPU; XLA fallback elsewhere or on failure."""
    try:
        if jax.default_backend() not in ("cpu",):
            return enhance_lines_fused(mask)
    except Exception:
        pass
    return _xla_enhance_lines(mask, **cfg_kwargs)
