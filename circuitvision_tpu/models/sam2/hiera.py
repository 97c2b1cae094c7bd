"""Hiera-Large image trunk (SAM 2.1) in Flax, NHWC.

First-party implementation of the architecture configured at
models/configs/sam2.1_hiera_l.yaml:10-16 in the reference: embed_dim 144,
2 heads, stages (2, 6, 36, 4), window spec (8, 4, 16, 8), global
attention at blocks 23/33/43, 7×7 background + 8×8 window positional
embeddings. Dims and heads double at each stage transition via a 2×2
max-pool on Q (blocks 2, 8, 44).

TPU notes: windowed attention reshapes to (B·nW, win², C) so every window
attends in one batched MXU contraction; softmax runs in float32; the rest
follows the module dtype (bfloat16 in production).
"""
from __future__ import annotations

import contextlib
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def window_partition(x: jax.Array, window: int) -> tuple[jax.Array, tuple[int, int]]:
    """(B, H, W, C) → (B·nW, win, win, C) with bottom/right zero padding."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jax.Array, window: int, pad_hw: tuple[int, int], hw: tuple[int, int]
) -> jax.Array:
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


def _pool2x(x: jax.Array) -> jax.Array:
    """2×2 max-pool on (B, H, W, C) (Hiera q_pool)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _rup(d: int, m: int) -> int:
    """Round d up to a multiple of m (m=0 ⇒ identity)."""
    return d if not m else -(-d // m) * m


class TrunkLayerNorm(nn.Module):
    """Trunk LayerNorm: channel-true statistics, optional MXU padding,
    optional fused Pallas execution and residual-join fusion.

    - `true_dim` < C marks MXU-alignment padding (hiera.pad_multiple):
      statistics divide by the TRUE channel count (padded entries are
      zero by construction, so plain sums already exclude them), and the
      scale parameter's padded tail is zero-initialized so padded lanes
      stay exactly zero through the affine transform. Equivalent to
      nn.LayerNorm on the first `true_dim` channels; for true_dim == C
      this IS flax's fast-variance LayerNorm math (f32 stats). Param
      names match nn.LayerNorm (scale/bias), so checkpoint conversion is
      a pure zero-pad.
    - On TPU with `fused`, runs ops/pallas/fused_ln (one HBM read/write
      instead of XLA's convert→reduce→broadcast chains — 37 ms of a
      241 ms batch-4 SAM2-L step, traced). Default OFF: measured
      STANDALONE the kernel wins, but inside the model the custom-call
      boundary blocks XLA's surrounding fusions and the full SAM2-L step
      regresses 183→191 ms (PERF.md). Kept for the planned use inside the
      fused window-attention block kernel, where LN shares the kernel
      with the matmuls instead of fencing them.
    - `__call__(x, residual=r)` computes the Hiera block's join
      `resid = r + x; y = LN(resid)` (fused into the same pass on TPU)
      and returns (resid, y); without `residual` it returns y alone.
    """

    true_dim: int = 0
    epsilon: float = 1e-6
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array | None = None):
        padded = x.shape[-1]
        true = self.true_dim or padded

        def scale_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate(
                [jnp.ones((true,), dtype), jnp.zeros((padded - true,), dtype)]
            )

        scale = self.param("scale", scale_init, (padded,))
        bias = self.param("bias", nn.initializers.zeros, (padded,))

        if self.fused and jax.default_backend() == "tpu":
            from ...ops.pallas.fused_ln import fused_add_layernorm, fused_layernorm

            shape = x.shape
            x2 = x.reshape(-1, padded)
            if residual is not None:
                resid, y = fused_add_layernorm(
                    residual.reshape(-1, padded), x2, scale, bias,
                    true_dim=true, eps=self.epsilon,
                )
                return resid.reshape(shape), y.reshape(shape).astype(self.dtype)
            return fused_layernorm(
                x2, scale, bias, true_dim=true, eps=self.epsilon
            ).reshape(shape).astype(self.dtype)

        if residual is not None:
            x = residual + x
            resid = x
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=-1, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
        mean = s1 / true
        var = jnp.maximum(s2 / true - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = (y * scale + bias).astype(self.dtype)
        if residual is not None:
            return resid, y
        return y


#: historical name — the padded-statistics behavior now lives on
#: TrunkLayerNorm via true_dim.
PaddedLayerNorm = TrunkLayerNorm


#: sequences at or above this length route to the flash-attention kernel
#: on TPU (the Hiera-L global blocks at 64² = 4096 tokens). Measured on
#: v5e at that shape (B4 H8 N4096 D72, head_dim padded 72→128): tuned
#: flash (block_q 1024 / block_k_major 2048 / block_k 1024) = 5.45 ms/call
#: vs 10.75 ms for XLA einsum attention; the stock default block sizes
#: LOSE at 18.5 ms — tuning matters more than the kernel choice.
#: test override for the fused-kernel gate: None → auto (TPU backend
#: only); True/False force the gate (CPU CI initializes the fused param
#: tree under jax.eval_shape without executing kernels — ADVICE r2 #2).
_FORCE_FUSED = None

#: perf-bisection toggles for the two round-3 fused paths (q-pool
#: transition kernel, global-block shell kernels). Production default ON;
#: scripts/profile_* flip them to attribute step-time deltas per path.
_ENABLE_FUSED_QPOOL = True
_ENABLE_FUSED_GLOBAL = True


@contextlib.contextmanager
def force_fused(value):
    """Scope the fused-kernel gate override (trace-time): True/False force
    the gate, None restores backend auto-detection, and an int N marks
    the start of the differentiable tail (see _fused_gate).

    The first-party Pallas kernels are forward-only (no custom VJP);
    training code traces the DIFFERENTIATED region on the module path —
    the flax modules and jax's flash-attention kernel (which does define
    a VJP) — while inference keeps the fused kernels. The param trees of
    both paths are identical (tests/test_pallas_kernels.py fused-flag
    tree parity), so params train on the module path and serve on the
    fused path unchanged. The selective train step
    (train/train_step.py) passes the int form so the frozen trunk prefix
    still rides the fused kernels during fine-tuning.
    """
    global _FORCE_FUSED
    old = _FORCE_FUSED
    _FORCE_FUSED = value
    try:
        yield
    finally:
        _FORCE_FUSED = old


def _fused_gate(block_index=None) -> bool:
    """Resolve the fused-kernel gate for one call site.

    _FORCE_FUSED is None → backend auto-detection; True/False → forced.
    An int N (set by the selective train step) means the differentiable
    tail starts at trunk block N: call sites with block_index < N keep
    backend auto-detection — they are forward-only under the split
    value_and_grad (no tangents reach them, so the VJP-less Pallas
    kernels never get differentiated) — while blocks ≥ N and every
    non-trunk kernel site (block_index None, e.g. the refinement head)
    take the module path so autodiff works.
    """
    f = _FORCE_FUSED
    if f is None:
        return jax.default_backend() == "tpu"
    if isinstance(f, bool):
        return f
    if block_index is not None and 0 <= block_index < f:
        return jax.default_backend() == "tpu"
    return False

FLASH_MIN_SEQ = 2048

#: trace-time override for the flash-attention kernel choice. Unlike the
#: forward-only fused kernels (force_fused), flash HAS a VJP and stays
#: on during training — but like every Mosaic custom call it cannot be
#: auto-partitioned by XLA's SPMD pass, so multi-chip pjit programs with
#: sharded operands must force the einsum path (or wrap in shard_map).
_FORCE_FLASH = None


@contextlib.contextmanager
def force_flash(value):
    """Scope the flash-attention gate: False forces einsum attention
    (SPMD-partitionable), True forces flash, None restores the
    seq-length/backend auto-detection."""
    global _FORCE_FLASH
    old = _FORCE_FLASH
    _FORCE_FLASH = value
    try:
        yield
    finally:
        _FORCE_FLASH = old


def _flash_block_sizes(n: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = min(1024, n)
    bkm = min(2048, n)
    bk = min(1024, n)
    small = min(512, n)
    return BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=small, block_k_major_dkv=small,
        block_k_dkv=small, block_q_dkv=small,
        block_k_major_dq=small, block_k_dq=small, block_q_dq=small,
    )


def _flash_or_einsum_attention(q, k, v, scale_dim: int) -> jax.Array:
    """(B, N, H, D) attention with softmax scale scale_dim**-0.5 (the TRUE
    head dim — equal to D unless the channel axis carries MXU padding).
    For long sequences on TPU, uses the Pallas flash-attention kernel so
    the (N, N) score matrix never touches HBM — the Hiera-L global blocks
    otherwise materialize 4096² f32 scores per head (~47 ms/step at batch
    4 on v5e, traced). head_dim pads to the 128-lane tile; the padded V
    columns are zero so outputs slice exactly.
    """
    scale = scale_dim**-0.5
    head_dim = q.shape[-1]
    n = q.shape[1]
    if _FORCE_FLASH is not None:
        use_flash = bool(_FORCE_FLASH)
    else:
        use_flash = n >= FLASH_MIN_SEQ and jax.default_backend() not in ("cpu",)
    if use_flash:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            pad = (-head_dim) % 128
            qt = jnp.swapaxes(q, 1, 2)  # (B, H, N, D)
            kt = jnp.swapaxes(k, 1, 2)
            vt = jnp.swapaxes(v, 1, 2)
            if pad:
                qt = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, pad)))
                kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, pad)))
                vt = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (0, pad)))
            out = flash_attention(
                qt, kt, vt, causal=False, sm_scale=scale,
                block_sizes=_flash_block_sizes(n),
            )
            out = out[..., :head_dim]
            return jnp.swapaxes(out, 1, 2)
        except Exception:
            pass  # fall through to einsum attention
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's names/shapes/initializers so
    the fused-kernel path and the module path share one checkpoint tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _AttnParams(nn.Module):
    """qkv + proj parameters under the same scope nn.Dense would use
    inside MultiScaleAttention (attn/qkv, attn/proj)."""

    dim_out: int

    @nn.compact
    def __call__(self, in_dim: int):
        qkv = _DenseParams(self.dim_out * 3, name="qkv")(in_dim)
        proj = _DenseParams(self.dim_out, name="proj")(self.dim_out)
        return qkv, proj


class _LNParams(nn.Module):
    """scale/bias under the same scope TrunkLayerNorm/nn.LayerNorm would
    use, with the padded-tail-zero scale init for true_dim < C."""

    dim: int
    true_dim: int = 0

    @nn.compact
    def __call__(self):
        true = self.true_dim or self.dim
        padded = self.dim

        def scale_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate(
                [jnp.ones((true,), dtype), jnp.zeros((padded - true,), dtype)]
            )

        scale = self.param("scale", scale_init, (padded,))
        bias = self.param("bias", nn.initializers.zeros, (padded,))
        return scale, bias


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: Any = jnp.float32
    # True (unpadded) head dim for the softmax scale; 0 ⇒ dim_out/heads.
    # When the trunk channels are MXU-padded, dim_out is the padded width
    # and each head carries zero-padded tail lanes that cancel in q·k,
    # but the scale must stay the reference's true head_dim**-0.5.
    true_head_dim: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        scale_dim = self.true_head_dim or head_dim
        qkv = nn.Dense(self.dim_out * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.q_pool:
            q = _pool2x(q.reshape(b, h, w, -1))
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, head_dim)

        out = _flash_or_einsum_attention(q, k, v, scale_dim)
        out = out.reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: bool = False
    window_size: int = 0
    dtype: Any = jnp.float32
    # True (unpadded) dims when the channel axis carries MXU padding;
    # 0 ⇒ no padding (true == declared). Padding changes: LayerNorm stats
    # divide by the true width, the attention scale uses the true head
    # dim, and the MLP hidden width is rup(true_dim_out * mlp_ratio).
    true_dim: int = 0
    true_dim_out: int = 0
    mlp_hidden: int = 0
    # Set by Hiera for blocks running in layout-persistent windowed form
    # ((B·nW, win, win, C), window_size==0): on TPU the whole attention
    # half (LN1 + qkv + per-window attention + proj + residual) runs as
    # one Pallas kernel (ops/pallas/window_attn) instead of XLA's
    # LN/reshape/einsum chain. Parameters are shared with the module path
    # (same names/shapes/inits), so this is purely an execution choice.
    fused_window_attn: bool = False
    # Position in the trunk (0-based), for the selective-training fused
    # gate (_fused_gate int cutoff); -1 ⇒ standalone block, treated as
    # part of the differentiable tail whenever a cutoff is active.
    block_index: int = -1

    def _norm(self, true_dim: int, name: str):
        return TrunkLayerNorm(
            true_dim=true_dim, epsilon=1e-6, dtype=self.dtype, name=name
        )

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        true_out = self.true_dim_out or self.dim_out
        on_tpu = _fused_gate(self.block_index if self.block_index >= 0 else None)
        use_fused_attn = (
            self.fused_window_attn
            and not self.q_stride
            and self.dim == self.dim_out
            and self.window_size == 0
            # kernel preconditions (ADVICE r2 #3): token count per window
            # must tile into 8-row sublanes and channels must split evenly
            # across heads; non-default window specs fall back to the
            # module path instead of failing Mosaic compilation.
            and (x.shape[1] * x.shape[2]) % 8 == 0
            and self.dim_out % self.num_heads == 0
            and on_tpu
        )
        use_fused_mlp = on_tpu
        # q-pool transition blocks (Hiera-L 2/8/44): LN1 + stage-transition
        # proj + 2×2 pools + qkv + pooled-q window attention + proj +
        # residual as one Pallas kernel (ops/pallas/window_attn.
        # qpool_attn_block). Needs an even window that tiles the feature
        # map (pooling then commutes with partitioning) and a true stage
        # transition (the proj shortcut must exist).
        use_fused_qpool = (
            self.q_stride
            and self.window_size > 0
            and self.window_size % 2 == 0
            and (self.window_size**2) % 8 == 0
            and x.shape[1] % self.window_size == 0
            and x.shape[2] % self.window_size == 0
            and self.dim_out % self.num_heads == 0
            and (self.true_dim or self.dim) != (self.true_dim_out or self.dim_out)
            and on_tpu
            and _ENABLE_FUSED_QPOOL
        )
        if use_fused_qpool:
            from ...ops.pallas.window_attn import qpool_attn_block

            lns, lnb = _LNParams(self.dim, self.true_dim, name="norm1")()
            wskip, bskip = _DenseParams(self.dim_out, name="proj")(self.dim)
            (wqkv, bqkv), (wproj, bproj) = _AttnParams(self.dim_out, name="attn")(
                self.dim
            )
            _b, fh, fw, c = x.shape
            win = self.window_size
            xw, _ = window_partition(x, win)  # divisible ⇒ no padding
            nwm = xw.shape[0]
            out = qpool_attn_block(
                xw.reshape(nwm * win * win, c),
                lns, lnb, wskip, bskip, wqkv, bqkv, wproj, bproj,
                heads=self.num_heads, win=win,
                true_dim=self.true_dim or self.dim,
                scale_dim=true_out // self.num_heads,
            )
            x = out.reshape(nwm, win // 2, win // 2, self.dim_out)
            x = window_unpartition(
                x, win // 2, (fh // 2, fw // 2), (fh // 2, fw // 2)
            )
        elif (
            # Global-attention blocks (Hiera-L 23/33/43): LN1 + qkv run as
            # one kernel emitting q/k/v directly in the flash layout
            # (B, H, N, 128), and proj + residual as a second kernel — no
            # XLA reshape/transpose/pad shell between them
            # (ops/pallas/global_attn).
            not self.q_stride
            and self.window_size == 0
            and not self.fused_window_attn
            and self.dim == self.dim_out
            and self.dim % self.num_heads == 0
            and (self.dim // self.num_heads) <= 128
            and x.shape[1] * x.shape[2] >= FLASH_MIN_SEQ
            and on_tpu
            and _ENABLE_FUSED_GLOBAL
        ):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            from ...ops.pallas.global_attn import attn_proj_residual, ln_qkv_flash

            lns, lnb = _LNParams(self.dim, self.true_dim, name="norm1")()
            (wqkv, bqkv), (wproj, bproj) = _AttnParams(self.dim_out, name="attn")(
                self.dim
            )
            b_, fh, fw, c = x.shape
            n = fh * fw
            xr = x.reshape(b_, n, c)
            q, k, v = ln_qkv_flash(
                xr, lns, lnb, wqkv, bqkv,
                heads=self.num_heads, true_dim=self.true_dim or self.dim,
            )
            o = flash_attention(
                q, k, v, causal=False,
                sm_scale=(true_out // self.num_heads) ** -0.5,
                block_sizes=_flash_block_sizes(n),
            )
            x = attn_proj_residual(xr, o, wproj, bproj).reshape(b_, fh, fw, c)
        elif use_fused_attn:
            from ...ops.pallas.window_attn import window_attn_block

            lns, lnb = _LNParams(self.dim, self.true_dim, name="norm1")()
            (wqkv, bqkv), (wproj, bproj) = _AttnParams(self.dim_out, name="attn")(
                self.dim
            )
            b_, wh, ww, c = x.shape
            x = window_attn_block(
                x.reshape(b_, wh * ww, c),
                lns, lnb, wqkv, bqkv, wproj, bproj,
                heads=self.num_heads,
                true_dim=self.true_dim or self.dim,
                scale_dim=true_out // self.num_heads,
            ).reshape(b_, wh, ww, c)
        else:
            shortcut = x
            x = self._norm(self.true_dim, "norm1")(x)
            # Stage transition is decided by the TRUE dims — padded widths
            # can coincide across a transition (e.g. 32→64 both pad to 64).
            if (self.true_dim or self.dim) != (self.true_dim_out or self.dim_out):
                shortcut = _pool2x(
                    nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
                )

            window = self.window_size
            pad_hw = None
            hw = (x.shape[1], x.shape[2])
            if window > 0:
                x, pad_hw = window_partition(x, window)

            x = MultiScaleAttention(
                self.dim_out, self.num_heads, q_pool=self.q_stride, dtype=self.dtype,
                true_head_dim=true_out // self.num_heads,
                name="attn",
            )(x)

            if self.q_stride:
                # Q was pooled: windows halve and the padded grid halves
                # with them. (The reference recomputes padding from the
                # shortcut dims, hieradet.py — equivalent for divisible
                # feature maps, wrong when pre-pool padding occurred;
                # deriving from the actual partitioned grid handles both.)
                window = window // 2
                hw = (shortcut.shape[1], shortcut.shape[2])
                if pad_hw is not None:
                    pad_hw = (pad_hw[0] // 2, pad_hw[1] // 2)
                else:
                    pad_h = (window - hw[0] % window) % window if window else 0
                    pad_w = (window - hw[1] % window) % window if window else 0
                    pad_hw = (hw[0] + pad_h, hw[1] + pad_w)

            if window > 0:
                x = window_unpartition(x, window, pad_hw, hw)

            if use_fused_mlp:
                x = shortcut + x
            else:
                x, y = self._norm(self.true_dim_out, "norm2")(x, residual=shortcut)

        hidden = self.mlp_hidden or int(self.dim_out * self.mlp_ratio)
        if use_fused_mlp:
            # LN2 + mlp0 + exact GELU + mlp1 + residual as one Pallas
            # kernel (ops/pallas/mlp_block) — row-wise, so it applies in
            # every layout (full, partitioned, post-q-pool).
            from ...ops.pallas.mlp_block import mlp_block

            lns, lnb = _LNParams(self.dim_out, self.true_dim_out, name="norm2")()
            w0, b0 = _DenseParams(hidden, name="mlp_layers_0")(self.dim_out)
            w1, b1 = _DenseParams(self.dim_out, name="mlp_layers_1")(hidden)
            shp = x.shape
            return mlp_block(
                x.reshape(-1, self.dim_out), lns, lnb, w0, b0, w1, b1,
                true_dim=self.true_dim_out or self.dim_out,
            ).reshape(shp)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_layers_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_layers_1")(y)
        return x + y


def _torch_bicubic(img: jax.Array, out_hw: tuple) -> jax.Array:
    """Bicubic resize matching torch F.interpolate(mode="bicubic",
    align_corners=False): cubic convolution with a = -0.75, half-pixel
    source coordinates, indices clamped at the borders.

    jax.image.resize's "cubic" is the Keys kernel with a = -0.5, which
    diverges ~4e-2 from torch on the Hiera pos-embed interpolation
    (hieradet _get_pos_embed) — enough to shift converted-checkpoint
    logits. Pinned by tests/test_full_model_parity.py.
    """
    a = -0.75

    def axis_weights(in_size: int, out_size: int):
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        i0 = jnp.floor(src)
        t = src - i0
        d = jnp.stack([1.0 + t, t, 1.0 - t, 2.0 - t])  # |dist| per tap
        ad = jnp.abs(d)
        w = jnp.where(
            ad <= 1.0,
            (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0,
            jnp.where(
                ad < 2.0,
                a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a,
                0.0,
            ),
        )  # (4, out)
        idx = jnp.clip(
            jnp.stack([i0 - 1, i0, i0 + 1, i0 + 2]).astype(jnp.int32),
            0,
            in_size - 1,
        )
        return w, idx

    _, h_in, w_in, _ = img.shape
    out_h, out_w = out_hw
    wh, ih = axis_weights(h_in, out_h)
    x = (img[:, ih] * wh[None, :, :, None, None]).sum(axis=1)  # (1, out_h, W, C)
    ww, iw = axis_weights(w_in, out_w)
    x = (x[:, :, iw] * ww[None, None, :, :, None]).sum(axis=2)  # (1, out_h, out_w, C)
    return x


class Hiera(nn.Module):
    """Hiera trunk. Input (B, S, S, 3); returns 4 feature maps
    high-res-first: strides 4/8/16/32, dims d, 2d, 4d, 8d."""

    embed_dim: int = 144
    num_heads: int = 2
    stages: Sequence[int] = (2, 6, 36, 4)
    global_att_blocks: Sequence[int] = (23, 33, 43)
    window_pos_embed_bkg_spatial_size: Sequence[int] = (7, 7)
    window_spec: Sequence[int] = (8, 4, 16, 8)
    dtype: Any = jnp.float32
    # Round every channel width up to this multiple (0 = off). Hiera-L's
    # native widths (144/288/576) straddle the 128-lane MXU tile; padding
    # trades FLOPs (+78%/+33%/+11% per stage) for full-tile matmuls.
    # Padded parameter regions are zero (see padding.pad_trunk_params), so
    # outputs equal the unpadded model's: zero k/v lanes cancel in q·k,
    # PaddedLayerNorm keeps true-width statistics, and stage outputs are
    # sliced back to true widths before the neck.
    pad_multiple: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        pm = self.pad_multiple
        p_embed = _rup(self.embed_dim, pm)
        # Patch embed: 7×7 conv stride 4 pad 3.
        x = nn.Conv(
            p_embed, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
            dtype=self.dtype, name="patch_embed_proj",
        )(x.astype(self.dtype))
        b, h, w, _ = x.shape

        # Positional embedding: bicubic-resized 7×7 background + tiled 8×8
        # window embed (hieradet._get_pos_embed).
        bkg = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, *self.window_pos_embed_bkg_spatial_size, p_embed),
        )
        win = self.param(
            "pos_embed_window",
            nn.initializers.zeros,
            (1, self.window_spec[0], self.window_spec[0], p_embed),
        )
        pos = _torch_bicubic(bkg, (h, w))
        tiles = (1, h // self.window_spec[0], w // self.window_spec[0], 1)
        pos = pos + jnp.tile(win, tiles)
        x = x + pos.astype(x.dtype)

        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]

        true_dim = self.embed_dim
        dim = p_embed
        heads = self.num_heads
        cur_stage = 0
        outputs: list[jax.Array] = []

        # Layout-persistent windowing: LayerNorm, in-window attention, and
        # the MLP are all layout-agnostic, so consecutive windowed blocks
        # run directly on the (B·nW, win, win, C) partitioned tensor — the
        # per-block partition/unpartition transposes (2 HBM round-trips of
        # the full activation per block, ~40 ms/step at batch 4 on v5e)
        # happen only at window-size changes, q-pool blocks, global blocks,
        # and stage outputs. Falls back to per-block partitioning whenever
        # the feature map does not divide evenly by the window.
        part_window = 0  # 0 ⇒ full (B, H, W, C) layout
        full_hw = (x.shape[1], x.shape[2])

        def to_full(x):
            nonlocal part_window
            if part_window:
                x = window_unpartition(
                    x, part_window,
                    (full_hw[0], full_hw[1]),  # divisible ⇒ no padding
                    full_hw,
                )
                part_window = 0
            return x

        for i in range(depth):
            true_dim_out = true_dim
            dim_out = dim
            window = self.window_spec[cur_stage]
            is_q_pool = i in q_pool_blocks
            if is_q_pool:
                true_dim_out = true_dim * 2
                dim_out = _rup(true_dim_out, pm)
                heads = heads * 2
                cur_stage += 1
                # The FIRST block of a stage keeps the PREVIOUS stage's
                # window size (hieradet reads window_spec[cur_stage]
                # before the stage bump; transformers Sam2MultiScaleBlock
                # spells it out: "take window size from previous stage if
                # first block of stage"). `window` was read before the
                # increment above, so it already holds the old stage's
                # spec — round 3 fixed a bug here that used the NEW
                # stage's window at transitions; pinned against the HF
                # reference in tests/test_sam2_hf_parity.py.
            if i in self.global_att_blocks:
                window = 0

            divisible = (
                window > 0
                and full_hw[0] % window == 0
                and full_hw[1] % window == 0
            )
            want_part = window if (divisible and not is_q_pool) else 0

            if part_window != want_part:
                x = to_full(x)
                if want_part:
                    x, _pad_hw = window_partition(x, want_part)
                    part_window = want_part

            with jax.named_scope(
                f"hiera_s{cur_stage}_b{i}" + ("_global" if window == 0 else "")
            ):
                x = MultiScaleBlock(
                    dim=dim,
                    dim_out=dim_out,
                    num_heads=heads,
                    q_stride=is_q_pool,
                    # In partitioned layout each "image" IS one window:
                    # plain attention over its win² tokens is the windowed
                    # attention of the full-layout formulation.
                    window_size=0 if part_window else window,
                    fused_window_attn=bool(part_window),
                    dtype=self.dtype,
                    true_dim=true_dim if pm else 0,
                    true_dim_out=true_dim_out if pm else 0,
                    mlp_hidden=_rup(int(true_dim_out * 4.0), pm) if pm else 0,
                    block_index=i,
                    name=f"blocks_{i}",
                )(x)
            dim = dim_out
            true_dim = true_dim_out
            if is_q_pool:
                full_hw = (x.shape[1], x.shape[2])  # pooled in full layout
            if i in stage_ends:
                x = to_full(x)
                outputs.append(x[..., :true_dim] if dim != true_dim else x)
        return outputs
