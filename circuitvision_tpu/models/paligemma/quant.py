"""Weight-only int8 quantization for the PaliGemma decode path.

The greedy decode loop is bandwidth-bound: every step re-reads the
decoder projections (18 layers of q/k/v/o + GeGLU MLP) and the tied
embedding LM head — ~2.5 B parameters, ~5 GB/step in bf16 (PERF.md:
batching is nearly free precisely because this read dominates). Storing
those weights int8 with per-output-channel (per-row for the embedding)
f32 scales halves the traffic; the matmuls upcast the int8 tiles on the
fly and apply the scales after the dot (QuantDense/QuantEmbed), so no
dequantized copy is ever materialized in HBM.

Scope: decoder projections + embedding only. The vision tower and
projector run once per image inside prefill (compute-bound, ~2% of a
32-token generation) and keep their float weights.

Error model: symmetric per-channel int8 (scale = max|w|/127) introduces
~0.2-0.5 % RMS weight error on random weights. When a checkpoint's
weights are exactly representable (w = q * 2^-k), quantization is EXACT
— multiplying by a power of two is lossless in floating point, which is
what tests/test_paligemma.py pins (bitwise logit equality on such a
checkpoint, isolating the plumbing from the rounding).
"""
from __future__ import annotations

import numpy as np

_PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def _quantize_matrix(w: np.ndarray, axis: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 along `axis` (the NON-reduced, per-scale axis)."""
    w = np.asarray(w, np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = np.abs(w).max(axis=reduce_axes)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    expand = [None if i != axis else slice(None) for i in range(w.ndim)]
    q = np.clip(np.rint(w / scale[tuple(expand)]), -127, 127).astype(np.int8)
    return q, scale


def _quantize_matrix_jax(w, axis: int):
    """Device-side twin of _quantize_matrix (jnp, jit-able) — used to
    quantize without a host round trip (e.g. over a remote-device
    tunnel, scripts/profile_paligemma.py)."""
    import jax.numpy as jnp

    w = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.abs(w).max(axis=reduce_axes)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    expand = [None if i != axis else slice(None) for i in range(w.ndim)]
    q = jnp.clip(jnp.round(w / scale[tuple(expand)]), -127, 127).astype(jnp.int8)
    return q, scale


def _walk(tree: dict, path: tuple, quantize_matrix) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            # Projections only under the DECODER — the vision tower
            # has same-named q/k/v/o modules and stays float.
            if k in _PROJ_NAMES and "kernel" in v and "decoder" in path:
                q, scale = quantize_matrix(v["kernel"], axis=1)
                out[k] = {"kernel_q": q, "scale": scale}
            elif k == "embed_tokens" and "embedding" in v:
                q, scale = quantize_matrix(v["embedding"], axis=0)
                out[k] = {"embedding_q": q, "scale": scale}
            else:
                out[k] = _walk(v, path + (k,), quantize_matrix)
        else:
            out[k] = v
    return out


def quantize_variables(variables: dict) -> dict:
    """Float PaliGemma params → the quant_int8=True tree.

    Decoder layer projections: kernel (in, out) → kernel_q int8 +
    per-out-channel scale (out,). Embedding (V, C) → embedding_q int8 +
    per-row scale (V,). Everything else passes through unchanged.
    Use with PaliGemmaConfig(text=...quant_int8=True)."""
    return _walk(
        variables, (),
        lambda w, axis: _quantize_matrix(np.asarray(w), axis),
    )


def quantize_variables_on_device(variables: dict) -> dict:
    """quantize_variables, but all math on device (one jit program).

    Donates the input tree so the float buffers are freed as they are
    consumed — at the 3B scale the bf16 originals (~6 GB) plus the int8
    outputs would otherwise coexist in HBM."""
    import jax

    return jax.jit(
        lambda v: _walk(v, (), _quantize_matrix_jax), donate_argnums=0
    )(variables)
