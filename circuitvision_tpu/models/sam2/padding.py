"""Zero-pad Hiera trunk parameters to MXU-aligned channel widths.

Hiera-L's channel widths (144/288/576) straddle the TPU's 128-lane MXU
tile. `pad_trunk_params` maps an UNPADDED trunk parameter tree (as built
by Hiera(pad_multiple=0) or by convert.py from the reference checkpoint,
src/circuit_analyzer.py:226-234) onto the parameter shapes of
Hiera(pad_multiple=m), filling every new region with zeros so the padded
model's outputs equal the unpadded model's bit-for-bit semantics:

- plain channel axes right-pad with zeros (patch embed, pos embeds, MLP,
  stage-transition proj);
- the qkv projection's OUTPUT axis and the attention proj's INPUT axis
  are interleaved (3 × heads × head_dim and heads × head_dim), so their
  zeros are inserted per head, not appended;
- LayerNorm scale pads with ZEROS (not ones) so padded lanes stay exactly
  zero through the affine transform (see hiera.PaddedLayerNorm).
"""
from __future__ import annotations

import numpy as np


def _rup(d: int, m: int) -> int:
    return d if not m else -(-d // m) * m


def _pad_last(a: np.ndarray, new: int) -> np.ndarray:
    pad = [(0, 0)] * (a.ndim - 1) + [(0, new - a.shape[-1])]
    return np.pad(a, pad)


def _pad_axis(a: np.ndarray, axis: int, new: int) -> np.ndarray:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, new - a.shape[axis])
    return np.pad(a, pad)


def _pad_heads(a: np.ndarray, axis: int, groups: int, hd: int, phd: int) -> np.ndarray:
    """Pad an interleaved (groups × head_dim) axis to (groups × phd)."""
    shape = list(a.shape)
    assert shape[axis] == groups * hd, (shape, axis, groups, hd)
    split = shape[:axis] + [groups, hd] + shape[axis + 1 :]
    a = a.reshape(split)
    a = _pad_axis(a, axis + 1, phd)
    merged = shape[:axis] + [groups * phd] + shape[axis + 1 :]
    return a.reshape(merged)


def pad_trunk_params(
    trunk: dict,
    *,
    embed_dim: int = 144,
    num_heads: int = 2,
    stages: tuple = (2, 6, 36, 4),
    pad_multiple: int = 128,
) -> dict:
    """Return a new trunk param tree shaped for Hiera(pad_multiple=...).

    `trunk` is the UNPADDED tree: {patch_embed_proj, pos_embed,
    pos_embed_window, blocks_0..{norm1, attn{qkv,proj}, [proj], norm2,
    mlp_layers_0, mlp_layers_1}}. Arrays may be any dtype; zeros pad in
    the same dtype.
    """
    pm = pad_multiple
    out: dict = {}
    p_embed = _rup(embed_dim, pm)

    def ln(d, p):
        return {
            "scale": _pad_last(np.asarray(d["scale"]), p),
            "bias": _pad_last(np.asarray(d["bias"]), p),
        }

    out["patch_embed_proj"] = {
        "kernel": _pad_last(np.asarray(trunk["patch_embed_proj"]["kernel"]), p_embed),
        "bias": _pad_last(np.asarray(trunk["patch_embed_proj"]["bias"]), p_embed),
    }
    out["pos_embed"] = _pad_last(np.asarray(trunk["pos_embed"]), p_embed)
    out["pos_embed_window"] = _pad_last(np.asarray(trunk["pos_embed_window"]), p_embed)

    depth = sum(stages)
    stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
    q_pool_blocks = [e + 1 for e in stage_ends[:-1]]

    true_dim, dim = embed_dim, p_embed
    heads = num_heads
    for i in range(depth):
        true_out, dim_out = true_dim, dim
        if i in q_pool_blocks:
            true_out = true_dim * 2
            dim_out = _rup(true_out, pm)
            heads *= 2
        hd, phd = true_out // heads, dim_out // heads
        b = trunk[f"blocks_{i}"]
        nb: dict = {}
        nb["norm1"] = ln(b["norm1"], dim)
        nb["norm2"] = ln(b["norm2"], dim_out)

        qkv_k = np.asarray(b["attn"]["qkv"]["kernel"])  # (true_dim, 3*true_out)
        qkv_k = _pad_axis(qkv_k, 0, dim)
        qkv_k = _pad_heads(qkv_k, 1, 3 * heads, hd, phd)
        qkv_b = _pad_heads(np.asarray(b["attn"]["qkv"]["bias"]), 0, 3 * heads, hd, phd)
        proj_k = np.asarray(b["attn"]["proj"]["kernel"])  # (true_out, true_out)
        proj_k = _pad_heads(proj_k, 0, heads, hd, phd)
        proj_k = _pad_axis(proj_k, 1, dim_out)
        proj_b = _pad_last(np.asarray(b["attn"]["proj"]["bias"]), dim_out)
        nb["attn"] = {
            "qkv": {"kernel": qkv_k, "bias": qkv_b},
            "proj": {"kernel": proj_k, "bias": proj_b},
        }

        if "proj" in b:  # stage-transition shortcut Dense
            nb["proj"] = {
                "kernel": _pad_axis(
                    _pad_axis(np.asarray(b["proj"]["kernel"]), 0, dim), 1, dim_out
                ),
                "bias": _pad_last(np.asarray(b["proj"]["bias"]), dim_out),
            }

        hidden_p = _rup(int(true_out * 4.0), pm)
        nb["mlp_layers_0"] = {
            "kernel": _pad_axis(
                _pad_axis(np.asarray(b["mlp_layers_0"]["kernel"]), 0, dim_out), 1, hidden_p
            ),
            "bias": _pad_last(np.asarray(b["mlp_layers_0"]["bias"]), hidden_p),
        }
        nb["mlp_layers_1"] = {
            "kernel": _pad_axis(
                _pad_axis(np.asarray(b["mlp_layers_1"]["kernel"]), 0, hidden_p), 1, dim_out
            ),
            "bias": _pad_last(np.asarray(b["mlp_layers_1"]["bias"]), dim_out),
        }
        out[f"blocks_{i}"] = nb
        true_dim, dim = true_out, dim_out
    return out


def maybe_pad_trunk_variables(variables: dict, cfg) -> dict:
    """Pad a NATIVE-width checkpoint's trunk to cfg.trunk_pad_multiple.

    Loading a converted (native-width) checkpoint into a model built with
    a nonzero pad multiple would otherwise fail with a parameter shape
    mismatch (ADVICE r2). No-op when padding is off, the tree has no
    trunk, or the trunk is already padded.
    """
    pm = getattr(cfg, "trunk_pad_multiple", 0)
    if not pm:
        return variables
    params = variables.get("params", variables)
    trunk = params.get("trunk")
    if trunk is None or "patch_embed_proj" not in trunk:
        return variables
    padded_width = _rup(cfg.embed_dim, pm)
    kernel = np.asarray(trunk["patch_embed_proj"]["kernel"])
    if kernel.shape[-1] == padded_width:
        return variables  # already padded
    new_trunk = pad_trunk_params(
        trunk,
        embed_dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        stages=tuple(cfg.stages),
        pad_multiple=pm,
    )
    new_params = dict(params)
    new_params["trunk"] = new_trunk
    if "params" in variables:
        out = dict(variables)
        out["params"] = new_params
        return out
    return new_params
