"""SAM 2.1 fine-tuned checkpoint → Flax variables, with LoRA folding.

The reference checkpoint (`best_miou_model_SAM_latest.pth`) is a
PEFT-wrapped SAM2ImageWrapper state dict (src/circuit_analyzer.py:203-233):
keys live under `sam2_model.base_model.model.*` with `base_layer` /
`lora_A.default` / `lora_B.default` entries on the 36 LoRA target modules
(src/circuit_analyzer.py:156-199), plus the wrapper's net-new parameters
(dense/sparse prompt embeddings, refinement head).

For inference the LoRA deltas fold into the base weights at conversion:
    W_eff = W + (alpha / r) · B @ A          (Linear)
    ΔW[o,i,kh,kw] = (alpha/r) Σ_r B[o,r]·A[r,i,kh,kw]   (Conv2d)
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np

_LORA_A = re.compile(r"^(.*)\.lora_A\.(?:default\.)?weight$")
_LORA_B = re.compile(r"^(.*)\.lora_B\.(?:default\.)?weight$")

#: The 36 LoRA target modules of the reference fine-tune
#: (src/circuit_analyzer.py:156-199, base_parts + added_parts). A real
#: fine-tuned checkpoint carries `<target>.base_layer.weight` +
#: `<target>.lora_A/lora_B` entries for exactly these.
REFERENCE_LORA_TARGETS = tuple(
    [
        f"sam_mask_decoder.transformer.layers.{i}.{attn}.{proj}"
        for i in (0, 1)
        for attn in ("self_attn", "cross_attn_token_to_image")
        for proj in ("k_proj", "q_proj", "v_proj", "out_proj")
    ]
    + [
        f"sam_mask_decoder.transformer.layers.{i}.mlp.layers.{j}"
        for i in (0, 1)
        for j in (0, 1)
    ]
    + [
        "sam_mask_decoder.iou_prediction_head.layers.2",
        "sam_mask_decoder.conv_s0",
        "sam_mask_decoder.conv_s1",
        "image_encoder.neck.convs.2.conv",
        "image_encoder.neck.convs.3.conv",
        "image_encoder.trunk.blocks.44.attn.qkv",
        "image_encoder.trunk.blocks.44.mlp.layers.0",
        "image_encoder.trunk.blocks.44.proj",
        "image_encoder.trunk.blocks.47.attn.qkv",
        "image_encoder.trunk.blocks.47.mlp.layers.0",
    ]
    + [
        f"sam_mask_decoder.transformer.layers.{i}.cross_attn_image_to_token.{proj}"
        for i in (0, 1)
        for proj in ("q_proj", "k_proj", "v_proj")
    ]
)

#: Checkpoint entries the image pipeline legitimately never consumes: the
#: SAM2 video-memory machinery (never run by the reference's image path,
#: src/sam2_infer.py builds image-only inference) and torch bookkeeping.
KNOWN_UNUSED_PREFIXES = (
    "memory_attention.",
    "memory_encoder.",
    "mask_downsample.",
    "obj_ptr_proj.",
    "obj_ptr_tpos_proj.",
    "no_mem_embed",
    "no_mem_pos_enc",
    "no_obj_ptr",
    "maskmem_tpos_enc",
    "no_obj_embed_spatial",
)
KNOWN_UNUSED_SUFFIXES = (".num_batches_tracked",)


def normalize_and_fold(
    torch_state: Mapping[str, np.ndarray],
    lora_alpha: float = 16.0,
) -> dict[str, np.ndarray]:
    """Strip PEFT prefixes, fold LoRA deltas, return clean torch-name dict."""
    state: dict[str, np.ndarray] = {}
    for k, v in torch_state.items():
        try:
            v = v.detach().cpu().numpy()  # type: ignore[union-attr]
        except AttributeError:
            v = np.asarray(v)
        k = k.removeprefix("sam2_model.")
        k = k.replace("base_model.model.", "")
        state[k] = v

    lora_a: dict[str, np.ndarray] = {}
    lora_b: dict[str, np.ndarray] = {}
    base: dict[str, np.ndarray] = {}
    for k, v in state.items():
        ma, mb = _LORA_A.match(k), _LORA_B.match(k)
        if ma:
            lora_a[ma.group(1)] = v
        elif mb:
            lora_b[mb.group(1)] = v
        else:
            base[k.replace(".base_layer.", ".")] = v

    dangling = set(lora_a) ^ set(lora_b)
    if dangling:
        raise KeyError(
            f"LoRA A/B pairs incomplete for {sorted(dangling)[:8]} "
            f"({len(dangling)} modules)"
        )
    for mod, a in lora_a.items():
        b = lora_b[mod]
        r = a.shape[0]
        scale = lora_alpha / r
        wkey = f"{mod}.weight"
        w = base.get(wkey)
        if w is None:
            raise KeyError(f"LoRA target {mod} has no base weight {wkey}")
        if w.ndim == 2:  # Linear (out, in)
            delta = scale * (b @ a)
        elif w.ndim == 4:  # Conv2d (out, in, kh, kw)
            a4 = a if a.ndim == 4 else a.reshape(r, *w.shape[1:])
            b2 = b.reshape(w.shape[0], r)
            delta = scale * np.einsum("or,rikl->oikl", b2, a4)
        else:
            raise ValueError(f"LoRA target {mod} has unsupported ndim {w.ndim}")
        base[wkey] = w + delta.astype(w.dtype)
    return base


# ---------------------------------------------------------------------------
# Flax-path → torch-key translation
# ---------------------------------------------------------------------------

_IDX = re.compile(r"^(blocks|layers|convs|conv_branches|output_hypernetworks_mlps|mlp_layers|output_upscaling)_(\d+)(_conv)?$")


def _flax_path_to_torch_key(path: tuple[str, ...]) -> tuple[str, str]:
    """Return (torch key, leaf kind). Leaf kinds: conv, convT, dense, norm,
    raw, embed."""
    parts: list[str] = []
    mods = list(path)
    leaf = mods.pop()  # kernel/bias/scale/... or param name

    kind = "raw"
    torch_leaf = leaf

    def push(name: str):
        m = _IDX.match(name)
        if m:
            base, idx, conv_suffix = m.group(1), m.group(2), m.group(3)
            base = {"mlp_layers": "mlp.layers"}.get(base, base)
            parts.append(f"{base}.{idx}" + (".conv" if conv_suffix else ""))
        elif name == "mlp_lin1":
            parts.append("mlp.layers.0")
        elif name == "mlp_lin2":
            parts.append("mlp.layers.1")
        elif name == "patch_embed_proj":
            parts.append("patch_embed.proj")
        elif name == "trunk":
            parts.append("image_encoder.trunk")
        elif name == "neck":
            parts.append("image_encoder.neck")
        elif name == "dense_pe":
            parts.append("sam_prompt_encoder.pe_layer")
        elif name in ("conv_s0", "conv_s1"):
            parts.append(f"sam_mask_decoder.{name}")
        else:
            parts.append(name)

    for m in mods:
        push(m)

    if leaf == "kernel":
        kind = "convT" if parts and ".".join(parts).endswith(("output_upscaling.0", "output_upscaling.3")) else "conv"
        torch_leaf = "weight"
    elif leaf == "scale":
        kind = "norm"
        torch_leaf = "weight"
    elif leaf == "bias":
        kind = "raw"
        torch_leaf = "bias"
    elif leaf in ("iou_token", "mask_tokens", "obj_score_token"):
        parts.append(leaf)
        kind = "embed"
        torch_leaf = "weight"
    elif leaf in ("pos_embed", "pos_embed_window"):
        parts.append(leaf)
        kind = "nchw"
        torch_leaf = ""
    elif leaf in ("dense_embedding1", "dense_embedding2", "sparse_embedding",
                  "positional_encoding_gaussian_matrix"):
        parts.append(leaf)
        kind = "raw"
        torch_leaf = ""

    key = ".".join(parts + ([torch_leaf] if torch_leaf else []))
    return key, kind


def _to_flax(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        if arr.ndim == 4:
            return np.transpose(arr, (2, 3, 1, 0))  # OIHW → HWIO
        return arr.T  # dense weight (out, in) → (in, out)
    if kind == "convT":
        # torch ConvTranspose2d (in,out,kh,kw) → flax (kh,kw,in,out) with a
        # spatial flip: flax's ConvTranspose (transpose_kernel=False)
        # correlates with the un-flipped kernel, torch convolves.
        return np.transpose(arr, (2, 3, 0, 1))[::-1, ::-1].copy()
    if kind == "nchw":
        return np.transpose(arr, (0, 2, 3, 1))
    return arr


def _from_flax(arr: np.ndarray, kind: str) -> np.ndarray:
    """Inverse of _to_flax (torch-side layout from a flax leaf)."""
    arr = np.asarray(arr)
    if kind == "conv":
        if arr.ndim == 4:
            return np.transpose(arr, (3, 2, 0, 1))  # HWIO → OIHW
        return arr.T
    if kind == "convT":
        return np.transpose(arr[::-1, ::-1], (2, 3, 0, 1)).copy()
    if kind == "nchw":
        return np.transpose(arr, (0, 3, 1, 2))
    return arr


def export_torch_state(flax_variables: dict) -> dict[str, np.ndarray]:
    """Flax variable tree → torch-named state dict (exact inverse of
    convert_state_dict's name map and layout transposes).

    Product use: export a TPU fine-tune back to the reference's checkpoint
    naming; test use: synthesize a COMPLETE reference-shaped checkpoint to
    prove conversion round-trips with no silent drops either direction.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
    out: dict[str, np.ndarray] = {}
    for path, leaf_val in flat:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        tkey, kind = _flax_path_to_torch_key(tuple(keys[1:]))
        if tkey in out:
            raise KeyError(f"Name map is not injective: {tkey} from {keys}")
        out[tkey] = _from_flax(np.asarray(leaf_val, np.float32), kind)
    return out


def convert_state_dict(torch_state: Mapping[str, np.ndarray], flax_variables: dict,
                       lora_alpha: float = 16.0, unconsumed: str = "error") -> dict:
    """Fill the SAM2ImageSegmenter variable tree from a (possibly PEFT)
    torch state dict.

    Raises KeyError listing any Flax parameter with no source weight, and
    (unconsumed="error", the default) any source weight that no Flax
    parameter consumed — excluding the documented video-memory machinery
    (KNOWN_UNUSED_PREFIXES) the image pipeline never runs. Pass
    unconsumed="ignore" to skip the reverse check.
    """
    import jax

    state = normalize_and_fold(torch_state, lora_alpha=lora_alpha)
    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]

    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_variables))

    def set_in(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = value

    missing = []
    used: set[str] = set()
    for path, leaf_val in flat:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        tkey, kind = _flax_path_to_torch_key(tuple(keys[1:]))
        if tkey not in state:
            missing.append(tkey)
            continue
        used.add(tkey)
        arr = _to_flax(state[tkey], kind)
        if arr.shape != tuple(leaf_val.shape) and arr.size == np.prod(leaf_val.shape):
            arr = arr.reshape(leaf_val.shape)
        if arr.shape != tuple(leaf_val.shape):
            raise ValueError(f"Shape mismatch {tkey}: torch→{arr.shape} flax {leaf_val.shape}")
        set_in(out, keys, arr.astype(np.float32))
    if missing:
        raise KeyError(
            f"Missing {len(missing)} weights, e.g. {sorted(missing)[:8]}"
        )
    if unconsumed == "error":
        extra = [
            k
            for k in state
            if k not in used
            and not k.startswith(KNOWN_UNUSED_PREFIXES)
            and not k.endswith(KNOWN_UNUSED_SUFFIXES)
        ]
        if extra:
            raise KeyError(
                f"{len(extra)} checkpoint weights were silently dropped, "
                f"e.g. {sorted(extra)[:8]}"
            )
    return out


def reference_checkpoint_inventory(
    flax_variables: dict,
    targets: tuple = None,
    rank: int = 4,
) -> dict[str, tuple]:
    """The COMPLETE key→shape inventory of the reference's fine-tuned
    checkpoint (`best_miou_model_SAM_latest.pth`) as written by PEFT +
    SAM2ImageWrapper (src/circuit_analyzer.py:203-233):

      - SAM2 internals under ``sam2_model.base_model.model.*``;
      - the 36 LoRA targets carry ``.base_layer.weight`` (and
        ``.base_layer.bias`` where the module has one) plus
        ``lora_A.default.weight`` / ``lora_B.default.weight`` in PEFT's
        Linear/Conv2d adapter layouts;
      - wrapper net-new params (prompt embeddings, refinement head) at
        top level, un-prefixed.

    Used to freeze the contract as an on-disk fixture
    (scripts/make_checkpoint_fixtures.py → tests/fixtures/) so converter
    drift that would silently drop a real checkpoint key fails a test
    (VERDICT r3 #7). Video-memory keys (KNOWN_UNUSED_PREFIXES) are part
    of real checkpoints but architecturally unknown to this image-only
    model; tests cover their tolerated-skip path separately.
    """
    if targets is None:
        targets = REFERENCE_LORA_TARGETS
    torch_state = export_torch_state(flax_variables)
    model_roots = ("image_encoder.", "sam_mask_decoder.", "sam_prompt_encoder.")
    inv: dict[str, tuple] = {}
    for key, val in torch_state.items():
        shape = tuple(int(s) for s in np.shape(val))
        if not key.startswith(model_roots):
            inv[key] = shape  # wrapper net-new params stay bare
            continue
        mod, leaf = key.rsplit(".", 1)
        base = f"sam2_model.base_model.model.{mod}"
        if mod in targets and leaf in ("weight", "bias"):
            # PEFT moves the whole base module under .base_layer
            inv[f"{base}.base_layer.{leaf}"] = shape
            if leaf == "weight":
                if len(shape) == 2:  # Linear (out, in)
                    inv[f"{base}.lora_A.default.weight"] = (rank, shape[1])
                    inv[f"{base}.lora_B.default.weight"] = (shape[0], rank)
                else:  # Conv2d (out, in, kh, kw): A is a conv, B is 1×1
                    inv[f"{base}.lora_A.default.weight"] = (rank, *shape[1:])
                    inv[f"{base}.lora_B.default.weight"] = (shape[0], rank, 1, 1)
        else:
            inv[f"sam2_model.base_model.model.{key}"] = shape
    return inv


def expected_torch_keys(flax_variables: dict) -> set[str]:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
    out = set()
    for path, _ in flat:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        out.add(_flax_path_to_torch_key(tuple(keys[1:]))[0])
    return out
