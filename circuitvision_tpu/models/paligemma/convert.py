"""HF PaliGemma checkpoint → Flax variables.

Accepts the torch state_dict key layout of
PaliGemmaForConditionalGeneration, both the current nested form
("model.vision_tower…", "model.language_model…", "lm_head.weight") and
the pre-4.52 flat form ("vision_tower…", "language_model.model…",
"language_model.lm_head.weight") — the same aliasing the HF loader's
_checkpoint_conversion_mapping handles.

Like models/sam2/convert.py, conversion is no-silent-drop in BOTH
directions: every checkpoint tensor must be consumed (lm_head is
verified against the tied embedding, not dropped) and every produced
leaf must land on a declared parameter of the Flax model.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from .config import PaliGemmaConfig


def torch_state_to_numpy(state_dict) -> dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def _canon(key: str) -> str:
    """Normalize both HF layouts to one canonical spelling."""
    if key.startswith("model."):
        key = key[len("model."):]
    key = key.replace("language_model.model.", "language_model.")
    if key == "language_model.lm_head.weight":
        key = "lm_head.weight"
    return key


def convert_hf_state(
    state: Mapping[str, np.ndarray], cfg: PaliGemmaConfig
) -> dict:
    """torch state_dict (tensors or arrays) → {"params": ...} for PaliGemma."""
    src: dict[str, np.ndarray] = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        src[_canon(k)] = np.asarray(v)
    used: set[str] = set()

    def take(key: str) -> np.ndarray:
        if key not in src:
            raise KeyError(f"checkpoint is missing {key!r}")
        used.add(key)
        return src[key]

    def linear(prefix: str, bias: bool = True) -> dict:
        out = {"kernel": take(f"{prefix}.weight").T}
        if bias:
            out["bias"] = take(f"{prefix}.bias")
        return out

    def layernorm(prefix: str) -> dict:
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    vt = "vision_tower.vision_model"
    vision: dict = {
        "patch_embedding": {
            # torch conv (O, I, kh, kw) → flax (kh, kw, I, O)
            "kernel": take(f"{vt}.embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
            "bias": take(f"{vt}.embeddings.patch_embedding.bias"),
        },
        "position_embedding": take(f"{vt}.embeddings.position_embedding.weight"),
        "post_layernorm": layernorm(f"{vt}.post_layernorm"),
    }
    for i in range(cfg.vision.num_hidden_layers):
        lp = f"{vt}.encoder.layers.{i}"
        vision[f"layer_{i}"] = {
            "layer_norm1": layernorm(f"{lp}.layer_norm1"),
            "layer_norm2": layernorm(f"{lp}.layer_norm2"),
            "self_attn": {
                name: linear(f"{lp}.self_attn.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "fc1": linear(f"{lp}.mlp.fc1"),
            "fc2": linear(f"{lp}.mlp.fc2"),
        }

    lm = "language_model"
    embed = take(f"{lm}.embed_tokens.weight")
    decoder: dict = {"norm": {"weight": take(f"{lm}.norm.weight")}}
    for i in range(cfg.text.num_hidden_layers):
        lp = f"{lm}.layers.{i}"
        decoder[f"layer_{i}"] = {
            "input_layernorm": {"weight": take(f"{lp}.input_layernorm.weight")},
            "post_attention_layernorm": {
                "weight": take(f"{lp}.post_attention_layernorm.weight")
            },
            "self_attn": {
                name: linear(f"{lp}.self_attn.{name}", bias=False)
                for name in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "gate_proj": linear(f"{lp}.mlp.gate_proj", bias=False),
            "up_proj": linear(f"{lp}.mlp.up_proj", bias=False),
            "down_proj": linear(f"{lp}.mlp.down_proj", bias=False),
        }

    params = {
        "vision_tower": vision,
        "projector": linear("multi_modal_projector.linear"),
        "embed_tokens": {"embedding": embed},
        "decoder": decoder,
    }

    # The LM head is weight-tied; verify rather than drop silently.
    if "lm_head.weight" in src:
        head = take("lm_head.weight")
        if head.shape != embed.shape or not np.array_equal(head, embed):
            raise ValueError(
                "lm_head.weight is not tied to embed_tokens.weight; this "
                "converter only supports tied-embedding checkpoints"
            )
    leftovers = set(src) - used
    if leftovers:
        raise ValueError(f"unconsumed checkpoint tensors: {sorted(leftovers)[:8]}")
    variables = {"params": params}
    _validate_shapes(variables, cfg)
    return variables


def _validate_shapes(variables: dict, cfg: PaliGemmaConfig) -> None:
    """Every produced leaf must match the model's declared parameter
    shapes for this cfg (jax.eval_shape — no compute). Catches e.g. a
    real 257216-row embedding converted under a cfg claiming a different
    vocab, or a mismatched intermediate width: those would otherwise
    save fine and only fail (or silently misbehave) at apply time."""
    import jax
    import jax.numpy as jnp

    from .gemma import make_kv_cache
    from .model import PaliGemma

    model = PaliGemma(cfg)
    s = cfg.num_image_tokens + 1
    ids = jnp.zeros((1, s), jnp.int32)
    k0, v0 = make_kv_cache(cfg.text, 1, s)
    px = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), ids, jnp.ones_like(ids), k0, v0, px,
            method=PaliGemma.prefill,
        )
    )
    want = jax.tree_util.tree_flatten_with_path(expected)[0]
    got = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    errors = []
    for key, leaf in want:
        ks = jax.tree_util.keystr(key)
        if ks not in got:
            errors.append(f"missing parameter {ks} {leaf.shape}")
        else:
            shp = tuple(got.pop(ks))
            if shp != tuple(leaf.shape):
                errors.append(f"{ks}: checkpoint {shp} vs model {leaf.shape}")
    errors += [f"extra leaf {ks} {shp}" for ks, shp in got.items()]
    if errors:
        raise ValueError(
            "converted tree does not match the model's declared parameters: "
            + "; ".join(errors[:6])
        )
