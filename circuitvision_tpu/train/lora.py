"""Rank-r LoRA adapter fine-tuning on the reference's exact target surface.

The reference fine-tunes SAM2 through PEFT LoRA adapters — rank 4,
alpha 16 on 36 named modules (src/circuit_analyzer.py:156-212,
src/sam2_infer.py:346-372) — plus the wrapper's net-new parameters
(prompt embeddings, refinement head), which PEFT leaves fully trainable.
`train/train_step.py` trains that surface *directly* (deltas fold the
same way LoRA's do); this module adds the genuinely low-rank variant:

  * adapters are factored ``delta = (alpha/r) * A @ B`` pairs stored
    OUTSIDE the model tree (``{"<kernel path>": {"a": A, "b": B}}``) —
    the trained artifact is ~100k params instead of ~50M, optimizer
    moments exist only for the adapters, and the base checkpoint is
    shared read-only across concurrent fine-tunes;
  * ``merge_lora`` applies the deltas functionally inside the jit'd
    step (36 rank-4 matmuls; microseconds), so the model code is
    untouched — gradients w.r.t. A/B through the merged kernel are
    exactly PEFT's (d loss/dA = (alpha/r) * Gw @ Bᵀ);
  * ``fold_lora`` materializes serving weights, the same composition
    `models/sam2/convert.normalize_and_fold` performs on the
    reference's .pth checkpoints — and ``export_peft_state`` writes the
    adapters in the reference's own `<target>.lora_A.default.weight`
    naming, so a round trip through the converter is the parity proof
    (tests/test_train_lora.py).

Deliberate deviation: PEFT applies dropout 0.3 to the ACTIVATIONS
entering lora_A during training (src/circuit_analyzer.py:211). A
weight-space merge cannot express an activation regularizer, so these
adapters train without it (inference-time composition is identical).

Initialization matches PEFT: A ~ kaiming_uniform(a=sqrt(5)) over the
torch-shaped fan-in (uniform ±1/sqrt(fan_in)), B = 0 — the delta starts
at exactly zero, so step 0 reproduces the base model bitwise.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from .losses import combined_loss
from .train_step import TRAINABLE_PATTERNS

#: wrapper net-new parameters PEFT keeps fully trainable alongside the
#: adapters (modules_to_save analog; src/sam2_infer.py:206-218).
DIRECT_PATTERNS = (
    r"dense_embedding1",
    r"dense_embedding2",
    r"sparse_embedding",
    r"refinement_layer/",
)


def reference_lora_paths(n_trunk_blocks: int = 48) -> tuple[str, ...]:
    """The 36 LoRA target modules as flax kernel-parent paths.

    Mirrors convert.REFERENCE_LORA_TARGETS (src/circuit_analyzer.py:
    156-199) with the trunk block indices generalized: the reference's
    blocks 44/47 are (n-4, n-1) of Hiera-L's 48; smaller test configs
    keep the same relative positions."""
    paths: list[str] = []
    for i in (0, 1):
        for attn in ("self_attn", "cross_attn_token_to_image"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                paths.append(
                    f"sam_mask_decoder/transformer/layers_{i}/{attn}/{proj}"
                )
        for proj in ("q_proj", "k_proj", "v_proj"):
            paths.append(
                f"sam_mask_decoder/transformer/layers_{i}/"
                f"cross_attn_image_to_token/{proj}"
            )
        paths.append(f"sam_mask_decoder/transformer/layers_{i}/mlp_lin1")
        paths.append(f"sam_mask_decoder/transformer/layers_{i}/mlp_lin2")
    paths += [
        "sam_mask_decoder/iou_prediction_head/layers_2",
        "conv_s0",
        "conv_s1",
        "neck/convs_2_conv",
        "neck/convs_3_conv",
    ]
    b1, b2 = max(n_trunk_blocks - 4, 0), max(n_trunk_blocks - 1, 0)
    paths += [
        f"trunk/blocks_{b1}/attn/qkv",
        f"trunk/blocks_{b1}/mlp_layers_0",
        f"trunk/blocks_{b1}/proj",
        f"trunk/blocks_{b2}/attn/qkv",
        f"trunk/blocks_{b2}/mlp_layers_0",
    ]
    return tuple(paths)


def _kernel_index(variables: dict) -> dict[str, Any]:
    """{'a/b/c': kernel leaf} for every kernel under params/."""
    out: dict[str, Any] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys and keys[0] == "params" and keys[-1] == "kernel":
            out["/".join(keys[1:-1])] = leaf
    return out


def lora_target_paths(variables: dict, n_trunk_blocks: int) -> list[str]:
    """Reference targets present in this param tree (a transition-free
    trunk block has no `proj`; small test configs drop it)."""
    index = _kernel_index(variables)
    return [p for p in reference_lora_paths(n_trunk_blocks) if p in index]


def init_lora(
    variables: dict,
    rng: jax.Array,
    cfg: Optional[TrainConfig] = None,
    n_trunk_blocks: int = 48,
    targets: Optional[list[str]] = None,
) -> dict:
    """{'<path>': {'a': (.., in, r), 'b': (r, out)}} adapters, PEFT init."""
    cfg = cfg or TrainConfig()
    r = cfg.lora_rank
    index = _kernel_index(variables)
    targets = (
        list(targets)
        if targets is not None
        else lora_target_paths(variables, n_trunk_blocks)
    )
    lora: dict[str, dict] = {}
    for path in targets:
        k = index[path]
        fan_in = int(np.prod(k.shape[:-1]))  # (in,) or (kh, kw, in)
        bound = 1.0 / np.sqrt(fan_in)
        rng, sub = jax.random.split(rng)
        a = jax.random.uniform(
            sub, (*k.shape[:-1], r), jnp.float32, -bound, bound
        )
        lora[path] = {"a": a, "b": jnp.zeros((r, k.shape[-1]), jnp.float32)}
    return lora


def _set_in(tree: dict, parts: tuple[str, ...], value) -> dict:
    """Immutable nested-dict update."""
    head = parts[0]
    if len(parts) == 1:
        return {**tree, head: value}
    return {**tree, head: _set_in(tree[head], parts[1:], value)}


def _delta(ab: dict, alpha: float) -> jax.Array:
    a, b = ab["a"], ab["b"]
    scale = alpha / b.shape[0]
    # a (..., in, r) @ b (r, out) covers dense and conv kernels alike.
    return scale * jnp.einsum("...r,ro->...o", a, b)


def merge_lora(
    variables: dict, lora: dict, cfg: Optional[TrainConfig] = None
) -> dict:
    """Functional fold: kernels += (alpha/r) A@B, rest shared by reference.

    Traced inside the train step (cheap); `fold_lora` is the
    materializing twin for serving."""
    cfg = cfg or TrainConfig()
    out = variables
    for path, ab in lora.items():
        parts = ("params", *path.split("/"), "kernel")
        node = out
        for p in parts:
            node = node[p]
        merged = (
            node.astype(jnp.float32) + _delta(ab, cfg.lora_alpha)
        ).astype(node.dtype)
        out = _set_in(out, parts, merged)
    return out


def fold_lora(
    variables: dict, lora: dict, cfg: Optional[TrainConfig] = None
) -> dict:
    """Materialized serving weights (same math as the converter's
    normalize_and_fold on the reference checkpoint format)."""
    return jax.jit(lambda v, l: merge_lora(v, l, cfg))(variables, lora)


# ---------------------------------------------------------------------------
# PEFT-format export (round-trip parity with models/sam2/convert.py)
# ---------------------------------------------------------------------------


def export_peft_state(lora: dict) -> dict[str, np.ndarray]:
    """Adapters in the reference checkpoint's PEFT naming/layout:
    `<torch target>.lora_A.default.weight` (r, in[, kh, kw]) and
    `.lora_B.default.weight` (out, r[, 1, 1]). Feeding these plus
    export_torch_state(variables) through convert.normalize_and_fold
    reproduces fold_lora bitwise up to dtype rounding."""
    from ..models.sam2.convert import _flax_path_to_torch_key

    out: dict[str, np.ndarray] = {}
    for path, ab in lora.items():
        tkey, _kind = _flax_path_to_torch_key((*path.split("/"), "kernel"))
        mod = tkey.removesuffix(".weight")
        a = np.asarray(ab["a"], np.float32)
        b = np.asarray(ab["b"], np.float32)
        if a.ndim == 2:  # dense: flax (in, r) → torch (r, in)
            out[f"{mod}.lora_A.default.weight"] = a.T
            out[f"{mod}.lora_B.default.weight"] = b.T
        else:  # conv: flax (kh, kw, in, r) → torch (r, in, kh, kw)
            out[f"{mod}.lora_A.default.weight"] = np.transpose(a, (3, 2, 0, 1))
            out[f"{mod}.lora_B.default.weight"] = b.T[..., None, None]
    return out


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def direct_mask(variables: dict) -> dict:
    """Boolean pytree marking the wrapper's net-new (fully trained)
    parameters — DIRECT_PATTERNS, a subset of train_step's surface."""
    compiled = [re.compile(p) for p in DIRECT_PATTERNS]
    assert all(
        any(re.search(d, t) for t in TRAINABLE_PATTERNS) for d in DIRECT_PATTERNS
    )

    def check(path, _leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return any(c.search(key) for c in compiled)

    return jax.tree_util.tree_map_with_path(check, variables)


def make_lora_optimizer(cfg: Optional[TrainConfig] = None):
    """Adam over the (lora, direct) train state — everything in the
    state trains, so no freeze routing (and no moment buffers for the
    base model at all; cf. make_optimizer's multi_transform)."""
    import optax

    from .train_step import learning_rate_schedule

    cfg = cfg or TrainConfig()
    tx = optax.adam(learning_rate_schedule(cfg))
    if cfg.grad_accum_steps > 1:
        # The whole (lora, direct) state trains, so plain MultiSteps is
        # already minimal — the accumulation buffer is adapter-sized.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def _lora_trunk_cutoff(lora: dict) -> int:
    """Earliest trunk block carrying an adapter — the fused-kernel
    boundary (see make_train_step: Pallas kernels are forward-only)."""
    cutoff = 1 << 30
    for path in lora:
        hit = re.match(r"trunk/blocks_(\d+)/", path)
        if hit:
            cutoff = min(cutoff, int(hit.group(1)))
    return cutoff


def make_lora_train_step(model, tx, cfg: Optional[TrainConfig] = None):
    """Returns train_step(variables, tstate, opt_state, images, masks)
    → (tstate, opt_state, metrics).

    `variables` is the frozen base tree (never updated, never in the
    optimizer); `tstate = {"lora": init_lora(...), "direct": {path:
    leaf}}` holds everything that trains. Gradients flow through the
    merged kernels only (selective autodiff like make_train_step: the
    base enters as non-differentiated leaves, the trunk prefix below
    the earliest adapter keeps the fused inference kernels). Serve with
    `materialize(variables, tstate)`."""
    cfg = cfg or TrainConfig()

    def loss_fn(variables, images, masks):
        high, _low, iou_pred = model.apply(variables, images)
        logits = high[..., 0]
        return combined_loss(logits, iou_pred, masks, cfg)

    def train_step(variables, tstate, opt_state, images, masks):
        from ..models.sam2 import hiera

        flat, treedef = jax.tree_util.tree_flatten(variables)
        dmask = jax.tree_util.tree_leaves(direct_mask(variables))
        frozen = [p for p, t in zip(flat, dmask) if not t]

        def split_loss(tstate, frozen, images, masks):
            di = iter(
                tstate["direct"][k] for k in sorted(tstate["direct"])
            )
            fi = iter(frozen)
            merged = jax.tree_util.tree_unflatten(
                treedef, [next(di) if t else next(fi) for t in dmask]
            )
            merged = merge_lora(merged, tstate["lora"], cfg)
            return loss_fn(merged, images, masks)

        with hiera.force_fused(_lora_trunk_cutoff(tstate["lora"])):
            (_loss, metrics), grads = jax.value_and_grad(
                split_loss, has_aux=True
            )(tstate, frozen, images, masks)
        import optax

        updates, opt_state = tx.update(grads, opt_state, tstate)
        tstate = optax.apply_updates(tstate, updates)
        return tstate, opt_state, metrics

    return train_step


def init_train_state(
    variables: dict,
    rng: jax.Array,
    cfg: Optional[TrainConfig] = None,
    n_trunk_blocks: int = 48,
) -> dict:
    """{"lora": adapters, "direct": {path: leaf}} for make_lora_train_step."""
    direct: dict[str, Any] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        keys = [str(getattr(p, "key", p)) for p in path]
        key = "/".join(keys)
        if any(re.search(p, key) for p in DIRECT_PATTERNS):
            direct[key] = leaf
    return {
        "lora": init_lora(variables, rng, cfg, n_trunk_blocks),
        "direct": direct,
    }


def materialize(
    variables: dict, tstate: dict, cfg: Optional[TrainConfig] = None
) -> dict:
    """Base tree + trained state → serving weights (direct leaves
    written back, adapters folded)."""
    out = variables
    for key, leaf in tstate["direct"].items():
        out = _set_in(out, tuple(key.split("/")), leaf)
    return fold_lora(out, tstate["lora"], cfg)
