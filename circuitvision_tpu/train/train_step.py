"""Sharded SAM2 fine-tune step (dp over batch + FSDP params over model axis).

The reference fine-tunes SAM2 with PEFT/LoRA in torch (offline, not in
this app; footprint at src/circuit_analyzer.py:203-223). Here the
equivalent capability is a jit-compiled, mesh-sharded training step:

  - trainable set mirrors the reference's fine-tune surface: the wrapper's
    net-new parameters (dense/sparse prompt embeddings, refinement head)
    and the LoRA target modules (decoder attention/MLP projections, IoU
    head tail, conv_s0/s1, neck convs 2-3, trunk blocks 44/47) — trained
    directly (selective fine-tuning; deltas fold the same way LoRA does);
  - everything else frozen via optax.masked with zero-memory state;
  - batch sharded over the mesh's data axis, parameters/optimizer state
    sharded FSDP-style over the model axis; XLA inserts all collectives.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax

import optax

from ..core.config import TrainConfig
from .losses import combined_loss

#: flax param-path regexes matching the reference LoRA target surface
#: (src/circuit_analyzer.py:156-199) plus the wrapper's own parameters.
TRAINABLE_PATTERNS = (
    r"dense_embedding1",
    r"dense_embedding2",
    r"sparse_embedding",
    r"refinement_layer/",
    r"sam_mask_decoder/transformer/layers_\d+/(self_attn|cross_attn_token_to_image|cross_attn_image_to_token)/(q_proj|k_proj|v_proj|out_proj)/",
    r"sam_mask_decoder/transformer/layers_\d+/(mlp_lin1|mlp_lin2)/",
    r"sam_mask_decoder/iou_prediction_head/layers_2/",
    r"conv_s0/",
    r"conv_s1/",
    r"neck/convs_[23]_conv/",
    r"trunk/blocks_4[47]/(attn/qkv|mlp_layers_0|proj)/",
)


def trainable_mask(params: dict) -> dict:
    """Boolean pytree: True where the parameter is fine-tuned."""
    compiled = [re.compile(p) for p in TRAINABLE_PATTERNS]

    def check(path, _leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return any(c.search(key) for c in compiled)

    return jax.tree_util.tree_map_with_path(check, params)


def make_optimizer(
    params: dict, cfg: Optional[TrainConfig] = None, mask: Optional[dict] = None
):
    """Adam on the trainable surface, hard-frozen elsewhere.

    NOT optax.masked(adam, mask): masked passes the un-masked leaves'
    updates through UNCHANGED — i.e. frozen params would receive the raw
    gradient as their update (gradient ascent at lr 1.0), which explodes
    the loss within a few steps (caught by scripts/train_demo.py).
    multi_transform routes frozen leaves to set_to_zero(), which also
    keeps their optimizer state empty (no moment buffers for the frozen
    ~78% of SAM2-L).

    mask: optional boolean pytree overriding the default reference
    LoRA-parity surface (e.g. all-True for a full fine-tune)."""
    cfg = cfg or TrainConfig()
    if mask is None:
        mask = trainable_mask(params)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform(
        {"train": optax.adam(cfg.learning_rate), "freeze": optax.set_to_zero()},
        param_labels=labels,
    )
    return tx, mask


def make_train_step(model, tx, cfg: Optional[TrainConfig] = None):
    """Returns train_step(params, opt_state, images, masks) →
    (params, opt_state, metrics). jit/shard externally with the desired
    in_shardings (see parallel.mesh and __graft_entry__.dryrun_multichip)."""
    cfg = cfg or TrainConfig()

    def loss_fn(params: Any, images: jax.Array, masks: jax.Array):
        high, _low, iou_pred = model.apply(params, images)
        logits = high[..., 0]
        return combined_loss(logits, iou_pred, masks, cfg)

    def train_step(params, opt_state, images, masks):
        from ..models.sam2 import hiera

        # The first-party Pallas kernels are inference-only (no VJP);
        # trace the forward on the module path so autodiff works on TPU.
        # Both paths share one param tree, so the trained params serve
        # on the fused path unchanged (hiera.force_fused docstring).
        with hiera.force_fused(False):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, masks
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step
