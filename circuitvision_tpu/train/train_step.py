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
import jax.numpy as jnp

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
    train_tx = optax.adam(learning_rate_schedule(cfg))
    if cfg.grad_accum_steps > 1:
        # Accumulate inside the "train" branch so the gradient buffer
        # covers only the trainable leaves (multi_transform partitions
        # the tree; MultiSteps over the whole tx would shadow-copy the
        # frozen ~78% of SAM2-L for nothing). Non-update micro-steps
        # emit zero updates, so params are untouched between flushes.
        train_tx = optax.MultiSteps(
            train_tx, every_k_schedule=cfg.grad_accum_steps
        )
    tx = optax.multi_transform(
        {"train": train_tx, "freeze": optax.set_to_zero()},
        param_labels=labels,
    )
    return tx, mask


def learning_rate_schedule(cfg: TrainConfig):
    """The configured LR: a constant (reference-parity default), a
    linear-warmup constant, or warmup→cosine decay. Returned as an
    optax schedule (or float) suitable for optax.adam."""
    if cfg.schedule == "cosine":
        if cfg.total_steps <= 0:
            raise ValueError("schedule='cosine' requires total_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=cfg.total_steps,
            end_value=cfg.learning_rate * cfg.min_lr_ratio,
        )
    if cfg.schedule != "constant":
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    if cfg.warmup_steps > 0:
        return optax.join_schedules(
            [
                optax.linear_schedule(
                    0.0, cfg.learning_rate, cfg.warmup_steps
                ),
                optax.constant_schedule(cfg.learning_rate),
            ],
            boundaries=[cfg.warmup_steps],
        )
    return cfg.learning_rate


def init_ema(params: dict, mask: Optional[dict] = None) -> list:
    """EMA shadow of the TRAINABLE leaves only, as a flat list (a valid
    pytree — jit/shard it alongside params). Frozen leaves never move,
    so shadowing them would copy the frozen ~78% of SAM2-L for nothing;
    ema_params() re-merges against the live tree at eval time."""
    if mask is None:
        mask = trainable_mask(params)
    flat = jax.tree_util.tree_leaves(params)
    flags = jax.tree_util.tree_leaves(mask)
    return [jnp.asarray(p) for p, t in zip(flat, flags) if t]


def update_ema(ema: list, params: dict, mask: dict, decay: float) -> list:
    """One EMA step over the trainable leaves: e ← d·e + (1−d)·p.
    Pure/jittable; call after each OPTIMIZER update (with gradient
    accumulation, after each flush — non-update micro-steps leave params
    unchanged, and folding them in would only bias the average toward
    stale values)."""
    flat = jax.tree_util.tree_leaves(params)
    flags = jax.tree_util.tree_leaves(mask)
    train = [p for p, t in zip(flat, flags) if t]
    return [decay * e + (1.0 - decay) * p for e, p in zip(ema, train)]


def ema_params(params: dict, ema: list, mask: dict) -> dict:
    """Eval-weights tree: trainable leaves from the EMA shadow, frozen
    leaves from the live tree (they are identical by construction)."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    flags = jax.tree_util.tree_leaves(mask)
    it = iter(ema)
    merged = [next(it) if t else p for p, t in zip(flat, flags)]
    return jax.tree_util.tree_unflatten(treedef, merged)


def _trunk_diff_cutoff(mask: dict) -> int:
    """First trunk block index the backward pass must reach.

    Gradients for a trunk block's parameters need VJPs for that block
    and every block AFTER it (the loss-to-block path), but nothing
    before it — blocks upstream of the earliest trainable block stay
    forward-only. Returns min(trainable trunk block index), or a
    sentinel past the deepest block when no trunk parameter trains
    (the whole trunk then keeps the fused inference kernels)."""
    cutoff = 1 << 30
    for path, m in jax.tree_util.tree_flatten_with_path(mask)[0]:
        if not m:
            continue
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        hit = re.search(r"trunk/blocks_(\d+)/", key)
        if hit:
            cutoff = min(cutoff, int(hit.group(1)))
    return cutoff


def make_train_step(
    model, tx, cfg: Optional[TrainConfig] = None, mask: Optional[dict] = None,
    selective: bool = True, multichip: bool = False,
):
    """Returns train_step(params, opt_state, images, masks) →
    (params, opt_state, metrics). jit/shard externally with the desired
    in_shardings (see parallel.mesh and __graft_entry__.dryrun_multichip).

    selective=True (default) differentiates ONLY the trainable leaves
    (`mask`, defaulting to the reference LoRA-parity surface): the frozen
    parameters enter the loss as non-differentiated arguments, so

      * no activation is stored for the frozen trunk prefix — at the L
        scale (1024² input, 44 frozen blocks) this is the difference
        between fitting on one 16 GB v5e chip and not;
      * the frozen prefix keeps the fused inference Pallas kernels
        (forward-only; hiera._fused_gate int cutoff), so the fine-tune
        step runs at near-inference speed instead of the module path's.

    The computed gradients are identical to the full value_and_grad's on
    the trainable leaves (tests/test_parallel_train.py::TestSelectiveGrad);
    frozen leaves get zeros, which the masked optimizer ignored anyway.

    `mask` must match the mask the optimizer was built with (make_optimizer
    returns it); selective=False restores the round-3 whole-tree autodiff.

    multichip=True forces the module path (no fused Pallas kernels) for
    the WHOLE forward: under a multi-device pjit with FSDP-sharded
    parameters, Mosaic custom calls cannot be auto-partitioned by XLA's
    SPMD pass ("Mosaic kernels cannot be automatically partitioned" —
    surfaced by the v5e-8 AOT validation, scripts/aot_validate.py). The
    module path partitions like any XLA program; the fused kernels
    remain a single-chip optimization. Single-chip fine-tunes keep the
    default."""
    cfg = cfg or TrainConfig()

    def loss_fn(params: Any, images: jax.Array, masks: jax.Array):
        high, _low, iou_pred = model.apply(params, images)
        logits = high[..., 0]
        return combined_loss(logits, iou_pred, masks, cfg)

    def train_step(params, opt_state, images, masks):
        import contextlib

        from ..models.sam2 import hiera

        # multichip also forces einsum attention: the flash kernel HAS a
        # VJP (fine for training) but, like every Mosaic custom call,
        # cannot be SPMD-partitioned over sharded operands.
        flash_ctx = (
            hiera.force_flash(False) if multichip else contextlib.nullcontext()
        )
        if not selective:
            # Whole-tree autodiff: every Pallas call sits on a
            # differentiated path, so the entire trace takes the module
            # path (the kernels are forward-only, no custom VJP).
            with hiera.force_fused(False), flash_ctx:
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, images, masks)
        else:
            m = trainable_mask(params) if mask is None else mask
            flat_params, treedef = jax.tree_util.tree_flatten(params)
            flat_mask = jax.tree_util.tree_leaves(m)
            train_leaves = [p for p, t in zip(flat_params, flat_mask) if t]
            frozen_leaves = [p for p, t in zip(flat_params, flat_mask) if not t]

            def split_loss_fn(train_leaves, frozen_leaves, images, masks):
                ti, fi = iter(train_leaves), iter(frozen_leaves)
                merged = [next(ti) if t else next(fi) for t in flat_mask]
                return loss_fn(
                    jax.tree_util.tree_unflatten(treedef, merged), images, masks
                )

            # Module path only from the earliest trainable trunk block on
            # (and for non-trunk kernel sites); the frozen prefix keeps
            # the fused kernels. multichip: module path EVERYWHERE (see
            # docstring — Mosaic custom calls don't SPMD-partition).
            gate = False if multichip else _trunk_diff_cutoff(m)
            with hiera.force_fused(gate), flash_ctx:
                (loss, metrics), gtrain = jax.value_and_grad(
                    split_loss_fn, has_aux=True
                )(train_leaves, frozen_leaves, images, masks)
            gi = iter(gtrain)
            grads = jax.tree_util.tree_unflatten(
                treedef,
                [
                    next(gi) if t else jnp.zeros_like(p)
                    for p, t in zip(flat_params, flat_mask)
                ],
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step
