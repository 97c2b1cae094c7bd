"""Fine-tune convergence demo: the north-star training capability run
for real on TPU (or CPU with --steps trimmed).

The reference fine-tunes SAM2 offline with PEFT/LoRA in torch
(src/circuit_analyzer.py:203-223); this repo's equivalent is the masked
optimizer over the same trainable surface (train/train_step.py). This
script demonstrates the loop actually LEARNS: a small-config SAM2 with a
frozen random trunk is trained on synthetic circuit renders (white
background, black wires) and the wire-mask IoU on held-out circuits
rises from ~0 to a real segmentation.

Two modes:
  --surface reference  (default) train ONLY the reference LoRA-parity
                       surface (prompts, decoder, refinement, conv_s0/s1,
                       neck tail, last trunk blocks) — the product setup;
  --surface full       full fine-tune (sanity upper bound).

Usage: python scripts/train_demo.py [--steps 300] [--batch 8]
                                    [--surface reference|full]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def small_cfg(resolution=256):
    from circuitvision_tpu.core.config import SAM2Config

    return SAM2Config(
        resolution=resolution,
        embed_dim=48,
        num_heads=2,
        stages=(1, 2, 4, 1),
        global_att_blocks=(5,),
        window_spec=(8, 4, 8, 4),
        backbone_channel_list=(384, 192, 96, 48),
        decoder_mlp_dim=256,
        dtype="float32",
    )


def make_batch(rng_seed: int, n: int, res: int):
    """n synthetic circuits → (images (n,res,res,3) normalized,
    masks (n,res,res) float 0/1)."""
    from circuitvision_tpu.eval.randomized import random_circuit
    from circuitvision_tpu.eval.synth import _render_image
    from circuitvision_tpu.ops.image import sam2_preprocess

    imgs = np.zeros((n, res, res, 3), np.float32)
    masks = np.zeros((n, res, res), np.float32)
    for i in range(n):
        mask, boxes = random_circuit(rng_seed + i)
        image = _render_image(mask, boxes)
        imgs[i] = np.asarray(sam2_preprocess(jnp.asarray(image), res))
        m = np.asarray(
            jax.image.resize(
                jnp.asarray(mask, jnp.float32), (res, res), method="linear"
            )
        )
        masks[i] = (m > 127.0).astype(np.float32)
    return jnp.asarray(imgs), jnp.asarray(masks)


def multisteps_mini_step(opt_state) -> int:
    """micro-steps accumulated since the last flush in the MultiSteps
    state buried inside the multi_transform optimizer state (0 when no
    accumulation is configured). Used to phase EMA flush detection:
    the counter is part of the checkpoint, so after a resume from a
    save step that is not a multiple of --grad-accum, `(i+1) % k` would
    drift from the actual flush cadence."""
    found = []

    def walk(o):
        if found:
            return
        if hasattr(o, "mini_step") and hasattr(o, "gradient_step"):
            found.append(int(np.asarray(o.mini_step)))
        elif hasattr(o, "_fields"):
            for f in o._fields:
                walk(getattr(o, f))
        elif isinstance(o, dict):
            for v in o.values():
                walk(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                walk(v)

    walk(opt_state)
    return found[0] if found else 0


def mask_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    inter = float(np.logical_and(pred, gt).sum())
    union = float(np.logical_or(pred, gt).sum())
    return inter / union if union else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--surface", choices=("reference", "full", "lora"),
                    default="reference",
                    help="reference = train the LoRA-parity surface "
                         "directly; full = whole-tree sanity bound; "
                         "lora = true rank-r factored adapters "
                         "(train/lora.py, reference PEFT setup)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--schedule", choices=("constant", "cosine"),
                    default="constant")
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="linear LR warmup length, counted in optimizer "
                         "UPDATES (with --grad-accum k, one update per k "
                         "micro-steps)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="average gradients over k micro-batches per "
                         "optimizer update (effective batch = k x --batch)")
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="EMA decay for an eval-weights shadow of the "
                         "trainable leaves (0 = off); final IoU is "
                         "reported for both raw and EMA weights")
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--ckpt-dir", default=None,
                    help="save/resume dir; resumes from the newest "
                         "committed step automatically")
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--keep", type=int, default=3)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host fine-tune: join the jax.distributed "
                         "runtime (pod auto-config or JAX_COORDINATOR_ADDRESS/"
                         "JAX_NUM_PROCESSES/JAX_PROCESS_ID env), train over "
                         "the global (data, model) mesh with each process "
                         "feeding its local batch shard; run one copy of "
                         "this script per host")
    ap.add_argument("--data", default=None,
                    help="fine-tune on a real dataset (<root>/images + "
                         "<root>/masks, train/data.py) instead of the "
                         "synthetic generator; IoU is then reported on "
                         "the dataset's first 16 items")
    ap.add_argument("--res", type=int, default=256,
                    help="input resolution (64 for a quick CPU smoke)")
    args = ap.parse_args()

    if args.distributed:
        # Before any backend-initializing jax call (model init below).
        from circuitvision_tpu.parallel import multihost

        multihost.initialize()
        if args.ckpt_dir:
            raise SystemExit(
                "--ckpt-dir with --distributed is not supported by this "
                "demo (single-host orbax writer); checkpoint from the "
                "production trainer instead"
            )

    from circuitvision_tpu.core.config import TrainConfig
    from circuitvision_tpu.models.sam2.wrapper import (
        SAM2ImageSegmenter,
        init_params,
    )
    from circuitvision_tpu.train.train_step import (
        make_optimizer,
        make_train_step,
        trainable_mask,
    )

    cfg = small_cfg(args.res)
    # TrainConfig's total_steps/warmup_steps count optimizer UPDATES:
    # MultiSteps advances the inner schedule only on flush, so with
    # --grad-accum k the k micro-steps of --steps collapse into
    # steps//k updates — pass that, or the cosine would traverse only
    # 1/k of its curve. --warmup-steps is likewise update-counted.
    n_updates = max(1, args.steps // max(1, args.grad_accum))
    tcfg = TrainConfig(
        learning_rate=args.lr,
        schedule=args.schedule,
        warmup_steps=args.warmup_steps,
        total_steps=n_updates if args.schedule == "cosine" else 0,
        grad_accum_steps=args.grad_accum,
        ema_decay=args.ema_decay,
    )
    model = SAM2ImageSegmenter(cfg=cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    n_total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables))

    materialize_for_eval = lambda state: state  # noqa: E731
    if args.surface == "lora":
        if args.distributed:
            raise SystemExit(
                "--surface lora with --distributed is not wired in this "
                "demo; use train/lora.py's API with your own mesh"
            )
        from circuitvision_tpu.train import lora as lora_mod

        base_variables = variables
        tstate = lora_mod.init_train_state(
            variables, jax.random.PRNGKey(7), tcfg,
            n_trunk_blocks=sum(cfg.stages),
        )
        tx = lora_mod.make_lora_optimizer(tcfg)
        opt_state = tx.init(tstate)
        n_train = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tstate))
        print(f"surface=lora: {n_train:,} adapter+direct params over a "
              f"{n_total:,}-param frozen base "
              f"(rank {tcfg.lora_rank}, alpha {tcfg.lora_alpha:g})")
        lstep = jax.jit(lora_mod.make_lora_train_step(model, tx, tcfg))

        def step(state, opt_state, images, masks):
            return lstep(base_variables, state, opt_state, images, masks)

        materialize_for_eval = lambda state: lora_mod.materialize(  # noqa: E731
            base_variables, state, tcfg
        )
        variables = tstate  # the loop/checkpoint carry the adapter state
    else:
        if args.surface == "reference":
            mask = trainable_mask(variables)
        else:
            mask = jax.tree.map(lambda _: True, variables)
        n_train = sum(
            int(np.prod(l.shape)) for l, m in zip(
                jax.tree.leaves(variables), jax.tree.leaves(mask)) if m
        )
        print(f"surface={args.surface}: {n_train:,}/{n_total:,} params "
              f"trainable ({100 * n_train / n_total:.1f}%)")

        tx, _ = make_optimizer(variables, tcfg, mask=mask)
        opt_state = tx.init(variables)

    ema_state = None
    if args.ema_decay > 0.0:
        if args.surface == "lora":
            raise SystemExit("--ema-decay with --surface lora is not "
                             "wired in this demo")
        from circuitvision_tpu.train.train_step import (
            ema_params,
            init_ema,
            update_ema,
        )

        ema_state = init_ema(variables, mask)
        ema_step_fn = jax.jit(
            lambda e, p: update_ema(e, p, mask, args.ema_decay)
        )

    mesh = None
    if args.surface == "lora":
        pass  # step built above; --distributed rejected earlier
    elif args.distributed:
        from jax.sharding import NamedSharding, PartitionSpec

        from circuitvision_tpu.core.config import MeshConfig
        from circuitvision_tpu.parallel import multihost
        from circuitvision_tpu.parallel.mesh import fsdp_param_shardings

        # dp-only global mesh (model_parallel=1): params replicate, the
        # batch shards host-outermost; the gradient psum is the only DCN
        # traffic. The dp+FSDP variant is exercised by tests/multihost_worker.py.
        mesh = multihost.global_mesh(MeshConfig())
        param_sh = fsdp_param_shardings(variables, mesh, axis="model")
        opt_sh = fsdp_param_shardings(opt_state, mesh, axis="model")
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        repl = NamedSharding(mesh, PartitionSpec())
        step = jax.jit(
            # multichip: Mosaic kernels don't SPMD-partition over the
            # sharded mesh; the module path does (train_step docstring)
            make_train_step(model, tx, tcfg, mask=mask, multichip=True),
            in_shardings=(param_sh, opt_sh, batch_sh, batch_sh),
            out_shardings=(param_sh, opt_sh, repl),
        )
        variables = jax.device_put(variables, param_sh)
        opt_state = jax.device_put(opt_state, opt_sh)
        print(f"distributed: {jax.process_count()} process(es), "
              f"mesh {dict(mesh.shape)}")
    else:
        step = jax.jit(make_train_step(model, tx, tcfg, mask=mask))

    start_step = 0
    if args.ckpt_dir:
        from circuitvision_tpu.train.checkpoint import (
            latest_checkpoint,
            prune_checkpoints,
            restore_train_state,
            save_train_state,
        )

        found = latest_checkpoint(args.ckpt_dir)
        if found:
            start_step = found[0]
            if ema_state is not None:
                variables, opt_state, ema_state = restore_train_state(
                    found[1], variables, opt_state, extra=ema_state
                )
            else:
                variables, opt_state = restore_train_state(
                    found[1], variables, opt_state
                )
            print(f"resumed from {found[1]} (step {start_step})")

    # Flush-phase offset for EMA tracking: micro-steps already sitting in
    # the (possibly checkpoint-restored) MultiSteps accumulator.
    ema_mini0 = 0
    if ema_state is not None and args.grad_accum > 1:
        ema_mini0 = multisteps_mini_step(opt_state)

    fwd = jax.jit(lambda v, x: model.apply(v, x)[0])

    data_iter = None
    if args.data:
        from circuitvision_tpu.train.data import SegmentationFolderDataset

        shard, per_batch = None, args.batch
        if mesh is not None:
            shard = (jax.process_index(), jax.process_count())
            per_batch = max(1, args.batch // jax.process_count())
        ds = SegmentationFolderDataset(args.data, resolution=cfg.resolution)
        data_iter = ds.batches(
            per_batch, seed=1000, epochs=None, augment=True, shard=shard
        )
        n_val = min(16, len(ds))
        val = [ds.load(i) for i in range(n_val)]
        val_imgs = np.stack([v[0] for v in val])
        val_masks = np.stack([v[1] for v in val])
        print(f"dataset: {len(ds)} pairs from {args.data} "
              f"(per-process batch {per_batch})")
    else:
        # Held-out eval circuits.
        val_imgs, val_masks = make_batch(990000, 16, cfg.resolution)

    def eval_iou(params) -> float:
        params = materialize_for_eval(params)  # lora: fold into the base
        if mesh is not None:
            # Params are replicated global arrays; pull to host once and
            # evaluate process-locally (no cross-host work in eval).
            params = jax.tree.map(np.asarray, params)
        high = fwd(params, val_imgs)
        logits = np.asarray(high[..., 0], np.float32)
        return float(np.mean([
            mask_iou(logits[i] > 0, np.asarray(val_masks[i]) > 0.5)
            for i in range(logits.shape[0])
        ]))

    iou0 = eval_iou(variables)
    print(f"held-out wire IoU before training: {iou0:.4f}")

    t0 = time.time()
    loss_first = loss = None
    for i in range(start_step, args.steps):
        if data_iter is not None:
            images, masks_b = next(data_iter)  # already this process's shard
            if mesh is not None:
                from circuitvision_tpu.parallel import multihost

                images = multihost.global_batch(images, mesh)
                masks_b = multihost.global_batch(masks_b, mesh)
        else:
            images, masks_b = make_batch(1000 + i * args.batch, args.batch,
                                         cfg.resolution)
            if mesh is not None:
                from circuitvision_tpu.parallel import multihost

                # Deterministic global batch; every process feeds only its
                # span (zero-copy process-local shards of the global array).
                span = multihost.local_span(images.shape[0])
                images = multihost.global_batch(
                    images[span.start:span.stop], mesh
                )
                masks_b = multihost.global_batch(
                    masks_b[span.start:span.stop], mesh
                )
        variables, opt_state, metrics = step(
            variables, opt_state, images, masks_b
        )
        if ema_state is not None and (
            ema_mini0 + i - start_step + 1
        ) % args.grad_accum == 0:
            # with accumulation, track only flush steps (params are
            # unchanged between flushes; folding those in would bias
            # the average toward stale values). ema_mini0 phases the
            # cadence to the restored MultiSteps counter so resumes
            # from a non-multiple-of-k save step stay aligned with the
            # optimizer's actual flushes.
            ema_state = ema_step_fn(ema_state, variables)
        if i % args.log_every == 0 or i == args.steps - 1:
            loss = float(metrics["loss"])
            if loss_first is None:
                loss_first = loss
            print(f"step {i:4d}  loss {loss:.4f}  "
                  f"({(time.time() - t0):.1f}s)")
        if args.ckpt_dir and (
            (i + 1) % args.save_every == 0 or i == args.steps - 1
        ):
            save_train_state(args.ckpt_dir, i + 1, variables, opt_state,
                             extra=ema_state)
            prune_checkpoints(args.ckpt_dir, keep=args.keep)
    iou1 = eval_iou(variables)
    if ema_state is not None:
        print(f"held-out wire IoU with EMA weights "
              f"(decay {args.ema_decay:g}): "
              f"{eval_iou(ema_params(variables, ema_state, mask)):.4f}")
    dt = time.time() - t0
    if loss is None:  # resumed at/after --steps; nothing trained this run
        print(f"held-out wire IoU at restore: {iou1:.4f}")
        return
    n_run = args.steps - start_step  # steps actually executed THIS run
    print(f"held-out wire IoU after {args.steps} steps: {iou1:.4f} "
          f"(was {iou0:.4f}); loss {loss_first:.4f} -> {loss:.4f}; "
          f"{dt:.1f}s total, {dt / n_run * 1e3:.0f} ms/step")
    if n_run >= 100:  # convergence bars calibrated for real runs
        assert loss < loss_first, "loss did not decrease"
        if args.data is None:  # bar calibrated on the synthetic set
            assert iou1 > iou0 + 0.1, "IoU did not improve"
    else:
        print(f"(short run: {n_run} steps — convergence bars skipped)")
    print("TRAIN DEMO OK")


if __name__ == "__main__":
    main()
