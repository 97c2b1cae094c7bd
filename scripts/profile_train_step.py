"""Fine-tune step cost on the real chip: selective vs whole-tree autodiff.

The selective train step (train/train_step.py) differentiates only the
trainable leaves (reference LoRA-parity surface, src/circuit_analyzer.py:
156-199): frozen params enter as non-differentiated arguments, so the
frozen trunk prefix stores no activations AND keeps the fused inference
Pallas kernels (hiera._fused_gate int cutoff). This script measures both
variants at the full SAM2.1-L 1024^2 config on the v5e chip:

  * ms/step + images/s at the given batch
  * device peak memory (memory_stats, when the backend reports it)

Whole-tree autodiff at this scale may simply OOM on a 16 GB chip — that
is itself the result the selective path exists for.

Usage: python scripts/profile_train_step.py [--batch 4] [--steps 8]
       [--mode selective|full|both]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def mem_gb():
    try:
        s = jax.local_devices()[0].memory_stats()
        return (s or {}).get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return 0.0


def run(mode: str, batch: int, steps: int) -> None:
    from circuitvision_tpu.core.config import SAM2Config, TrainConfig
    from circuitvision_tpu.models.initialization import fast_init
    from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter
    from circuitvision_tpu.train.train_step import make_optimizer, make_train_step

    cfg = SAM2Config(dtype="bfloat16")
    model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, cfg.resolution, cfg.resolution, 3), np.float32))
    masks = jnp.asarray((rng.random((batch, cfg.resolution, cfg.resolution)) > 0.5).astype(np.float32))
    variables = fast_init(model, jax.random.PRNGKey(0), images[:1])
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )

    tx, mask = make_optimizer(variables, TrainConfig())
    opt_state = tx.init(variables)
    step = jax.jit(
        make_train_step(
            model, tx, TrainConfig(), mask=mask, selective=(mode == "selective")
        ),
        donate_argnums=(0, 1),
    )

    t0 = time.time()
    variables, opt_state, metrics = step(variables, opt_state, images, masks)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0
    loss0 = float(metrics["loss"])

    t0 = time.time()
    for _ in range(steps):
        variables, opt_state, metrics = step(variables, opt_state, images, masks)
    loss = float(metrics["loss"])  # forced readback ends the timing window
    dt = (time.time() - t0) / steps
    print(
        f"{mode:9s} batch={batch}: {dt*1e3:7.1f} ms/step "
        f"({batch/dt:6.2f} img/s)  peak_mem={mem_gb():.2f} GiB  "
        f"compile={compile_s:.0f}s  loss {loss0:.4f}->{loss:.4f}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--mode", default="both", choices=["selective", "full", "both"])
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    modes = ["selective", "full"] if args.mode == "both" else [args.mode]
    for m in modes:
        try:
            run(m, args.batch, args.steps)
        except Exception as e:  # OOM on the full path is an expected outcome
            print(f"{m:9s} batch={args.batch}: FAILED — {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
