"""Measure MXU channel padding on the SAM2.1-L forward (VERDICT #5).

Compares trunk_pad_multiple=0 (native 144/288/576/1152 widths) against
=128 (256/384/640/1152) at batch 4 bf16 on the real chip. Weights are
random — architecture timing is weight-independent; production zero-pads
converted weights via models/sam2/padding.pad_trunk_params (equivalence
pinned by tests/test_sam2.py::TestChannelPadding).

Usage: python scripts/profile_channel_padding.py [pad_multiples...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.core.config import SAM2Config
from circuitvision_tpu.models.initialization import fast_init
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter

BATCH = 4


def run(pad: int) -> float:
    cfg = SAM2Config(dtype="bfloat16", trunk_pad_multiple=pad)
    model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.bfloat16)
    imgs = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 1024, 1024, 3), np.float32)
    )
    variables = fast_init(model, jax.random.PRNGKey(0), imgs[:1])
    fwd = jax.jit(lambda v, x: model.apply(v, x)[0])
    t0 = time.perf_counter()
    out = fwd(variables, imgs)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0, :1])
    print(f"pad={pad}: compile+first {time.perf_counter() - t0:.1f}s")

    best = float("inf")
    for _ in range(3):
        steps = 10
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(variables, imgs)
        _ = np.asarray(out[0, 0, :1])
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"pad={pad}: {best*1e3:.1f} ms/step, {BATCH/best:.2f} img/s")
    return best


def main():
    pads = [int(a) for a in sys.argv[1:]] or [0, 128]
    results = {p: run(p) for p in pads}
    base = results.get(0)
    for p, t in results.items():
        note = f" ({base/t:.3f}x vs native)" if base and p else ""
        print(f"pad={p}: {t*1e3:.1f} ms/step{note}")


if __name__ == "__main__":
    main()
