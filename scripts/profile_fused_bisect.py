"""Bisect the step-time contribution of the round-3 fused paths.

Times the SAM2.1-L batch-8 forward with each combination of the q-pool
transition kernel and the global-block shell kernels toggled, so a
regression can be attributed to one path.

Usage: python scripts/profile_fused_bisect.py [qpool global] ...
  e.g.  python scripts/profile_fused_bisect.py 11 01 10 00
  (default: 11 01 10 00 — both, global-only, qpool-only, neither)
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
from circuitvision_tpu.models.sam2 import hiera
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter


def run(qpool: bool, glob: bool, batch: int = 8) -> float:
    hiera._ENABLE_FUSED_QPOOL = qpool
    hiera._ENABLE_FUSED_GLOBAL = glob
    cfg = SAM2Config(dtype="bfloat16")
    model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, 1024, 1024, 3), np.float32))
    variables = fast_init(model, jax.random.PRNGKey(0), imgs[:1])
    fwd = jax.jit(lambda v, x: model.apply(v, x)[0])

    out = fwd(variables, imgs)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0, 0])

    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(variables, imgs)
    _ = np.asarray(out[0, 0, :1])
    return (time.perf_counter() - t0) / steps


def main():
    combos = sys.argv[1:] or ["11", "01", "10", "00"]
    for c in combos:
        qpool, glob = c[0] == "1", c[1] == "1"
        dt = run(qpool, glob)
        print(
            f"qpool={int(qpool)} global={int(glob)}: {dt*1e3:8.1f} ms/step "
            f"({8/dt:6.2f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
