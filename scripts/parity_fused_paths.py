"""Full-model parity: TPU fused Pallas paths vs CPU module paths.

The Hiera trunk picks execution paths by backend (fused window-attention
+ fused MLP kernels on TPU, flax modules elsewhere) while sharing one
parameter tree. This script verifies the two executions agree on the
same deterministic parameters. Because the gate reads the process-global
`jax.default_backend()`, the CPU reference must run in a separate
process:

    python scripts/parity_fused_paths.py cpu   # JAX_PLATFORMS=cpu
    python scripts/parity_fused_paths.py tpu
    python scripts/parity_fused_paths.py compare

Acceptance (measured 2026-08-16, tiny f32 config): high-res logits (the
product mask surface, thresholded at 0 per src/circuit_analyzer.py:356 in
the reference) agree in sign at 100.0000% with max abs err ~1e-5; the
low-res auxiliary logits show ~0.15% sign flips confined to values within
±5e-4 of zero — FP-accumulation ties, not a numerical defect.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "compare"

if mode == "compare":
    import numpy as np

    a = np.load("/tmp/parity_cpu.npz")
    b = np.load("/tmp/parity_tpu.npz")
    for k, thresh in (("h", 0.9999), ("l", 0.99)):
        err = np.abs(a[k] - b[k]).max()
        mag = np.abs(a[k]).max()
        agree = ((a[k] > 0) == (b[k] > 0)).mean()
        print(f"{k}: max err {err:.6f} (mag {mag:.3f}), sign agreement {agree:.6f}")
        assert agree >= thresh, f"{k}: binarization diverged"
    print("PARITY OK")
    sys.exit(0)

if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from circuitvision_tpu.core.config import SAM2Config
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter

cfg = SAM2Config(
    resolution=128, embed_dim=32, num_heads=2, stages=(1, 2, 2, 1),
    global_att_blocks=(4,), window_spec=(4, 4, 4, 4),
    backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
    dtype="float32",
)
model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.float32)
x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 128, 3)), jnp.float32)

variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
rng = np.random.default_rng(42)
variables = jax.tree_util.tree_map_with_path(
    lambda p, leaf: jnp.asarray(rng.standard_normal(leaf.shape) * 0.05, leaf.dtype),
    variables,
)

h, l, _ = jax.jit(model.apply)(variables, x)
np.savez(f"/tmp/parity_{mode}.npz", h=np.asarray(h), l=np.asarray(l))
print(mode, "done", float(jnp.abs(h).max()))
