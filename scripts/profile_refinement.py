"""Validate + time the fused refinement kernel vs the flax module."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.models.sam2.wrapper import MultiKernelRefinement
from circuitvision_tpu.models.initialization import fast_init
from circuitvision_tpu.ops.pallas.refinement_fused import refinement_fused

B = 4
x = jnp.asarray(np.random.default_rng(0).normal(size=(B,1024,1024,1)).astype(np.float32))
mod = MultiKernelRefinement(dtype=jnp.bfloat16)
v = fast_init(mod, jax.random.PRNGKey(0), x)
p = v["params"]
bw = [p[f"conv_branches_{i}"]["kernel"] for i in range(4)]
bb = [p[f"conv_branches_{i}"]["bias"] for i in range(4)]
cw, cb = p["combiner_conv"]["kernel"], p["combiner_conv"]["bias"]

ref_fn = jax.jit(lambda v, x: mod.apply(v, x))
ref = np.asarray(ref_fn(v, x), np.float32)
fused = np.asarray(refinement_fused(x, bw, bb, cw, cb))
diff = np.abs(ref - fused)
print("max diff:", diff.max(), "rel:", diff.max()/ (np.abs(ref).max()+1e-9))

for fn, name in [(lambda: ref_fn(v, x), "flax/xla"),
                 (lambda: refinement_fused(x, bw, bb, cw, cb), "pallas fused")]:
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20): out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/step")
