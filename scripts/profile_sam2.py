"""SAM2 internal breakdown: trunk / neck / decoder / refinement / global-attn."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.core.config import SAM2Config
from circuitvision_tpu.models.sam2.hiera import Hiera
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter, init_params
from circuitvision_tpu.models.initialization import fast_init

B = 4
cfg = SAM2Config(dtype="bfloat16")
dt = jnp.bfloat16

def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter()-t0)/iters*1000
    print(f"{name:30s} {ms:8.2f} ms/step {ms/B:7.2f} ms/img")

imgs = jnp.asarray(np.random.default_rng(0).random((B,1024,1024,3), np.float32))

trunk = Hiera(dtype=dt)
tv = fast_init(trunk, jax.random.PRNGKey(0), imgs)
timeit("hiera trunk", jax.jit(lambda v, x: trunk.apply(v, x)), tv, imgs)

# trunk variants: no global attention (all windowed) to isolate global-attn cost
trunk_nog = Hiera(dtype=dt, global_att_blocks=())
tvn = fast_init(trunk_nog, jax.random.PRNGKey(0), imgs)
timeit("hiera trunk (no global)", jax.jit(lambda v, x: trunk_nog.apply(v, x)), tvn, imgs)

full = SAM2ImageSegmenter(cfg=cfg, dtype=dt)
fv = init_params(full, jax.random.PRNGKey(1))
timeit("full segmenter", jax.jit(lambda v, x: full.apply(v, x)), fv, imgs)

cfg_noref = SAM2Config(dtype="bfloat16", use_refinement=False)
noref = SAM2ImageSegmenter(cfg=cfg_noref, dtype=dt)
nv = init_params(noref, jax.random.PRNGKey(1))
timeit("segmenter w/o refinement", jax.jit(lambda v, x: noref.apply(v, x)), nv, imgs)
