"""Measure the flash-attention global-block speedup."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.models.sam2.hiera import Hiera
from circuitvision_tpu.models.initialization import fast_init

B = 4
dt = jnp.bfloat16
imgs = jnp.asarray(np.random.default_rng(0).random((B,1024,1024,3), np.float32))

trunk = Hiera(dtype=dt)
tv = fast_init(trunk, jax.random.PRNGKey(0), imgs)
fwd = jax.jit(lambda v, x: trunk.apply(v, x))
out = fwd(tv, imgs); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10): out = fwd(tv, imgs)
jax.block_until_ready(out)
ms = (time.perf_counter()-t0)/10*1000
print(f"hiera trunk (flash global): {ms:8.2f} ms/step {ms/B:7.2f} ms/img")
# numerical sanity vs einsum path: compare one global-attn output
from circuitvision_tpu.models.sam2 import hiera as H
q = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4096, 8, 72)).astype(np.float32), dt)
k = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4096, 8, 72)).astype(np.float32), dt)
v = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4096, 8, 72)).astype(np.float32), dt)
flash = H._flash_or_einsum_attention(q, k, v, 72)
H.FLASH_MIN_SEQ = 10**9  # force einsum
ref = H._flash_or_einsum_attention(q, k, v, 72)
diff = jnp.max(jnp.abs(flash.astype(jnp.float32) - ref.astype(jnp.float32)))
print("flash vs einsum max diff:", float(diff))
