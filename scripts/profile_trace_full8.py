"""Named-device-op profile of the FULL SAM2 forward at batch 8 — ranks
the remaining non-Pallas time (patch embed, pos embed, neck, decoder,
upsample, layout ops) now that the trunk hot loop is in kernels."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circuitvision_tpu.core.config import SAM2Config
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter
from circuitvision_tpu.models.initialization import fast_init

B = 8
cfg = SAM2Config(dtype="bfloat16")
model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.bfloat16)
imgs = jnp.asarray(np.random.default_rng(0).random((B, cfg.resolution, cfg.resolution, 3), np.float32))
v = fast_init(model, jax.random.PRNGKey(0), imgs)
# Params must BE bf16 (not just computed in bf16): f32 params make XLA
# re-convert every step and push the window-attn kernel over VMEM.
v = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v)
fwd = jax.jit(lambda v, x: model.apply(v, x))
out = fwd(v, imgs); jax.block_until_ready(out)

import time
t0 = time.time()
N = 5
for _ in range(N):
    out = fwd(v, imgs)
jax.block_until_ready(out)
print(f"steady-state: {(time.time()-t0)/N*1000:.1f} ms/step")

import tempfile, glob
d = tempfile.mkdtemp()
jax.profiler.start_trace(d)
for _ in range(3):
    out = fwd(v, imgs)
jax.block_until_ready(out)
jax.profiler.stop_trace()

from jax.profiler import ProfileData
files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
pd = ProfileData.from_file(files[0])
rows = {}
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    for line in plane.lines:
        if "step" in line.name.lower():
            continue
        for ev in line.events:
            rows[ev.name] = rows.get(ev.name, 0) + ev.duration_ns
top = sorted(rows.items(), key=lambda kv: -kv[1])[:40]
total = sum(rows.values())
for name, dur in top:
    print(f"{dur/3e6:9.2f} ms/step  {100*dur/total:5.1f}%  {name[:120]}")
print("total accounted:", total / 3e6, "ms/step")
