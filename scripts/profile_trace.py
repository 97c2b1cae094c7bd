"""Device-op-level profile of the SAM2 trunk via jax.profiler.ProfileData."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from circuitvision_tpu.models.sam2.hiera import Hiera
from circuitvision_tpu.models.initialization import fast_init

B = 4
dt = jnp.bfloat16
imgs = jnp.asarray(np.random.default_rng(0).random((B,1024,1024,3), np.float32))
trunk = Hiera(dtype=dt)
tv = fast_init(trunk, jax.random.PRNGKey(0), imgs)
fwd = jax.jit(lambda v, x: trunk.apply(v, x))
out = fwd(tv, imgs); jax.block_until_ready(out)
_ = np.asarray(out[0][0,0,0])

import tempfile, glob
d = tempfile.mkdtemp()
jax.profiler.start_trace(d)
for _ in range(3):
    out = fwd(tv, imgs)
_ = np.asarray(out[0][0,0,0,:1])
jax.profiler.stop_trace()

from jax.profiler import ProfileData
files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
print("trace files:", files)
pd = ProfileData.from_file(files[0])
rows = {}
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print("plane:", plane.name)
    for line in plane.lines:
        for ev in line.events:
            name = ev.name
            dur = ev.duration_ns
            rows[name] = rows.get(name, 0) + dur
top = sorted(rows.items(), key=lambda kv: -kv[1])[:25]
total = sum(rows.values())
for name, dur in top:
    print(f"{dur/1e6:9.2f} ms  {100*dur/total:5.1f}%  {name[:110]}")
print("total accounted:", total/1e6, "ms (3 steps)")
