"""Stage-level trace of the SAM2 trunk via named scopes."""
import sys, os, re
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
out = fwd(tv, imgs); _ = np.asarray(out[0][0,0,0])

import tempfile, glob
d = tempfile.mkdtemp()
jax.profiler.start_trace(d)
for _ in range(3):
    out = fwd(tv, imgs)
_ = np.asarray(out[0][0,0,0,:1])
jax.profiler.stop_trace()

from jax.profiler import ProfileData
files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
pd = ProfileData.from_file(files[0])
stage_ms = {}
op_kind_ms = {}
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            # stage attribution from named_scope in metadata (hlo op names carry scope)
            name = ev.name
            m = re.search(r"hiera_s(\d+)_b(\d+)(_global)?", name)
            key = None
            if m:
                key = f"stage{m.group(1)}" + ("_global" if m.group(3) else "")
            else:
                # try the metadata/display name
                pass
            if key:
                stage_ms[key] = stage_ms.get(key, 0) + ev.duration_ns
            kind = name.split(".")[0].split(" ")[0][:40]
            if not name.startswith("jit_"):
                op_kind_ms[kind] = op_kind_ms.get(kind, 0) + ev.duration_ns
print("per-stage (3 steps):")
for k in sorted(stage_ms):
    print(f"  {k:16s} {stage_ms[k]/3e6:8.2f} ms/step")
print("top op kinds:")
for k, v in sorted(op_kind_ms.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {v/3e6:8.2f} ms/step  {k}")
