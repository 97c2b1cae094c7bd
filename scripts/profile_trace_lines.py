"""Line-aware trace of the FULL SAM2 forward at batch 8.

The earlier trace scripts summed every xplane line, which mixes async
DMA spans (slice-start/copy-start, which OVERLAP compute) into the
denominator. This one reports each (plane, line) separately so the
synchronous compute line can be read on its own, then prints the
top ops per compute line.
"""
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

# Pass 1: structure — every line with its total duration and event count.
print("\n=== line structure ===")
lines_by_key = {}
for plane in pd.planes:
    for line in plane.lines:
        tot = 0
        n = 0
        for ev in line.events:
            tot += ev.duration_ns
            n += 1
        key = (plane.name, line.name)
        lines_by_key[key] = (tot, n)
        if n:
            print(f"{tot/3e6:9.2f} ms/step  {n/3:7.0f} ev/step  plane={plane.name!r} line={line.name!r}")

# Pass 2: per-op totals for each TPU line that is NOT an async/step line.
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    for line in plane.lines:
        lname = line.name.lower()
        if "step" in lname:
            continue
        rows = {}
        for ev in line.events:
            rows[ev.name] = rows.get(ev.name, 0) + ev.duration_ns
        if not rows:
            continue
        total = sum(rows.values())
        print(f"\n=== top ops: plane={plane.name!r} line={line.name!r} total={total/3e6:.1f} ms/step ===")
        for name, dur in sorted(rows.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{dur/3e6:9.3f} ms/step  {100*dur/total:5.1f}%  {name[:120]}")

# Pass 3: category aggregation over the synchronous XLA Ops line.
import re
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        cats = {}
        for ev in line.events:
            n = ev.name
            m = re.match(r"%([a-zA-Z_\-]+)", n)
            base = m.group(1) if m else n
            if base.endswith("_fusion") or base == "fusion":
                base = "fusion"
            cats[base] = cats.get(base, 0) + ev.duration_ns
        print("\n=== category totals (XLA Ops, ms/step) ===")
        for k, vns in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{vns/3e6:9.3f}  {k}")
