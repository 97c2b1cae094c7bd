"""Explain the batch-8 vs batch-4 throughput gap with an op-kind trace.

Runs the SAM2.1-L full forward (the 96% cost of the device path) at the
given batch sizes, times steady-state steps, and aggregates device-op
durations by op *kind* so the regression source is visible (HBM-bound op
classes growing super-linearly vs compute ops growing linearly).

Usage: python scripts/profile_batch_sweep.py [batches...]  (default: 4 8)
"""
import glob
import os
import sys
import tempfile
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


def classify(name: str) -> str:
    n = name.lower()
    if "flash" in n or "attention" in n:
        return "flash-attention"
    if n.startswith("convolution") or ".convolution" in n:
        return "convolution"
    if "convert" in n and ("reduce" in n or "subtract" in n or "multiply" in n):
        return "layernorm-fusion"
    if n.startswith("copy") or "transpose" in n:
        return "layout-copy/transpose"
    if n.startswith("reshape") or n.startswith("bitcast"):
        return "reshape"
    if n.startswith("fusion") or ".fusion" in n:
        return "generic-fusion"
    if "dynamic-update-slice" in n or "slice" in n or "pad" in n:
        return "slice/pad"
    if "copy-start" in n or "copy-done" in n or "dma" in n:
        return "async-dma"
    return "other"


def run(batch: int) -> dict:
    cfg = SAM2Config(dtype="bfloat16")
    model = SAM2ImageSegmenter(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, 1024, 1024, 3), np.float32))
    variables = fast_init(model, jax.random.PRNGKey(0), imgs[:1])
    fwd = jax.jit(lambda v, x: model.apply(v, x)[0])

    out = fwd(variables, imgs)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0, 0])  # force a real readback through the tunnel

    # Steady-state timing: pipelined dispatch, end with forced readback.
    steps = 6
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(variables, imgs)
    _ = np.asarray(out[0, 0, :1])
    dt = (time.perf_counter() - t0) / steps

    d = tempfile.mkdtemp()
    jax.profiler.start_trace(d)
    for _ in range(3):
        out = fwd(variables, imgs)
    _ = np.asarray(out[0, 0, :1])
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData

    files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    kinds: dict[str, float] = {}
    ops: dict[str, float] = {}
    for plane in ProfileData.from_file(files[0]).planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                ms = ev.duration_ns / 1e6 / 3.0  # per step
                kinds[classify(ev.name)] = kinds.get(classify(ev.name), 0.0) + ms
                ops[ev.name] = ops.get(ev.name, 0.0) + ms
    return {"batch": batch, "step_s": dt, "img_s": batch / dt, "kinds": kinds, "ops": ops}


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    results = [run(b) for b in batches]
    for r in results:
        print(f"\n=== batch {r['batch']}: {r['step_s']*1e3:.1f} ms/step, "
              f"{r['img_s']:.2f} img/s ===")
        for k, v in sorted(r["kinds"].items(), key=lambda kv: -kv[1]):
            print(f"  {v:8.2f} ms/step  {v/r['batch']:7.2f} ms/img  {k}")
    if len(results) == 2:
        a, b = results
        print(f"\n=== per-image delta ({b['batch']} vs {a['batch']}) by kind ===")
        allk = set(a["kinds"]) | set(b["kinds"])
        for k in sorted(allk, key=lambda k: -(b["kinds"].get(k, 0) / b["batch"]
                                              - a["kinds"].get(k, 0) / a["batch"])):
            da = a["kinds"].get(k, 0) / a["batch"]
            db = b["kinds"].get(k, 0) / b["batch"]
            print(f"  {db - da:+8.2f} ms/img  ({da:7.2f} -> {db:7.2f})  {k}")
        print(f"\n=== top op growth (ms/img) ===")
        allo = set(a["ops"]) | set(b["ops"])
        deltas = sorted(
            allo,
            key=lambda k: -(b["ops"].get(k, 0) / b["batch"] - a["ops"].get(k, 0) / a["batch"]),
        )[:15]
        for k in deltas:
            da = a["ops"].get(k, 0) / a["batch"]
            db = b["ops"].get(k, 0) / b["batch"]
            print(f"  {db - da:+7.2f}  ({da:6.2f} -> {db:6.2f})  {k[:100]}")


if __name__ == "__main__":
    main()
