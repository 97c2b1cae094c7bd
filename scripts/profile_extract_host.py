"""Host-only micro-profile of the node-extraction finish path.

Separates finish_from_packed's host CPU cost (unpackbits, C++ contour
trace, touch matrix, node assembly) from the device wait that
_extract_nodes_chunk also pays, by running the host half on pre-fetched
packed rasters. CPU-only (JAX on CPU), no tunnel.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from circuitvision_tpu.core.config import TopologyConfig
from circuitvision_tpu.eval.synth import make_circuits
from circuitvision_tpu.topology.nodes import (
    finish_from_packed,
    prepare_packed_raster,
)

cfg = TopologyConfig()
circuits = make_circuits()

prepared = []
for c in circuits:
    pr = prepare_packed_raster(c.wire_mask, c.boxes, cfg)
    ph = np.asarray(jax.device_get(pr.packed_dev))
    prepared.append((ph, pr, c.boxes))

# warm
for ph, pr, boxes in prepared:
    finish_from_packed(ph, pr, boxes, cfg)

N = 8
t0 = time.perf_counter()
for _ in range(N):
    for ph, pr, boxes in prepared:
        finish_from_packed(ph, pr, boxes, cfg)
dt = time.perf_counter() - t0
n = N * len(prepared)
print(f"finish_from_packed host cost: {dt/n*1000:.2f} ms/img over {n} calls")

# sub-phase split
import circuitvision_tpu.topology.host_cc as hc
from circuitvision_tpu.topology.contours import trace_contours

T = {}


def clocked(label, fn):
    def inner(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            T[label] = T.get(label, 0.0) + time.perf_counter() - t0

    return inner


hc_orig = hc.contour_touch_stage_host
hc.contour_touch_stage_host = clocked("contour_touch_stage", hc_orig)
np_unpack = np.unpackbits
np.unpackbits = clocked("unpackbits", np_unpack)

t0 = time.perf_counter()
for _ in range(N):
    for ph, pr, boxes in prepared:
        finish_from_packed(ph, pr, boxes, cfg)
dt = time.perf_counter() - t0
np.unpackbits = np_unpack
hc.contour_touch_stage_host = hc_orig
for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
    print(f"  {k:28s} {v/n*1000:7.3f} ms/img")
print(f"  {'other (scale/assemble)':28s} {(dt - sum(T.values()))/n*1000:7.3f} ms/img")

# inside contour_touch_stage: trace vs touch
T.clear()
import circuitvision_tpu.topology.contours as ctr

tr_orig = ctr.trace_contours
stash = []
for ph, pr, boxes in prepared:
    pass

def traced(fg):
    t0 = time.perf_counter()
    try:
        return tr_orig(fg)
    finally:
        T["trace_contours (C++)"] = T.get("trace_contours (C++)", 0.0) + time.perf_counter() - t0

ctr.trace_contours = traced
hc.trace_contours = traced if hasattr(hc, "trace_contours") else None
# host_cc imports trace_contours inside the function from .contours
t0 = time.perf_counter()
for _ in range(N):
    for ph, pr, boxes in prepared:
        finish_from_packed(ph, pr, boxes, cfg)
dt = time.perf_counter() - t0
ctr.trace_contours = tr_orig
print(f"  {'trace_contours (C++)':28s} {T.get('trace_contours (C++)', 0.0)/n*1000:7.3f} ms/img")
print(f"  {'touch+stats (numpy)':28s} {(dt - T.get('trace_contours (C++)', 0.0))/n*1000:7.3f} ms/img  (incl. unpack/assemble)")
