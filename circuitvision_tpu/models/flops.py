"""Analytic FLOP accounting for the device path (VERDICT r3 #8).

Counts the matmul/convolution FLOPs of a jittable function by walking
its jaxpr — no XLA compile, no device work, exact for the math that
actually runs (the fused Pallas paths compute the same contractions as
the module path they replace, so counting the module-path trace is the
right denominator-free number for both).

Scope: dot_general + conv_general_dilated only — the standard
"model FLOPs" definition used for MFU (elementwise/reduction work is
excluded by convention). MFU = achieved_flops_per_sec / peak_flops,
with peak taken from the device kind (v5e bf16 ≈ 197 TFLOP/s).

The reference has no FLOP accounting at all (its perf story is prose
timings, /root/reference/README.md); this module gives the bench a
hardware-normalized metric so perf regressions are visible independent
of tunnel latency.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

#: peak dense matmul throughput by TPU device kind, FLOP/s (bf16).
#: v5e: 197 TFLOPS bf16 (public spec); v4: 275; v5p: 459; v6e: 918.
PEAK_FLOPS_BY_KIND = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of `device` (default: jax.devices()[0]), or None
    for unknown kinds (CPU, unrecognized TPU generations)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for key, peak in PEAK_FLOPS_BY_KIND.items():
        if kind.startswith(key):
            return peak
    return None


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = 1.0
    for d in lb:
        batch *= lhs.shape[d]
    k = 1.0
    for d in lc:
        k *= lhs.shape[d]
    m = 1.0
    for i, s in enumerate(lhs.shape):
        if i not in lc and i not in lb:
            m *= s
    n = 1.0
    for i, s in enumerate(rhs.shape):
        if i not in rc and i not in rb:
            n *= s
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1) * eqn.params.get(
        "batch_group_count", 1
    )
    # out: batch × out_spatial × C_out; kernel: spatial × C_in/g × C_out
    out_elems = float(np.prod(out.shape))
    k_spatial = 1.0
    for i, s in enumerate(rhs.shape):
        if i not in (dn.rhs_spec[0], dn.rhs_spec[1]):
            k_spatial *= s
    c_in = lhs.shape[dn.lhs_spec[1]]
    return 2.0 * out_elems * k_spatial * (c_in / groups)


def _walk(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "cond":
            # Exactly one branch executes at runtime — summing both
            # would overstate FLOPs wherever a cond holds matmuls. Take
            # the max branch (the conservative upper bound on real work).
            branches = eqn.params.get("branches", ())
            branch_costs = [
                _walk(sub) for b in branches for sub in _subjaxprs(b)
            ]
            total += max(branch_costs, default=0.0)
        else:
            for v in eqn.params.values():
                for sub in _subjaxprs(v):
                    mult = 1.0
                    if name in ("scan", "while"):
                        # scan body runs `length` times; while bodies are
                        # unbounded — count one iteration (the device
                        # path has no unbounded matmul loops).
                        mult = float(eqn.params.get("length", 1) or 1)
                    total += mult * _walk(sub)
    return total


def _subjaxprs(v):
    from jax.extend.core import ClosedJaxpr, Jaxpr

    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _subjaxprs(x)


def matmul_flops(fn, *args) -> float:
    """Total dot/conv FLOPs of one call of `fn(*args)` (trace only;
    args may be ShapeDtypeStructs)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _walk(jaxpr.jaxpr)


_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
    "flops_cache.json",
)


#: Bump when the counting logic or a counted architecture changes —
#: folded into every cache key so stale on-disk counts self-invalidate.
FLOPS_COUNT_VERSION = 2


def cached_flops(key: str, compute) -> float:
    """Memoize an expensive trace-and-count under .jax_cache (tracing
    SAM2-L takes ~1 min on a 1-core host; the count is config-pure)."""
    key = f"v{FLOPS_COUNT_VERSION}:{key}"
    cache = {}
    try:
        with open(_CACHE_PATH) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        pass
    if key in cache:
        return float(cache[key])
    val = float(compute())
    cache[key] = val
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f)
    except OSError:
        pass
    return val


def sam2_forward_flops(cfg, batch: int = 1) -> float:
    """Matmul/conv FLOPs of one SAM2 forward at cfg.resolution (module
    path — identical math to the fused kernels)."""
    import jax.numpy as jnp

    from . import sam2 as _  # noqa: F401  (package import side effects)
    from .sam2 import hiera
    from .sam2.wrapper import SAM2ImageSegmenter, init_params

    def compute():
        model = SAM2ImageSegmenter(cfg=cfg)
        variables = init_params(model, jax.random.PRNGKey(0))
        x = jax.ShapeDtypeStruct(
            (batch, cfg.resolution, cfg.resolution, 3), jnp.float32
        )

        def fwd(v, img):
            with hiera.force_fused(False):
                return model.apply(v, img)

        # Count the pure-einsum path: on TPU the global blocks otherwise
        # route through the flash-attention custom call, whose internal
        # contractions a jaxpr walk cannot see (~113 GFLOP/img at L).
        saved = hiera.FLASH_MIN_SEQ
        hiera.FLASH_MIN_SEQ = 1 << 60
        try:
            return matmul_flops(fwd, variables, x)
        finally:
            hiera.FLASH_MIN_SEQ = saved

    key = f"sam2:{cfg.resolution}:{cfg.embed_dim}:{cfg.stages}:{batch}"
    return cached_flops(key, compute)


def yolo_forward_flops(det_cfg, batch: int = 1) -> float:
    """Matmul/conv FLOPs of one YOLO forward + decode at det_cfg.img_size."""
    import jax.numpy as jnp

    from .yolo.decode import decode_predictions
    from .yolo.model import YOLOv11, init_params

    def compute():
        model = YOLOv11(
            num_classes=det_cfg.num_classes,
            scale=det_cfg.scale,
            reg_max=det_cfg.reg_max,
        )
        variables = init_params(
            model, jax.random.PRNGKey(0), img_size=det_cfg.img_size
        )
        x = jax.ShapeDtypeStruct(
            (batch, det_cfg.img_size, det_cfg.img_size, 3), jnp.float32
        )

        def fwd(v, img):
            outs = model.apply(v, img)
            return decode_predictions(
                outs, det_cfg.reg_max, det_cfg.num_classes
            )

        return matmul_flops(fwd, variables, x)

    key = (
        f"yolo:{det_cfg.scale}:{det_cfg.img_size}:{det_cfg.num_classes}:{batch}"
    )
    return cached_flops(key, compute)
