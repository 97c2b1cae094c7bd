"""Fast parameter materialization without compiling the init graph.

`flax_module.init` traces and XLA-compiles the entire forward pass just to
produce parameter values — for large models that is minutes of compile
time before a single step runs. `fast_init` gets the variable *shapes*
abstractly via `jax.eval_shape` (no compilation) and fills them with host
numpy randomness: fan-in-scaled normals for >=2-D kernels, zeros for
biases, BatchNorm identity stats.

Converted checkpoints overwrite these values in production; random init is
for tests, benchmarks, and training-from-scratch experiments where exact
flax initializer parity is irrelevant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(module, rng: jax.Array, *args, method=None, **kwargs) -> dict:
    seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.PRNGKey(0), *a, method=method, **kwargs),
        *args,
    )
    gen = np.random.default_rng(seed)

    def materialize(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        shape, dtype = leaf.shape, leaf.dtype
        last = names[-1] if names else ""
        if last in ("bias", "mean"):
            return jnp.zeros(shape, dtype)
        if last in ("scale", "var"):
            return jnp.ones(shape, dtype)
        if len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            std = (1.0 / max(fan_in, 1)) ** 0.5
            return jnp.asarray(
                gen.normal(0.0, std, size=shape).astype(np.float32), dtype
            )
        if len(shape) == 1 or len(shape) == 0:
            return jnp.asarray(
                gen.normal(0.0, 0.02, size=shape).astype(np.float32), dtype
            )
        return jnp.zeros(shape, dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)


def cast_float_params(variables, dtype):
    """Cast float32 leaves to the model's compute dtype (no-op for f32).

    Flax keeps params in float32 even when a module computes in bfloat16,
    and converted checkpoints are stored float32 — without this cast XLA
    re-converts every parameter on every step (~137 ms/step for SAM2-L,
    see bench.py) and Pallas kernels receive f32 refs whose doubled VMEM
    footprint can exceed the scoped-vmem limit at serving batch sizes.
    Integer/bool leaves (counters, tables) are left untouched.
    """
    dt = jnp.dtype(dtype)
    if dt == jnp.float32:
        return variables
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
