"""Device mesh construction + sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.4); this
module provides the TPU-native scaling layer the rebuild requires:
a (data, model) mesh over ICI, batch sharding for pure-DP inference, and
FSDP-style parameter sharding for training. All communication is XLA
collectives inserted from `NamedSharding` annotations — no hand-written
comms for this model scale (both models fit on one chip; DP is the
throughput axis, the model axis exists so TP is a config change, not a
rewrite).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model_parallel)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // model
    # data can floor to 0 when model > n — catch that here rather than
    # letting an empty 0-device Mesh fail cryptically downstream.
    if data < 1 or data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate rest."""
    return NamedSharding(mesh, PartitionSpec(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def fsdp_param_shardings(params, mesh: Mesh, axis: str = "model", min_size: int = 2**16):
    """Per-leaf NamedSharding tree: shard the largest divisible dim of each
    sufficiently-large parameter over the model axis (FSDP-style); small
    params replicate. XLA inserts the all-gathers/reduce-scatters."""
    axis_size = mesh.shape[axis]

    def spec_for(leaf):
        if axis_size == 1 or leaf.size < min_size:
            return NamedSharding(mesh, PartitionSpec())
        dims = list(leaf.shape)
        best = -1
        for d in range(len(dims) - 1, -1, -1):  # prefer trailing dims
            if dims[d] % axis_size == 0 and dims[d] >= axis_size:
                best = d
                break
        if best < 0:
            return NamedSharding(mesh, PartitionSpec())
        spec = [None] * len(dims)
        spec[best] = axis
        return NamedSharding(mesh, PartitionSpec(*spec))

    return jax.tree_util.tree_map(spec_for, params)


def shard_batch(x, mesh: Mesh, data_axis: str = "data"):
    """Place a host batch onto the mesh, sharded over the batch dim."""
    return jax.device_put(x, batch_sharding(mesh, data_axis))
