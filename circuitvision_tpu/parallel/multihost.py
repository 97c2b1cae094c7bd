"""Multi-host (multi-process) execution: DCN + ICI as one global mesh.

The reference is strictly single-process, single-device — its only
"device management" is picking one global ``torch.device``
(``/root/reference/src/sam2_infer.py:19-25``), and SURVEY §2.4 records
that it has no distributed execution of any kind. This module is the
cross-host half of the rebuild's scaling layer (the within-host half is
``parallel.mesh``): one JAX process per TPU host, connected by
``jax.distributed.initialize``, with a single global mesh spanning every
chip of every host.

Layout rule (the "How to Scale Your Model" recipe): the **data axis is
host-outermost** and the **model axis lives entirely inside one host's
ICI domain**. Consequences:

- pure-DP batched inference (the product path, ``pipeline.batch``) has
  NO cross-host collectives at all — each host's chips work on the
  images that host decoded; DCN carries nothing;
- FSDP/TP training keeps its all-gathers/reduce-scatters on ICI; the
  only DCN traffic is the data-axis gradient psum, which is tiny
  relative to ICI bandwidth and overlaps with the backward pass;
- host-side pipeline stages (JPEG decode, topology, netlist text)
  naturally shard by process — see :func:`local_span`.

Testing without a pod: JAX's distributed runtime works multi-process on
CPU (Gloo collectives); ``tests/test_multihost.py`` spawns real worker
processes, builds the global mesh, and checks cross-process collectives
and a sharded train step against the single-process answer. The same
code path runs unchanged on a v5e pod slice where each host's
``jax.local_devices()`` are its 4 physically-attached chips.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.config import MeshConfig

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Connect this process to the distributed runtime. Idempotent.

    Arguments default to the standard JAX environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers can configure workers by env alone;
    on Cloud TPU pods all three are auto-detected by JAX and every
    argument may be ``None``. Returns True if the distributed runtime
    was (or already is) initialized, False when no coordinator is
    configured — single-process mode, everything in this module then
    degrades to the ``parallel.mesh`` behavior.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and (
        num_processes is not None or process_id is not None
    ):
        # Half-configured env: silently running single-process here would
        # make every host analyze the full work list independently.
        raise ValueError(
            "JAX_NUM_PROCESSES/JAX_PROCESS_ID are set but no coordinator "
            "address is configured (JAX_COORDINATOR_ADDRESS); refusing to "
            "fall back to single-process"
        )
    # Must not touch the backend before jax.distributed.initialize (it
    # refuses to run once XLA is initialized), so the "are we on a pod
    # where JAX auto-detects the topology" check is env-only. Cloud TPU
    # sets TPU_WORKER_HOSTNAMES whenever libtpu is present (single host:
    # "localhost"), so only a MULTI-entry worker table — or a megascale
    # coordinator — marks a real multi-host slice.
    on_tpu_pod = (
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if coordinator_address is None and not on_tpu_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def is_distributed() -> bool:
    return jax.process_count() > 1


def global_mesh(cfg: Optional[MeshConfig] = None) -> Mesh:
    """(data, model) mesh over ALL processes' devices.

    The model axis is constrained to one host (``model_parallel`` must
    divide ``jax.local_device_count()``) so tensor/FSDP collectives ride
    ICI; the data axis spans hosts. Built with
    ``mesh_utils.create_hybrid_device_mesh`` so the device order encodes
    the DCN/ICI hierarchy (process-outermost along data). Single-process
    it reduces to ``parallel.mesh.make_mesh`` semantics.
    """
    cfg = cfg or MeshConfig()
    nproc = jax.process_count()
    if nproc == 1:
        from .mesh import make_mesh

        return make_mesh(cfg)  # full make_mesh semantics, subset meshes included
    n_local = jax.local_device_count()
    model = max(1, cfg.model_parallel)
    if n_local % model != 0:
        raise ValueError(
            f"model_parallel={model} must divide the {n_local} local "
            "devices: the model axis may not cross hosts (DCN is ~10x "
            "slower than ICI; shard models within a host only)"
        )
    local_data = n_local // model
    if cfg.data_parallel > 0 and cfg.data_parallel != nproc * local_data:
        raise ValueError(
            f"data_parallel={cfg.data_parallel} incompatible with "
            f"{nproc} processes x {local_data} local data-shards; use "
            "data_parallel=-1 (all devices) for multi-host meshes"
        )
    from jax.experimental import mesh_utils

    # The DCN granule is the *process* (one process per host), which also
    # works on CPU workers where virtual devices carry no slice_index.
    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(local_data, model),
        dcn_mesh_shape=(nproc, 1),
        devices=jax.devices(),
        process_is_granule=True,
    )
    return Mesh(devs, (cfg.data_axis, cfg.model_axis))


def global_batch(local: np.ndarray, mesh: Mesh, data_axis: str = "data"):
    """Assemble a global, batch-sharded array from per-process shards.

    ``local`` is THIS process's slice of the batch (its own host-decoded
    images); the returned ``jax.Array`` has global shape
    ``(num_processes * local.shape[0], ...)`` and is sharded over
    ``data_axis`` with every shard already resident on its owner —
    no cross-host data movement happens now or at dispatch.
    """
    sharding = NamedSharding(mesh, PartitionSpec(data_axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


def local_span(n_global: int) -> range:
    """This process's contiguous share of ``n_global`` host-side work
    items (images to decode, netlists to emit), aligned with the
    host-outermost data-axis layout of :func:`global_mesh` so item i's
    host work and device shard land on the same machine."""
    nproc = jax.process_count()
    if n_global % nproc != 0:
        raise ValueError(
            f"{n_global} items do not split evenly over {nproc} "
            "processes; pad the work list (pipeline.batch pads chunks)"
        )
    per = n_global // nproc
    start = jax.process_index() * per
    return range(start, start + per)


def gather_bytes(payload: bytes) -> list:
    """All-gather one opaque byte string per process (netlist text,
    msgpack'd results); returns the list indexed by process. Runs two
    device all-gathers (lengths, then max-padded uint8 payloads) so it
    works identically over DCN and in tests over Gloo. Single-process:
    ``[payload]``."""
    nproc = jax.process_count()
    if nproc == 1:
        return [payload]
    from jax.experimental import multihost_utils

    lens = multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int32)
    ).reshape(nproc)
    mx = max(int(lens.max()), 1)
    buf = np.zeros((mx,), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    allbuf = np.asarray(multihost_utils.process_allgather(buf)).reshape(nproc, mx)
    return [allbuf[i, : int(lens[i])].tobytes() for i in range(nproc)]


def balanced_span(n_global: int) -> range:
    """Like :func:`local_span` but for host-side work with no global
    device array behind it: uneven counts are allowed, the first
    ``n_global % nproc`` processes take one extra item."""
    nproc = jax.process_count()
    pid = jax.process_index()
    q, r = divmod(n_global, nproc)
    start = pid * q + min(pid, r)
    return range(start, start + q + (1 if pid < r else 0))


def analyze_many_distributed(
    analyzer,
    images: Sequence[np.ndarray],
    batch_size: Optional[int] = None,
    prefetch: int = 2,
    final: bool = False,
):
    """Pure-DP multi-host inference over a global image list.

    The data axis is host-outermost (:func:`global_mesh`), so the optimal
    multi-host layout for the product path needs **no cross-host
    collectives at all**: each process analyzes its :func:`balanced_span`
    of the list on its OWN locally-attached chips (a local data mesh over
    ``jax.local_devices()``), and DCN carries only the final netlist text
    (:func:`gather_bytes`). This is the multi-host form of the
    reference's upload→netlist pipeline (src/analysis_pipeline.py:97-326)
    at pod scale; any image count works on any process count.

    Returns ``(local_results, netlists)``: this process's full
    ``AnalysisResult`` list for its span, plus the globally-indexed list
    of ``{"netlist", "valueless"}`` dicts assembled identically on every
    process. Single-process it degrades to plain ``analyze_batch``.
    """
    import json

    from ..pipeline.batch import BatchedPipeline
    from .mesh import make_mesh

    span = balanced_span(len(images))
    mesh = make_mesh(analyzer.cfg.mesh, devices=jax.local_devices())
    pipe = BatchedPipeline(analyzer, mesh=mesh, batch_size=batch_size)
    # VLM stage-2 (final=True) runs per host over its OWN span,
    # interleaved per chunk (the on-TPU reader runs on this host's chips;
    # HTTP clients fan out per host) — still no cross-host collectives,
    # DCN carries only the final text.
    local_results = pipe.analyze_many(
        [images[i] for i in span], prefetch=prefetch, finalize=final
    )
    payload = json.dumps(
        [
            {"netlist": r.netlist_text, "valueless": r.valueless_netlist_text}
            for r in local_results
        ]
    ).encode()
    netlists: list = []
    for chunk in gather_bytes(payload):
        netlists.extend(json.loads(chunk.decode()))
    return local_results, netlists


def sync(tag: str = "circuitvision") -> None:
    """Barrier across all processes (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
