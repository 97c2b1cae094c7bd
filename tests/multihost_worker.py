"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <mode>

Each worker forces the CPU platform with 4 local virtual devices and
joins the distributed runtime at localhost:<port>, emulating one host of
a pod slice (same pattern as tests/conftest.py: the axon TPU plugin
rewrites JAX_PLATFORMS, so the jax.config update must win). Results are
printed as single "RESULT <key>=<value>" lines for the parent to parse.
"""
from __future__ import annotations

import os
import re
import sys


def main() -> None:
    pid, nproc, port, mode = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        os.environ.get("XLA_FLAGS", ""),
    )
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from circuitvision_tpu.parallel import multihost

    ok = multihost.initialize(f"localhost:{port}", nproc, pid)
    assert ok and jax.process_count() == nproc, (
        f"distributed init failed: ok={ok} procs={jax.process_count()}"
    )

    if mode == "mesh":
        run_mesh_checks(pid, nproc)
    elif mode == "train":
        run_train_step(pid, nproc)
    elif mode == "infer":
        run_inference(pid, nproc)
    else:
        raise SystemExit(f"unknown mode {mode}")


def run_mesh_checks(pid: int, nproc: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from circuitvision_tpu.core.config import MeshConfig
    from circuitvision_tpu.parallel import multihost

    mesh = multihost.global_mesh(MeshConfig(model_parallel=2))
    n_local = jax.local_device_count()
    assert mesh.devices.shape == (nproc * n_local // 2, 2), mesh.devices.shape

    # A model axis that does not divide the LOCAL device count would have
    # to cross hosts (ride DCN) — must be rejected in multi-process runs.
    try:
        multihost.global_mesh(MeshConfig(model_parallel=3))
        raise AssertionError("expected ValueError for cross-host model axis")
    except ValueError as e:
        assert "model axis may not cross" in str(e)

    # Model axis must stay within one host (ICI): both devices of every
    # model-axis row belong to the same process.
    for row in mesh.devices.reshape(-1, 2):
        assert row[0].process_index == row[1].process_index, (
            "model axis crosses hosts"
        )
    # Data axis is host-outermost: the first half of the data rows are
    # process 0's, the second half process 1's.
    procs_along_data = [d[0].process_index for d in mesh.devices]
    assert procs_along_data == sorted(procs_along_data), procs_along_data
    print(f"RESULT mesh_shape={mesh.devices.shape}", flush=True)

    # Cross-process reduction over a global batch assembled from
    # process-local shards: sum over ALL shards must be visible on every
    # process (this is the DCN gradient-psum path in miniature).
    local = (np.arange(8, dtype=np.float32) + 100.0 * pid).reshape(4, 2)
    garr = multihost.global_batch(local, mesh)
    assert garr.shape == (4 * nproc, 2), garr.shape
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, PartitionSpec())
    )(garr)
    print(f"RESULT global_sum={float(total)}", flush=True)

    span = multihost.local_span(8 * nproc)
    print(f"RESULT span={span.start}:{span.stop}", flush=True)

    gathered = multihost.gather_bytes(f"netlist-from-{pid}".encode())
    assert len(gathered) == nproc
    print(
        "RESULT gathered=" + ",".join(g.decode() for g in gathered), flush=True
    )
    multihost.sync("mesh-checks-done")


def run_train_step(pid: int, nproc: int) -> None:
    """One sharded fine-tune step over the global (data=4, model=2) mesh
    with the batch fed as process-local shards; the loss must match the
    single-process 8-device run bit-for-bit (same logical program, same
    global batch — only the process topology differs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from circuitvision_tpu.core.config import MeshConfig, TrainConfig
    from circuitvision_tpu.parallel import multihost
    from circuitvision_tpu.parallel.mesh import fsdp_param_shardings
    from circuitvision_tpu.train.train_step import make_optimizer, make_train_step
    from tests.multihost_common import make_global_train_batch, tiny_sam2

    cfg, model, variables = tiny_sam2()
    mesh = multihost.global_mesh(MeshConfig(model_parallel=2))

    tx, _ = make_optimizer(variables, TrainConfig())
    opt_state = tx.init(variables)
    step = make_train_step(model, tx, TrainConfig())

    param_sh = fsdp_param_shardings(variables, mesh, axis="model", min_size=1024)
    opt_sh = fsdp_param_shardings(opt_state, mesh, axis="model", min_size=1024)
    repl = NamedSharding(mesh, PartitionSpec())

    images, masks = make_global_train_batch(cfg)
    span = multihost.local_span(images.shape[0])
    g_images = multihost.global_batch(images[span.start : span.stop], mesh)
    g_masks = multihost.global_batch(masks[span.start : span.stop], mesh)

    jit_step = jax.jit(
        step,
        in_shardings=(param_sh, opt_sh, g_images.sharding, g_masks.sharding),
        out_shardings=(param_sh, opt_sh, repl),
    )
    variables = jax.device_put(variables, param_sh)
    opt_state = jax.device_put(opt_state, opt_sh)
    _params, _opt, metrics = jit_step(variables, opt_state, g_images, g_masks)
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)
    print(f"RESULT loss={loss!r}", flush=True)
    multihost.sync("train-step-done")


def run_inference(pid: int, nproc: int) -> None:
    """Pure-DP multi-host inference: the global 4-image list is split by
    local_span, each process runs the batched pipeline on its OWN 4 local
    devices, and gather_bytes assembles the globally-ordered netlists —
    the no-cross-host-collectives layout of multihost.analyze_many_distributed.
    The parent diffs the gathered netlists against single-process analyze()."""
    import copy

    from circuitvision_tpu.parallel import multihost
    from tests.multihost_common import tiny_analyzer, inference_images

    analyzer = tiny_analyzer()
    images, gt_by_shape = inference_images()

    from circuitvision_tpu.pipeline.batch import BatchedPipeline

    BatchedPipeline._detect_bboxes = lambda self, chunk: [
        copy.deepcopy(gt_by_shape[img.shape]) for img in chunk
    ]

    local_results, netlists = multihost.analyze_many_distributed(
        analyzer, images, batch_size=4
    )
    # 5 images over 2 processes: balanced_span gives 3/2 (uneven on purpose).
    assert len(local_results) == len(multihost.balanced_span(len(images)))
    assert len(netlists) == len(images)
    print(
        "RESULT netlists=" + "|".join(n["valueless"].replace("\n", ";") for n in netlists),
        flush=True,
    )
    multihost.sync("infer-done")


if __name__ == "__main__":
    main()
