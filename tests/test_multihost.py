"""Multi-host layer tests (parallel/multihost.py).

The cross-process tests spawn REAL worker processes (2 processes x 4
virtual CPU devices each = one emulated 2-host/8-chip slice), connected
through jax.distributed's runtime with Gloo collectives — the same code
path a v5e pod slice runs over DCN. The reference has no distributed
execution at all (SURVEY §2.4, src/sam2_infer.py:19-25); this layer is
net-new TPU-native capability.
"""
from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real multi-process jax.distributed runs (~2 min)

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str, nproc: int = 2, timeout: float = 900.0, _retries: int = 1):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    if _retries > 0 and any(
        p.returncode != 0 and "Gloo context initialization failed" in out
        for p, out in zip(procs, outs)
    ):
        # Gloo's rendezvous window is 30 s; on a loaded single-core CI
        # host one worker's first compile can exceed the skew budget.
        # One retry hits the now-warm persistent compile cache.
        return _run_workers(mode, nproc, timeout, _retries - 1)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args} failed:\n{out}"
    return outs


def _results(out: str) -> dict:
    return dict(
        m.groups() for m in re.finditer(r"^RESULT (\w+)=(.*)$", out, re.MULTILINE)
    )


class TestCrossProcess:
    def test_mesh_collectives_span_gather(self):
        outs = [_results(o) for o in _run_workers("mesh")]
        for r in outs:
            assert r["mesh_shape"] == "(4, 2)"
            # 0..7 on process 0 (sum 28) + 100-offset on process 1 (828).
            assert float(r["global_sum"]) == 856.0
            assert r["gathered"] == "netlist-from-0,netlist-from-1"
        assert outs[0]["span"] == "0:8"
        assert outs[1]["span"] == "8:16"

    def test_inference_netlists_match_single_process(self):
        """Pure-DP multi-host inference (each process's local chips work
        its local_span; DCN carries only netlist text) must produce the
        same globally-ordered netlists as single-process analyze()."""
        outs = [_results(o) for o in _run_workers("infer")]
        # Every process assembles the same global list.
        assert outs[0]["netlists"] == outs[1]["netlists"]
        gathered = [n.split(";") for n in outs[0]["netlists"].split("|")]

        singles = _single_process_netlists()
        assert gathered == singles

    def test_train_step_matches_single_process(self):
        """The sharded fine-tune step over 2 processes must produce the
        same loss as the identical logical program run single-process on
        the conftest 8-device mesh (same global batch, same seed)."""
        outs = [_results(o) for o in _run_workers("train")]
        losses = [float(r["loss"]) for r in outs]
        assert losses[0] == losses[1]

        single = _single_process_loss()
        np.testing.assert_allclose(losses[0], single, rtol=2e-5)


def _single_process_netlists() -> list:
    """Expected netlists from the plain single-image path on one process."""
    import copy

    from tests.multihost_common import inference_images, tiny_analyzer

    analyzer = tiny_analyzer()
    images, gt_by_shape = inference_images()
    analyzer.bboxes = lambda img: copy.deepcopy(gt_by_shape[img.shape])
    return [
        analyzer.analyze(img).valueless_netlist_text.split("\n") for img in images
    ]


def _single_process_loss() -> float:
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from circuitvision_tpu.core.config import MeshConfig, TrainConfig
    from circuitvision_tpu.parallel import multihost
    from circuitvision_tpu.parallel.mesh import fsdp_param_shardings
    from circuitvision_tpu.train.train_step import make_optimizer, make_train_step
    from tests.multihost_common import make_global_train_batch, tiny_sam2

    cfg, model, variables = tiny_sam2()
    mesh = multihost.global_mesh(MeshConfig(model_parallel=2))
    assert mesh.devices.shape == (4, 2)

    tx, _ = make_optimizer(variables, TrainConfig())
    opt_state = tx.init(variables)
    step = make_train_step(model, tx, TrainConfig())

    param_sh = fsdp_param_shardings(variables, mesh, axis="model", min_size=1024)
    opt_sh = fsdp_param_shardings(opt_state, mesh, axis="model", min_size=1024)
    batch_sh = NamedSharding(mesh, PartitionSpec("data"))
    repl = NamedSharding(mesh, PartitionSpec())

    images, masks = make_global_train_batch(cfg)
    jit_step = jax.jit(
        step,
        in_shardings=(param_sh, opt_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_sh, repl),
    )
    _p, _o, metrics = jit_step(
        jax.device_put(variables, param_sh),
        jax.device_put(opt_state, opt_sh),
        jax.device_put(images, batch_sh),
        jax.device_put(masks, batch_sh),
    )
    return float(jax.device_get(metrics["loss"]))


class TestSingleProcessDegradation:
    """Every multihost helper must degrade to single-process semantics so
    the same launcher code runs on one host unchanged."""

    def test_initialize_without_coordinator_is_noop(self):
        from circuitvision_tpu.parallel import multihost

        env = {
            k: os.environ.pop(k)
            for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
            if k in os.environ
        }
        try:
            assert multihost.initialize() is False
            assert multihost.is_distributed() is False
            # Half-configured env must error, not silently run N
            # independent single-process jobs.
            os.environ["JAX_NUM_PROCESSES"] = "2"
            with pytest.raises(ValueError, match="no coordinator"):
                multihost.initialize()
        finally:
            os.environ.pop("JAX_NUM_PROCESSES", None)
            os.environ.update(env)

    def test_global_mesh_reduces_to_local_mesh(self):
        import jax

        from circuitvision_tpu.core.config import MeshConfig
        from circuitvision_tpu.parallel import multihost
        from circuitvision_tpu.parallel.mesh import make_mesh

        cfg = MeshConfig(model_parallel=2)
        g = multihost.global_mesh(cfg)
        l = make_mesh(cfg)
        assert g.devices.shape == l.devices.shape == (jax.device_count() // 2, 2)
        assert g.axis_names == l.axis_names

    def test_global_mesh_subset_single_process(self):
        """Single-process, global_mesh delegates fully to make_mesh —
        including explicit subset meshes (data_parallel < all devices)
        that the multi-process layout rejects. The cross-host-model-axis
        rejection itself is asserted inside the 2-process mesh worker."""
        from circuitvision_tpu.core.config import MeshConfig
        from circuitvision_tpu.parallel import multihost

        g = multihost.global_mesh(MeshConfig(data_parallel=2, model_parallel=1))
        assert g.devices.shape == (2, 1)

    def test_global_batch_and_span_and_gather(self):
        from circuitvision_tpu.core.config import MeshConfig
        from circuitvision_tpu.parallel import multihost

        mesh = multihost.global_mesh(MeshConfig())
        local = np.arange(16, dtype=np.float32).reshape(8, 2)
        garr = multihost.global_batch(local, mesh)
        assert garr.shape == (8, 2)
        np.testing.assert_array_equal(np.asarray(garr), local)

        assert multihost.local_span(24) == range(0, 24)
        assert multihost.balanced_span(5) == range(0, 5)
        assert multihost.gather_bytes(b"abc") == [b"abc"]
        multihost.sync()  # no-op

    def test_analyze_distributed_final_single_process(self):
        """final=True single-process: each host finalizes its own span —
        degraded to one process, the gathered netlists must carry the
        VLM-merged values (batched stage-2 via FakeVLMClient)."""
        import copy

        from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
        from circuitvision_tpu.enrich.client import FakeVLMClient
        from circuitvision_tpu.eval.synth import make_circuits
        from circuitvision_tpu.parallel import multihost
        from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
        from circuitvision_tpu.pipeline.batch import BatchedPipeline

        client = FakeVLMClient(
            labels=[{"id": "1", "class": "voltage.dc", "value": "9"}]
        )
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=client,
        )
        c = make_circuits()[0]
        orig = BatchedPipeline._detect_bboxes
        BatchedPipeline._detect_bboxes = lambda self, chunk: [
            copy.deepcopy(c.boxes) for _ in chunk
        ]
        try:
            _local, netlists = multihost.analyze_many_distributed(
                analyzer, [c.image, c.image], batch_size=8, final=True
            )
        finally:
            BatchedPipeline._detect_bboxes = orig
        assert len(netlists) == 2
        for net in netlists:
            assert " 9" in net["netlist"]  # VLM value merged
            assert net["netlist"] != net["valueless"]
        assert getattr(client, "label_batch_calls", 0) >= 1
