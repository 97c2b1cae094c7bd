"""Batched mesh pipeline + orbax checkpoint round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuitvision_tpu.core.config import (
    DetectorConfig,
    MeshConfig,
    PipelineConfig,
    SAM2Config,
)
from circuitvision_tpu.enrich.client import FakeVLMClient
from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU

TINY_SAM = SAM2Config(
    resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
    global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
    dtype="float32",
)


def _cpu_mesh(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs[:n]).reshape(n, 1), ("data", "model"))


@pytest.fixture(scope="module")
def tiny_analyzer():
    return CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
            sam2=TINY_SAM,
            mesh=MeshConfig(batch_per_device=1),
            use_sam2=True,
        ),
        use_sam2=True,
        vlm_client=FakeVLMClient(),
    )


@pytest.mark.slow
class TestBatchedPipeline:
    def test_run_batch_sharded(self, tiny_analyzer):
        from circuitvision_tpu.pipeline.batch import BatchedPipeline

        mesh = _cpu_mesh(8)
        bp = BatchedPipeline(tiny_analyzer, mesh=mesh, batch_size=8)
        images = [
            np.full((100 + 10 * i, 120, 3), 255, np.uint8) for i in range(8)
        ]
        out = bp.run_batch(images)
        assert out.boxes.shape == (8, 128, 4)
        assert out.masks.shape == (8, 128, 128)

    def test_analyze_many(self, tiny_analyzer):
        from circuitvision_tpu.pipeline.batch import BatchedPipeline

        mesh = _cpu_mesh(8)
        bp = BatchedPipeline(tiny_analyzer, mesh=mesh, batch_size=8)
        img = np.full((200, 260, 3), 255, np.uint8)
        img[100:103, 20:240] = 0
        results = bp.analyze_many([img] * 10)
        assert len(results) == 10
        for r in results:
            assert r.netlist_text is not None


class TestCheckpointRoundTrip:
    def test_save_load(self, tmp_path, tiny_analyzer):
        from circuitvision_tpu.models.checkpoint import load_variables, save_variables

        path = str(tmp_path / "ckpt")
        save_variables(path, tiny_analyzer.yolo_variables)
        restored = load_variables(path)
        orig = jax.tree_util.tree_leaves(tiny_analyzer.yolo_variables)
        back = jax.tree_util.tree_leaves(restored)
        assert len(orig) == len(back)
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
class TestBatchedPipelineNoSam:
    def test_run_batch_without_sam2(self):
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
                sam2=TINY_SAM,
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=FakeVLMClient(),
        )
        from circuitvision_tpu.pipeline.batch import BatchedPipeline

        mesh = _cpu_mesh(8)
        bp = BatchedPipeline(analyzer, mesh=mesh, batch_size=8)
        images = [np.full((96, 96, 3), 255, np.uint8)] * 8
        out = bp.run_batch(images)
        assert out.masks.shape == (8, 128, 128)
        assert (out.masks == 0).all()  # no SAM2 → empty masks


@pytest.mark.slow
class TestConverterCLI:
    def test_flags_reach_converter_kwargs(self, monkeypatch):
        """--scale/--num-classes must reach convert_yolo_checkpoint (they
        were silently dropped, making non-default conversions impossible
        from the CLI)."""
        from circuitvision_tpu.models import checkpoint as ck

        seen = {}

        def fake(src, dst, **kw):
            seen.update(kw, src=src, dst=dst)

        monkeypatch.setattr(ck, "convert_yolo_checkpoint", fake)
        rc = ck.main(["convert-yolo", "a.pt", "out/", "--scale", "x",
                      "--num-classes", "80"])
        assert rc == 0
        assert seen == {"src": "a.pt", "dst": "out/", "scale": "x",
                        "num_classes": 80}

    def test_unknown_flag_errors(self, capsys):
        from circuitvision_tpu.models import checkpoint as ck

        rc = ck.main(["convert-yolo", "a.pt", "out/", "--bogus", "1"])
        assert rc == 1
        assert "unknown argument" in capsys.readouterr().out


class TestAnalyzeBatchAPI:
    def test_analyze_batch_delegates(self, tiny_analyzer):
        mesh = _cpu_mesh(8)
        img = np.full((200, 260, 3), 255, np.uint8)
        img[100:103, 20:240] = 0
        results = tiny_analyzer.analyze_batch([img] * 8, mesh=mesh, batch_size=8)
        assert len(results) == 8
