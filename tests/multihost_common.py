"""Shared fixtures for the multi-host tests: one tiny SAM2 config and one
deterministic global training batch, used identically by the spawned
workers (tests/multihost_worker.py) and by the parent test's
single-process comparison run so the losses are comparable."""
from __future__ import annotations

import jax
import numpy as np


def tiny_sam2():
    """Same tiny config as __graft_entry__.dryrun_multichip (known-good
    shapes; its compile is already in the persistent cache)."""
    from circuitvision_tpu.core.config import SAM2Config
    from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter, init_params

    cfg = SAM2Config(
        resolution=128,
        embed_dim=32,
        num_heads=1,
        stages=(1, 1, 2, 1),
        global_att_blocks=(3,),
        window_spec=(4, 2, 4, 2),
        backbone_channel_list=(256, 128, 64, 32),
        decoder_mlp_dim=64,
    )
    model = SAM2ImageSegmenter(cfg=cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    return cfg, model, variables


def tiny_analyzer():
    """Random-weight analyzer with SAM2 off (classical mask path) and a
    fake VLM — same construction as tests/test_batch_parity.py, so the
    multi-host netlists are comparable to the single-process pins."""
    from circuitvision_tpu.core.config import (
        DetectorConfig,
        PipelineConfig,
        SAM2Config,
    )
    from circuitvision_tpu.enrich.client import FakeVLMClient
    from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU

    tiny_sam = SAM2Config(
        resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
        global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
        backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
        dtype="float32",
    )
    return CircuitAnalyzerTPU(
        config=PipelineConfig(
            detector=DetectorConfig(scale="n", img_size=64, dtype="float32"),
            sam2=tiny_sam,
            use_sam2=False,
        ),
        use_sam2=False,
        vlm_client=FakeVLMClient(directions={"voltage.dc": ("UP", "SIGN")}),
    )


def inference_images():
    """Global 5-image work list (odd on purpose: 2 processes take a 3/2
    balanced_span split) + ground-truth detections keyed by image shape,
    shared by all worker processes and the parent."""
    from tests.test_batch_parity import golden_image, loop_image

    golden, golden_boxes = golden_image()
    loop, loop_boxes = loop_image()
    images = [golden, loop, golden, loop, golden]
    gt_by_shape = {golden.shape: golden_boxes, loop.shape: loop_boxes}
    return images, gt_by_shape


def make_global_train_batch(cfg, batch: int = 8):
    """Deterministic (images, masks) global batch; every process builds
    the full batch and feeds only its local_span slice."""
    rng = np.random.default_rng(7)
    images = rng.random((batch, cfg.resolution, cfg.resolution, 3)).astype(
        np.float32
    )
    masks = (
        rng.random((batch, cfg.resolution, cfg.resolution)) > 0.7
    ).astype(np.float32)
    return images, masks
