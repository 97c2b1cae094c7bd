"""Composition-level conversion proof (VERDICT r2 missing #2 / task #3).

Builds the Flax SAM2ImageSegmenter at a tiny config, exports its weights
through `export_torch_state` (the converter's inverse name/layout map),
loads them into a hand-written PyTorch twin of the OFFICIAL SAM2
architecture (tests/torch_twin_sam2.py) with `strict=True`, and diffs
the COMPOSED forward — patch embed → windowed/global Hiera with q-pool →
FPN → dense PE → two-way decoder with high-res skips and the
dynamic-stability single-mask path → E1@E2 prompt → upsample →
refinement — against the Flax model on real inputs.

This pins exactly the places a converted real checkpoint would silently
diverge: window-partition order, q-pool geometry, pos-embed
interpolation, decoder wiring, and every name/layout transpose in the
converter (strict load fails on any missing/extra key).
"""
from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model torch-twin diffs (~2 min cold)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from circuitvision_tpu.core.config import SAM2Config
from circuitvision_tpu.models.sam2.convert import export_torch_state
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter, init_params

TINY = SAM2Config(
    resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
    global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
    dtype="float32",
)


@pytest.fixture(scope="module")
def models():
    from tests.torch_twin_sam2 import TorchSam2Twin

    flax_model = SAM2ImageSegmenter(cfg=TINY)
    variables = init_params(flax_model, jax.random.PRNGKey(3))
    state = {k: torch.from_numpy(np.asarray(v)) for k, v in
             export_torch_state(variables).items()}

    twin = TorchSam2Twin(TINY)
    # strict load: every exported key must land, every twin parameter must
    # be fed — a completeness check of the converter's name map.
    twin.load_state_dict(state, strict=True)
    twin.eval()
    return flax_model, variables, twin


class TestFullModelForwardParity:
    def test_composed_forward_matches_torch(self, models):
        flax_model, variables, twin = models
        rng = np.random.default_rng(11)
        x = rng.standard_normal((2, TINY.resolution, TINY.resolution, 3)).astype(
            np.float32
        )

        with jax.default_matmul_precision("highest"):
            high_j, low_j, iou_j = flax_model.apply(variables, jnp.asarray(x))

        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        with torch.no_grad():
            high_t, low_t, iou_t = twin(xt)

        high_t = high_t.permute(0, 2, 3, 1).numpy()
        low_t = low_t.permute(0, 2, 3, 1).numpy()
        iou_t = iou_t.numpy()

        def rel_err(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-9))

        assert np.asarray(low_j).shape == low_t.shape
        assert np.asarray(high_j).shape == high_t.shape
        assert rel_err(low_j, low_t) < 1e-4, f"low-res logits {rel_err(low_j, low_t)}"
        assert rel_err(high_j, high_t) < 1e-4, f"high-res logits {rel_err(high_j, high_t)}"
        assert rel_err(iou_j, iou_t) < 1e-4, f"iou {rel_err(iou_j, iou_t)}"

    def test_yolo_composed_forward_matches_torch(self):
        """Same composition-level proof for YOLOv11: export an 'n'-scale
        Flax model through the ultralytics-name map, strict-load it into
        the torch twin (tests/torch_twin_yolo.py), and diff the raw
        per-scale head outputs."""
        from circuitvision_tpu.models.yolo.convert import (
            export_torch_state as yolo_export,
        )
        from circuitvision_tpu.models.yolo.model import (
            YOLOArch,
            YOLOv11,
            init_params as yolo_init,
        )
        from tests.torch_twin_yolo import TorchYoloTwin

        flax_model = YOLOv11(num_classes=13, scale="n")
        variables = yolo_init(flax_model, jax.random.PRNGKey(7), img_size=64)
        # random-but-nontrivial BN stats so the BN path is exercised
        rng = np.random.default_rng(5)
        variables = jax.tree.map(
            lambda a: jnp.asarray(
                rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
            )
            if a.ndim == 1
            else a,
            variables,
        )

        arch = YOLOArch.for_scale("n")
        twin = TorchYoloTwin(13, arch.channels, arch.head_channels,
                             arch.repeats, arch.c3k)
        state = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
                 yolo_export(variables).items()}
        missing, unexpected = twin.load_state_dict(state, strict=False)
        # num_batches_tracked counters are torch bookkeeping with no Flax
        # counterpart; everything else must map exactly.
        assert not unexpected, unexpected
        assert all(k.endswith("num_batches_tracked") for k in missing), missing
        twin.eval()

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            outs_j = flax_model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            outs_t = twin(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        assert len(outs_j) == len(outs_t) == 3
        for i, (oj, ot) in enumerate(zip(outs_j, outs_t)):
            otn = np.transpose(ot.numpy(), (0, 2, 3, 1))
            assert np.asarray(oj).shape == otn.shape
            err = float(
                np.abs(np.asarray(oj, np.float64) - otn).max()
                / max(np.abs(otn).max(), 1e-9)
            )
            assert err < 1e-4, f"scale {i}: rel err {err}"

    def test_binarized_masks_identical(self, models):
        """The product consumes logits>0 (src/circuit_analyzer.py:356):
        the converted model must binarize identically on random inputs."""
        flax_model, variables, twin = models
        rng = np.random.default_rng(12)
        x = rng.standard_normal((1, TINY.resolution, TINY.resolution, 3)).astype(
            np.float32
        )
        with jax.default_matmul_precision("highest"):
            high_j, _, _ = flax_model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            high_t, _, _ = twin(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        mj = np.asarray(high_j)[..., 0] > 0
        mt = high_t.numpy()[:, 0] > 0
        # allow disagreement only where |logit| is within fp noise of 0
        margin = np.abs(high_t.numpy()[:, 0]) > 1e-4
        assert (mj == mt)[margin].all()
