"""Checkpoint-conversion proof on COMPLETE synthetic checkpoints
(VERDICT r1 #4): every source tensor consumed, every Flax param filled,
LoRA folding exact, converted models forward.

Real weights are unavailable in this environment; these tests exercise
the full reference checkpoint SHAPE instead — a PEFT-wrapped SAM2 state
dict with all 36 LoRA targets (src/circuit_analyzer.py:156-199, trunk
block indices mapped onto the tiny config), wrapper net-new params, the
video-memory entries the image pipeline never consumes, and an
ultralytics-nested YOLO dict with DFL/BatchNorm bookkeeping.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.core.config import DetectorConfig, SAM2Config
from circuitvision_tpu.models.sam2 import convert as sam2_convert
from circuitvision_tpu.models.sam2.wrapper import SAM2ImageSegmenter
from circuitvision_tpu.models.sam2.wrapper import init_params as sam2_init
from circuitvision_tpu.models.yolo import convert as yolo_convert
from circuitvision_tpu.models.yolo.model import YOLOv11
from circuitvision_tpu.models.yolo.model import init_params as yolo_init

TINY_SAM = SAM2Config(
    resolution=128, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
    global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
    dtype="float32",
)

# The reference's 36 LoRA targets with the Hiera-L trunk block indices
# (44, 47) mapped onto blocks that exist in the tiny config and have the
# same module inventory (4: windowed-with-proj, 3: global-without-proj).
TINY_TARGETS = tuple(
    t.replace("blocks.44", "blocks.4").replace("blocks.47", "blocks.3")
    for t in sam2_convert.REFERENCE_LORA_TARGETS
)

SAM2_MODEL_ROOTS = ("image_encoder.", "sam_mask_decoder.", "sam_prompt_encoder.")
RANK, ALPHA = 4, 16.0


def _tree_leaves_with_names(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path): np.asarray(v)
        for path, v in flat
    }


@pytest.fixture(scope="module")
def sam2_setup():
    model = SAM2ImageSegmenter(cfg=TINY_SAM)
    variables = sam2_init(model, jax.random.PRNGKey(7))
    template = sam2_init(model, jax.random.PRNGKey(8))  # distinct fill target
    return model, variables, template


class TestSAM2Conversion:
    def _build_peft_checkpoint(self, torch_state, rng):
        """Wrap a plain torch-named dict the way the reference fine-tune
        checkpoint is laid out (src/circuit_analyzer.py:203-233)."""
        peft = {}
        loras = {}
        for key, val in torch_state.items():
            if key.startswith(SAM2_MODEL_ROOTS):
                mod = key.rsplit(".", 1)[0]
                if key.endswith(".weight") and mod in TINY_TARGETS:
                    w = val
                    if w.ndim == 2:
                        a = rng.standard_normal((RANK, w.shape[1])).astype(np.float32)
                        b = rng.standard_normal((w.shape[0], RANK)).astype(np.float32)
                    else:  # Conv2d (o, i, kh, kw): PEFT stores A as a conv
                        a = rng.standard_normal((RANK, *w.shape[1:])).astype(np.float32)
                        b = rng.standard_normal((w.shape[0], RANK, 1, 1)).astype(
                            np.float32
                        )
                    base = f"sam2_model.base_model.model.{mod}"
                    peft[f"{base}.base_layer.weight"] = w
                    peft[f"{base}.lora_A.default.weight"] = a
                    peft[f"{base}.lora_B.default.weight"] = b
                    loras[mod] = (a, b)
                else:
                    peft[f"sam2_model.base_model.model.{key}"] = val
            else:
                peft[key] = val  # wrapper net-new params stay bare
        # Entries the image pipeline legitimately never consumes.
        peft["sam2_model.base_model.model.memory_attention.layers.0.self_attn.q_proj.weight"] = (
            np.zeros((4, 4), np.float32)
        )
        peft["sam2_model.base_model.model.memory_encoder.fuser.layers.0.norm.num_batches_tracked"] = (
            np.zeros((), np.int64)
        )
        peft["sam2_model.base_model.model.no_mem_embed"] = np.zeros((1, 1, 8), np.float32)
        return peft, loras

    def test_full_peft_roundtrip_and_fold(self, sam2_setup):
        model, variables, template = sam2_setup
        torch_state = sam2_convert.export_torch_state(variables)
        # All 36 reference targets exist in the synthetic checkpoint.
        assert all(f"{t}.weight" in torch_state for t in TINY_TARGETS), [
            t for t in TINY_TARGETS if f"{t}.weight" not in torch_state
        ]

        rng = np.random.default_rng(0)
        peft, loras = self._build_peft_checkpoint(torch_state, rng)
        converted = sam2_convert.convert_state_dict(
            peft, template, lora_alpha=ALPHA
        )

        # Expected: original weights + folded deltas on the 36 targets.
        folded = dict(torch_state)
        for mod, (a, b) in loras.items():
            w = folded[f"{mod}.weight"]
            if w.ndim == 2:
                delta = (ALPHA / RANK) * (b @ a)
            else:
                delta = (ALPHA / RANK) * np.einsum(
                    "or,rikl->oikl", b.reshape(w.shape[0], RANK), a
                )
            folded[f"{mod}.weight"] = w + delta
        expected = sam2_convert.convert_state_dict(folded, template)

        got = _tree_leaves_with_names(converted)
        want = _tree_leaves_with_names(expected)
        orig = _tree_leaves_with_names(variables)
        assert set(got) == set(want) == set(orig)
        n_changed = 0
        for name in want:
            np.testing.assert_allclose(got[name], want[name], rtol=1e-5, atol=1e-5)
            if not np.allclose(got[name], orig[name]):
                n_changed += 1
        # Every LoRA-target weight actually moved (36 modules).
        assert n_changed == len(TINY_TARGETS)

    @pytest.mark.slow
    def test_converted_model_forwards(self, sam2_setup):
        model, variables, template = sam2_setup
        torch_state = sam2_convert.export_torch_state(variables)
        peft, _ = self._build_peft_checkpoint(torch_state, np.random.default_rng(1))
        converted = sam2_convert.convert_state_dict(peft, template, lora_alpha=ALPHA)
        x = jnp.zeros((1, TINY_SAM.resolution, TINY_SAM.resolution, 3), jnp.float32)
        high, low, iou = model.apply(jax.tree.map(jnp.asarray, converted), x)
        assert np.isfinite(np.asarray(high)).all()

    def test_unconsumed_weight_raises(self, sam2_setup):
        _, variables, template = sam2_setup
        state = sam2_convert.export_torch_state(variables)
        state["sam_mask_decoder.mystery_head.weight"] = np.zeros((2, 2), np.float32)
        with pytest.raises(KeyError, match="silently dropped"):
            sam2_convert.convert_state_dict(state, template)

    def test_missing_weight_raises(self, sam2_setup):
        _, variables, template = sam2_setup
        state = sam2_convert.export_torch_state(variables)
        del state["sam_mask_decoder.conv_s0.weight"]
        with pytest.raises(KeyError, match="Missing"):
            sam2_convert.convert_state_dict(state, template)

    def test_dangling_lora_raises(self, sam2_setup):
        _, variables, template = sam2_setup
        state = sam2_convert.export_torch_state(variables)
        state["sam_mask_decoder.conv_s0.lora_A.default.weight"] = np.zeros(
            (4, 8), np.float32
        )
        with pytest.raises(KeyError, match="LoRA"):
            sam2_convert.convert_state_dict(state, template)


class TestYOLOConversion:
    @pytest.fixture(scope="class")
    def yolo_setup(self):
        cfg = DetectorConfig(scale="n", img_size=64, dtype="float32")
        model = YOLOv11(num_classes=cfg.num_classes, scale=cfg.scale, reg_max=cfg.reg_max)
        variables = yolo_init(model, jax.random.PRNGKey(3), img_size=cfg.img_size)
        template = yolo_init(model, jax.random.PRNGKey(4))
        return cfg, model, variables, template

    def test_full_ultralytics_roundtrip(self, yolo_setup):
        cfg, model, variables, template = yolo_setup
        torch_state = yolo_convert.export_torch_state(variables)
        # ultralytics nests the model once and carries DFL + BN counters.
        ckpt = {f"model.{k}": v for k, v in torch_state.items()}
        ckpt["model.model.23.dfl.conv.weight"] = np.arange(
            cfg.reg_max, dtype=np.float32
        ).reshape(1, cfg.reg_max, 1, 1)
        ckpt["model.model.0.bn.num_batches_tracked"] = np.zeros((), np.int64)

        converted = yolo_convert.convert_state_dict(ckpt, template)
        got = _tree_leaves_with_names(converted)
        orig = _tree_leaves_with_names(variables)
        assert set(got) == set(orig)
        for name in orig:
            np.testing.assert_array_equal(got[name], orig[name])

    @pytest.mark.slow
    def test_converted_model_forwards(self, yolo_setup):
        cfg, model, variables, template = yolo_setup
        ckpt = yolo_convert.export_torch_state(variables)
        converted = yolo_convert.convert_state_dict(ckpt, template)
        x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
        outs = model.apply(jax.tree.map(jnp.asarray, converted), x)
        assert all(np.isfinite(np.asarray(o)).all() for o in outs)

    def test_unconsumed_weight_raises(self, yolo_setup):
        _, _, variables, template = yolo_setup
        ckpt = yolo_convert.export_torch_state(variables)
        ckpt["model.99.conv.weight"] = np.zeros((2, 2, 1, 1), np.float32)
        with pytest.raises(KeyError, match="silently dropped"):
            yolo_convert.convert_state_dict(ckpt, template)

    def test_missing_weight_raises(self, yolo_setup):
        _, _, variables, template = yolo_setup
        ckpt = yolo_convert.export_torch_state(variables)
        key = next(iter(sorted(ckpt)))
        del ckpt[key]
        with pytest.raises(KeyError, match="Missing"):
            yolo_convert.convert_state_dict(ckpt, template)


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_fixture(name):
    with open(os.path.join(FIXTURE_DIR, name)) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


@pytest.fixture(scope="module")
def sam2_l_vars():
    """Full Hiera-L variables — the real checkpoint's fill target
    (slow: ~1 min init on the CI host)."""
    from circuitvision_tpu.core.config import SAM2Config

    model = SAM2ImageSegmenter(cfg=SAM2Config())
    return sam2_init(model, jax.random.PRNGKey(0))


class TestFrozenKeyInventories:
    """VERDICT r3 #7: the complete REAL checkpoint key inventories
    (PEFT-wrapped SAM2-L fine-tune with all 36 LoRA targets at the real
    trunk indices 44/47; ultralytics YOLOv11-L) are frozen on disk
    (scripts/make_checkpoint_fixtures.py). These tests fail if converter
    or model drift would silently drop — or newly require — a real
    checkpoint key."""

    @pytest.mark.slow
    def test_sam2_l_inventory_is_frozen(self, sam2_l_vars):
        fixture = _load_fixture("sam2_l_reference_checkpoint_keys.json")
        current = sam2_convert.reference_checkpoint_inventory(sam2_l_vars)
        current = {k: tuple(v) for k, v in current.items()}
        assert current == fixture, (
            "reference-checkpoint inventory drifted from the frozen "
            "fixture — if the architecture change is intentional, "
            "regenerate with scripts/make_checkpoint_fixtures.py; "
            f"added={sorted(set(current) - set(fixture))[:5]} "
            f"removed={sorted(set(fixture) - set(current))[:5]}"
        )

    @pytest.mark.slow
    def test_sam2_l_every_fixture_key_consumed(self, sam2_l_vars):
        """A checkpoint with EXACTLY the frozen keys (zeros) converts:
        every key consumed or on the documented skip list; then one
        dropped key and one stray key both fail loudly."""
        fixture = _load_fixture("sam2_l_reference_checkpoint_keys.json")
        ckpt = {k: np.zeros(s, np.float32) for k, s in fixture.items()}
        # the real file also carries video-memory machinery the image
        # path never runs — tolerated by documented prefix
        ckpt["sam2_model.base_model.model.memory_encoder.fuser.layers.0.norm.weight"] = (
            np.zeros((4,), np.float32)
        )
        converted = sam2_convert.convert_state_dict(ckpt, sam2_l_vars)
        assert converted is not None

        stray = dict(ckpt)
        stray["sam2_model.base_model.model.sam_mask_decoder.mystery.weight"] = (
            np.zeros((2, 2), np.float32)
        )
        with pytest.raises(KeyError, match="silently dropped"):
            sam2_convert.convert_state_dict(stray, sam2_l_vars)

        short = dict(ckpt)
        del short["sam2_model.base_model.model.image_encoder.trunk.blocks.10.attn.qkv.weight"]
        with pytest.raises(KeyError, match="Missing"):
            sam2_convert.convert_state_dict(short, sam2_l_vars)

    def test_sam2_fixture_invariants(self):
        """Fast lane: structural facts of the frozen inventory that the
        reference fine-tune guarantees (src/circuit_analyzer.py:156-212)."""
        fixture = _load_fixture("sam2_l_reference_checkpoint_keys.json")
        lora_a = {k for k in fixture if ".lora_A.default.weight" in k}
        lora_b = {k for k in fixture if ".lora_B.default.weight" in k}
        assert len(lora_a) == len(lora_b) == 36
        # every adapter pair sits on a base_layer'd module with rank 4
        for k in lora_a:
            mod = k[: -len(".lora_A.default.weight")]
            assert f"{mod}.base_layer.weight" in fixture, mod
            assert fixture[k][0] == 4  # rank
        for k in lora_b:
            assert fixture[k][1] == 4
        # the two fine-tuned trunk blocks are the real Hiera-L indices
        assert any("trunk.blocks.44.attn.qkv.lora_A" in k for k in lora_a)
        assert any("trunk.blocks.47.mlp.layers.0.lora_A" in k for k in lora_a)
        # wrapper net-new params are present and un-prefixed
        assert "dense_embedding1" in fixture
        assert "sparse_embedding" in fixture
        assert any(k.startswith("refinement_layer.") for k in fixture)

    def test_yolo_l_inventory_is_frozen(self):
        from circuitvision_tpu.core.config import DetectorConfig

        det_cfg = DetectorConfig(scale="l", img_size=640)
        model = YOLOv11(
            num_classes=det_cfg.num_classes, scale=det_cfg.scale,
            reg_max=det_cfg.reg_max,
        )
        variables = yolo_init(model, jax.random.PRNGKey(1), img_size=640)
        fixture = _load_fixture("yolo_l_reference_checkpoint_keys.json")
        current = yolo_convert.reference_checkpoint_inventory(variables)
        current = {k: tuple(v) for k, v in current.items()}
        assert current == fixture, (
            f"added={sorted(set(current) - set(fixture))[:5]} "
            f"removed={sorted(set(fixture) - set(current))[:5]}"
        )

    def test_yolo_l_every_fixture_key_consumed(self):
        from circuitvision_tpu.core.config import DetectorConfig

        det_cfg = DetectorConfig(scale="l", img_size=640)
        model = YOLOv11(
            num_classes=det_cfg.num_classes, scale=det_cfg.scale,
            reg_max=det_cfg.reg_max,
        )
        template = yolo_init(model, jax.random.PRNGKey(1), img_size=640)
        fixture = _load_fixture("yolo_l_reference_checkpoint_keys.json")
        ckpt = {
            k: np.zeros(s, np.float32) if s else np.zeros((), np.int64)
            for k, s in fixture.items()
        }
        converted = yolo_convert.convert_state_dict(ckpt, template)
        assert converted is not None

        stray = dict(ckpt)
        stray["model.99.conv.weight"] = np.zeros((2, 2, 1, 1), np.float32)
        with pytest.raises(KeyError, match="silently dropped"):
            yolo_convert.convert_state_dict(stray, template)
