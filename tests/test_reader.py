"""Trained crop reader (train/reader.py + enrich/trained_reader.py):
value codec, dataset generation, model forward, learning on a tiny
slice, and the serving client's batched contract."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.train.reader import (
    CropReader,
    ReaderConfig,
    decode_value,
    encode_value,
    generate_reader_dataset,
    init_reader,
    make_crop,
    make_reader_train_step,
)


class TestValueCodec:
    @pytest.mark.parametrize("v", ["1k", "470", "10:45", "2:-90", "22u", "5"])
    def test_roundtrip(self, v):
        assert decode_value(encode_value(v)) == v

    def test_none_and_empty(self):
        assert decode_value(encode_value(None)) is None
        assert decode_value(encode_value("")) is None

    def test_blank_is_zero(self):
        codes = encode_value("1k")
        assert codes[2] == 0 and codes[0] != 0


class TestDataset:
    def test_generates_consistent_arrays(self):
        from circuitvision_tpu.train.reader import (
            CROP_SIZE,
            READER_CLASS_NAMES,
            READER_CLASS_TO_ID,
        )

        data = generate_reader_dataset(4, seed0=123)
        n = data["crops"].shape[0]
        assert n > 0
        assert data["crops"].shape[1:] == (CROP_SIZE, CROP_SIZE, 3)
        assert data["cls"].shape == (n,)
        assert data["val"].shape == (n, 8)
        assert data["dir"].shape == (n,)
        assert data["val_w"].shape == (n,)
        # at least one crop carries a value and all classes are valid ids
        assert (data["val"].sum(axis=1) > 0).any()
        assert (data["cls"] >= 0).all()
        assert (data["cls"] < len(READER_CLASS_NAMES)).all()
        # the netlist-map-only names must have REAL ids, not background
        # (labeling them 0 silently capped held-out class accuracy)
        assert READER_CLASS_TO_ID["capacitor"] != 0
        assert READER_CLASS_TO_ID["current.dc"] != 0

    def test_deterministic(self):
        a = generate_reader_dataset(2, seed0=55)
        b = generate_reader_dataset(2, seed0=55)
        np.testing.assert_array_equal(a["crops"], b["crops"])
        np.testing.assert_array_equal(a["val"], b["val"])


class TestModel:
    @pytest.mark.slow
    def test_forward_shapes(self):
        cfg = ReaderConfig(width=8)
        model = CropReader(cfg)
        params = init_reader(cfg, jax.random.PRNGKey(0))
        cls, val, d = model.apply(
            params, jnp.zeros((3, cfg.crop_size, cfg.crop_size, 3))
        )
        assert cls.shape == (3, cfg.num_classes)
        assert val.shape == (3, cfg.value_len, cfg.value_vocab)
        assert d.shape == (3, cfg.n_directions)

    @pytest.mark.slow
    def test_learns_tiny_slice(self):
        """A handful of steps on 32 crops must cut the loss (pins the
        full differentiated path through all three heads)."""
        import optax

        data = generate_reader_dataset(6, seed0=321)
        sel = np.arange(min(32, data["crops"].shape[0]))
        cfg = ReaderConfig(width=8)
        model = CropReader(cfg)
        params = init_reader(cfg, jax.random.PRNGKey(0))
        tx = optax.adam(3e-3)
        opt = tx.init(params)
        step = jax.jit(make_reader_train_step(model, tx))
        args = (
            jnp.asarray(data["crops"][sel]),
            jnp.asarray(data["cls"][sel]),
            jnp.asarray(data["val"][sel]),
            jnp.asarray(data["dir"][sel]),
        )
        first = last = None
        for _ in range(15):
            params, opt, metrics = step(params, opt, *args)
            if first is None:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert last < first


class TestMakeCrop:
    def test_shape_and_padding(self):
        from circuitvision_tpu.train.reader import CROP_SIZE

        img = np.full((100, 200, 3), 255, np.uint8)
        img[40:60, 90:110] = 0
        from circuitvision_tpu.core.types import BBox

        crop = make_crop(img, BBox("resistor", 0.9, 90, 40, 110, 60))
        assert crop.shape == (CROP_SIZE, CROP_SIZE, 3)
        assert (crop < 128).any()  # the dark box is in frame

    def test_edge_box_clipped(self):
        from circuitvision_tpu.train.reader import CROP_SIZE

        img = np.full((50, 50, 3), 255, np.uint8)
        from circuitvision_tpu.core.types import BBox

        crop = make_crop(img, BBox("resistor", 0.9, -10, -10, 5, 5))
        assert crop.shape == (CROP_SIZE, CROP_SIZE, 3)

    def test_value_window_is_native_resolution(self):
        """The window must be a pixel-exact excerpt (no resampling)."""
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.train.reader import (
            CROP_SIZE,
            make_value_window,
        )

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (300, 400, 3), np.uint8)
        box = BBox("resistor", 0.9, 180, 140, 220, 180)
        win = make_value_window(img, box)
        assert win.shape == (CROP_SIZE, CROP_SIZE, 3)
        cx, cy = (180 + 220) // 2, (140 + 180) // 2
        x0, y0 = cx - CROP_SIZE // 2, cy - CROP_SIZE // 2
        np.testing.assert_array_equal(
            win, img[y0 : y0 + CROP_SIZE, x0 : x0 + CROP_SIZE]
        )

    def test_value_window_pads_white_at_border(self):
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.train.reader import make_value_window

        from circuitvision_tpu.train.reader import CROP_SIZE

        img = np.zeros((60, 60, 3), np.uint8)
        win = make_value_window(img, BBox("resistor", 0.9, 0, 0, 10, 10))
        # window starts at image coord (5 - S/2); image (0, 0) lands at
        # window (S/2 - 5); everything before it is white padding
        off = CROP_SIZE // 2 - 5
        assert (win[0, 0] == 255).all()
        assert (win[off, off] == 0).all()
        assert (win[off - 1, off - 1] == 255).all()


class TestServingClient:
    def _trained_on_one_batch(self):
        """Not accuracy — just a functioning params tree."""
        cfg = ReaderConfig(width=8)
        return ReaderConfig(width=8), init_reader(cfg, jax.random.PRNGKey(1))

    def test_labels_batch_boxes_contract(self):
        from circuitvision_tpu.enrich.trained_reader import TrainedReaderClient

        cfg, params = self._trained_on_one_batch()
        client = TrainedReaderClient(params, cfg)
        img = np.full((120, 160, 3), 255, np.uint8)
        from circuitvision_tpu.core.types import BBox

        boxes = [
            dataclasses.replace(
                BBox("resistor", 0.9, 10, 10, 40, 40), visual_id=1
            ),
            dataclasses.replace(
                BBox("capacitor", 0.9, 60, 10, 90, 40), visual_id=2
            ),
        ]
        out = client.get_labels_batch_boxes([img, img], [boxes, []])
        assert len(out) == 2
        assert [r["id"] for r in out[0]] == ["1", "2"]
        assert out[1] == []
        for r in out[0]:
            assert set(r) == {"id", "class", "value"}

    def test_directions_batch_contract(self):
        from circuitvision_tpu.enrich.trained_reader import TrainedReaderClient

        cfg, params = self._trained_on_one_batch()
        client = TrainedReaderClient(params, cfg)
        crops = [np.full((40, 40, 3), 255, np.uint8)] * 3
        out = client.get_directions_batch(
            crops, ["voltage.dc", "diode", "current.dc"]
        )
        assert len(out) == 3
        d, reason = out[0]
        assert d in ("UP", "DOWN", "LEFT", "RIGHT", "UNKNOWN")
        assert reason == "SIGN"
        assert out[1][1] == "ARROW" and out[2][1] == "ARROW"

    def test_get_labels_without_boxes_raises(self):
        from circuitvision_tpu.enrich.trained_reader import TrainedReaderClient

        cfg, params = self._trained_on_one_batch()
        client = TrainedReaderClient(params, cfg)
        with pytest.raises(NotImplementedError):
            client.get_labels(np.zeros((10, 10, 3), np.uint8))


class TestDefaultClientSelectsReader:
    def test_env_spec_loads_shipped_checkpoint(self, monkeypatch):
        """CIRCUITVISION_VLM=reader:<dir> must return the trained
        reader client (the path the CLI/serving stack takes)."""
        import os

        from circuitvision_tpu.enrich.client import default_client
        from circuitvision_tpu.enrich.trained_reader import TrainedReaderClient

        ckpt = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ckpt", "reader",
        )
        if not os.path.isdir(ckpt):
            pytest.skip("no shipped reader checkpoint")
        monkeypatch.setenv("CIRCUITVISION_VLM", f"reader:{ckpt}")
        client = default_client()
        assert isinstance(client, TrainedReaderClient)

    def test_shipped_reader_reads_a_value(self):
        """The in-repo checkpoint must actually read: render one circuit
        with known values and require >0 correct rows (full accuracy is
        pinned by the training demo; this guards checkpoint/codec drift)."""
        import dataclasses
        import os

        from circuitvision_tpu.core import taxonomy
        from circuitvision_tpu.enrich.trained_reader import load_trained_reader
        from circuitvision_tpu.eval.glyphs import render_schematic
        from circuitvision_tpu.eval.randomized import random_circuit

        ckpt = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ckpt", "reader",
        )
        if not os.path.isdir(ckpt):
            pytest.skip("no shipped reader checkpoint")
        client = load_trained_reader(ckpt)
        mask, boxes = random_circuit(990_005)
        rng = np.random.default_rng(990_005)
        img, values, _dirs, _tb = render_schematic(mask, boxes, rng)
        enum_boxes, gt = [], {}
        vid = 1
        for b in boxes:
            if b.class_name in taxonomy.NETLIST_IGNORE_CLASSES or \
                    b.class_name == "circuit":
                continue
            enum_boxes.append(dataclasses.replace(b, visual_id=vid))
            gt[str(vid)] = (b.class_name, values.get(b.persistent_uid))
            vid += 1
        out = client.get_labels_batch_boxes([img], [enum_boxes])[0]
        ok = sum(
            1 for r in out if gt.get(r["id"]) == (r["class"], r["value"])
        )
        assert ok > 0, out


class TestAnalyzerPrefersBoxHook:
    def test_generate_final_netlist_uses_boxes_hook(self):
        """A client exposing get_labels_batch_boxes must be called with
        the enum boxes; get_labels must not be touched."""
        from circuitvision_tpu.core.types import AnalysisResult, BBox
        from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
        from circuitvision_tpu.core.config import PipelineConfig

        calls = {}

        class BoxClient:
            def get_labels_batch_boxes(self, imgs, boxes_lists):
                calls["boxes"] = (len(imgs), boxes_lists)
                return [[] for _ in imgs]

            def get_labels(self, img):
                raise AssertionError("should not be called")

            def get_direction(self, crop, cls):
                return ("UNKNOWN", "UNKNOWN")

        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(use_sam2=False), use_sam2=False,
            vlm_client=BoxClient(),
        )
        res = AnalysisResult(original_image=np.zeros((4, 4, 3), np.uint8))
        res.enum_image = np.zeros((4, 4, 3), np.uint8)
        res.enum_bboxes = [
            dataclasses.replace(
                BBox("resistor", 0.9, 0, 0, 2, 2), visual_id=1
            )
        ]
        res.netlist = []
        analyzer.generate_final_netlist(res)
        assert calls["boxes"][0] == 1
