"""YOLOv11 architecture, decoding, and weight-converter mapping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.models.yolo.convert import (
    convert_state_dict,
    expected_torch_keys,
)
from circuitvision_tpu.models.yolo.decode import (
    decode_predictions,
    postprocess,
    unletterbox_boxes,
)
from circuitvision_tpu.models.yolo.model import YOLOv11, init_params, param_count


@pytest.fixture(scope="module")
def tiny_model():
    model = YOLOv11(num_classes=8, scale="n")
    variables = init_params(model, jax.random.PRNGKey(0), img_size=64)
    return model, variables


class TestArchitecture:
    @pytest.mark.slow
    def test_output_shapes(self, tiny_model):
        model, variables = tiny_model
        x = jnp.zeros((2, 64, 64, 3))
        outs = model.apply(variables, x)
        assert len(outs) == 3
        assert outs[0].shape == (2, 8, 8, 4 * 16 + 8)  # stride 8
        assert outs[1].shape == (2, 4, 4, 4 * 16 + 8)  # stride 16
        assert outs[2].shape == (2, 2, 2, 4 * 16 + 8)  # stride 32

    def test_l_scale_param_count(self):
        # YOLOv11-L ≈ 25.3M params (ultralytics reports 25.37M for nc=80;
        # nc=62 trims the class convs slightly).
        model = YOLOv11(num_classes=62, scale="l")
        variables = init_params(model, jax.random.PRNGKey(0), img_size=64)
        n = param_count(variables)
        assert 23e6 < n < 28e6, f"param count {n}"

    def test_jit_forward(self, tiny_model):
        model, variables = tiny_model
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        outs = fwd(variables, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(outs[0])).all()


class TestDecode:
    @pytest.mark.slow
    def test_decode_shapes(self, tiny_model):
        model, variables = tiny_model
        outs = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
        boxes, scores = decode_predictions(outs, reg_max=16, num_classes=8)
        n_anchors = 8 * 8 + 4 * 4 + 2 * 2
        assert boxes.shape == (2, n_anchors, 4)
        assert scores.shape == (2, n_anchors, 8)
        assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()

    @pytest.mark.slow
    def test_boxes_in_image_range(self, tiny_model):
        model, variables = tiny_model
        outs = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
        boxes, _ = decode_predictions(outs, reg_max=16, num_classes=8)
        b = np.asarray(boxes)
        # ltrb distances ≤ reg_max-1 in stride units; boxes stay near image.
        assert b.min() > -16 * 32 and b.max() < 64 + 16 * 32

    @pytest.mark.slow
    def test_postprocess_static_shape(self, tiny_model):
        model, variables = tiny_model
        outs = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
        boxes, scores = decode_predictions(outs, reg_max=16, num_classes=8)
        det = postprocess(boxes, scores, max_detections=32, conf_threshold=0.99)
        assert det.boxes.shape == (1, 32, 4)
        assert det.valid.shape == (1, 32)
        # random init sigmoid scores ≈ 0.5 ≪ 0.99 → nothing valid
        assert not np.asarray(det.valid).any()

    def test_postprocess_keeps_distinct_classes(self):
        # Two perfectly-overlapping boxes of different classes both survive
        # class-aware NMS.
        boxes = jnp.asarray([[[0, 0, 10, 10], [0, 0, 10, 10]]], jnp.float32)
        scores = jnp.zeros((1, 2, 3)).at[0, 0, 1].set(0.9).at[0, 1, 2].set(0.8)
        det = postprocess(boxes, scores, max_detections=2, conf_threshold=0.5)
        assert np.asarray(det.valid).sum() == 2

    def test_unletterbox(self):
        boxes = jnp.asarray([[100.0, 160.0, 200.0, 260.0]])
        out = np.asarray(
            unletterbox_boxes(boxes, jnp.float32(2.0), jnp.asarray([0.0, 160.0]), 320, 100)
        )
        np.testing.assert_allclose(out[0], [50, 0, 100, 50])


class TestConverter:
    def test_round_trip_fills_all_leaves(self, tiny_model):
        model, variables = tiny_model
        keys = expected_torch_keys(variables)
        # DFL has no flax params; everything else must be covered.
        assert all(k.startswith("model.") for k in keys)
        # Build a fake torch state dict with matching shapes by inverting
        # the transpose rule.
        import jax as _jax

        flat = _jax.tree_util.tree_flatten_with_path(variables)[0]
        fake = {}
        rng = np.random.default_rng(0)
        from circuitvision_tpu.models.yolo.convert import _flax_path_to_torch_key

        for path, leaf in flat:
            names = [getattr(p, "key", str(p)) for p in path]
            tkey = _flax_path_to_torch_key(tuple(names[1:]))
            arr = rng.normal(size=leaf.shape).astype(np.float32)
            if names[-1] == "kernel" and arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO → OIHW
            fake[tkey] = arr
        converted = convert_state_dict(fake, variables)
        # Same tree structure, all leaves overwritten with finite values.
        flat2 = _jax.tree_util.tree_flatten_with_path(converted)[0]
        assert len(flat2) == len(flat)
        for (_, a), (_, b) in zip(flat, flat2):
            assert a.shape == np.asarray(b).shape

    def test_missing_key_raises(self, tiny_model):
        model, variables = tiny_model
        with pytest.raises(KeyError):
            convert_state_dict({}, variables)
