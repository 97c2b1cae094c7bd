"""SegmentationFolderDataset: the real-dataset loader for fine-tuning.

The reference fine-tuned SAM2 on a 267-image dataset outside its repo
(README.md:119); this loader is the rebuild's first-party equivalent.
Covers discovery/validation, preprocessing parity with sam2_preprocess,
deterministic shuffled epochs, dihedral augmentation, multi-host
sharding, and end-to-end consumption by the train step.
"""
import os

import numpy as np
import pytest
from PIL import Image

from circuitvision_tpu.train.data import SegmentationFolderDataset

RES = 64


@pytest.fixture()
def dataset_root(tmp_path):
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(7):
        h, w = int(rng.integers(40, 90)), int(rng.integers(40, 90))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[: h // 2, : w // 2] = 255
        Image.fromarray(img).save(img_dir / f"c{i}.png")
        Image.fromarray(mask).save(mask_dir / f"c{i}.png")
    return str(tmp_path)


class TestDiscovery:
    def test_pairs_found(self, dataset_root):
        ds = SegmentationFolderDataset(dataset_root, resolution=RES)
        assert len(ds) == 7

    def test_missing_mask_errors(self, dataset_root):
        Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(
            os.path.join(dataset_root, "images", "orphan.png")
        )
        with pytest.raises(FileNotFoundError, match="no mask for image orphan"):
            SegmentationFolderDataset(dataset_root, resolution=RES)

    def test_empty_errors(self, tmp_path):
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        with pytest.raises(FileNotFoundError, match="no images"):
            SegmentationFolderDataset(str(tmp_path), resolution=RES)


class TestLoading:
    def test_preprocessing_matches_inference(self, dataset_root):
        """Loader images must equal sam2_preprocess on the raw image —
        the exact inference transform (src/sam2_infer.py:43-51)."""
        import jax.numpy as jnp

        from circuitvision_tpu.ops.image import sam2_preprocess

        ds = SegmentationFolderDataset(dataset_root, resolution=RES)
        img, mask = ds.load(0)
        raw_img, raw_mask = ds.load_raw(0)
        np.testing.assert_array_equal(
            img, np.asarray(sam2_preprocess(jnp.asarray(raw_img), RES))
        )
        assert img.shape == (RES, RES, 3) and mask.shape == (RES, RES)
        assert set(np.unique(mask)) <= {0.0, 1.0}
        assert mask.mean() > 0  # the drawn quadrant survived the resize

    def test_augment_codes_are_dihedral(self, dataset_root):
        ds = SegmentationFolderDataset(dataset_root, resolution=RES)
        base_img, base_mask = ds.load(1, augment_code=0)
        seen = {base_mask.tobytes()}
        for code in range(1, 8):
            img, mask = ds.load(1, augment_code=code)
            assert img.shape == base_img.shape and mask.shape == base_mask.shape
            seen.add(mask.tobytes())
        # The flips move the drawn quadrant to all 4 corners; transpose
        # variants can coincide after the square resize (the quadrant is
        # ~half-size along each axis), so 4 distinct is the guarantee.
        assert len(seen) >= 4


class TestBatches:
    def test_epoch_shapes_and_determinism(self, dataset_root):
        ds = SegmentationFolderDataset(dataset_root, resolution=RES)
        a = list(ds.batches(2, seed=5, epochs=2, augment=True))
        b = list(ds.batches(2, seed=5, epochs=2, augment=True))
        assert len(a) == 6  # 7 items -> 3 full batches of 2, x2 epochs
        for (xa, ya), (xb, yb) in zip(a, b):
            assert xa.shape == (2, RES, RES, 3) and ya.shape == (2, RES, RES)
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)

    def test_keep_remainder(self, dataset_root):
        ds = SegmentationFolderDataset(dataset_root, resolution=RES)
        sizes = [x.shape[0] for x, _ in ds.batches(2, epochs=1, drop_remainder=False)]
        assert sizes == [2, 2, 2, 1]

    def test_shards_are_equal_length_and_disjoint(self, dataset_root):
        """Shards must have the SAME length (multi-host training runs
        collectives in lockstep — a longer shard would hang waiting for
        exhausted peers), so each epoch truncates to a multiple of
        n_shards; the kept indices partition the permutation prefix."""
        ds = SegmentationFolderDataset(dataset_root, resolution=RES)

        def n_items(shard):
            return sum(
                y.shape[0]
                for _x, y in ds.batches(
                    1, seed=9, epochs=1, shard=shard, drop_remainder=False
                )
            )

        assert n_items((0, 2)) == n_items((1, 2)) == 3  # 7 -> 6 usable
        rng = np.random.default_rng(9 + 0)
        perm = rng.permutation(7).tolist()[:6]
        assert sorted(perm[0::2] + perm[1::2]) == sorted(perm)

    def test_loader_feeds_train_step(self, dataset_root):
        """End-to-end: one optimizer step on a real loaded batch."""
        import jax

        from circuitvision_tpu.core.config import SAM2Config, TrainConfig
        from circuitvision_tpu.models.sam2.wrapper import (
            SAM2ImageSegmenter,
            init_params,
        )
        from circuitvision_tpu.train.train_step import (
            make_optimizer,
            make_train_step,
        )

        cfg = SAM2Config(
            resolution=RES, embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
            global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
            backbone_channel_list=(256, 128, 64, 32), decoder_mlp_dim=64,
            dtype="float32",
        )
        model = SAM2ImageSegmenter(cfg=cfg)
        variables = init_params(model, jax.random.PRNGKey(0))
        tx, _ = make_optimizer(variables, TrainConfig())
        opt_state = tx.init(variables)
        step = jax.jit(make_train_step(model, tx, TrainConfig()))

        ds = SegmentationFolderDataset(dataset_root, resolution=RES)
        images, masks = next(iter(ds.batches(2, seed=1)))
        _v, _o, metrics = step(variables, opt_state, images, masks)
        assert np.isfinite(float(metrics["loss"]))
