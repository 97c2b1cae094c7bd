"""Degradation tiers (eval/degrade.py): determinism, GT-consistency of
the geometric warps, and that each tier actually perturbs the pixels."""
import numpy as np
import pytest

from circuitvision_tpu.core.types import BBox
from circuitvision_tpu.eval.degrade import DEGRADE_TIERS, degrade


def _scene():
    """A synthetic image with a bright square whose position a box and a
    mask both track — lets us check image/box/mask warp consistency."""
    img = np.full((120, 160, 3), 255, np.uint8)
    img[40:80, 60:110] = 30
    mask = np.zeros((120, 160), np.uint8)
    mask[40:80, 60:110] = 255
    box = BBox("resistor", 0.9, 60, 40, 110, 80)
    return img, mask, box


class TestTiers:
    @pytest.mark.parametrize("tier", sorted(DEGRADE_TIERS))
    def test_deterministic(self, tier):
        img, mask, box = _scene()
        a1, b1, m1 = degrade(img, tier, seed=7, boxes=[box], mask=mask)
        a2, b2, m2 = degrade(img, tier, seed=7, boxes=[box], mask=mask)
        np.testing.assert_array_equal(a1, a2)
        assert [(x.xmin, x.ymin, x.xmax, x.ymax) for x in b1] == [
            (x.xmin, x.ymin, x.xmax, x.ymax) for x in b2
        ]
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    @pytest.mark.parametrize("tier", sorted(DEGRADE_TIERS))
    def test_changes_pixels_keeps_shape_dtype(self, tier):
        img, mask, box = _scene()
        out, _, _ = degrade(img, tier, seed=3, boxes=[box], mask=mask)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img)

    def test_different_seeds_differ_for_random_tiers(self):
        img, mask, box = _scene()
        a, _, _ = degrade(img, "perspective", seed=1, boxes=[box], mask=mask)
        b, _, _ = degrade(img, "perspective", seed=2, boxes=[box], mask=mask)
        assert not np.array_equal(a, b)

    def test_process_stable_pinned_values(self):
        """The tier RNG must not depend on the per-process hash salt
        (PYTHONHASHSEED): pin a digest of each tier's output so a future
        regression to built-in hash() fails across processes."""
        import hashlib

        img, mask, box = _scene()
        digests = {}
        for tier in sorted(DEGRADE_TIERS):
            out, _, _ = degrade(img, tier, seed=7, boxes=[box], mask=mask)
            digests[tier] = hashlib.sha256(out.tobytes()).hexdigest()[:16]
        assert digests == {
            "blur": "cf5297ef736e9bc5",
            "jpeg": "6ef0ae0d93bc3f9a",
            "perspective": "bdf9ba5018f62300",
            "shadow": "538934b67279d0e2",
            "wobble": "8ae969c1f81be5d5",
        }

    def test_unknown_tier_raises(self):
        img, _, _ = _scene()
        with pytest.raises(KeyError, match="unknown"):
            degrade(img, "fog", seed=0)

    def test_photometric_tiers_leave_gt_alone(self):
        img, mask, box = _scene()
        for tier in ("blur", "shadow", "jpeg"):
            _, boxes, m = degrade(img, tier, seed=5, boxes=[box], mask=mask)
            assert boxes[0].xmin == box.xmin and boxes[0].ymax == box.ymax
            assert m is mask


class TestGeometricConsistency:
    @pytest.mark.parametrize("tier", ["perspective", "wobble"])
    def test_warped_mask_tracks_warped_image(self, tier):
        """The dark square in the warped image must coincide with the
        warped mask: IoU(dark pixels, warped mask) stays high."""
        img, mask, box = _scene()
        out, boxes, m = degrade(img, tier, seed=11, boxes=[box], mask=mask)
        dark = (out[..., 0] < 128)
        warped = np.asarray(m) > 127
        inter = np.logical_and(dark, warped).sum()
        union = np.logical_or(dark, warped).sum()
        assert union > 0
        assert inter / union > 0.85, (tier, inter / union)

    @pytest.mark.parametrize("tier", ["perspective", "wobble"])
    def test_warped_box_contains_warped_mask(self, tier):
        """The warped box is the AABB of the warped corners; it must
        cover (almost) every on pixel of the warped mask."""
        img, mask, box = _scene()
        _, boxes, m = degrade(img, tier, seed=11, boxes=[box], mask=mask)
        b = boxes[0]
        ys, xs = np.nonzero(np.asarray(m) > 127)
        inside = (
            (xs >= b.xmin - 2) & (xs <= b.xmax + 2)
            & (ys >= b.ymin - 2) & (ys <= b.ymax + 2)
        )
        assert inside.mean() > 0.98

    def test_perspective_moves_corners(self):
        img, mask, box = _scene()
        _, boxes, _ = degrade(
            img, "perspective", seed=11, boxes=[box], mask=mask
        )
        b = boxes[0]
        assert (b.xmin, b.ymin, b.xmax, b.ymax) != (
            box.xmin, box.ymin, box.xmax, box.ymax
        )
