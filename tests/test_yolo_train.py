"""YOLO detection training (train/yolo_loss.py, train/yolo_train.py):
TAL assignment semantics, loss component math, and end-to-end learning
on a tiny model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circuitvision_tpu.train.yolo_loss import (
    YOLOLossConfig,
    anchor_grid,
    pairwise_ciou,
    task_aligned_assign,
    yolo_detection_loss,
    _dfl_loss,
)


def small_cfg(img_size=64, num_classes=8, reg_max=8):
    return YOLOLossConfig(
        num_classes=num_classes, reg_max=reg_max, img_size=img_size
    )


class TestAnchorGrid:
    def test_matches_decode_flatten_order(self):
        """Anchor layout must equal decode_predictions' flatten order:
        row-major per scale, strides (8, 16, 32) concatenated."""
        pts, sts = anchor_grid(64)
        assert pts.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
        # first anchor of stride 8: center (4, 4); second: (12, 4)
        np.testing.assert_allclose(np.asarray(pts[0]), [4.0, 4.0])
        np.testing.assert_allclose(np.asarray(pts[1]), [12.0, 4.0])
        # first stride-16 anchor comes after the 64 stride-8 anchors
        np.testing.assert_allclose(np.asarray(pts[64]), [8.0, 8.0])
        assert float(sts[0]) == 8.0 and float(sts[64]) == 16.0

    def test_anchor_count_640(self):
        pts, _ = anchor_grid(640)
        assert pts.shape[0] == 80 * 80 + 40 * 40 + 20 * 20  # 8400


class TestCIoU:
    def test_identical_boxes(self):
        b = jnp.asarray([10.0, 10.0, 50.0, 30.0])
        assert float(pairwise_ciou(b, b)) == pytest.approx(1.0, abs=1e-6)

    def test_disjoint_less_than_zero(self):
        a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
        b = jnp.asarray([100.0, 100.0, 110.0, 110.0])
        # IoU 0 minus the distance penalty → negative
        assert float(pairwise_ciou(a, b)) < 0.0

    def test_orders_by_overlap(self):
        gt = jnp.asarray([0.0, 0.0, 20.0, 20.0])
        near = jnp.asarray([2.0, 2.0, 22.0, 22.0])
        far = jnp.asarray([10.0, 10.0, 30.0, 30.0])
        assert float(pairwise_ciou(near, gt)) > float(pairwise_ciou(far, gt))


class TestAssigner:
    def _perfect_setup(self, cfg, gt, cls_id):
        """Predictions that exactly equal the GT box everywhere, with the
        GT class scored 0.9 — alignment is then driven by in-box + IoU."""
        A = (
            (cfg.img_size // 8) ** 2
            + (cfg.img_size // 16) ** 2
            + (cfg.img_size // 32) ** 2
        )
        pts, _ = anchor_grid(cfg.img_size)
        pred_boxes = jnp.broadcast_to(gt, (1, A, 4))
        scores = jnp.full((1, A, cfg.num_classes), 0.05)
        scores = scores.at[:, :, cls_id].set(0.9)
        gt_boxes = gt[None, None, :]
        gt_classes = jnp.asarray([[cls_id]], jnp.int32)
        gt_valid = jnp.asarray([[True]])
        return pts, pred_boxes, scores, gt_boxes, gt_classes, gt_valid

    def test_assigns_only_inside_topk(self):
        cfg = small_cfg()
        gt = jnp.asarray([8.0, 8.0, 40.0, 40.0])
        pts, pb, sc, gb, gc, gv = self._perfect_setup(cfg, gt, cls_id=3)
        fg, agt, tsc = task_aligned_assign(sc, pb, pts, gb, gc, gv, cfg)
        fg = np.asarray(fg[0])
        inside = np.asarray(
            (pts[:, 0] > 8) & (pts[:, 0] < 40) & (pts[:, 1] > 8) & (pts[:, 1] < 40)
        )
        assert fg.sum() > 0
        assert fg.sum() <= cfg.topk
        assert not np.any(fg & ~inside)  # never assigns outside the box
        # targets are one-hot on the gt class, soft-scaled
        t = np.asarray(tsc[0])
        assert np.all(t[~fg] == 0)
        assert np.all(t[fg][:, 3] > 0)
        assert np.all(t[fg][:, :3] == 0) and np.all(t[fg][:, 4:] == 0)

    def test_invalid_gt_assigns_nothing(self):
        cfg = small_cfg()
        gt = jnp.asarray([8.0, 8.0, 40.0, 40.0])
        pts, pb, sc, gb, gc, _ = self._perfect_setup(cfg, gt, cls_id=3)
        fg, _, tsc = task_aligned_assign(
            sc, pb, pts, gb, gc, jnp.asarray([[False]]), cfg
        )
        assert int(fg.sum()) == 0
        assert float(tsc.sum()) == 0.0

    def test_conflict_resolves_to_higher_iou_gt(self):
        """Two GTs overlapping the same anchors; predictions equal GT-0's
        box, so IoU(pred, GT0)=1 > IoU(pred, GT1) and contested anchors
        must all go to GT 0."""
        cfg = small_cfg()
        g0 = jnp.asarray([8.0, 8.0, 40.0, 40.0])
        g1 = jnp.asarray([10.0, 10.0, 44.0, 44.0])
        pts, _ = anchor_grid(cfg.img_size)
        A = pts.shape[0]
        pred_boxes = jnp.broadcast_to(g0, (1, A, 4))
        scores = jnp.full((1, A, cfg.num_classes), 0.9)
        gb = jnp.stack([g0, g1])[None]
        gc = jnp.asarray([[1, 2]], jnp.int32)
        gv = jnp.asarray([[True, True]])
        fg, agt, tsc = task_aligned_assign(scores, pred_boxes, pts, gb, gc, gv, cfg)
        fg0 = np.asarray(fg[0])
        agt0 = np.asarray(agt[0])
        # anchors inside both boxes (contested) all resolved to gt 0
        both = np.asarray(
            (pts[:, 0] > 10) & (pts[:, 0] < 40) & (pts[:, 1] > 10) & (pts[:, 1] < 40)
        )
        contested = fg0 & both
        assert contested.sum() > 0
        assert np.all(agt0[contested] == 0)


class TestDFL:
    def test_zero_loss_at_confident_correct_bins(self):
        reg_max = 8
        # target distance exactly 3.0 → all mass on bin 3 is optimal
        pred = jnp.full((1, 2, 4 * reg_max), -20.0)
        pred = pred.at[..., 3::reg_max].set(20.0)  # bin 3 of each side
        t = jnp.full((1, 2, 4), 3.0)
        loss = _dfl_loss(pred, t, reg_max)
        assert float(loss.max()) < 1e-3

    def test_loss_increases_with_distance(self):
        reg_max = 8
        pred = jnp.full((1, 1, 4 * reg_max), -20.0)
        pred = pred.at[..., 3::reg_max].set(20.0)
        near = _dfl_loss(pred, jnp.full((1, 1, 4), 3.4), reg_max)
        far = _dfl_loss(pred, jnp.full((1, 1, 4), 5.0), reg_max)
        assert float(far[0, 0]) > float(near[0, 0])


class TestDetectionLoss:
    def _head_outputs(self, cfg, batch=2, seed=0):
        rng = np.random.default_rng(seed)
        outs = []
        for s in (8, 16, 32):
            n = cfg.img_size // s
            outs.append(
                jnp.asarray(
                    rng.normal(
                        0, 0.1, (batch, n, n, 4 * cfg.reg_max + cfg.num_classes)
                    ).astype(np.float32)
                )
            )
        return outs

    def _targets(self, cfg, batch=2):
        gb = np.zeros((batch, 4, 4), np.float32)
        gc = np.zeros((batch, 4), np.int32)
        gv = np.zeros((batch, 4), bool)
        gb[:, 0] = (8, 8, 40, 40)
        gc[:, 0] = 2
        gv[:, 0] = True
        gb[:, 1] = (30, 10, 60, 50)
        gc[:, 1] = 5
        gv[:, 1] = True
        return jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(gv)

    def test_loss_finite_and_jits(self):
        cfg = small_cfg()
        outs = self._head_outputs(cfg)
        gb, gc, gv = self._targets(cfg)
        total, metrics = jax.jit(
            lambda o, b, c, v: yolo_detection_loss(o, b, c, v, cfg)
        )(outs, gb, gc, gv)
        assert np.isfinite(float(total))
        assert float(metrics["n_fg"]) > 0
        for k in ("box_loss", "cls_loss", "dfl_loss"):
            assert np.isfinite(float(metrics[k]))

    def test_no_gt_only_cls_loss(self):
        cfg = small_cfg()
        outs = self._head_outputs(cfg)
        gb, gc, gv = self._targets(cfg)
        gv = jnp.zeros_like(gv)
        total, metrics = yolo_detection_loss(outs, gb, gc, gv, cfg)
        assert float(metrics["n_fg"]) == 0
        assert float(metrics["box_loss"]) == 0.0
        assert float(metrics["dfl_loss"]) == 0.0
        assert np.isfinite(float(total))

    def test_gradients_flow_and_are_finite(self):
        cfg = small_cfg()
        outs = self._head_outputs(cfg)
        gb, gc, gv = self._targets(cfg)

        def f(outs):
            return yolo_detection_loss(outs, gb, gc, gv, cfg)[0]

        grads = jax.grad(f)(outs)
        gmax = max(float(jnp.abs(g).max()) for g in grads)
        assert np.isfinite(gmax) and gmax > 0


@pytest.mark.slow
class TestTrainStepLearns:
    def test_loss_decreases_on_tiny_model(self):
        """Nano model @64² with two fixed boxes: a dozen AdamW steps must
        cut the detection loss — pins the full differentiated path
        (model → DFL decode → TAL → three loss heads → grads)."""
        from circuitvision_tpu.models.yolo.model import YOLOv11, init_params
        from circuitvision_tpu.train.yolo_train import (
            make_yolo_optimizer,
            make_yolo_train_step,
            targets_from_boxes,
        )
        from circuitvision_tpu.core.types import BBox

        cfg = small_cfg(img_size=64, num_classes=8, reg_max=8)
        model = YOLOv11(num_classes=8, scale="n", reg_max=8)
        params = init_params(model, jax.random.PRNGKey(0), img_size=64)
        tx = make_yolo_optimizer(2e-3)
        opt = tx.init(params)
        step = jax.jit(make_yolo_train_step(model, tx, cfg))

        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        boxes = [
            [BBox("a", 0.9, 8, 8, 40, 40, class_id=2)],
            [BBox("b", 0.9, 20, 16, 56, 48, class_id=5)],
        ]
        gb, gc, gv = targets_from_boxes(boxes, max_gt=4, class_to_id={"a": 2, "b": 5})

        first = last = None
        for i in range(12):
            params, opt, metrics = step(params, opt, images, gb, gc, gv)
            if first is None:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert last < first, (first, last)

    def test_nonfinite_batch_is_skipped_not_poisoning(self):
        """A NaN batch must not poison the parameters: clipping alone
        passes NaN through (NaN global norm → NaN scale → every leaf
        NaN, observed as the fg=0/loss=0 collapse mid-run); the
        apply_if_finite wrapper skips the update and recovers on the
        next clean batch."""
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.models.yolo.model import YOLOv11, init_params
        from circuitvision_tpu.train.yolo_train import (
            make_yolo_optimizer,
            make_yolo_train_step,
            targets_from_boxes,
        )

        cfg = small_cfg(img_size=64, num_classes=8, reg_max=8)
        model = YOLOv11(num_classes=8, scale="n", reg_max=8)
        params = init_params(model, jax.random.PRNGKey(0), img_size=64)
        tx = make_yolo_optimizer(2e-3)
        opt = tx.init(params)
        step = jax.jit(make_yolo_train_step(model, tx, cfg))

        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        gb, gc, gv = targets_from_boxes(
            [[BBox("a", 0.9, 8, 8, 40, 40, class_id=2)], []],
            max_gt=4, class_to_id={"a": 2},
        )
        params, opt, _ = step(params, opt, images, gb, gc, gv)
        assert int(opt.notfinite_count) == 0

        poisoned = images.at[0, 0, 0, 0].set(jnp.nan)
        params2, opt, _ = step(params, opt, poisoned, gb, gc, gv)
        assert int(opt.notfinite_count) == 1
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            assert bool(jnp.array_equal(a, b)), "poisoned update applied"

        params3, opt, metrics = step(params2, opt, images, gb, gc, gv)
        assert int(opt.notfinite_count) == 0  # reset on recovery
        assert np.isfinite(float(metrics["loss"]))
        assert any(
            not bool(jnp.array_equal(a, b))
            for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(params3))
        ), "clean update after a skipped batch did not apply"

    def test_targets_from_boxes_padding(self):
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.train.yolo_train import targets_from_boxes

        boxes = [[BBox("resistor", 0.9, 1, 2, 3, 4)], []]
        gb, gc, gv = targets_from_boxes(boxes, max_gt=3)
        assert gb.shape == (2, 3, 4)
        assert bool(gv[0, 0]) and not bool(gv[0, 1]) and not bool(gv[1, 0])
        np.testing.assert_allclose(np.asarray(gb[0, 0]), [1, 2, 3, 4])
