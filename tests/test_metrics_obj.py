"""Object-wise metrics (measure.py obj_* family) + HD95 score column."""

import numpy as np
import pytest

from maxstyle_tpu import metrics as M


def _two_blobs():
    """GT: two separated squares; pred: hits one, adds a spurious blob."""
    gt = np.zeros((32, 32), bool)
    gt[4:10, 4:10] = True
    gt[20:26, 20:26] = True
    pred = np.zeros((32, 32), bool)
    pred[5:11, 5:11] = True      # overlaps GT blob 1
    pred[14:17, 2:5] = True      # false positive, overlaps nothing
    return pred, gt


class TestObjectMetrics:
    def test_tpr_counts_matched_over_result_objects(self):
        pred, gt = _two_blobs()
        # 1 matched pair; pred has 2 objects -> tpr = 1/2 (measure.obj_tpr
        # divides by distinct result objects)
        assert M.obj_tpr(pred, gt) == pytest.approx(0.5)

    def test_fpr_counts_unmatched_reference_objects(self):
        pred, gt = _two_blobs()
        # gt has 2 objects, 1 matched -> fpr = 1/2 (measure.obj_fpr divides
        # by distinct reference objects)
        assert M.obj_fpr(pred, gt) == pytest.approx(0.5)

    def test_perfect_prediction(self):
        _, gt = _two_blobs()
        assert M.obj_tpr(gt, gt) == 1.0
        assert M.obj_fpr(gt, gt) == 0.0
        assert M.obj_asd(gt, gt) == 0.0
        assert M.obj_assd(gt, gt) == 0.0

    def test_obj_asd_ignores_unmatched_objects(self):
        pred, gt = _two_blobs()
        # only the matched pair (1-voxel diagonal shift) contributes; the
        # spurious blob and the missed GT blob do not explode the distance
        v = M.obj_asd(pred, gt)
        assert 0.0 < v < 2.0

    def test_obj_asd_respects_spacing(self):
        pred, gt = _two_blobs()
        a1 = M.obj_asd(pred, gt, voxelspacing=(1.0, 1.0))
        a2 = M.obj_asd(pred, gt, voxelspacing=(2.0, 2.0))
        assert a2 == pytest.approx(2.0 * a1, rel=1e-6)

    def test_empty_inputs_raise(self):
        z = np.zeros((8, 8), bool)
        o = np.ones((8, 8), bool)
        with pytest.raises(RuntimeError):
            M.obj_tpr(z, o)
        with pytest.raises(RuntimeError):
            M.obj_fpr(o, z)

    def test_one_to_many_resolution(self):
        # one big GT object overlapped by two pred objects: only one counts
        gt = np.zeros((16, 16), bool)
        gt[2:14, 2:14] = True
        pred = np.zeros((16, 16), bool)
        pred[3:6, 3:13] = True
        pred[9:12, 3:13] = True
        assert M.obj_tpr(pred, gt) == pytest.approx(0.5)  # 1 match / 2 objs
        assert M.obj_fpr(pred, gt) == pytest.approx(0.0)  # GT object matched


class TestHD95Column:
    def test_segmentation_score_hd95(self):
        score = M.SegmentationScore(2, ["fg"], ("Dice", "HD95", "ASD"))
        gt = np.zeros((4, 16, 16), np.int32)
        gt[:, 4:12, 4:12] = 1
        pred = np.zeros_like(gt)
        pred[:, 5:13, 5:13] = 1
        score.update("p1", pred, gt, voxel_spacing=(5.0, 1.0, 1.0))
        cols, means, stds = score.summary()
        assert cols == ["fg_Dice", "fg_HD95", "fg_ASD"]
        assert all(np.isfinite(means))
        assert means[1] > 0  # HD95 of a shifted square is positive
