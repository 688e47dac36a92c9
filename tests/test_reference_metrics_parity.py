"""Metrics-layer parity against the reference's OWN executable code.

Pins our metrics (maxstyle_tpu/metrics.py — vectorized scipy) and the full
PairwiseMeasures m_dict (utils/pairwise_measures.py) against the reference's
vendored measure.py / hausdorff_util.py running on this host
(tests/reference_shim.py). Same binary masks, same voxel spacings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # the shim needs the torch stack

from maxstyle_tpu import metrics as our  # noqa: E402
from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def measure():
    from tests.reference_shim import reference_module
    return reference_module("src.common_utils.measure")


@pytest.fixture(scope="module")
def hu():
    from tests.reference_shim import reference_module
    return reference_module("src.common_utils.hausdorff_util")


def make_masks(seed=0, shape=(12, 40, 40), n_blobs=3):
    """Overlapping random blobby masks with multiple components."""
    rng = np.random.RandomState(seed)
    ref = np.zeros(shape, bool)
    seg = np.zeros(shape, bool)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    for _ in range(n_blobs):
        cz, cy, cx = (rng.rand(3) * np.asarray(shape)).astype(int)
        r = 3 + rng.rand() * 6
        ref |= ((zz - cz) ** 2 * 4 + (yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
        dz, dy, dx = rng.randint(-3, 4, 3)
        seg |= (((zz - cz - dz) ** 2 * 4 + (yy - cy - dy) ** 2
                 + (xx - cx - dx) ** 2) < (r + rng.randint(-1, 2)) ** 2)
    return ref, seg


SPACING = (3.6, 1.25, 1.25)


class TestMeasureFunctions:
    """measure.py (vendored-medpy) vs maxstyle_tpu/metrics.py."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_overlap_family(self, measure, seed):
        ref, seg = make_masks(seed)
        assert our.dice(seg, ref) == pytest.approx(measure.dc(seg, ref))
        assert our.jaccard(seg, ref) == pytest.approx(measure.jc(seg, ref))
        assert our.precision(seg, ref) == pytest.approx(
            measure.precision(seg, ref))
        assert our.recall(seg, ref) == pytest.approx(measure.recall(seg, ref))
        assert our.specificity(seg, ref) == pytest.approx(
            measure.specificity(seg, ref))
        assert our.ravd(seg, ref) == pytest.approx(measure.ravd(seg, ref))

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("spacing", [None, SPACING])
    def test_surface_family(self, measure, seed, spacing):
        ref, seg = make_masks(seed)
        assert our.hausdorff_distance(seg, ref, spacing) == pytest.approx(
            measure.hd(seg, ref, voxelspacing=spacing))
        assert our.asd(seg, ref, spacing) == pytest.approx(
            measure.asd(seg, ref, voxelspacing=spacing))
        assert our.assd(seg, ref, spacing) == pytest.approx(
            measure.assd(seg, ref, voxelspacing=spacing))

    def test_hd_2d_stack(self, measure):
        # NOTE: the reference's hd_2D_stack is a MEAN over valid slices
        # (measure.py:381-399), despite the "stack HD" name
        ref, seg = make_masks(4)
        assert our.hd_2d_stack(seg, ref, SPACING[1:]) == pytest.approx(
            measure.hd_2D_stack(seg, ref, pixelspacing=SPACING[1:]))

    def test_volume_similarity(self, measure):
        ref, seg = make_masks(5)
        # the reference has two variants; ours matches VolumeSimIndex
        # (2|A-B|/(A+B) complement), used by runningMySegmentationScore
        assert our.volume_similarity(seg, ref) == pytest.approx(
            measure.VolumeSimIndex(seg, ref))

    @pytest.mark.parametrize("connectivity", [1, 2])
    def test_object_family(self, measure, connectivity):
        ref, seg = make_masks(6)
        assert our.obj_tpr(seg, ref, connectivity) == pytest.approx(
            measure.obj_tpr(seg, ref, connectivity))
        assert our.obj_fpr(seg, ref, connectivity) == pytest.approx(
            measure.obj_fpr(seg, ref, connectivity))
        # the reference's obj_asd/obj_assd are py2 dead code on this
        # interpreter (dict.iteritems(), measure.py:913) — pin the breakage;
        # ours are validated by golden tests (test_metrics_obj.py)
        with pytest.raises(AttributeError):
            measure.obj_asd(seg, ref, connectivity=connectivity)
        assert np.isfinite(our.obj_asd(seg, ref, connectivity=connectivity))
        assert np.isfinite(our.obj_assd(seg, ref, connectivity=connectivity))


class TestPairwiseMeasures:
    """hausdorff_util.PairwiseMeasures full m_dict vs ours, measure by
    measure on identical masks."""

    # every reference m_dict key except com_ref/com_seg/list_labels
    # (tuple-valued; compared separately below). Our hd95 is an extension:
    # the reference's vendored niftynet copy dropped it.
    MEASURES = ["ref volume", "seg volume", "ref bg volume", "seg bg volume",
                "fp", "fn", "tp", "tn", "n_intersection", "n_union",
                "sensitivity", "specificity", "accuracy", "fpr", "ppv",
                "npv", "dice", "IoU", "jaccard", "informedness",
                "markedness", "vol_diff", "ave_dist", "haus_dist",
                "connected_elements", "outline_error", "detection_error",
                "com_dist"]

    @pytest.mark.parametrize("pixdim", [(1.0, 1.0, 1.0), SPACING])
    def test_m_dict_parity(self, hu, pixdim):
        ref, seg = make_masks(7, shape=(8, 32, 32))
        theirs = hu.PairwiseMeasures(seg_img=seg.astype(np.int8),
                                     ref_img=ref.astype(np.int8),
                                     measures=self.MEASURES,
                                     pixdim=list(pixdim))
        ours = PairwiseMeasures(seg, ref, measures=self.MEASURES,
                                pixdim=pixdim)
        for m in self.MEASURES:
            ref_val = theirs.m_dict[m][0]()
            our_val = ours.m_dict[m][0]()
            np.testing.assert_allclose(
                np.asarray(our_val, dtype=np.float64),
                np.asarray(ref_val, dtype=np.float64),
                rtol=1e-6, atol=1e-9, err_msg=f"measure {m}")

    def test_com_tuples(self, hu):
        ref, seg = make_masks(8, shape=(8, 32, 32))
        theirs = hu.PairwiseMeasures(seg_img=seg.astype(np.int8),
                                     ref_img=ref.astype(np.int8),
                                     pixdim=list(SPACING))
        ours = PairwiseMeasures(seg, ref, pixdim=SPACING)
        np.testing.assert_allclose(np.asarray(ours.com_ref()),
                                   np.asarray(theirs.com_ref()), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.com_seg()),
                                   np.asarray(theirs.com_seg()), rtol=1e-6)
