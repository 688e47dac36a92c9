"""Tests for medical IO, split policies, datasets, and metrics."""

import os

import numpy as np
import pytest

from maxstyle_tpu import metrics
from maxstyle_tpu.data import medio
from maxstyle_tpu.data.datasets import (HostBatchLoader, SliceDataset,
                                        build_general_dataset, remap_labels)
from maxstyle_tpu.data.splits import (ACDC_TEST_PATIENTS, acdc_split,
                                      prostate_split)


class TestMedIO:
    @pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
    def test_nifti_roundtrip(self, tmp_path, ext):
        vol = np.random.RandomState(0).rand(5, 16, 18).astype(np.float32)
        path = str(tmp_path / f"vol{ext}")
        medio.write_nifti(path, vol, spacing=(1.25, 1.5, 8.0))
        back, spacing = medio.read_nifti(path)
        np.testing.assert_allclose(back, vol, atol=1e-6)
        np.testing.assert_allclose(spacing, (1.25, 1.5, 8.0), rtol=1e-5)

    @pytest.mark.parametrize("compress", [True, False])
    def test_nrrd_roundtrip(self, tmp_path, compress):
        vol = (np.random.RandomState(0).rand(4, 10, 12) * 4).astype(np.int16)
        path = str(tmp_path / "vol.nrrd")
        medio.write_nrrd(path, vol, spacing=(1.37, 1.37, 10.0), compress=compress)
        back, spacing = medio.read_nrrd(path)
        np.testing.assert_array_equal(back, vol)
        np.testing.assert_allclose(spacing, (1.37, 1.37, 10.0), rtol=1e-5)

    def test_resample_changes_inplane_size(self):
        vol = np.ones((3, 20, 20), np.float32)
        out, sp = medio.resample_by_spacing(vol, (1.0, 1.0, 5.0),
                                            (2.0, 2.0, -1))
        assert out.shape == (3, 10, 10)
        np.testing.assert_allclose(sp, (2.0, 2.0, 5.0))

    def test_crop_or_pad(self):
        vol = np.arange(2 * 6 * 6, dtype=np.float32).reshape(2, 6, 6)
        bigger = medio.crop_or_pad(vol, (8, 8))
        assert bigger.shape == (2, 8, 8)
        np.testing.assert_allclose(bigger[:, 1:7, 1:7], vol)
        smaller = medio.crop_or_pad(vol, (4, 4))
        np.testing.assert_allclose(smaller, vol[:, 1:5, 1:5])


class TestSplits:
    def test_acdc_standard_sizes(self):
        p = acdc_split("standard", 0)
        assert len(p["train"]) == 70
        assert len(p["validate"]) == 10
        assert len(p["test"]) == 20
        assert not set(p["train"]) & set(p["test"])
        assert not set(p["train"]) & set(p["validate"])

    def test_acdc_numeric_setting(self):
        p = acdc_split("10", 0)
        assert len(p["train"]) == 10
        p2 = acdc_split("10", 1)
        assert p["train"] != p2["train"]  # cval changes the draw

    def test_acdc_shot_settings(self):
        assert len(acdc_split("one_shot", 0)["train"]) == 1
        assert len(acdc_split("three_shot", 2)["train"]) == 3
        p = acdc_split("three_shot_upperbound", 2)
        assert len(p["train"]) == 3 + 25

    def test_acdc_deterministic(self):
        assert acdc_split("10", 3)["train"] == acdc_split("10", 3)["train"]

    def test_prostate_split(self):
        ids = [f"patient_{i}" for i in range(32)]
        p = prostate_split(ids, "all", 0)
        assert len(p["test"]) == 7
        assert not set(p["train"]) & set(p["test"])
        assert not set(p["validate"]) & set(p["test"])


def make_synthetic_site(root, n_patients=3, shape=(4, 32, 32), seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n_patients):
        pid = f"case{i:02d}"
        os.makedirs(os.path.join(root, pid), exist_ok=True)
        img = rng.rand(*shape).astype(np.float32)
        lab = np.zeros(shape, np.int16)
        lab[:, 8:24, 8:24] = rng.randint(1, 4)
        if i == n_patients - 1:
            lab[0] = 0  # one black slice
        medio.write_nifti(os.path.join(root, pid, "img.nii.gz"), img,
                          spacing=(1.0, 1.0, 5.0))
        medio.write_nifti(os.path.join(root, pid, "seg.nii.gz"), lab,
                          spacing=(1.0, 1.0, 5.0))
    return root


class TestSliceDataset:
    def test_scan_excludes_black_slices(self, tmp_path):
        root = make_synthetic_site(str(tmp_path / "site"))
        ds = SliceDataset(root, ["case00", "case01", "case02"],
                          "{pid}/img.nii.gz", "{pid}/seg.nii.gz",
                          pad_hw=(40, 40), crop_hw=(32, 32))
        assert len(ds.patient_ids) == 3
        assert len(ds) == 3 * 4 - 1  # one black slice dropped

    def test_raw_slice_shapes(self, tmp_path):
        root = make_synthetic_site(str(tmp_path / "site"))
        ds = SliceDataset(root, ["case00"], "{pid}/img.nii.gz",
                          "{pid}/seg.nii.gz", pad_hw=(40, 40), crop_hw=(32, 32))
        img, lab, pid = ds.get_raw_slice(0)
        assert img.shape == (40, 40) and lab.shape == (40, 40)
        assert pid == "case00"

    def test_patient_volume_normalized(self, tmp_path):
        root = make_synthetic_site(str(tmp_path / "site"))
        ds = SliceDataset(root, ["case00"], "{pid}/img.nii.gz",
                          "{pid}/seg.nii.gz", pad_hw=(40, 40), crop_hw=(32, 32))
        vol, lab, spacing = ds.get_patient_volume("case00")
        assert vol.shape == (4, 32, 32)
        assert abs(float(vol[0].max()) - 1.0) < 1e-5

    def test_loader_batches(self, tmp_path):
        root = make_synthetic_site(str(tmp_path / "site"))
        ds = build_general_dataset(root, "{pid}/img.nii.gz", "{pid}/seg.nii.gz",
                                   pad_hw=(40, 40), crop_hw=(32, 32))
        loader = HostBatchLoader(ds, batch_size=4, seed=0)
        batches = list(loader)
        assert len(batches) == len(ds) // 4
        assert batches[0]["image"].shape == (4, 40, 40)
        assert batches[0]["label"].dtype == np.int32

    def test_remap_labels(self):
        lab = np.array([[0, 1, 2, 3]])
        np.testing.assert_array_equal(remap_labels(lab, binary=True),
                                      [[0, 1, 1, 1]])
        np.testing.assert_array_equal(remap_labels(lab, myocardium_only=True),
                                      [[0, 0, 1, 0]])
        np.testing.assert_array_equal(
            remap_labels(lab, label_map={1: 3, 3: 1, 2: 2}), [[0, 3, 2, 1]])


class TestMetrics:
    def test_running_score_perfect(self):
        rs = metrics.RunningScore(3)
        lab = np.random.RandomState(0).randint(0, 3, (2, 8, 8))
        rs.update(lab, lab)
        s = rs.get_scores()
        assert abs(s["Mean IoU : \t"] - 1.0) < 1e-9

    def test_dice_known_value(self):
        a = np.zeros((8, 8), bool)
        b = np.zeros((8, 8), bool)
        a[:4] = True     # 32 px
        b[2:6] = True    # 32 px, overlap 16
        assert abs(metrics.dice(a, b) - 0.5) < 1e-9

    def test_hausdorff_translation(self):
        a = np.zeros((16, 16), bool)
        b = np.zeros((16, 16), bool)
        a[4:8, 4:8] = True
        b[4:8, 7:11] = True  # shifted 3 right
        assert abs(metrics.hausdorff_distance(a, b) - 3.0) < 1e-9

    def test_asd_identical_zero(self):
        a = np.zeros((16, 16), bool)
        a[4:10, 4:10] = True
        assert metrics.asd(a, a) == 0.0

    def test_voxelspacing_scales_distances(self):
        a = np.zeros((16, 16), bool)
        b = np.zeros((16, 16), bool)
        a[4:8, 4:8] = True
        b[4:8, 7:11] = True
        d = metrics.hausdorff_distance(a, b, voxelspacing=(1.0, 2.0))
        assert abs(d - 6.0) < 1e-9

    def test_segmentation_score_summary(self):
        ss = metrics.SegmentationScore(4, ["LV", "MYO", "RV"],
                                       metrics_list=("Dice", "HD", "ASD"))
        gt = np.zeros((3, 16, 16), np.int32)
        gt[:, 4:10, 4:10] = 1
        gt[:, 10:14, 4:8] = 2
        ss.update("p0", gt, gt, voxel_spacing=(1.0, 1.0, 5.0))
        cols, means, stds = ss.summary()
        assert "LV_Dice" in cols
        assert means[cols.index("LV_Dice")] == 1.0
        assert means[cols.index("MYO_HD")] == 0.0

    def test_keep_largest_cc(self):
        from maxstyle_tpu.utils.postprocess import keep_largest_connected_components
        seg = np.zeros((16, 16), np.int32)
        seg[2:10, 2:10] = 1      # big component
        seg[13:15, 13:15] = 1    # small component
        out = keep_largest_connected_components(seg)
        assert out[3, 3] == 1 and out[13, 13] == 0


def test_artefacts_cli(tmp_path):
    """python -m maxstyle_tpu.data.artefacts writes corrupted copies for
    each artefact family (generate_artefacted_data.py CLI parity)."""
    import os

    from maxstyle_tpu.data import artefacts
    root = make_synthetic_site(str(tmp_path / "site"), n_patients=1,
                               shape=(3, 32, 32))
    out = str(tmp_path / "artefacted")
    artefacts.main(["--root_dir", root, "--out_root", out,
                    "--artefact", "RandomMotion", "--crop", "32", "32",
                    "--repeats", "2"])
    pids = os.listdir(os.path.join(out, "RandomMotion"))
    assert len(pids) == 2
    for pid in pids:
        assert os.path.exists(os.path.join(out, "RandomMotion", pid, "img.nii.gz"))
        assert os.path.exists(os.path.join(out, "RandomMotion", pid, "seg.nii.gz"))


def test_preprocess_cli(tmp_path):
    """ACDC offline preprocessing CLI (acdc_preprocess.py parity): resample
    to target spacing, percentile-normalize, optional LV/RV swap, write
    per-frame NRRD pairs."""
    import numpy as np

    from maxstyle_tpu.data import medio, preprocess

    src = tmp_path / "raw" / "patient001"
    src.mkdir(parents=True)
    rng = np.random.RandomState(0)
    img = (rng.rand(4, 24, 24) * 500).astype(np.float32)
    lab = rng.randint(0, 4, (4, 24, 24)).astype(np.uint8)
    for frame in ("ED", "ES"):
        medio.write_nifti(str(src / f"{frame}_img.nii.gz"), img,
                          spacing=(1.0, 1.0, 5.0))
        medio.write_nifti(str(src / f"{frame}_seg.nii.gz"), lab,
                          spacing=(1.0, 1.0, 5.0))

    out = str(tmp_path / "prep")
    preprocess.main(["--src", str(tmp_path / "raw"), "--out", out,
                     "--swap_lv_rv"])
    for frame in ("ED", "ES"):
        pimg, spacing = medio.read_nrrd(
            os.path.join(out, frame, "patient001_img.nrrd"))
        plab, _ = medio.read_nrrd(
            os.path.join(out, frame, "patient001_seg.nrrd"))
        assert pimg.shape == plab.shape
        # resampled in-plane to ~1.367mm: 24 * 1.0/1.367 ~ 17-18 px
        assert pimg.shape[1] < 24
        assert 0.0 <= pimg.min() and pimg.max() <= 1.0  # percentile norm
        # LV/RV swap permutes labels {1,3}; the label set stays {0..3}
        assert set(np.unique(plab)) <= {0, 1, 2, 3}
