"""Inference CLI smoke test."""

import os

import pytest

from tests.test_data import make_synthetic_site


def test_infer_cli(tmp_path):
    from maxstyle_tpu import infer
    root = make_synthetic_site(str(tmp_path / "site"), n_patients=2,
                               shape=(3, 32, 32))
    out_dir = str(tmp_path / "preds")
    infer.main(["--input_dir", root, "--image_format", "{pid}/img.nii.gz",
                "--label_format", "{pid}/seg.nii.gz",
                "--out_dir", out_dir, "--chunk", "4", "--crop", "32", "32",
                "--uncertainty", "--keep_largest_cc"])
    files = os.listdir(out_dir)
    assert sum(f.endswith("_pred.nrrd") for f in files) == 2
    assert sum(f.endswith("_entropy.nrrd") for f in files) == 2
    from maxstyle_tpu.data import medio
    pred, _ = medio.read_nrrd(os.path.join(
        out_dir, [f for f in files if f.endswith("_pred.nrrd")][0]))
    assert pred.shape == (3, 32, 32)


def test_infer_cli_data_parallel(tmp_path):
    """--data_parallel shards chunks over the 8-device CPU mesh and matches
    the single-device predictions bit-for-bit."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import numpy as np
    from maxstyle_tpu import infer
    from maxstyle_tpu.data import medio
    root = make_synthetic_site(str(tmp_path / "site"), n_patients=1,
                               shape=(5, 32, 32))
    out_a = str(tmp_path / "preds_single")
    out_b = str(tmp_path / "preds_dp")
    common = ["--input_dir", root, "--image_format", "{pid}/img.nii.gz",
              "--label_format", "{pid}/seg.nii.gz", "--chunk", "4",
              "--crop", "32", "32"]
    infer.main(common + ["--out_dir", out_a])
    infer.main(common + ["--out_dir", out_b, "--data_parallel"])
    fa = [f for f in os.listdir(out_a) if f.endswith("_pred.nrrd")][0]
    pa, _ = medio.read_nrrd(os.path.join(out_a, fa))
    pb, _ = medio.read_nrrd(os.path.join(out_b, fa))
    np.testing.assert_array_equal(pa, pb)
