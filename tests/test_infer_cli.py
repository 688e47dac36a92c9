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
