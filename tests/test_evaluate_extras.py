"""Evaluation harness extras: prediction dumps, top-k selection, subset
sampling, multi-metric reporting."""

import os

import jax
import numpy as np
import pytest

from maxstyle_tpu.data.datasets import build_general_dataset
from maxstyle_tpu.evaluate import TestSegmentationNetwork
from maxstyle_tpu.solver import TripletSegmentationSolver
from tests.test_data import make_synthetic_site
from tests.test_end_to_end import tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval") / "site"
    make_synthetic_site(str(root), n_patients=4, shape=(5, 40, 40))
    ds = build_general_dataset(str(root), "{pid}/img.nii.gz",
                               "{pid}/seg.nii.gz", pad_hw=(40, 40),
                               crop_hw=(32, 32))
    cfg = tiny_config()
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(0), (32, 32), batch_size=2)
    return solver, state, ds


def test_save_predictions_nrrd(setup, tmp_path):
    solver, state, ds = setup
    h = TestSegmentationNetwork(solver, state, ds, maximum_batch_size=3,
                                save_report_dir=str(tmp_path / "rep"),
                                save_predict=True,
                                class_names=["a", "b", "c"])
    h.run()
    dumps = [f for f in os.listdir(str(tmp_path / "rep"))
             if f.endswith("_pred.nrrd")]
    assert len(dumps) == 4
    from maxstyle_tpu.data import medio
    vol, spacing = medio.read_nrrd(os.path.join(str(tmp_path / "rep"), dumps[0]))
    assert vol.shape == (5, 32, 32)


def test_top_k_and_worst_k(setup):
    solver, state, ds = setup
    h = TestSegmentationNetwork(solver, state, ds, maximum_batch_size=5,
                                class_names=["a", "b", "c"])
    h.run()
    best = h.top_k(2)
    worst = h.top_k(2, worst=True)
    assert len(best) == 2 and len(worst) == 2


def test_subset_ratio(setup):
    solver, state, ds = setup
    h = TestSegmentationNetwork(solver, state, ds, maximum_batch_size=5,
                                test_set_ratio=0.5,
                                class_names=["a", "b", "c"])
    h.run()
    assert len(h.per_patient) == 2


def test_multi_metric_summary(setup):
    solver, state, ds = setup
    h = TestSegmentationNetwork(solver, state, ds, maximum_batch_size=5,
                                metrics_list=("Dice", "HD", "ASD", "VS"),
                                class_names=["a", "b", "c"])
    means, stds = h.run()
    assert len(means) == 3 * 4
    assert all(np.isfinite(m) for m in means)
