"""Data-parallel trainer loop on the 8-virtual-CPU mesh: the full
train_network path with --data_parallel semantics."""

import jax
import numpy as np
import pytest

from maxstyle_tpu.data.datasets import build_general_dataset
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train import train_network
from tests.test_data import make_synthetic_site
from tests.test_end_to_end import tiny_config

pytestmark = pytest.mark.slow  # heavy compile; excluded from `make test-fast`


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_train_network(tmp_path):
    import dataclasses
    cfg = tiny_config()
    # batch 8 halves to 4 raw slices/step with keep_orig; 4 doesn't divide 8
    # devices, so use keep_orig batch 16 -> raw 8
    cfg = dataclasses.replace(cfg, learning=dataclasses.replace(
        cfg.learning, batch_size=16, n_epochs=1))
    solver = TripletSegmentationSolver(cfg)
    root = make_synthetic_site(str(tmp_path / "site"), n_patients=4,
                               shape=(4, 40, 40))
    ds = build_general_dataset(root, "{pid}/img.nii.gz", "{pid}/seg.nii.gz",
                               pad_hw=(40, 40), crop_hw=(32, 32))
    state, best = train_network(
        "dp", solver, ds, ds, cfg, model_dir=str(tmp_path / "model"),
        seed=0, max_epochs=1, data_parallel=True)
    assert np.isfinite(best)
