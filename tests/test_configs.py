"""Shipped experiment configs parse and build solvers."""

import glob
import os

import pytest

from maxstyle_tpu.config import ExperimentConfig
from maxstyle_tpu.solver import TripletSegmentationSolver

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "configs", "**", "*.json"),
                           recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses_and_builds(path):
    cfg = ExperimentConfig.from_json(path)
    solver = TripletSegmentationSolver(cfg)
    assert solver.num_classes == cfg.segmentation_model.num_classes
    assert cfg.crop_hw == (192, 192)
    if "maxstyle" in path:
        assert cfg.learning.max_style
        assert cfg.max_style.n_iter == 5
        assert cfg.max_style.decoder_layers_indexes == (3, 4, 5)
    if "lsm" in path:
        assert cfg.learning.latent_DA
        assert cfg.latent_DA.image_code.loss_name == "mse"
        assert cfg.latent_DA.shape_code.loss_name == "ce"


def test_configs_exist():
    assert len(CONFIGS) >= 4
