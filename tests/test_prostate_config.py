"""Binary (prostate) MaxStyle configuration through the full train step —
locks the C=1 style hook, always_use_beta sampling, and 2-class losses."""

import dataclasses

import jax
import numpy as np

from maxstyle_tpu.config import (DataConfig, ExperimentConfig, LearningConfig,
                                 MaxStyleConfig, SegmentationModelConfig)
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train_step import make_train_step
import pytest

pytestmark = pytest.mark.slow  # heavy compile; excluded from `make test-fast`


def test_binary_maxstyle_step():
    cfg = ExperimentConfig(
        data=DataConfig(dataset_name="Prostate", crop_size=(64, 64, 1),
                        num_classes=2),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN", num_classes=2),
        learning=LearningConfig(lr=1e-4, batch_size=4, optimizer_type="AdamW",
                                max_style=True),
        max_style=MaxStyleConfig(n_iter=2, decoder_layers_indexes=(3, 4, 5),
                                 always_use_beta=True),
    )
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
    step = make_train_step(solver)
    batch = {
        "image": jax.numpy.clip(
            jax.random.normal(jax.random.key(1), (4, 64, 64, 1)) * 0.2 + 0.5,
            0, 1),
        "label": jax.random.randint(jax.random.key(2), (4, 64, 64), 0, 2),
    }
    state, metrics = step(state, batch, jax.random.key(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["loss/hard/total"]) != 0.0
