"""Smoke tests: each wired method branch trains one step with finite losses
(the reference methods LSM, RSC, MixStyle, DSU, RandConv —
train_adv…:201-427)."""

import jax
import numpy as np
import pytest

from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train_step import make_train_step
from tests.test_train_step import small_config, synthetic_batch

pytestmark = pytest.mark.slow  # heavy compile; excluded from `make test-fast`


@pytest.mark.parametrize("flag,channel", [
    ("latent_DA", "loss/hard/total"),
    ("RSC", "loss/hard/RSC"),
    ("mix_style", "loss/hard/mix_style"),
    ("DSU", "loss/hard/DSU"),
    ("rand_conv", "loss/hard/rand_conv"),
    ("adv_noise", "loss/hard/adv_noise"),
    ("adv_bias", "loss/hard/adv_bias"),
])
def test_branch_step_finite(flag, channel):
    cfg = small_config(**{flag: True})
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
    step = make_train_step(solver)
    batch = synthetic_batch(jax.random.key(1))
    state, metrics = step(state, batch, jax.random.key(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics[channel]) != 0.0, f"{channel} should be non-zero"
