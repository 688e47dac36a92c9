"""Tests for the plain single-network solver + DS_FCN two-domain training +
seed determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.basic_solver import SegmentationModel
from tests.test_train_step import small_config, synthetic_batch


class TestSegmentationModel:
    @pytest.mark.parametrize("net", ["UNet_16", "FCN_16", "ResUNet_16"])
    def test_train_step_decreases_loss(self, net):
        model = SegmentationModel(network_type=net, num_classes=4, lr=1e-3)
        state = model.init_state(jax.random.key(0), (32, 32), batch_size=4)
        step = model.make_train_step()
        batch = synthetic_batch(jax.random.key(1), n=4, hw=32)
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_ema_teacher_tracks_student(self):
        model = SegmentationModel(network_type="UNet_16", use_ema=True,
                                  ema_decay=0.5, lr=1e-2)
        state = model.init_state(jax.random.key(0), (32, 32), batch_size=2)
        step = model.make_train_step()
        batch = synthetic_batch(jax.random.key(1), n=2, hw=32)
        state, _ = step(state, batch, jax.random.key(2))
        diffs = jax.tree_util.tree_map(
            lambda e, p: float(jnp.max(jnp.abs(e - p))),
            state.ema_params, state.params)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0  # lags behind
        pred = model.predict(state, batch["image"], use_ema=True)
        assert pred.shape == (2, 32, 32, 4)


@pytest.mark.slow
class TestDomainSpecific:
    def test_ds_fcn_maxstyle_step(self):
        """DS_FCN: hard-example pass trains domain-1 BN stats while the
        standard pass trains domain-0 (advanced_triplet…:860-865)."""
        import dataclasses
        from maxstyle_tpu.solver import TripletSegmentationSolver
        from maxstyle_tpu.train_step import make_train_step
        cfg = small_config(max_style=True)
        cfg = dataclasses.replace(
            cfg, segmentation_model=dataclasses.replace(
                cfg.segmentation_model, network_type="DS_FCN_16_standard"))
        solver = TripletSegmentationSolver(cfg)
        assert solver.spec.num_domains == 2
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        step = make_train_step(solver)
        batch = synthetic_batch(jax.random.key(1))
        before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        state2, metrics = step(state, batch, jax.random.key(2))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # both domains' encoder BN stats must have moved
        flat_before = jax.tree_util.tree_leaves_with_path(before)
        after = state2.batch_stats
        flat_after = {jax.tree_util.keystr(p): v for p, v in
                      jax.tree_util.tree_leaves_with_path(after)}
        moved = {0: False, 1: False}
        for path, b in flat_before:
            key = jax.tree_util.keystr(path)
            for d in (0, 1):
                if f"bn_domain{d}" in key and "image_encoder" in key:
                    if np.abs(np.asarray(flat_after[key]) - b).max() > 0:
                        moved[d] = True
        assert moved[0] and moved[1]


@pytest.mark.slow
class TestDeterminism:
    def test_same_seed_same_metrics(self):
        from maxstyle_tpu.solver import TripletSegmentationSolver
        from maxstyle_tpu.train_step import make_train_step
        cfg = small_config(max_style=True)
        solver = TripletSegmentationSolver(cfg)
        batch = synthetic_batch(jax.random.key(1))

        def run():
            state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
            step = make_train_step(solver)
            _, metrics = step(state, batch, jax.random.key(7))
            return {k: float(v) for k, v in metrics.items()}

        m1, m2 = run(), run()
        assert m1 == m2
