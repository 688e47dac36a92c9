"""Mixed-precision (bf16 activations / f32 params+stats) plumbing tests.

The shipped TPU default is bfloat16 compute (`learning.compute_dtype='auto'`
resolves to bf16 on TPU backends, float32 on CPU/GPU) with float32 master
params, optimizer state and BatchNorm running statistics — the policy flax
expresses as ``dtype=bf16, param_dtype=f32`` plus BN's
``force_float32_reductions``.
"""

import jax
import jax.numpy as jnp
import pytest

from maxstyle_tpu.config import (DataConfig, ExperimentConfig, LearningConfig,
                                 MaxStyleConfig, SegmentationModelConfig)
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train_step import make_train_step


def _config(compute_dtype, max_style=True, hw=32, batch=4):
    return ExperimentConfig(
        data=DataConfig(crop_size=(hw, hw, 1), num_classes=4),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN", num_classes=4),
        learning=LearningConfig(lr=1e-4, batch_size=batch,
                                optimizer_type="AdamW", max_style=max_style,
                                compute_dtype=compute_dtype),
        max_style=MaxStyleConfig(n_iter=2, decoder_layers_indexes=(3, 4, 5)),
    )


def _batch(hw=32, batch=4):
    x = jnp.clip(0.5 + 0.2 * jax.random.normal(jax.random.key(1),
                                               (batch, hw, hw, 1)), 0, 1)
    lab = jax.random.randint(jax.random.key(2), (batch, hw, hw), 0, 4)
    return {"image": x, "label": lab}


class TestDtypePolicy:
    def test_bf16_keeps_master_state_f32(self):
        solver = TripletSegmentationSolver(_config("bfloat16"))
        assert solver.compute_dtype == jnp.bfloat16
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=4)
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32

    def test_bf16_forward_emits_bf16(self):
        solver = TripletSegmentationSolver(_config("bfloat16"))
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=4)
        pred = solver.predict(state.params, state.batch_stats,
                              jnp.zeros((4, 32, 32, 1)), softmax=False)
        assert pred.dtype == jnp.bfloat16

    def test_bf16_full_maxstyle_step_finite_and_state_stays_f32(self):
        solver = TripletSegmentationSolver(_config("bfloat16"))
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=4)
        step = make_train_step(solver)
        state2, metrics = step(state, _batch(), jax.random.key(3))
        assert all(bool(jnp.isfinite(v)) for v in metrics.values()), metrics
        # losses are computed in f32 regardless of activation dtype
        assert metrics["loss/total"].dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves((state2.params,
                                               state2.batch_stats,
                                               state2.opt_states)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype

    def test_auto_resolves_f32_on_cpu(self):
        assert jax.default_backend() == "cpu"
        solver = TripletSegmentationSolver(_config("auto"))
        assert solver.compute_dtype == jnp.float32

    def test_config_dict_plumbing(self):
        cfg = LearningConfig.from_dict({"compute_dtype": "bfloat16", "lr": 1e-3})
        assert cfg.compute_dtype == "bfloat16"
        assert LearningConfig.from_dict({}).compute_dtype == "auto"

    def test_unknown_dtype_rejected(self):
        with pytest.raises(ValueError):
            TripletSegmentationSolver(_config("float16"))


class TestNumericalParity:
    """bf16 and f32 share the same f32 params, so outputs must agree to
    bf16 resolution (~1e-2 relative)."""

    def test_predict_parity(self):
        s32 = TripletSegmentationSolver(_config("float32"))
        s16 = TripletSegmentationSolver(_config("bfloat16"))
        state = s32.init_state(jax.random.key(0), (32, 32), batch_size=4)
        x = _batch()["image"]
        p32 = s32.predict(state.params, state.batch_stats, x, softmax=True)
        p16 = s16.predict(state.params, state.batch_stats, x, softmax=True)
        # untrained nets emit O(60) logits, so individual borderline pixels
        # can flip; require near-total argmax agreement + small mean error
        agree = jnp.mean((jnp.argmax(p32, -1) == jnp.argmax(p16, -1))
                         .astype(jnp.float32))
        assert float(agree) > 0.99, float(agree)
        assert float(jnp.mean(jnp.abs(p32 - p16.astype(jnp.float32)))) < 5e-3

    def test_step_loss_parity(self):
        batch = _batch()
        losses = {}
        for name, dt in [("f32", "float32"), ("bf16", "bfloat16")]:
            solver = TripletSegmentationSolver(_config(dt, max_style=False))
            state = solver.init_state(jax.random.key(0), (32, 32), batch_size=4)
            step = make_train_step(solver)
            _, metrics = step(state, batch, jax.random.key(3))
            losses[name] = float(metrics["loss/standard/total"])
        assert losses["bf16"] == pytest.approx(losses["f32"], rel=3e-2), losses
