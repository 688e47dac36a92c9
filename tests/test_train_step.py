"""End-to-end smoke tests: synthetic-data training steps for the standard and
MaxStyle configurations (SURVEY.md §4's `--debug` equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.config import (ExperimentConfig, LearningConfig,
                                 MaxStyleConfig, DataConfig,
                                 SegmentationModelConfig)
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train_step import add_input_noise, make_train_step


def small_config(**learning_kwargs):
    return ExperimentConfig(
        data=DataConfig(crop_size=(64, 64, 1), num_classes=4),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN", num_classes=4),
        learning=LearningConfig(lr=1e-4, batch_size=4, optimizer_type="AdamW",
                                **learning_kwargs),
        max_style=MaxStyleConfig(n_iter=2, decoder_layers_indexes=(3, 4, 5)),
    )


def synthetic_batch(key, n=4, hw=64, num_classes=4):
    k1, k2 = jax.random.split(key)
    image = jax.nn.sigmoid(jax.random.normal(k1, (n, hw, hw, 1)))
    # blobby labels derived from the image so the task is learnable
    label = (image[..., 0] * num_classes).astype(jnp.int32) % num_classes
    return {"image": image, "label": label}


class TestAddInputNoise:
    def test_min_max_clamps_to_batch_range(self):
        x = jnp.clip(jax.random.normal(jax.random.key(0), (2, 8, 8, 1)), 0, 1)
        y = add_input_noise(x, jax.random.key(1), "min_max")
        assert float(jnp.min(y)) >= float(jnp.min(x)) - 1e-6
        assert float(jnp.max(y)) <= float(jnp.max(x)) + 1e-6

    def test_z_score_renormalizes(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 1)) * 4 + 2
        y = np.asarray(add_input_noise(x, jax.random.key(1), "z_score"))
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-4)


class TestStandardTraining:
    def test_two_steps_finite_and_decreasing_on_fixed_batch(self):
        cfg = small_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        step = make_train_step(solver)
        batch = synthetic_batch(jax.random.key(1))
        metrics_hist = []
        for i in range(4):
            state, metrics = step(state, batch, jax.random.key(100))
            metrics_hist.append({k: float(v) for k, v in metrics.items()})
        for m in metrics_hist:
            for k, v in m.items():
                assert np.isfinite(v), f"{k} not finite"
        assert metrics_hist[-1]["loss/standard/total"] < metrics_hist[0]["loss/standard/total"]

    def test_batch_stats_change_after_step(self):
        cfg = small_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        # snapshot to host first: the jitted step donates its input state
        before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
        step = make_train_step(solver)
        state2, _ = step(state, synthetic_batch(jax.random.key(1)),
                         jax.random.key(2))
        after = [np.asarray(x) for x in jax.tree_util.tree_leaves(state2.batch_stats)]
        assert any(np.abs(a - b).max() > 0 for a, b in zip(before, after))

    def test_unwired_branch_raises(self, monkeypatch):
        from maxstyle_tpu import train_step_branches as br
        monkeypatch.setattr(br, "SUPPORTED", br.SUPPORTED - {"rand_conv"})
        cfg = small_config(rand_conv=True)
        solver = TripletSegmentationSolver(cfg)
        with pytest.raises(NotImplementedError):
            make_train_step(solver)


@pytest.mark.slow
class TestMaxStyleTraining:
    def test_maxstyle_step_runs_and_is_finite(self):
        cfg = small_config(max_style=True)
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        step = make_train_step(solver)
        batch = synthetic_batch(jax.random.key(1))
        state, metrics = step(state, batch, jax.random.key(2))
        assert np.isfinite(float(metrics["loss/total"]))
        assert float(metrics["loss/hard/total"]) != 0.0

    def test_generation_produces_valid_images(self):
        cfg = small_config(max_style=True)
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        batch = synthetic_batch(jax.random.key(1))

        @jax.jit
        def gen(params, stats, image, label, rng):
            (z_i, _), _ = solver.encode_image(params, stats, image, mode="frozen")
            return solver.generate_max_style_image(
                params, stats, z_i, reference_segmentation=label,
                ms_cfg=cfg.max_style, rng=rng)

        out = gen(state.params, state.batch_stats, batch["image"],
                  batch["label"], jax.random.key(7))
        assert out.shape == batch["image"].shape
        arr = np.asarray(out)
        assert np.isfinite(arr).all()
        assert arr.min() >= 0.0 and arr.max() <= 1.0  # sigmoid head

    def test_adversarial_loop_increases_seg_loss_of_generated(self):
        """The inner loop maximizes CE: generated images after n_iter steps
        should be at least as hard as the n_iter=0 generation (statistically;
        we check the optimization moves the style params)."""
        cfg0 = small_config(max_style=True)
        solver = TripletSegmentationSolver(cfg0)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        batch = synthetic_batch(jax.random.key(1))

        def gen_with(ms_cfg, rng):
            @jax.jit
            def gen(params, stats, image, label):
                (z_i, _), _ = solver.encode_image(params, stats, image, mode="frozen")
                return solver.generate_max_style_image(
                    params, stats, z_i, reference_segmentation=label,
                    ms_cfg=ms_cfg, rng=rng)
            return gen(state.params, state.batch_stats, batch["image"], batch["label"])

        rng = jax.random.key(3)
        out0 = gen_with(MaxStyleConfig(n_iter=0), rng)
        out5 = gen_with(MaxStyleConfig(n_iter=5), rng)
        # same init (same rng) but optimization must move the output
        assert not np.allclose(np.asarray(out0), np.asarray(out5), atol=1e-5)


class TestPredict:
    def test_predict_shapes_and_softmax(self):
        cfg = small_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        batch = synthetic_batch(jax.random.key(1))

        @jax.jit
        def pred(params, stats, x):
            return solver.predict(params, stats, x, softmax=True)

        out = pred(state.params, state.batch_stats, batch["image"])
        assert out.shape == (4, 64, 64, 4)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


class TestInnerUnroll:
    def test_unrolled_scan_matches_sequential(self):
        """inner_unroll only changes XLA scheduling (lax.scan unroll=k);
        the generated stylized image must be bitwise-stable vs unroll=1.
        Guards the knob's plumbing incl. clamping unroll > n_iter."""
        import dataclasses
        outs = []
        for unroll in (1, 2, 99):  # 99 clamps to n_iter=2
            cfg = small_config(max_style=True)
            cfg = dataclasses.replace(
                cfg, max_style=dataclasses.replace(cfg.max_style,
                                                   inner_unroll=unroll))
            solver = TripletSegmentationSolver(cfg)
            state = solver.init_state(jax.random.key(0), (64, 64),
                                      batch_size=4)
            batch = synthetic_batch(jax.random.key(1))
            (z_i, _), _ = solver.encode_image(state.params, state.batch_stats,
                                              batch["image"], mode="frozen")
            out = solver.generate_max_style_image(
                state.params, state.batch_stats, z_i,
                reference_segmentation=batch["label"],
                ms_cfg=cfg.max_style, rng=jax.random.key(5))
            outs.append(np.asarray(out))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-6)


class TestStyleGroupInterleave:
    def test_layout_blocks_of_aug_then_orig(self):
        from maxstyle_tpu.train_step import interleave_style_groups
        aug = jnp.arange(8)[:, None] * jnp.ones((8, 3))          # rows 0..7
        orig = (100 + jnp.arange(8))[:, None] * jnp.ones((8, 3))  # rows 100..107
        out = interleave_style_groups(aug, orig, group_size=4)
        first_col = np.asarray(out[:, 0]).astype(int)
        # groups of 4 = [2 aug | 2 orig], consecutive
        assert list(first_col) == [0, 1, 100, 101, 2, 3, 102, 103,
                                   4, 5, 104, 105, 6, 7, 106, 107]

    def test_odd_or_misaligned_group_refuses_loudly(self):
        """A group that can't hold the [G/2 aug | G/2 orig] composition
        must raise, not silently build all-aug / all-orig groups."""
        from maxstyle_tpu.data import augment as A
        from maxstyle_tpu.train_step import make_fused_train_step
        cfg = ExperimentConfig(
            data=DataConfig(crop_size=(32, 32, 1), num_classes=4),
            segmentation_model=SegmentationModelConfig(
                network_type="FCN_16_standard_no_STN", num_classes=4),
            learning=LearningConfig(lr=1e-4, batch_size=20,
                                    optimizer_type="AdamW", max_style=True),
            max_style=MaxStyleConfig(n_iter=1, decoder_layers_indexes=(3,),
                                     style_group_size=5),  # odd
        )
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=20)
        policy = A.get_policy("no_aug", (40, 40), (32, 32))
        step = make_fused_train_step(solver, policy, keep_orig=True,
                                     jit_compile=False)
        raw = {"image": jnp.zeros((10, 40, 40)),
               "label": jnp.zeros((10, 40, 40), jnp.int32)}
        with pytest.raises(ValueError, match="style_group_size"):
            step(state, raw, jax.random.key(3))

    @pytest.mark.slow
    def test_fused_step_with_grouping_runs(self):
        """Scaled-batch MaxStyle step with style_group_size: the fused
        aug+train dispatch builds interleaved groups and the grouped style
        op compiles and yields finite losses (the production large-batch
        recipe, scripts/bench_scaling.py)."""
        from maxstyle_tpu.data import augment as A
        from maxstyle_tpu.train_step import make_fused_train_step
        cfg = ExperimentConfig(
            data=DataConfig(crop_size=(32, 32, 1), num_classes=4),
            segmentation_model=SegmentationModelConfig(
                network_type="FCN_16_standard_no_STN", num_classes=4),
            learning=LearningConfig(lr=1e-4, batch_size=16,
                                    optimizer_type="AdamW", max_style=True),
            max_style=MaxStyleConfig(n_iter=2, decoder_layers_indexes=(3, 4, 5),
                                     style_group_size=8),
        )
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=16)
        policy = A.get_policy("ACDC_affine_elastic_intensity", (40, 40),
                              (32, 32))
        step = make_fused_train_step(solver, policy, keep_orig=True,
                                     jit_compile=False)
        raw = {"image": jnp.clip(0.5 + 0.25 * jax.random.normal(
                   jax.random.key(1), (8, 40, 40)), 0, 1),
               "label": jax.random.randint(jax.random.key(2), (8, 40, 40),
                                           0, 4)}
        new_state, metrics = step(state, raw, jax.random.key(3))
        assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
        assert int(new_state.step) == 1
