"""BN-mode choreography tests (SURVEY §7 hard part 1): 'train' commits
running-stat updates, 'frozen' uses batch stats without committing, 'eval'
uses running stats — across solver.apply_module and the method branches."""

import jax
import jax.numpy as jnp
import numpy as np

from maxstyle_tpu.solver import TripletSegmentationSolver
from tests.test_train_step import small_config, synthetic_batch


def stats_snapshot(stats):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(stats)]


def max_diff(a, b):
    return max(float(np.abs(x - y).max()) for x, y in zip(a, b))


class TestBNModes:
    def setup_method(self):
        self.cfg = small_config()
        self.solver = TripletSegmentationSolver(self.cfg)
        self.state = self.solver.init_state(jax.random.key(0), (64, 64),
                                            batch_size=4)
        self.batch = synthetic_batch(jax.random.key(1))

    def test_train_mode_commits_stats(self):
        before = stats_snapshot(self.state.batch_stats)

        @jax.jit
        def run(params, stats, x):
            (z_i, z_s), stats = self.solver.encode_image(params, stats, x,
                                                         mode="train")
            return stats

        new_stats = run(self.state.params, self.state.batch_stats,
                        self.batch["image"])
        assert max_diff(before, stats_snapshot(new_stats)) > 0

    def test_frozen_mode_discards_stats(self):
        before = stats_snapshot(self.state.batch_stats)

        @jax.jit
        def run(params, stats, x):
            (z_i, z_s), stats = self.solver.encode_image(params, stats, x,
                                                         mode="frozen")
            return stats, z_s

        new_stats, _ = run(self.state.params, self.state.batch_stats,
                           self.batch["image"])
        assert max_diff(before, stats_snapshot(new_stats)) == 0

    def test_frozen_uses_batch_stats_not_running(self):
        """With fresh (zero-mean/unit-var) running averages, frozen and eval
        outputs must DIFFER on non-normalized inputs — frozen normalizes by
        batch statistics."""
        x = self.batch["image"] * 5.0 + 3.0
        from functools import partial

        @partial(jax.jit, static_argnums=0)
        def run(mode, params, stats, x):
            (z_i, z_s), _ = self.solver.encode_image(params, stats, x, mode=mode)
            return z_s

        frozen = run("frozen", self.state.params, self.state.batch_stats, x)
        evaled = run("eval", self.state.params, self.state.batch_stats, x)
        assert not np.allclose(np.asarray(frozen), np.asarray(evaled), atol=1e-4)

    def test_maxstyle_generation_does_not_touch_stats(self):
        before = stats_snapshot(self.state.batch_stats)

        @jax.jit
        def gen(params, stats, image, label, rng):
            (z_i, _), _ = self.solver.encode_image(params, stats, image,
                                                   mode="frozen")
            out = self.solver.generate_max_style_image(
                params, stats, z_i, reference_segmentation=label,
                ms_cfg=self.cfg.max_style, rng=rng)
            return out

        gen(self.state.params, self.state.batch_stats, self.batch["image"],
            self.batch["label"], jax.random.key(5))
        after = stats_snapshot(self.state.batch_stats)
        assert max_diff(before, after) == 0

    def test_eval_differs_from_train_after_stats_updates(self):
        """After several train-mode passes the running averages move, so
        eval-mode outputs change while frozen-mode outputs (batch stats)
        stay fixed for a fixed batch."""
        from functools import partial

        @partial(jax.jit, static_argnums=0)
        def encode(mode, params, stats, x):
            (_, z_s), new_stats = self.solver.encode_image(params, stats, x,
                                                           mode=mode)
            return z_s, new_stats

        x = self.batch["image"]
        eval0, _ = encode("eval", self.state.params, self.state.batch_stats, x)
        stats = self.state.batch_stats
        for _ in range(3):
            _, stats = encode("train", self.state.params, stats, x)
        eval1, _ = encode("eval", self.state.params, stats, x)
        frozen0, _ = encode("frozen", self.state.params, self.state.batch_stats, x)
        frozen1, _ = encode("frozen", self.state.params, stats, x)
        assert not np.allclose(np.asarray(eval0), np.asarray(eval1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(frozen0), np.asarray(frozen1),
                                   atol=1e-6)
