"""Tests for the library-surface losses, profiling utilities and extra
layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu import losses_extra as lx

KEY = jax.random.key(0)


class TestExtraLosses:
    def test_style_loss_zero_for_identical(self):
        f = jax.random.normal(KEY, (2, 8, 8, 4))
        np.testing.assert_allclose(float(lx.style_loss(f, f)), 0.0, atol=1e-8)

    def test_contrastive_similar_vs_dissimilar(self):
        a = jnp.zeros((2, 4))
        b = jnp.ones((2, 4)) * 0.1
        sim = lx.contrastive_loss(a, b, jnp.ones(2))
        dis = lx.contrastive_loss(a, b, jnp.zeros(2))
        assert float(sim) < float(dis)

    def test_brier_perfect_zero(self):
        labels = jnp.zeros((1, 4, 4), jnp.int32)
        logits = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(100.0)
        assert float(lx.brier_loss(logits, labels)) < 1e-6

    def test_ncc_identical_zero(self):
        x = jax.random.normal(KEY, (2, 8, 8, 1))
        np.testing.assert_allclose(float(lx.ncc_loss(x, x)), 0.0, atol=1e-4)

    def test_local_ncc_identical_near_zero(self):
        x = jax.random.normal(KEY, (2, 16, 16, 1))
        assert float(lx.local_ncc_loss(x, x)) < 0.05

    def test_cross_entropy_3d(self):
        logits = jax.random.normal(KEY, (2, 3, 8, 8, 4))
        labels = jax.random.randint(jax.random.key(1), (2, 3, 8, 8), 0, 4)
        assert np.isfinite(float(lx.cross_entropy_3d(logits, labels)))

    def test_smooth_l1_quadratic_interior(self):
        # reference default beta=1/9 (custom_loss.smooth_l1_loss:500):
        # |d| < beta -> 0.5*d^2/beta; |d| >= beta -> d - beta/2
        beta = 1.0 / 9
        d = beta / 2
        np.testing.assert_allclose(
            float(lx.smooth_l1_loss(jnp.asarray([d]), jnp.asarray([0.0]))),
            0.5 * d * d / beta, atol=1e-7)
        np.testing.assert_allclose(
            float(lx.smooth_l1_loss(jnp.asarray([0.5]), jnp.asarray([0.0]))),
            0.5 - beta / 2, atol=1e-6)
        # beta=1.0 recovers the classic Huber interior value
        np.testing.assert_allclose(
            float(lx.smooth_l1_loss(jnp.asarray([0.5]), jnp.asarray([0.0]),
                                    beta=1.0)),
            0.125, atol=1e-6)

    def test_laplacian_smoothness_flat_zero(self):
        x = jnp.ones((1, 8, 8, 1))
        np.testing.assert_allclose(float(lx.laplacian_smoothness_loss(x)),
                                   0.0, atol=1e-8)

    def test_hierarchical_loss_runs(self):
        labels = jax.random.randint(KEY, (2, 8, 8), 0, 4)
        logits = [jax.random.normal(jax.random.key(i), (2, 8, 8, c))
                  for i, c in enumerate([2, 3, 4])]
        assert np.isfinite(float(lx.hierarchical_loss(logits, labels)))

    def test_filter_and_sharpen(self):
        logits = jnp.zeros((1, 4, 4, 3)).at[..., 1].set(5.0)
        conf = lx.filter_unlabelled_predictions(jax.nn.softmax(logits, -1))
        assert float(conf.min()) == 1.0
        sharp = lx.sharpen_predictions(logits, 0.5)
        np.testing.assert_allclose(np.asarray(sharp).sum(-1), 1.0, atol=1e-6)
        assert float(sharp[..., 1].min()) > float(
            jax.nn.softmax(logits, -1)[..., 1].min())


class TestExtraLayers:
    def test_adain(self):
        from maxstyle_tpu.models.layers import AdaptiveInstanceNorm2d
        m = AdaptiveInstanceNorm2d()
        x = jax.random.normal(KEY, (2, 8, 8, 4)) * 3 + 1
        gamma = jnp.ones((2, 4)) * 2.0
        beta = jnp.ones((2, 4)) * 0.5
        y = m.apply({}, x, gamma, beta)
        got = np.asarray(y)
        np.testing.assert_allclose(got.mean(axis=(1, 2)), 0.5, atol=1e-4)
        np.testing.assert_allclose(got.std(axis=(1, 2)), 2.0, atol=1e-2)

    def test_spp_output_size(self):
        from maxstyle_tpu.models.layers import spatial_pyramid_pool
        x = jax.random.normal(KEY, (2, 16, 16, 4))
        out = spatial_pyramid_pool(x, levels=(1, 2, 4))
        assert out.shape == (2, 4 * (1 + 4 + 16))

    def test_bilinear_additive_upsampling(self):
        from maxstyle_tpu.models.layers import bilinear_additive_upsampling
        x = jnp.ones((1, 4, 4, 8))
        y = bilinear_additive_upsampling(x, 2)
        assert y.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)

    def test_batch_instance_norm(self):
        from maxstyle_tpu.models.layers import AdaptiveBatchInstanceNorm
        m = AdaptiveBatchInstanceNorm()
        x = jax.random.normal(KEY, (4, 8, 8, 3))
        v = m.init(KEY, x, train=True)
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert y.shape == x.shape


class TestProfiling:
    def test_step_timer(self):
        from maxstyle_tpu.utils.profiling import StepTimer
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 2 and s["steps_per_sec"] > 0

    def test_parameter_count(self):
        from maxstyle_tpu.utils.profiling import parameter_bytes, parameter_count
        params = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros(5)}}
        assert parameter_count(params) == 11
        assert parameter_bytes(params) == 44
