"""Unit tests for the MaxStyle / MixStyle functional ops against
hand-computed statistics (the exact math of maxstyle.py:157-188, re-derived
independently in numpy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.config import MaxStyleConfig
from maxstyle_tpu.ops.maxstyle import (MaxStyleParams, MaxStyleState,
                                       MixStyleConfig, apply_maxstyle,
                                       apply_mixstyle, init_maxstyle,
                                       instance_stats, learnable_mask)

KEY = jax.random.key(42)


def manual_state(b, c, perm, gate=1.0):
    return MaxStyleState(perm=jnp.asarray(perm), gate=jnp.asarray(gate, jnp.float32),
                         gamma_std=jnp.full((1, 1, 1, c), jnp.nan),
                         beta_std=jnp.full((1, 1, 1, c), jnp.nan))


def np_instance_stats(x, eps):
    hw = x.shape[1] * x.shape[2]
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True) * hw / (hw - 1)
    return mu, np.sqrt(var + eps)


class TestForwardMath:
    def setup_method(self):
        rng = np.random.RandomState(3)
        self.x = rng.randn(4, 6, 6, 3).astype(np.float32) * 2 + 1
        self.cfg = MaxStyleConfig()
        self.perm = np.array([1, 2, 3, 0])

    def test_matches_manual_computation(self):
        b, _, _, c = self.x.shape
        rng = np.random.RandomState(5)
        lmda = rng.rand(b, 1, 1, 1).astype(np.float32)
        gn = rng.randn(b, 1, 1, c).astype(np.float32)
        bn = rng.randn(b, 1, 1, c).astype(np.float32)
        params = MaxStyleParams(jnp.asarray(lmda), jnp.asarray(gn), jnp.asarray(bn))
        out, state = apply_maxstyle(jnp.asarray(self.x), params,
                                    manual_state(b, c, self.perm), self.cfg)
        mu, sig = np_instance_stats(self.x, self.cfg.eps)
        x_normed = (self.x - mu) / sig
        gamma_std = sig.std(axis=0, keepdims=True, ddof=1)
        beta_std = mu.std(axis=0, keepdims=True, ddof=1)
        lm = np.clip(lmda, 0, 1)
        sig_mix = sig * (1 - lm) + sig[self.perm] * lm
        mu_mix = mu * (1 - lm) + mu[self.perm] * lm
        want = (sig_mix + gn * gamma_std) * x_normed + (mu_mix + bn * beta_std)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.gamma_std),
                                   gamma_std, rtol=1e-4)

    def test_gate_off_is_identity(self):
        params, _ = init_maxstyle(KEY, 4, 3, self.cfg)
        out, _ = apply_maxstyle(jnp.asarray(self.x), params,
                                manual_state(4, 3, self.perm, gate=0.0), self.cfg)
        np.testing.assert_allclose(np.asarray(out), self.x, atol=1e-6)

    def test_zero_params_no_mix_recovers_input(self):
        # lmda=0 and zero noise => reconstruction of x (mu/sig re-applied)
        b, _, _, c = self.x.shape
        params = MaxStyleParams(jnp.zeros((b, 1, 1, 1)), jnp.zeros((b, 1, 1, c)),
                                jnp.zeros((b, 1, 1, c)))
        out, _ = apply_maxstyle(jnp.asarray(self.x), params,
                                manual_state(b, c, self.perm), self.cfg)
        np.testing.assert_allclose(np.asarray(out), self.x, rtol=1e-3, atol=1e-4)

    def test_std_cache_frozen_across_applications(self):
        b, _, _, c = self.x.shape
        params, _ = init_maxstyle(KEY, b, c, self.cfg)
        _, state1 = apply_maxstyle(jnp.asarray(self.x), params,
                                   manual_state(b, c, self.perm), self.cfg)
        x2 = self.x * 5.0 + 2.0
        out2, state2 = apply_maxstyle(jnp.asarray(x2), params, state1, self.cfg)
        # cached spreads must NOT change despite different input stats
        np.testing.assert_allclose(np.asarray(state2.gamma_std),
                                   np.asarray(state1.gamma_std), atol=0)

    def test_no_noise_config_drops_noise_term(self):
        cfg = MaxStyleConfig(no_noise=True)
        b, _, _, c = self.x.shape
        lmda = np.full((b, 1, 1, 1), 0.3, np.float32)
        params = MaxStyleParams(jnp.asarray(lmda),
                                jnp.full((b, 1, 1, c), 100.0),
                                jnp.full((b, 1, 1, c), 100.0))
        out, _ = apply_maxstyle(jnp.asarray(self.x), params,
                                manual_state(b, c, self.perm), cfg)
        mu, sig = np_instance_stats(self.x, cfg.eps)
        x_normed = (self.x - mu) / sig
        sig_mix = sig * 0.7 + sig[self.perm] * 0.3
        mu_mix = mu * 0.7 + mu[self.perm] * 0.3
        np.testing.assert_allclose(np.asarray(out), sig_mix * x_normed + mu_mix,
                                   rtol=1e-4, atol=1e-5)

    def test_lmda_clamped(self):
        b, _, _, c = self.x.shape
        params_hi = MaxStyleParams(jnp.full((b, 1, 1, 1), 7.0),
                                   jnp.zeros((b, 1, 1, c)), jnp.zeros((b, 1, 1, c)))
        params_one = MaxStyleParams(jnp.ones((b, 1, 1, 1)),
                                    jnp.zeros((b, 1, 1, c)), jnp.zeros((b, 1, 1, c)))
        out_hi, _ = apply_maxstyle(jnp.asarray(self.x), params_hi,
                                   manual_state(b, c, self.perm), self.cfg)
        out_one, _ = apply_maxstyle(jnp.asarray(self.x), params_one,
                                    manual_state(b, c, self.perm), self.cfg)
        np.testing.assert_allclose(np.asarray(out_hi), np.asarray(out_one), atol=1e-6)

    def test_batch_one_is_identity(self):
        x1 = jnp.asarray(self.x[:1])
        params, state = init_maxstyle(KEY, 1, 3, self.cfg)
        out, _ = apply_maxstyle(x1, params, manual_state(1, 3, [0]), self.cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x1), atol=0)


class TestGradients:
    def test_grads_only_flow_through_learnables(self):
        cfg = MaxStyleConfig()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 6, 6, 3).astype(np.float32))
        params, _ = init_maxstyle(KEY, 4, 3, cfg)
        state = manual_state(4, 3, [1, 2, 3, 0])

        def loss(p):
            out, _ = apply_maxstyle(x, p, state, cfg)
            return jnp.mean((out - 1.0) ** 2)

        g = jax.grad(loss)(params)
        assert np.abs(np.asarray(g.lmda)).sum() > 0
        assert np.abs(np.asarray(g.gamma_noise)).sum() > 0
        assert np.abs(np.asarray(g.beta_noise)).sum() > 0

    def test_clamp_blocks_gradient_outside_interior(self):
        cfg = MaxStyleConfig()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 6, 6, 3).astype(np.float32))
        state = manual_state(4, 3, [1, 2, 3, 0])
        base, _ = init_maxstyle(KEY, 4, 3, cfg)
        params = base.replace(lmda=jnp.full((4, 1, 1, 1), 2.0))

        def loss(p):
            out, _ = apply_maxstyle(x, p, state, cfg)
            return jnp.mean(out ** 2)

        g = jax.grad(loss)(params)
        np.testing.assert_allclose(np.asarray(g.lmda), 0.0, atol=1e-7)

    def test_inner_optimization_decreases_loss(self):
        """MaxStyle differentiability self-test (maxstyle.py:193-241):
        Adam(lr=0.1) on style params against an MSE objective must reduce it."""
        import optax
        cfg = MaxStyleConfig()
        rng = np.random.RandomState(1)
        x = jnp.asarray((3 * np.arange(4 * 2 * 2 * 2).reshape(4, 2, 2, 2) + 5)
                        .astype(np.float32))
        params, _ = init_maxstyle(KEY, 4, 2, cfg)
        state = manual_state(4, 2, [1, 2, 3, 0])
        gt = jnp.ones_like(x)
        opt = optax.adam(0.1)
        opt_state = opt.init(params)

        def loss(p):
            out, _ = apply_maxstyle(x, p, state, cfg)
            return jnp.mean((out - gt) ** 2)

        l0 = float(loss(params))
        for _ in range(5):
            g = jax.grad(loss)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        assert float(loss(params)) < l0


class TestInit:
    def test_learnable_mask_flags(self):
        m = learnable_mask(MaxStyleConfig())
        assert float(m.lmda) == 1.0 and float(m.gamma_noise) == 1.0
        m2 = learnable_mask(MaxStyleConfig(mix_learnable=False, noise_learnable=False))
        assert float(m2.lmda) == 0.0 and float(m2.gamma_noise) == 0.0
        m3 = learnable_mask(MaxStyleConfig(no_noise=True))
        assert float(m3.gamma_noise) == 0.0

    def test_beta_sampling_bimodal(self):
        cfg = MaxStyleConfig(always_use_beta=True, alpha=0.1)
        params, _ = init_maxstyle(KEY, 512, 2, cfg)
        lm = np.asarray(params.lmda).ravel()
        # Beta(0.1, 0.1) concentrates near 0 and 1
        assert ((lm < 0.1) | (lm > 0.9)).mean() > 0.6

    def test_perm_never_identity(self):
        for seed in range(10):
            _, state = init_maxstyle(jax.random.key(seed), 6, 2, MaxStyleConfig())
            assert not np.array_equal(np.asarray(state.perm), np.arange(6))


class TestMixStyle:
    def test_gaussian_mode_shifts_stats(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
        cfg = MixStyleConfig(mix="gaussian", p=1.0)
        out = apply_mixstyle(jax.random.key(1), x, cfg)
        assert out.shape == x.shape
        assert not np.allclose(np.asarray(out), np.asarray(x))

    def test_random_mode_with_lmda_zero_identity_like(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
        cfg = MixStyleConfig(mix="random", p=1.0, lmda=0.0)
        out = apply_mixstyle(jax.random.key(1), x, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-3, atol=1e-4)

    def test_probability_zero_is_identity(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
        cfg = MixStyleConfig(mix="random", p=0.0)
        out = apply_mixstyle(jax.random.key(1), x, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


class TestGroupedStyleStats:
    """style_group_size (config.py): a B=N*G batch must behave like N
    independent reference batches of G — block permutation, per-group stat
    spreads — so large-batch throughput scaling keeps the method's tuned
    batch-20 semantics (scripts/bench_scaling.py production recipe)."""

    def _grouped_equals_independent(self, apply_fn):
        b, g, c = 8, 4, 3
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(b, 6, 6, c).astype(np.float32) * 2 + 1)
        cfg_g = MaxStyleConfig(style_group_size=g)
        cfg = MaxStyleConfig()
        params, state = init_maxstyle(KEY, b, c, cfg_g)
        # force-apply and use a deterministic block perm for the comparison
        perm = jnp.asarray([1, 2, 3, 0, 6, 7, 4, 5])
        state = state.replace(gate=jnp.asarray(1.0), perm=perm)
        out, new_state = apply_fn(x, params, state, cfg_g)
        assert new_state.gamma_std.shape == (b, 1, 1, c)
        for i in range(b // g):
            sl = slice(i * g, (i + 1) * g)
            p_i = MaxStyleParams(lmda=params.lmda[sl],
                                 gamma_noise=params.gamma_noise[sl],
                                 beta_noise=params.beta_noise[sl])
            s_i = manual_state(g, c, np.asarray(perm[sl]) - i * g)
            out_i, st_i = apply_fn(x[sl], p_i, s_i, cfg)
            np.testing.assert_allclose(np.asarray(out[sl]), np.asarray(out_i),
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(
                np.asarray(new_state.gamma_std[sl]),
                np.asarray(np.broadcast_to(st_i.gamma_std, (g, 1, 1, c))),
                rtol=1e-6)

    def test_grouped_equals_independent_batches(self):
        self._grouped_equals_independent(apply_maxstyle)

    def test_grouped_equals_independent_batches_pallas(self):
        from maxstyle_tpu.ops.maxstyle_pallas import apply_maxstyle_pallas
        self._grouped_equals_independent(apply_maxstyle_pallas)

    def test_init_perm_is_block_diagonal_non_identity(self):
        b, g = 12, 4
        cfg = MaxStyleConfig(style_group_size=g)
        for seed in range(5):
            _, state = init_maxstyle(jax.random.key(seed), b, 3, cfg)
            perm = np.asarray(state.perm)
            for i in range(b // g):
                blk = perm[i * g:(i + 1) * g]
                assert set(blk) == set(range(i * g, (i + 1) * g)), perm
                assert not np.array_equal(blk, np.arange(i * g, (i + 1) * g))

    def test_group_must_divide_batch(self):
        with pytest.raises(ValueError, match="divide"):
            init_maxstyle(KEY, 10, 3, MaxStyleConfig(style_group_size=4))

    def test_none_and_oversized_group_keep_batch_semantics(self):
        # default + G>=B: identical draws and state shapes to the ungrouped op
        b, c = 6, 3
        for cfg in (MaxStyleConfig(), MaxStyleConfig(style_group_size=64)):
            params, state = init_maxstyle(KEY, b, c, cfg)
            assert state.gamma_std.shape == (1, 1, 1, c)
            p0, s0 = init_maxstyle(KEY, b, c, MaxStyleConfig())
            np.testing.assert_array_equal(np.asarray(state.perm),
                                          np.asarray(s0.perm))

    def test_grouped_gradients_match_independent(self):
        # the inner adversarial loop optimizes params; grouped grads must
        # equal the per-group reference grads
        b, g, c = 8, 4, 2
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(b, 5, 5, c).astype(np.float32))
        cfg_g = MaxStyleConfig(style_group_size=g)
        cfg = MaxStyleConfig()
        params, state = init_maxstyle(KEY, b, c, cfg_g)
        perm = jnp.asarray([3, 0, 1, 2, 5, 6, 7, 4])
        state = state.replace(gate=jnp.asarray(1.0), perm=perm)

        def loss(p, xx, st, cc):
            out, _ = apply_maxstyle(xx, p, st, cc)
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(params, x, state, cfg_g)
        for i in range(b // g):
            sl = slice(i * g, (i + 1) * g)
            p_i = MaxStyleParams(lmda=params.lmda[sl],
                                 gamma_noise=params.gamma_noise[sl],
                                 beta_noise=params.beta_noise[sl])
            s_i = manual_state(g, c, np.asarray(perm[sl]) - i * g)
            g_i = jax.grad(loss)(p_i, x[sl], s_i, cfg)
            np.testing.assert_allclose(np.asarray(grads.gamma_noise[sl]),
                                       np.asarray(g_i.gamma_noise),
                                       rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(grads.lmda[sl]),
                                       np.asarray(g_i.lmda),
                                       rtol=2e-5, atol=1e-6)
