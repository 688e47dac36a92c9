"""Pallas fused MaxStyle kernels vs the jnp reference implementation:
forward values and ALL gradients (x, lmda, gamma/beta noise) must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.config import MaxStyleConfig
from maxstyle_tpu.ops.maxstyle import (MaxStyleParams, apply_maxstyle,
                                       init_maxstyle)
from maxstyle_tpu.ops.maxstyle_pallas import apply_maxstyle_pallas
from tests.test_maxstyle import manual_state

KEY = jax.random.key(11)


def setup_case(b=4, h=8, w=16, c=8, seed=0, cfg=None):
    cfg = cfg or MaxStyleConfig()
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 2 + 1)
    params = MaxStyleParams(
        lmda=jnp.asarray(rng.rand(b, 1, 1, 1).astype(np.float32)),
        gamma_noise=jnp.asarray(rng.randn(b, 1, 1, c).astype(np.float32)),
        beta_noise=jnp.asarray(rng.randn(b, 1, 1, c).astype(np.float32)))
    perm = list(range(1, b)) + [0]
    return cfg, x, params, manual_state(b, c, perm)


class TestForwardParity:
    @pytest.mark.parametrize("cfg", [
        MaxStyleConfig(),
        MaxStyleConfig(no_noise=True),
        MaxStyleConfig(mix_style=False),
    ])
    def test_forward_matches_reference(self, cfg):
        cfg, x, params, state = setup_case(cfg=cfg)
        ref, ref_state = apply_maxstyle(x, params, state, cfg)
        out, out_state = apply_maxstyle_pallas(x, params, state, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_state.gamma_std),
                                   np.asarray(ref_state.gamma_std),
                                   rtol=1e-4, atol=1e-6)

    def test_gate_off_identity(self):
        cfg, x, params, state = setup_case()
        state = state.replace(gate=jnp.asarray(0.0, jnp.float32))
        out, _ = apply_maxstyle_pallas(x, params, state, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)

    def test_cached_stds_reused(self):
        cfg, x, params, state = setup_case()
        _, st1 = apply_maxstyle_pallas(x, params, state, cfg)
        _, st2 = apply_maxstyle_pallas(x * 3 + 1, params, st1, cfg)
        np.testing.assert_array_equal(np.asarray(st1.gamma_std),
                                      np.asarray(st2.gamma_std))


class TestGradientParity:
    def test_all_grads_match_reference(self):
        cfg, x, params, state = setup_case()

        def loss_ref(x_, p_):
            out, _ = apply_maxstyle(x_, p_, state, cfg)
            return jnp.sum(jnp.sin(out))

        def loss_pal(x_, p_):
            out, _ = apply_maxstyle_pallas(x_, p_, state, cfg)
            return jnp.sum(jnp.sin(out))

        gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, params)
        gx_pal, gp_pal = jax.grad(loss_pal, argnums=(0, 1))(x, params)
        np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gp_pal.lmda),
                                   np.asarray(gp_ref.lmda), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(gp_pal.gamma_noise)[:, 0, 0, :],
            np.asarray(gp_ref.gamma_noise)[:, 0, 0, :], rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(gp_pal.beta_noise)[:, 0, 0, :],
            np.asarray(gp_ref.beta_noise)[:, 0, 0, :], rtol=2e-3, atol=2e-4)

    def test_clamp_outside_zero_grad(self):
        cfg, x, params, state = setup_case()
        params = params.replace(lmda=jnp.full_like(params.lmda, 3.0))

        def loss(p_):
            out, _ = apply_maxstyle_pallas(x, p_, state, cfg)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        np.testing.assert_allclose(np.asarray(g.lmda), 0.0, atol=1e-6)

    def test_stats_are_detached(self):
        """Only the affine path contributes to dx — perturbing x through the
        (detached) stats must not change the gradient formula: dx = g*scale."""
        cfg, x, params, state = setup_case()
        out, _ = apply_maxstyle_pallas(x, params, state, cfg)

        def loss(x_):
            o, _ = apply_maxstyle_pallas(x_, params, state, cfg)
            return jnp.sum(o * 2.0)

        g = jax.grad(loss)(x)
        # with cotangent=2 everywhere, dx must be constant per (b, c)
        gv = np.asarray(g)
        per_bc_std = gv.std(axis=(1, 2))
        np.testing.assert_allclose(per_bc_std, 0.0, atol=1e-4)
