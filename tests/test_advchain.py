"""Unit tests for the native adversarial attacks (AdvNoise / AdvBias /
composed chains)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.ops import advchain

KEY = jax.random.key(0)


def linear_model(w):
    """Toy 'segmentation' forward: channel-mixing linear map -> logits."""
    def f(x):
        return jnp.concatenate([x * w, -x * w], axis=-1)
    return f


class TestAdvNoise:
    def test_perturbation_bounded_and_detached(self):
        x = jnp.clip(jax.random.normal(KEY, (2, 16, 16, 1)), 0, 1)
        adv, cons = advchain.adv_noise_attack(linear_model(3.0), x,
                                              linear_model(3.0)(x),
                                              epsilon=0.1, key=KEY,
                                              if_norm_image=False)
        delta = np.abs(np.asarray(adv - x))
        # per-sample L2 of the normalized perturbation is epsilon
        l2 = np.linalg.norm(delta.reshape(2, -1), axis=1)
        np.testing.assert_allclose(l2, 0.1, rtol=1e-3)
        assert float(cons) >= 0

    def test_consistency_gradient_reaches_model(self):
        x = jnp.clip(jax.random.normal(KEY, (2, 8, 8, 1)), 0, 1)

        def loss(w):
            f = linear_model(w)
            _, cons = advchain.adv_noise_attack(f, x, f(x), key=KEY,
                                                if_norm_image=False)
            return cons

        g = jax.grad(loss)(2.0)
        assert np.isfinite(float(g))


class TestAdvBias:
    def test_bias_field_is_smooth_and_bounded(self):
        cp = jax.random.uniform(KEY, (2, 5, 5, 1), minval=-1, maxval=1)
        field = advchain.bias_field_from_control_points(cp, (32, 32))
        proj = advchain._project_field(field, 0.4)
        assert float(jnp.max(jnp.abs(proj))) <= 0.4 + 1e-5
        tv = float(jnp.abs(jnp.diff(proj, axis=1)).mean())
        assert tv < 0.1  # smooth

    def test_attack_is_multiplicative_positive(self):
        x = jnp.clip(jax.random.normal(KEY, (2, 16, 16, 1)), 0.1, 1)
        adv, cons = advchain.adv_bias_attack(linear_model(2.0), x,
                                             linear_model(2.0)(x), key=KEY)
        assert float(jnp.min(adv)) > 0  # x * exp(field) > 0
        assert np.isfinite(float(cons))


class TestCompose:
    @pytest.mark.parametrize("chain", [("noise",), ("bias",),
                                       ("noise", "bias")])
    def test_chains_run(self, chain):
        x = jnp.clip(jax.random.normal(KEY, (2, 16, 16, 1)), 0.1, 1)
        f = linear_model(1.5)
        adv, cons = advchain.compose_adversarial_attack(
            f, x, f(x), transforms=chain, key=KEY)
        assert adv.shape == x.shape
        assert np.isfinite(float(cons))
        assert not np.allclose(np.asarray(adv), np.asarray(x))

    def test_jittable(self):
        x = jnp.clip(jax.random.normal(KEY, (2, 16, 16, 1)), 0.1, 1)
        f = linear_model(1.5)

        @jax.jit
        def run(x, k):
            return advchain.compose_adversarial_attack(
                f, x, f(x), transforms=("noise", "bias"), key=k)

        adv, cons = run(x, KEY)
        assert np.isfinite(float(cons))
