"""Tests for gradient-based latent masking (LSM/RSC) and RandConv ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.ops import latent_masking as lm
from maxstyle_tpu.ops.randconv import rand_conv_augment

KEY = jax.random.key(0)


def linear_decoder(w):
    """Toy decoder: per-channel scaling + broadcast to 'image'."""
    def dec(code):
        return code * w
    return dec


class TestChannelMask:
    def test_masks_top_gradient_channels(self):
        # loss = mean(code * w * target); grad per channel proportional to w
        b, h, w_, c = 2, 4, 4, 6
        code = jnp.ones((b, h, w_, c))
        weights = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])  # grad ranks = idx
        target = jnp.ones((b, h, w_, c))
        masked, mask = lm.mask_latent_code_channel_wise(
            code, linear_decoder(weights), target, num_classes=c,
            percentile=1 / 3.0, loss_type="corr", key=KEY)
        m = np.asarray(mask)[0, 0, 0]
        # top 1/3 (k=2 -> entries with score > sorted[2]) masked: channels 4,5
        assert m[5] == 0 and m[4] == 0
        assert m[:4].min() == 1

    def test_soft_mask_values_in_range(self):
        b, c = 2, 6
        code = jnp.ones((b, 4, 4, c))
        weights = jnp.arange(c, dtype=jnp.float32)
        masked, mask = lm.mask_latent_code_channel_wise(
            code, linear_decoder(weights), jnp.ones_like(code), num_classes=c,
            percentile=0.5, loss_type="corr", if_soft=True, key=KEY)
        m = np.asarray(mask)
        assert ((m == 1.0) | ((m >= 0.0) & (m <= 0.5))).all()

    def test_if_detach_false_keeps_gradient_path(self):
        c = 4
        weights = jnp.arange(c, dtype=jnp.float32) + 1

        def f(code):
            masked, _ = lm.mask_latent_code_channel_wise(
                code, linear_decoder(weights), jnp.ones_like(code),
                num_classes=c, percentile=0.25, loss_type="mse",
                if_detach=False, key=KEY)
            return jnp.sum(masked)

        g = jax.grad(f)(jnp.ones((2, 4, 4, c)))
        assert np.abs(np.asarray(g)).sum() > 0

    def test_if_detach_true_blocks_gradient(self):
        c = 4
        weights = jnp.arange(c, dtype=jnp.float32) + 1

        def f(code):
            masked, _ = lm.mask_latent_code_channel_wise(
                code, linear_decoder(weights), jnp.ones_like(code),
                num_classes=c, percentile=0.25, loss_type="mse",
                if_detach=True, key=KEY)
            return jnp.sum(masked)

        g = jax.grad(f)(jnp.ones((2, 4, 4, c)))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)


class TestSpatialMask:
    def test_mask_shape_and_fraction(self):
        b, h, w_, c = 2, 8, 8, 4
        rng = np.random.RandomState(0)
        code = jnp.asarray(rng.randn(b, h, w_, c).astype(np.float32))
        target = jnp.asarray(rng.randn(b, h, w_, c).astype(np.float32))
        masked, mask = lm.mask_latent_code_spatial_wise(
            code, lambda x: x * 2.0, target, num_classes=c,
            percentile=0.25, loss_type="mse", key=KEY)
        assert mask.shape == (b, h, w_, 1)
        frac_masked = 1.0 - np.asarray(mask).mean()
        assert 0.1 < frac_masked < 0.4  # ~25%


class TestDispatch:
    @pytest.mark.parametrize("ptype", ["dropout", "channel", "spatial",
                                       "random", "RSC", "no_dropout"])
    def test_all_types_produce_valid_masks(self, ptype):
        c = 8
        rng = np.random.RandomState(1)
        code = jnp.asarray(rng.rand(2, 4, 4, c).astype(np.float32) + 0.5)
        target = jnp.asarray(rng.randn(2, 4, 4, c).astype(np.float32))
        masked, mask = lm.perturb_latent_code(
            code, lambda x: x * 1.5, target, num_classes=c,
            perturb_type=ptype, threshold=0.5, loss_type="mse", key=KEY)
        assert masked.shape == code.shape
        assert mask.shape == code.shape
        assert np.isfinite(np.asarray(masked)).all()

    def test_jittable(self):
        c = 8
        code = jnp.ones((2, 4, 4, c))
        target = jnp.zeros((2, 4, 4, c))

        @jax.jit
        def f(code, key):
            return lm.perturb_latent_code(code, lambda x: x, target,
                                          num_classes=c, perturb_type="random",
                                          threshold=0.5, loss_type="mse", key=key)[0]

        out = f(code, KEY)
        assert np.isfinite(np.asarray(out)).all()


class TestRandConv:
    def test_output_shape_and_detached(self):
        x = jnp.clip(jax.random.normal(KEY, (2, 16, 16, 1)), 0, 1)
        y = rand_conv_augment(jax.random.key(5), x)
        assert y.shape == x.shape
        g = jax.grad(lambda im: jnp.sum(rand_conv_augment(jax.random.key(5), im)))(x)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)

    def test_different_keys_different_outputs(self):
        x = jnp.clip(jax.random.normal(KEY, (2, 16, 16, 1)), 0, 1)
        y1 = rand_conv_augment(jax.random.key(1), x)
        y2 = rand_conv_augment(jax.random.key(2), x)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_kernel1_equivalent_masking(self):
        """With k=1 selected, the masked-7x7 conv must equal a pure 1x1 conv:
        output = alpha*x + (1-alpha)*(w00 * x) for single-channel."""
        # brute-force a key that selects k=1
        for seed in range(50):
            key = jax.random.key(seed)
            _, k_size, _, _ = jax.random.split(key, 4)
            if int(jax.random.randint(k_size, (), 0, 4)) == 0:
                break
        x = jnp.ones((1, 8, 8, 1))
        y = np.asarray(rand_conv_augment(key, x))
        # constant input + 1x1 kernel -> constant output
        np.testing.assert_allclose(y, y[0, 0, 0, 0], rtol=1e-4)
