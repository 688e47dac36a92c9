"""Golden-value tests for losses vs independent numpy implementations.

These lock in the *reference semantics* documented in SURVEY.md §2.4 (e.g. the
mask-numel denominator of cross_entropy_2D, dice smooth=0.01 placement) without
porting any reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu import losses


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestCrossEntropy2D:
    def test_hard_labels_matches_manual(self, rng):
        logits = rng.randn(2, 8, 8, 4).astype(np.float32)
        labels = rng.randint(0, 4, size=(2, 8, 8))
        got = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels))
        log_p = _np_log_softmax(logits)
        nll = -np.take_along_axis(log_p, labels[..., None], axis=-1)
        want = nll.sum() / (2 * 8 * 8)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_hard_labels_class_weights_normalized_to_c(self, rng):
        logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 4, 4))
        w = [1.0, 2.0, 3.0]
        got = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels), weight=w)
        wn = np.array(w) / sum(w) * 3
        log_p = _np_log_softmax(logits)
        nll = -np.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
        want = (nll * wn[labels]).sum() / (2 * 4 * 4)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_soft_target_is_logits_by_default(self, rng):
        logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        target_logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        got = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(target_logits))
        q = _np_softmax(target_logits)
        want = -(q * _np_log_softmax(logits)).sum() / (2 * 4 * 4)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mask_zeroes_loss_but_keeps_denominator(self, rng):
        logits = rng.randn(1, 4, 4, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(1, 4, 4))
        mask = np.zeros((1, 4, 4, 1), np.float32)
        mask[0, :2] = 1.0
        got = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels),
                                      mask=jnp.asarray(mask))
        log_p = _np_log_softmax(logits)
        nll = -np.take_along_axis(log_p, labels[..., None], axis=-1)
        want = (nll * mask).sum() / 16.0  # denominator is numel, not mask sum
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_perfect_prediction_near_zero(self):
        labels = np.zeros((1, 4, 4), np.int32)
        logits = np.zeros((1, 4, 4, 2), np.float32)
        logits[..., 0] = 50.0
        got = losses.cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels))
        assert float(got) < 1e-6


class TestSoftDice:
    def test_perfect_onehot_close_to_zero(self):
        labels = np.zeros((2, 8, 8), np.int32)
        labels[:, 4:] = 1
        logits = np.where(
            np.arange(2)[None, None, None, :] == labels[..., None], 100.0, -100.0
        ).astype(np.float32)
        got = losses.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels), 2)
        assert float(got) < 1e-3

    def test_matches_manual_formula(self, rng):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 8, 8))
        got = losses.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels), 3)
        p = _np_softmax(logits).reshape(2, -1, 3)
        t = np.eye(3)[labels].reshape(2, -1, 3)
        inter = (p * t).sum(1) + 0.01
        union = p.sum(1) + t.sum(1) + 0.01
        want = 1 - (2 * inter / union).sum() / (2 * 3)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_foreground_only_ignores_bg(self, rng):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 8, 8))
        got = losses.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels), 3,
                                    class_ids=[1, 2])
        p = _np_softmax(logits).reshape(2, -1, 3)[:, :, 1:]
        t = np.eye(3)[labels].reshape(2, -1, 3)[:, :, 1:]
        inter = (p * t).sum(1)
        union = p.sum(1) + t.sum(1)
        want = 1 - ((2 * inter + 0.01) / (union + 0.01)).sum() / (2 * 2)
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestDivergences:
    def test_kl_self_is_zero(self, rng):
        x = rng.randn(2, 4, 4, 3).astype(np.float32)
        got = losses.kl_divergence(jnp.asarray(x), jnp.asarray(x))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_kl_positive(self, rng):
        a = rng.randn(2, 4, 4, 3).astype(np.float32)
        b = rng.randn(2, 4, 4, 3).astype(np.float32)
        assert float(losses.kl_divergence(jnp.asarray(a), jnp.asarray(b))) > 0

    def test_js_symmetric(self, rng):
        a = rng.randn(2, 4, 4, 3).astype(np.float32)
        b = rng.randn(2, 4, 4, 3).astype(np.float32)
        d1 = losses.js_divergence(jnp.asarray(a), jnp.asarray(b))
        d2 = losses.js_divergence(jnp.asarray(b), jnp.asarray(a))
        np.testing.assert_allclose(d1, d2, rtol=1e-5)
        assert float(d1) > 0

    def test_consistency_kl_contour_runs(self, rng):
        a = rng.randn(2, 16, 16, 4).astype(np.float32)
        b = rng.randn(2, 16, 16, 4).astype(np.float32)
        val = losses.segmentation_consistency(jnp.asarray(a), jnp.asarray(b))
        assert np.isfinite(float(val))


class TestReconLosses:
    def test_mse_has_half_factor(self, rng):
        a = rng.randn(2, 8, 8, 1).astype(np.float32)
        b = rng.randn(2, 8, 8, 1).astype(np.float32)
        got = losses.mse_recon_loss(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(got, 0.5 * ((a - b) ** 2).mean(), rtol=1e-5)

    def test_ngf_identical_images_zero(self, rng):
        a = rng.randn(2, 16, 16, 1).astype(np.float32)
        got = losses.ngf_loss(jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(got, 0.0, atol=1e-4)

    def test_tv_loss_flat_image_zero(self):
        a = np.ones((2, 8, 8, 1), np.float32)
        np.testing.assert_allclose(losses.tv_loss(jnp.asarray(a)), 0.0, atol=1e-7)


class TestContour:
    def test_identical_maps_zero(self, rng):
        labels = rng.randint(0, 3, size=(2, 16, 16))
        probs = np.eye(3)[labels].astype(np.float32)
        got = losses.contour_loss(jnp.asarray(probs), jnp.asarray(labels), num_classes=3)
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_gradient_flows(self, rng):
        labels = rng.randint(0, 3, size=(1, 16, 16))
        logits = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))

        def f(lg):
            return losses.contour_loss(jax.nn.softmax(lg, axis=-1),
                                       jnp.asarray(labels), num_classes=3)

        g = jax.grad(f)(logits)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


class TestBasicLossFn:
    @pytest.mark.parametrize("loss_type", [
        "cross entropy", "weighted cross entropy", "dice", "foreground dice",
        "focal", "contour_smooth"])
    def test_all_dispatch_paths(self, rng, loss_type):
        logits = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 4, size=(2, 16, 16)))
        val = losses.basic_loss_fn(logits, labels, loss_type=loss_type)
        assert np.isfinite(float(val))


class TestIntensity:
    def test_rescale_range(self, rng):
        from maxstyle_tpu.ops import intensity
        x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32) * 7 + 3)
        y = intensity.rescale_intensity(x)
        np.testing.assert_allclose(np.asarray(y).min(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y).max(axis=(1, 2)), 1.0, atol=1e-5)

    def test_z_score_moments(self, rng):
        from maxstyle_tpu.ops import intensity
        x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32) * 7 + 3)
        y = np.asarray(intensity.z_score_intensity(x))
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(axis=(1, 2), ddof=1), 1.0, atol=1e-4)

    def test_instance_norm_matches_torch_semantics(self, rng):
        from maxstyle_tpu.ops import intensity
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        y = np.asarray(intensity.instance_norm(jnp.asarray(x)))
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        want = (x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


class TestPrng:
    def test_non_identity_permutation(self):
        from maxstyle_tpu import prng
        for seed in range(20):
            perm = prng.non_identity_permutation(jax.random.key(seed), 4)
            assert not np.array_equal(np.asarray(perm), np.arange(4))
            assert sorted(np.asarray(perm).tolist()) == [0, 1, 2, 3]


class TestSoftDice3D:
    """SoftDiceLoss3D (custom_loss.py:589-623): identical arithmetic over
    NDHW volumes; our rank-general implementation covers it with
    channel-last [B,D,H,W,C] logits and [B,D,H,W] integer labels."""

    def test_3d_volume_matches_manual(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 4, 8, 8, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 4, 8, 8))
        got = losses.soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels), 3)
        p = _np_softmax(logits).reshape(2, -1, 3)
        t = np.eye(3)[labels].reshape(2, -1, 3)
        inter = (p * t).sum(1) + 0.01
        union = p.sum(1) + t.sum(1) + 0.01
        want = 1 - (2 * inter / union).sum() / (2 * 3)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_3d_selective_classes(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(1, 4, 6, 6, 4).astype(np.float32)
        labels = rng.randint(0, 4, size=(1, 4, 6, 6))
        full = float(losses.soft_dice_loss(jnp.asarray(logits),
                                           jnp.asarray(labels), 4))
        fg = float(losses.soft_dice_loss(jnp.asarray(logits),
                                         jnp.asarray(labels), 4,
                                         class_ids=[1, 2, 3]))
        assert np.isfinite(full) and np.isfinite(fg) and fg != full
