"""Tests for the on-device augmentation pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import dataclasses
import pytest

from maxstyle_tpu.data import augment as A

KEY = jax.random.key(0)


def checkerboard(hw=64, period=8):
    y, x = np.mgrid[0:hw, 0:hw]
    return (((y // period) + (x // period)) % 2).astype(np.float32)


class TestPolicies:
    def test_registry_has_headline_policies(self):
        for name in ("no_aug", "ACDC_affine_elastic_intensity",
                     "Prostate_affine_elastic_intensity"):
            p = A.get_policy(name, (64, 64), (48, 48))
            assert p.crop_hw == (48, 48)

    def test_acdc_policy_values(self):
        p = A.get_policy("ACDC_affine_elastic_intensity")
        assert p.flip_p == 0.2 and p.rotate_deg == 15.0
        assert p.zoom_range == (0.8, 1.1)
        assert p.elastic_prob == 0.5 and p.intensity_prob == 0.5
        assert len(p.rotate_groups) == 8

    def test_unknown_policy_raises(self):
        with pytest.raises(KeyError):
            A.get_policy("nope")


class TestAugmentBatch:
    def test_no_aug_is_center_cropless_identity(self):
        """With no_aug, only the random crop + minmax apply."""
        p = A.get_policy("no_aug", (64, 64), (64, 64))  # crop == pad -> no offset
        img = np.stack([checkerboard()] * 2)
        lab = (img > 0.5).astype(np.int32)
        out_img, out_lab = A.augment_batch(KEY, jnp.asarray(img), jnp.asarray(lab), p)
        np.testing.assert_allclose(np.asarray(out_img)[..., 0], img, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_lab), lab)

    def test_shapes_and_ranges(self):
        p = A.get_policy("ACDC_affine_elastic_intensity", (64, 64), (48, 48))
        img = np.stack([checkerboard()] * 4)
        lab = (img > 0.5).astype(np.int32) * 3
        out_img, out_lab = A.augment_batch(KEY, jnp.asarray(img), jnp.asarray(lab), p)
        assert out_img.shape == (4, 48, 48, 1)
        assert out_lab.shape == (4, 48, 48)
        oi = np.asarray(out_img)
        assert oi.min() >= 0.0 and oi.max() <= 1.0 + 1e-6
        assert set(np.unique(np.asarray(out_lab))) <= {0, 3}

    def test_label_image_geometric_consistency(self):
        """Labels must move with the image: label = (img>0.5) must still
        roughly match after a pure geometric policy."""
        p = A.AugPolicy(pad_hw=(64, 64), crop_hw=(48, 48), rotate_deg=20.0,
                        zoom_range=(0.9, 1.1))
        img = checkerboard(64, 16)
        lab = (img > 0.5).astype(np.int32)
        out_img, out_lab = A.augment_batch(
            jax.random.key(3), jnp.asarray(img[None]), jnp.asarray(lab[None]), p)
        oi = np.asarray(out_img)[0, ..., 0]
        ol = np.asarray(out_lab)[0]
        agreement = ((oi > 0.5) == (ol > 0)).mean()
        assert agreement > 0.95

    def test_different_keys_give_different_augs(self):
        p = A.get_policy("ACDC_affine_elastic_intensity", (64, 64), (48, 48))
        img = jnp.asarray(np.stack([checkerboard()] * 2))
        lab = jnp.zeros((2, 64, 64), jnp.int32)
        o1, _ = A.augment_batch(jax.random.key(1), img, lab, p)
        o2, _ = A.augment_batch(jax.random.key(2), img, lab, p)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_same_key_reproducible(self):
        p = A.get_policy("Prostate_affine_elastic_intensity", (64, 64), (48, 48))
        img = jnp.asarray(np.stack([checkerboard()] * 2))
        lab = jnp.zeros((2, 64, 64), jnp.int32)
        o1, _ = A.augment_batch(jax.random.key(7), img, lab, p)
        o2, _ = A.augment_batch(jax.random.key(7), img, lab, p)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=0)


class TestNormBatch:
    def test_center_crop_and_norm(self):
        img = np.zeros((1, 64, 64), np.float32)
        img[0, 16:48, 16:48] = np.linspace(1, 5, 32)[None, :]
        lab = np.ones((1, 64, 64), np.int32)
        out_img, out_lab = A.norm_batch(jnp.asarray(img), jnp.asarray(lab), (32, 32))
        assert out_img.shape == (1, 32, 32, 1)
        oi = np.asarray(out_img)
        assert abs(oi.max() - 1.0) < 1e-5 and abs(oi.min()) < 1e-5
        assert np.asarray(out_lab).min() == 1


class TestElasticField:
    def test_fft_field_smoothness_increases_with_sigma(self):
        dy_s, _ = A._fft_gaussian_field(KEY, (64, 64), jnp.asarray(1.0),
                                        jnp.asarray(1.0))
        dy_l, _ = A._fft_gaussian_field(KEY, (64, 64), jnp.asarray(8.0),
                                        jnp.asarray(1.0))
        tv = lambda f: float(jnp.abs(jnp.diff(f, axis=0)).mean())
        # normalize by amplitude to compare roughness
        r_s = tv(dy_s) / (float(jnp.abs(dy_s).mean()) + 1e-9)
        r_l = tv(dy_l) / (float(jnp.abs(dy_l).mean()) + 1e-9)
        assert r_l < r_s


class TestPerturbV1:
    """MyRandomPurtarbation V1 (intensity_transform.py:274-372)."""

    def test_field_properties(self):
        from maxstyle_tpu.data.augment import _multiscale_bias_field
        f = _multiscale_bias_field(jax.random.key(0), (64, 64), (2, 4, 8),
                                   16.0, 0.3)
        f = np.asarray(f)
        assert f.shape == (64, 64)
        assert f.min() >= 0.7 - 1e-6 and f.max() <= 1.3 + 1e-6
        assert f.std() > 1e-4  # non-degenerate spatial modulation
        # smooth: neighbouring-pixel deltas are small vs the field's range
        assert np.abs(np.diff(f, axis=0)).max() < 0.05

    def test_policy_applies_noise_and_stays_in_range(self):
        from maxstyle_tpu.data import augment
        pol = dataclasses.replace(augment.no_aug((64, 64), (48, 48)),
                                  perturb_v1_prob=1.0)
        img = jnp.asarray(np.random.RandomState(0).rand(64, 64), jnp.float32)
        lab = jnp.zeros((64, 64), jnp.int32)
        out, _ = augment.augment_pair(jax.random.key(0), img, lab, pol)
        out = np.asarray(out)
        assert out.shape == (48, 48)
        assert out.min() >= 0.0 and out.max() <= 1.0
        # and the perturbation actually changed the image vs no_aug
        base, _ = augment.augment_pair(jax.random.key(0), img, lab,
                                       augment.no_aug((64, 64), (48, 48)))
        assert np.abs(out - np.asarray(base)).max() > 1e-3

    def test_v1_policies_registered(self):
        from maxstyle_tpu.data.augment import get_policy
        assert get_policy("ACDC_affine_perturb").perturb_v1_prob == 0.5
        assert get_policy("ACDC_affine_perturb").bias_field_prob == 0.0
        assert get_policy("Atrial_perturb").perturb_v1_prob == 0.5
        assert get_policy("ACDC_affine_perturb_v2").bias_field_prob == 0.5


class TestClahe:
    """CLAHE host transform (intensity_transform.py:12-65)."""

    def test_uniform_image_is_stable(self):
        from maxstyle_tpu.data.clahe import equalize_adapthist
        out = equalize_adapthist(np.full((64, 64), 0.5, np.float32))
        assert out.shape == (64, 64)
        assert np.all(np.isfinite(out))

    def test_enhances_local_contrast(self):
        from maxstyle_tpu.data.clahe import equalize_adapthist
        rng = np.random.RandomState(0)
        # low-contrast detail on a strong gradient: global equalization
        # can't recover it, CLAHE should
        gradient = np.linspace(0, 1, 96)[:, None] * np.ones((96, 96))
        detail = 0.02 * rng.rand(96, 96)
        img = (gradient * 0.9 + detail).astype(np.float32)
        out = equalize_adapthist(img, clip_limit=0.9)
        # local std (detail contrast) increases markedly
        def local_std(x):
            return np.mean([x[i:i+12, j:j+12].std()
                            for i in range(0, 96, 12) for j in range(0, 96, 12)])
        assert local_std(out) > 2.0 * local_std(detail)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_random_clahe_preserves_range_and_labels(self):
        from maxstyle_tpu.data.clahe import random_clahe
        rng = np.random.RandomState(3)
        vol = (rng.rand(2, 32, 32) * 4 - 1).astype(np.float32)
        lab = rng.randint(0, 3, (2, 32, 32))
        out, lab2 = random_clahe(np.random.RandomState(0), vol, label=lab)
        assert out.shape == vol.shape
        np.testing.assert_array_equal(lab2, lab)
        # per-slice range recovered (:55-57)
        for i in range(2):
            assert abs(out[i].min() - vol[i].min()) < 1e-4
            assert abs(out[i].max() - vol[i].max()) < 1e-3
