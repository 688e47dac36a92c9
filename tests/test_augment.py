"""Tests for the on-device augmentation pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
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
