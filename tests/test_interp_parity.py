"""Quantified parity between our bilinear warp and the reference's order-3
spline interpolation (SURVEY §7 hard part 5; VERDICT round-1 missing #7).

The reference augments with scipy order-3 `map_coordinates`
(/root/reference/src/dataset_loader/_utils/elastic_transform.py) while the
TPU pipeline samples bilinearly (data/augment.py:15-21 documents the
deliberate deviation). These tests replace the eyeball argument with
numbers: we evaluate OUR composed warp coordinates with a scipy order-3
fallback (`scipy.ndimage.map_coordinates`, exactly the reference's
interpolator) and bound the discrepancy on the reference's own real cardiac
fixture. The label path is nearest-neighbour in both frameworks, so labels
are checked for exact agreement against scipy order-0.
"""

import os

import numpy as np
import pytest

scipy_ndimage = pytest.importorskip("scipy.ndimage")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.data import augment as A  # noqa: E402

IMAGE_NPY = "/root/reference/notebooks/data/image.npy"


def order3_reference_warp(image: np.ndarray, sy: np.ndarray, sx: np.ndarray,
                          order: int = 3) -> np.ndarray:
    """The reference's interpolator on our composed inverse-warp coords."""
    return scipy_ndimage.map_coordinates(
        np.asarray(image, np.float64), [sy, sx], order=order, mode="constant",
        cval=0.0, prefilter=True).astype(np.float32)


def _policy():
    # the headline geometric chain at real scale (no intensity, so the
    # comparison isolates interpolation)
    return A.get_policy("ACDC_affine_elastic", pad_hw=(224, 224),
                        crop_hw=(192, 192))


@pytest.mark.skipif(not os.path.exists(IMAGE_NPY),
                    reason="reference fixture unavailable")
@pytest.mark.slow
def test_bilinear_vs_order3_on_real_cardiac_slices():
    vol = np.load(IMAGE_NPY)  # (20, 192, 192) in [0, 1]
    pol = _policy()
    rel_errs, psnrs = [], []
    for i, key in zip(range(6, 12), range(6)):
        img = np.zeros((224, 224), np.float32)
        img[16:208, 16:208] = vol[i]  # pad to the policy frame
        k = jax.random.key(key)
        sy, sx = A._aug_coords(k, pol)
        ours = np.asarray(A._sample_bilinear(jnp.asarray(img), sy, sx))
        ref = order3_reference_warp(img, np.asarray(sy), np.asarray(sx))
        # compare where both in-bounds (border fill conventions differ at
        # the half-pixel rim)
        sy_n, sx_n = np.asarray(sy), np.asarray(sx)
        inside = ((sy_n >= 1) & (sy_n <= 222) & (sx_n >= 1) & (sx_n <= 222))
        diff = (ours - ref)[inside]
        rng_ = ref[inside].max() - ref[inside].min() + 1e-12
        rel = np.abs(diff).mean() / rng_
        psnr = 10 * np.log10(1.0 / max(np.mean(diff ** 2), 1e-12))
        rel_errs.append(rel)
        psnrs.append(psnr)
    # mean |bilinear - order3| under 1.5% of the dynamic range, PSNR > 30 dB:
    # far below MR noise floor -> statistically equivalent training signal
    assert float(np.mean(rel_errs)) < 0.015, rel_errs
    assert float(np.mean(psnrs)) > 30.0, psnrs


def test_label_path_matches_scipy_order0_exactly():
    rng = np.random.RandomState(0)
    lab = rng.randint(0, 4, (64, 64)).astype(np.float32)
    pol = A.get_policy("ACDC_affine", pad_hw=(64, 64), crop_hw=(48, 48))
    sy, sx = A._aug_coords(jax.random.key(3), pol)
    ours = np.asarray(A._sample_nearest(jnp.asarray(lab), sy, sx))
    sy_n, sx_n = np.asarray(sy), np.asarray(sx)
    ref = scipy_ndimage.map_coordinates(lab, [sy_n, sx_n], order=0,
                                        mode="constant", cval=0.0)
    # identical up to knife-edge .5 rounding ties (round-half-even vs
    # half-up); allow a vanishing fraction of tie pixels to differ
    inside = ((sy_n >= 0) & (sy_n <= 63) & (sx_n >= 0) & (sx_n <= 63))
    mismatch = np.mean(ours[inside] != ref[inside])
    assert mismatch < 5e-3, mismatch


def test_order3_fallback_available_for_any_coords():
    """The fallback itself round-trips an identity warp exactly (sanity that
    parity tooling is trustworthy)."""
    img = np.random.RandomState(1).rand(32, 32).astype(np.float32)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    out = order3_reference_warp(img, yy, xx)
    np.testing.assert_allclose(out, img, atol=1e-5)
