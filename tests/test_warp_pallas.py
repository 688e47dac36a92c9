"""Fused MXU warp kernel (ops/warp_pallas.py) vs the jnp gather reference.

On CPU the pallas_call runs in interpreter mode — the identical kernel code
path the TPU compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.data import augment as A
from maxstyle_tpu.ops.warp_pallas import warp_bilinear_nearest


def _random_problem(seed=0, n=3, src=64, out=48):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(n, src, src).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 4, (n, src, src)).astype(np.int32))
    # coords straddle the borders to exercise clipping + outside fill
    sy = jnp.asarray((rng.rand(n, out, out) * (src + 16) - 8).astype(np.float32))
    sx = jnp.asarray((rng.rand(n, out, out) * (src + 16) - 8).astype(np.float32))
    return img, lab, sy, sx


class TestWarpKernelParity:
    def test_bilinear_matches_gather(self):
        img, lab, sy, sx = _random_problem()
        oi, _ = warp_bilinear_nearest(img, lab, sy, sx, (48, 48), interpret=True)
        ri = jax.vmap(A._sample_bilinear)(img, sy, sx)
        np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=1e-5)

    def test_nearest_label_exact(self):
        img, lab, sy, sx = _random_problem(seed=1)
        _, ol = warp_bilinear_nearest(img, lab, sy, sx, (48, 48), interpret=True)
        rl = jax.vmap(lambda l, y, x: A._sample_nearest(
            l.astype(jnp.float32), y, x).astype(jnp.int32))(lab, sy, sx)
        assert int((ol != rl).sum()) == 0

    def test_outside_fill_zero(self):
        img, lab, _, _ = _random_problem(seed=2)
        far = jnp.full((3, 48, 48), 1000.0)
        oi, ol = warp_bilinear_nearest(img, lab, far, far, (48, 48),
                                       interpret=True)
        assert float(jnp.abs(oi).max()) == 0.0
        assert int(jnp.abs(ol).max()) == 0

    def test_nonmultiple_pixel_count_padding(self):
        # 30x30 output = 900 pixels, far from a TILE_P multiple
        img, lab, sy, sx = _random_problem(seed=3, out=30)
        oi, _ = warp_bilinear_nearest(img, lab, sy, sx, (30, 30), interpret=True)
        ri = jax.vmap(A._sample_bilinear)(img, sy, sx)
        np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=1e-5)

    def test_identity_warp_is_identity(self):
        img, lab, _, _ = _random_problem(seed=4, src=48, out=48)
        yy = jnp.broadcast_to(jnp.arange(48.0)[:, None], (48, 48))
        xx = jnp.broadcast_to(jnp.arange(48.0)[None, :], (48, 48))
        sy = jnp.broadcast_to(yy, (3, 48, 48))
        sx = jnp.broadcast_to(xx, (3, 48, 48))
        oi, ol = warp_bilinear_nearest(img, lab, sy, sx, (48, 48), interpret=True)
        np.testing.assert_allclose(np.asarray(oi), np.asarray(img), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ol), np.asarray(lab))


class TestCubicWarpKernelParity:
    """Four-hot cubic kernel (warp_cubic_nearest) vs the gather cubic op
    (ops/spline.map_coordinates_cubic) — identical semantics, MXU cost of
    the bilinear kernel."""

    def test_cubic_matches_gather_spline(self):
        from maxstyle_tpu.ops.spline import map_coordinates_cubic
        from maxstyle_tpu.ops.warp_pallas import warp_cubic_nearest
        img, lab, sy, sx = _random_problem(seed=5)
        oi, _ = warp_cubic_nearest(img, lab, sy, sx, (48, 48),
                                   interpret=True)
        ri = jax.vmap(map_coordinates_cubic)(img, sy, sx)
        np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=2e-5)

    def test_cubic_matches_scipy(self):
        scipy_ndimage = pytest.importorskip("scipy.ndimage")
        from maxstyle_tpu.ops.warp_pallas import warp_cubic_nearest
        img, lab, sy, sx = _random_problem(seed=6, n=2)
        oi, _ = warp_cubic_nearest(img, lab, sy, sx, (48, 48),
                                   interpret=True)
        for i in range(2):
            ref = scipy_ndimage.map_coordinates(
                np.asarray(img[i], np.float64),
                [np.asarray(sy[i]), np.asarray(sx[i])], order=3,
                mode="constant", cval=0.0, prefilter=True)
            np.testing.assert_allclose(np.asarray(oi[i]), ref, atol=5e-5)

    def test_nearest_label_exact(self):
        from maxstyle_tpu.ops.warp_pallas import (warp_bilinear_nearest,
                                                  warp_cubic_nearest)
        img, lab, sy, sx = _random_problem(seed=7)
        _, ol_c = warp_cubic_nearest(img, lab, sy, sx, (48, 48),
                                     interpret=True)
        _, ol_b = warp_bilinear_nearest(img, lab, sy, sx, (48, 48),
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(ol_c), np.asarray(ol_b))

    def test_identity_warp_is_identity(self):
        from maxstyle_tpu.ops.warp_pallas import warp_cubic_nearest
        img, lab, _, _ = _random_problem(seed=8, src=48, out=48)
        yy = jnp.broadcast_to(jnp.arange(48.0)[:, None], (48, 48))
        xx = jnp.broadcast_to(jnp.arange(48.0)[None, :], (48, 48))
        sy = jnp.broadcast_to(yy, (3, 48, 48))
        sx = jnp.broadcast_to(xx, (3, 48, 48))
        oi, ol = warp_cubic_nearest(img, lab, sy, sx, (48, 48),
                                    interpret=True)
        # cubic interpolation reproduces the samples at grid points
        np.testing.assert_allclose(np.asarray(oi), np.asarray(img),
                                   atol=5e-5)
        np.testing.assert_array_equal(np.asarray(ol), np.asarray(lab))


class TestAugmentBackends:
    def test_batch_backends_agree(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(4, 64, 64).astype(np.float32))
        lab = jnp.asarray(rng.randint(0, 4, (4, 64, 64)).astype(np.int32))
        pol = A.get_policy("ACDC_affine_elastic_intensity", (64, 64), (48, 48))
        key = jax.random.key(3)
        gi, gl = A.augment_batch(key, img, lab, pol, warp_backend="gather")
        pi, pl_ = A.augment_batch(key, img, lab, pol, warp_backend="pallas")
        np.testing.assert_allclose(np.asarray(gi), np.asarray(pi), atol=2e-5)
        # nearest ties at exact .5 fractions may differ (documented); random
        # float coords make them measure-zero
        assert int((gl != pl_).sum()) == 0

    def test_augment_pair_unchanged_reference_path(self):
        # the per-sample gather path must keep its RNG stream: same key in
        # pair and batch('gather') produces the same output
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(2, 64, 64).astype(np.float32))
        lab = jnp.asarray(rng.randint(0, 4, (2, 64, 64)).astype(np.int32))
        # no-elastic policy: the batched FFT of the elastic field is not
        # bitwise identical to the single-sample FFT, which moves a handful
        # of floor()-boundary taps
        pol = A.get_policy("ACDC_affine_intensity", (64, 64), (48, 48))
        key = jax.random.key(9)
        keys = jax.random.split(key, 2)
        i0, l0 = A.augment_pair(keys[0], img[0], lab[0], pol)
        bi, bl = A.augment_batch(key, img, lab, pol, warp_backend="gather")
        # vmapped and single-sample programs compile differently; allow
        # accumulation-order noise, not semantic drift
        np.testing.assert_allclose(np.asarray(bi[0, ..., 0]), np.asarray(i0),
                                   atol=1e-4)
        mismatch = int((np.asarray(bl[0]) != np.asarray(l0)).sum())
        assert mismatch <= l0.size * 0.005, mismatch
