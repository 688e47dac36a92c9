"""Utility-surface parity against the reference's OWN executable
basic_operations.py (construct_input, intensity norms, crop_or_pad)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu import solver as oursolver  # noqa: E402
from maxstyle_tpu.data import medio  # noqa: E402
from maxstyle_tpu.ops import intensity  # noqa: E402

pytestmark = pytest.mark.slow

B, C, H, W = 3, 4, 16, 16


@pytest.fixture(scope="module")
def bo():
    from tests.reference_shim import reference_module
    return reference_module("src.common_utils.basic_operations")


def nhwc(x_nchw):
    return jnp.asarray(np.moveaxis(x_nchw, 1, -1))


class TestIntensityNorms:
    def test_rescale_intensity(self, bo):
        rng = np.random.RandomState(0)
        x = (5 * rng.randn(B, 1, H, W) + 2).astype(np.float32)
        ref = bo.rescale_intensity(torch.from_numpy(x), 0, 1)
        ours = intensity.rescale_intensity(nhwc(x))
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-6, atol=1e-7)

    def test_z_score_intensity(self, bo):
        rng = np.random.RandomState(1)
        x = (3 * rng.rand(B, 1, H, W) - 1).astype(np.float32)
        ref = bo.z_score_intensity(torch.from_numpy(x))
        ours = intensity.z_score_intensity(nhwc(x))
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-5, atol=1e-6)


class TestConstructInput:
    def test_logits_softmax_temperature(self, bo):
        rng = np.random.RandomState(2)
        seg = rng.randn(B, C, H, W).astype(np.float32)
        img = rng.rand(B, 1, H, W).astype(np.float32)
        ref = bo.construct_input(torch.from_numpy(seg),
                                 image=torch.from_numpy(img),
                                 num_classes=C, apply_softmax=True,
                                 temperature=2, is_labelmap=False,
                                 use_gpu=False)
        ours = oursolver.construct_input(nhwc(seg), nhwc(img), C,
                                         apply_softmax=True,
                                         is_labelmap=False, temperature=2.0)
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-5, atol=1e-6)

    def test_labelmap_onehot(self, bo):
        rng = np.random.RandomState(3)
        lab = rng.randint(0, C, (B, H, W)).astype(np.int64)
        ref = bo.construct_input(torch.from_numpy(lab), image=None,
                                 num_classes=C, apply_softmax=False,
                                 is_labelmap=True, use_gpu=False)
        ours = oursolver.construct_input(jnp.asarray(lab), None, C,
                                         apply_softmax=False,
                                         is_labelmap=True)
        np.testing.assert_array_equal(
            np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1))


class TestCropOrPad:
    @pytest.mark.parametrize("shape,target", [
        ((5, 30, 30), (16, 16)),   # crop both
        ((5, 10, 10), (16, 16)),   # pad both
        ((5, 30, 10), (16, 16)),   # crop h, pad w
        ((5, 16, 16), (16, 16)),   # no-op
    ])
    def test_matches_reference(self, bo, shape, target):
        rng = np.random.RandomState(4)
        vol = rng.rand(*shape).astype(np.float32)
        ref_img, _, _, _, _, _ = bo.crop_or_pad(vol.copy(), target)
        ours = medio.crop_or_pad(vol, target)
        np.testing.assert_array_equal(ours, ref_img)
        # the native C++ fastpath agrees too
        from maxstyle_tpu import native
        np.testing.assert_array_equal(native.crop_or_pad(vol, target),
                                      ref_img)
