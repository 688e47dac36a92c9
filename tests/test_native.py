"""Native fastpack kernels vs their numpy references."""

import numpy as np
import pytest

from maxstyle_tpu import native
from maxstyle_tpu.data import medio


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


class TestCropOrPad:
    @pytest.mark.parametrize("shape,target", [
        ((3, 10, 12), (16, 16)),   # pure pad
        ((3, 20, 24), (16, 16)),   # pure crop
        ((3, 10, 24), (16, 16)),   # mixed
        ((2, 16, 16), (16, 16)),   # identity
    ])
    def test_matches_numpy_f32(self, lib, shape, target):
        vol = np.random.RandomState(0).rand(*shape).astype(np.float32)
        got = native.crop_or_pad(vol, target)
        want = medio.crop_or_pad(vol, target)
        np.testing.assert_array_equal(got, want)

    def test_matches_numpy_i32(self, lib):
        vol = np.random.RandomState(0).randint(0, 4, (2, 10, 30)).astype(np.int32)
        got = native.crop_or_pad(vol, (20, 20))
        want = medio.crop_or_pad(vol, (20, 20))
        np.testing.assert_array_equal(got, want)

    def test_pad_value(self, lib):
        vol = np.ones((1, 4, 4), np.float32)
        out = native.crop_or_pad(vol, (8, 8), pad_value=-1.0)
        assert out[0, 0, 0] == -1.0 and out[0, 4, 4] == 1.0


class TestGatherPack:
    @pytest.mark.parametrize("dtype", [np.float32, np.int32])
    def test_matches_fancy_indexing(self, lib, dtype):
        rng = np.random.RandomState(0)
        vols = [(rng.rand(s, 6, 7) * 100).astype(dtype) for s in (3, 5, 2)]
        vol_idx = np.asarray([0, 2, 1, 1, 0], np.int64)
        sl_idx = np.asarray([2, 1, 4, 0, 0], np.int64)
        got = native.gather_pack(vols, vol_idx, sl_idx)
        want = np.stack([vols[v][s] for v, s in zip(vol_idx, sl_idx)])
        assert got.dtype == dtype
        np.testing.assert_array_equal(got, want)

    def test_fallback_without_native(self, monkeypatch):
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        vols = [np.arange(12, dtype=np.float32).reshape(3, 2, 2)]
        out = native.gather_pack(vols, [0, 0], [2, 0])
        np.testing.assert_array_equal(out[0], vols[0][2])
        np.testing.assert_array_equal(out[1], vols[0][0])


class TestMinMaxNorm:
    def test_matches_numpy(self, lib):
        vol = (np.random.RandomState(0).rand(4, 8, 8) * 9 - 3).astype(np.float32)
        got = native.minmax_norm_slices(vol.copy())
        mn = vol.min(axis=(1, 2), keepdims=True)
        mx = vol.max(axis=(1, 2), keepdims=True)
        want = (vol - mn) / (mx - mn + 1e-20)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_fallback_without_native(self, monkeypatch):
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        vol = np.random.RandomState(0).rand(2, 8, 8).astype(np.float32)
        out = native.minmax_norm_slices(vol.copy())
        assert abs(out.max() - 1.0) < 1e-6 and abs(out.min()) < 1e-6
