"""Native host-side data-path kernels (C++ via ctypes).

Compiled on first import with g++ into a cached shared library; every entry
point has a numpy fallback so the framework runs without a toolchain. Used
by the dataset layer for crop-or-pad, per-slice normalization and batch
packing — the only host work left once augmentation runs on device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "fastpack.cpp")
    cache_dir = os.environ.get("MAXSTYLE_NATIVE_CACHE",
                               os.path.join(tempfile.gettempdir(),
                                            "maxstyle_native"))
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libfastpack.so")
    if not os.path.exists(lib_path) or (os.path.getmtime(lib_path)
                                        < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.crop_or_pad_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64,
                                    ctypes.c_float]
    lib.crop_or_pad_i32.argtypes = [i32p, i64, i64, i64, i32p, i64, i64,
                                    ctypes.c_int32]
    lib.minmax_norm_slices_f32.argtypes = [f32p, i64, i64, ctypes.c_float]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.gather_pack_f32.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), i64p, i64p,
        i64, i64, i64, f32p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("MAXSTYLE_DISABLE_NATIVE"):
            _LIB = None
        else:
            _LIB = _build_and_load()
    return _LIB


def crop_or_pad(volume: np.ndarray, target_hw, pad_value: float = 0.0
                ) -> np.ndarray:
    """Native center crop-or-pad ([S,H,W] -> [S,TH,TW]); numpy fallback."""
    lib = get_lib()
    s, h, w = volume.shape
    th, tw = target_hw
    if lib is not None and volume.dtype in (np.float32, np.int32):
        vol = np.ascontiguousarray(volume)
        out = np.empty((s, th, tw), vol.dtype)
        if vol.dtype == np.float32:
            lib.crop_or_pad_f32(vol, s, h, w, out, th, tw, float(pad_value))
        else:
            lib.crop_or_pad_i32(vol, s, h, w, out, th, tw, int(pad_value))
        return out
    from maxstyle_tpu.data import medio
    return medio.crop_or_pad(volume, target_hw, pad_value)


def gather_pack(volumes, vol_idx, slice_idx) -> np.ndarray:
    """Pack out[i] = volumes[vol_idx[i]][slice_idx[i]] from equally-shaped
    [S,H,W] 4-byte-element volumes into one [N,H,W] batch with a single
    native call (one memcpy per slice, no per-slice Python).

    Accepts float32 or int32 volumes: the kernel is a pure memcpy, so int32
    data is routed through the f32 entry point via a bit-preserving view.
    """
    vols = [np.ascontiguousarray(v) for v in volumes]
    dtype = vols[0].dtype
    assert dtype in (np.float32, np.int32) and dtype.itemsize == 4
    h, w = vols[0].shape[1:]
    vol_idx = np.ascontiguousarray(vol_idx, np.int64)
    slice_idx = np.ascontiguousarray(slice_idx, np.int64)
    n = vol_idx.shape[0]
    out = np.empty((n, h, w), dtype)
    lib = get_lib()
    if lib is not None:
        fptr = ctypes.POINTER(ctypes.c_float)
        ptrs = (fptr * len(vols))(*[v.ctypes.data_as(fptr) for v in vols])
        lib.gather_pack_f32(ptrs, vol_idx, slice_idx, n, h, w,
                            out.view(np.float32))
        return out
    for i in range(n):
        out[i] = vols[vol_idx[i]][slice_idx[i]]
    return out


def minmax_norm_slices(volume: np.ndarray, eps: float = 1e-20) -> np.ndarray:
    """Per-slice min-max normalization to [0,1] (in-place native path)."""
    lib = get_lib()
    if lib is not None and volume.dtype == np.float32:
        vol = np.ascontiguousarray(volume)
        s = vol.shape[0]
        lib.minmax_norm_slices_f32(vol, s, int(np.prod(vol.shape[1:])), eps)
        return vol
    mn = volume.min(axis=(1, 2), keepdims=True)
    mx = volume.max(axis=(1, 2), keepdims=True)
    return ((volume - mn) / (mx - mn + eps)).astype(np.float32)
