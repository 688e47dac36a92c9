"""Cubic B-spline interpolation (scipy `map_coordinates(order=3)`
semantics) as a jittable TPU op.

The reference augments with order-3 splines (dataset_loader/_utils/
elastic_transform.py: per-class `scipy.ndimage.map_coordinates(...,
order=3)`; affine_transform.py bilinear), which JAX's
`jax.scipy.ndimage.map_coordinates` cannot express (orders 0/1 only).
Round 1-3 shipped a quantified bilinear deviation (<1.5% of dynamic
range, tests/test_interp_parity.py); this module closes it with the real
thing:

* `spline_filter1d` / `spline_filter2d` — Unser's recursive prefilter
  (pole z = sqrt(3)-2, gain 6, mirror boundary init — the same algorithm
  scipy's C implementation uses), expressed as two `lax.scan`s per axis.
  Scan length = image extent (~224): sequential on that axis but fully
  vectorized across the other axis and the vmapped batch, and the filter
  runs once per sample while the 16-tap evaluation dominates.
* `sample_cubic` — 4x4-tap B-spline evaluation of the prefiltered
  coefficients at float coordinates, with scipy's `mode="constant"`
  out-of-bounds semantics (taps outside the grid read 0, points farther
  than the support radius outside return `fill`).
* `map_coordinates_cubic` — the two composed; drop-in for the gather
  warp in data/augment.py (`AugPolicy.image_interp = "cubic"`).

Numerics are pinned against scipy in tests/test_spline.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# cubic B-spline pole (Unser 1993; scipy ni_interpolation.c order-3)
_POLE = math.sqrt(3.0) - 2.0
_GAIN = 6.0  # (1 - z)(1 - 1/z) for the cubic pole


def spline_filter1d(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Cubic B-spline coefficient prefilter along `axis`, mirror boundary
    (scipy.ndimage.spline_filter1d(order=3, mode='mirror'))."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n < 2:
        out = x  # a single sample is its own coefficient
        return jnp.moveaxis(out, 0, axis)
    z = jnp.asarray(_POLE, x.dtype)

    xg = x * _GAIN
    # causal init: c+[0] over the mirror extension. For n > 28 the
    # truncated sum (z^k underflows f32 past 28 terms) matches scipy; for
    # small n use the exact closed form over the full reflected period
    # (scipy's exact-boundary branch) — shapes are static so this branch
    # resolves at trace time.
    if n > 28:
        pw = z ** jnp.arange(28, dtype=x.dtype)
        c0 = jnp.tensordot(pw, xg[:28], axes=[[0], [0]])
    else:
        # sum_{i} (z^i + z^{2n-2-i}) x_i over the full reflected period
        k = jnp.arange(1, n - 1, dtype=x.dtype)
        wts = z ** k + z ** (2 * (n - 1) - k)
        inner = jnp.tensordot(wts, xg[1:n - 1], axes=[[0], [0]])
        c0 = (xg[0] + z ** (n - 1) * xg[n - 1] + inner) \
            / (1.0 - z ** (2 * n - 2))

    def fwd(c, xk):
        c2 = xk + z * c
        return c2, c2

    _, cp_rest = jax.lax.scan(fwd, c0, xg[1:])
    cp = jnp.concatenate([c0[None], cp_rest], axis=0)

    # anticausal init (mirror, Unser eq. 2.6 / scipy _sym_iir)
    c_last = (z / (z * z - 1.0)) * (cp[n - 1] + z * cp[n - 2])

    def bwd(c, cpk):
        c2 = z * (c - cpk)
        return c2, c2

    _, cm_rest = jax.lax.scan(bwd, c_last, cp[:-1], reverse=True)
    out = jnp.concatenate([cm_rest, c_last[None]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def spline_filter2d(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] image -> cubic spline coefficients (both axes filtered)."""
    return spline_filter1d(spline_filter1d(img, axis=0), axis=1)


def _bspline_weights(t: jnp.ndarray):
    """Cubic B-spline basis at fractional offset t in [0,1): weights for
    taps at floor-1, floor, floor+1, floor+2."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
    w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
    w3 = t3 / 6.0
    return w0, w1, w2, w3


def sample_cubic(coeffs: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                 fill: float = 0.0) -> jnp.ndarray:
    """Evaluate prefiltered coefficients [H,W] at float coords [...].

    scipy mode='constant' semantics (verified against scipy 1.17):
    in-bounds points evaluate with MIRROR tap extension (whole-sample
    reflect: -1 -> 1, N -> N-2), and only coordinates strictly outside
    [0, N-1] return `fill` (matching the bilinear sampler's `inside`
    convention, data/augment.py)."""
    h, w = coeffs.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = _bspline_weights(ys - y0)
    wx = _bspline_weights(xs - x0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def _reflect(idx, n):
        idx = jnp.where(idx < 0, -idx, idx)
        idx = jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)
        return jnp.clip(idx, 0, n - 1)  # far-outside coords are fill anyway

    out = jnp.zeros(ys.shape, coeffs.dtype)
    for i in range(4):
        yc = _reflect(y0i + (i - 1), h)
        for j in range(4):
            xc = _reflect(x0i + (j - 1), w)
            out = out + wy[i] * wx[j] * coeffs[yc, xc]
    inside = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    return jnp.where(inside, out, fill)


def map_coordinates_cubic(img: jnp.ndarray, ys: jnp.ndarray,
                          xs: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """scipy.ndimage.map_coordinates(img, [ys, xs], order=3,
    mode='constant', prefilter=True) for 2D images, jittable."""
    return sample_cubic(spline_filter2d(img), ys, xs, fill=fill)
