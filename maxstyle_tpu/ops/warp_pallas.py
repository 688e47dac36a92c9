"""Fused image+label warp as MXU matmuls (Pallas, TPU).

The augmentation chain's inverse warp (data/augment.py) needs, per output
pixel, a 4-tap bilinear read of the image and a nearest read of the label at
arbitrary float coordinates. XLA lowers that to element gathers, which TPUs
execute at a crawl (~0.3 GB/s effective — measured 23 ms per 10-slice batch
in round 1, dominating the 26 ms on-device augmentation; docs/VALIDATION.md).

TPU-first redesign: a gather from a small image IS a matmul with a one-hot
matrix — and matmuls are what the MXU does at speed-of-light. Bilinear
interpolation along rows is a *two*-hot matrix R[p, y0]=1-wy, R[p, y1]=wy, so

    out[p] = sum_c ( R @ img )[p, c] * C[p, c]

with a two-hot column matrix C gives the exact 4-tap bilinear sample; a
one-hot R/C built from rounded weights gives the exact nearest sample (used
for labels — label ids must never blend). The kernel tiles output pixels
(grid = samples x pixel-tiles), keeps the whole source image + label
resident in VMEM across the inner tiles (224^2 f32 = 200 KB each), builds
the two-hot tiles in registers, and never materializes them in HBM: traffic
is one image+label read per sample plus coordinates — ~1 MB/sample vs the
~200 MB/sample a jnp einsum formulation would stream.

Semantics match data/augment._sample_bilinear/_sample_nearest (index clip +
outside-fill 0) with one documented exception: nearest rounding of exact
half-pixel fractions is round-half-up here vs numpy round-half-to-even
(measure-zero for random float coordinates).

Off-TPU the pallas_call runs in interpreter mode so CPU tests exercise the
identical code path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 1024  # output pixels per grid step (8 sublane rows x 128 lanes)


def _warp_kernel(coord_ref, img_ref, lab_ref, out_img_ref, out_lab_ref):
    """One (sample, pixel-tile) step.

    coord_ref: [1, TILE_P, 8] f32 — columns are
      0: y0 (clipped floor row)   1: y1 (clipped y0+1)   2: wy (frac)
      3: x0                       4: x1                  5: wx
      6: bilinear inside mask     7: nearest inside mask
    img_ref / lab_ref: [1, H, W] f32 (label pre-cast; ids exact in f32)
    out_*_ref: [1, TILE_P//128, 128] f32 (pixel tile folded into vreg rows)
    """
    coords = coord_ref[0]                       # [TILE_P, 8]
    img = img_ref[0]                            # [H, W]
    lab = lab_ref[0]
    h_src, w_src = img.shape

    y0 = coords[:, 0:1].astype(jnp.int32)
    y1 = coords[:, 1:2].astype(jnp.int32)
    wy = coords[:, 2:3]
    x0 = coords[:, 3:4].astype(jnp.int32)
    x1 = coords[:, 4:5].astype(jnp.int32)
    wx = coords[:, 5:6]

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, h_src), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, w_src), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    # bilinear two-hot row/col matrices; if clipping made y0==y1 the two
    # terms land on the same entry and sum to 1 (same as clipped gather)
    row_b = (jnp.where(iota_h == y0, one, zero) * (1.0 - wy)
             + jnp.where(iota_h == y1, one, zero) * wy)
    col_b = (jnp.where(iota_w == x0, one, zero) * (1.0 - wx)
             + jnp.where(iota_w == x1, one, zero) * wx)
    # nearest one-hot (round-half-up on the fraction)
    row_n = jnp.where(iota_h == jnp.where(wy >= 0.5, y1, y0), one, zero)
    col_n = jnp.where(iota_w == jnp.where(wx >= 0.5, x1, x0), one, zero)

    t_img = jnp.dot(row_b, img, preferred_element_type=jnp.float32)
    t_lab = jnp.dot(row_n, lab, preferred_element_type=jnp.float32)

    img_val = jnp.sum(t_img * col_b, axis=1)
    lab_val = jnp.sum(t_lab * col_n, axis=1)

    out_img_ref[0] = (img_val * coords[:, 6]).reshape(TILE_P // 128, 128)
    out_lab_ref[0] = (lab_val * coords[:, 7]).reshape(TILE_P // 128, 128)


def _pack_coords(sy: jnp.ndarray, sx: jnp.ndarray, src_hw: Tuple[int, int],
                 tile_p: int) -> jnp.ndarray:
    """[N,h,w] float coords -> [N, P_padded, 8] kernel coordinate block."""
    h_src, w_src = src_hw
    n = sy.shape[0]
    ys = sy.reshape(n, -1)
    xs = sx.reshape(n, -1)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = ys - y0f
    wx = xs - x0f
    y0 = jnp.clip(y0f, 0, h_src - 1)
    y1 = jnp.clip(y0f + 1, 0, h_src - 1)
    x0 = jnp.clip(x0f, 0, w_src - 1)
    x1 = jnp.clip(x0f + 1, 0, w_src - 1)
    inside_b = ((ys >= 0) & (ys <= h_src - 1)
                & (xs >= 0) & (xs <= w_src - 1)).astype(jnp.float32)
    inside_n = ((ys >= -0.5) & (ys <= h_src - 0.5)
                & (xs >= -0.5) & (xs <= w_src - 0.5)).astype(jnp.float32)
    coords = jnp.stack([y0, y1, wy, x0, x1, wx, inside_b, inside_n], axis=-1)
    p = coords.shape[1]
    pad = (-p) % tile_p
    if pad:
        coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    return coords


@partial(jax.jit, static_argnames=("out_hw", "interpret"))
def warp_bilinear_nearest(images: jnp.ndarray, labels: jnp.ndarray,
                          sy: jnp.ndarray, sx: jnp.ndarray,
                          out_hw: Tuple[int, int],
                          interpret: bool = False):
    """Batched fused warp.

    images: [N,H,W] f32; labels: [N,H,W] (any int/float); sy/sx: [N,h,w]
    source coordinates. Returns ([N,h,w] f32 bilinear, [N,h,w] int32
    nearest).
    """
    n, h_src, w_src = images.shape
    h, w = out_hw
    p = h * w
    p_pad = p + ((-p) % TILE_P)
    num_tiles = p_pad // TILE_P

    coords = _pack_coords(sy, sx, (h_src, w_src), TILE_P)
    lab_f = labels.astype(jnp.float32)

    flops = 2 * n * p_pad * h_src * (w_src + 2)  # two dots per tile row
    out_img, out_lab = pl.pallas_call(
        _warp_kernel,
        grid=(n, num_tiles),  # pixel tiles innermost: image stays in VMEM
        in_specs=[
            pl.BlockSpec((1, TILE_P, 8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_src, w_src), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_src, w_src), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_P // 128, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_P // 128, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, p_pad // 128, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(images.size + lab_f.size + coords.size
                            + 2 * n * p_pad) * 4,
            transcendentals=0),
        interpret=interpret,
    )(coords, images.astype(jnp.float32), lab_f)

    img = out_img.reshape(n, p_pad)[:, :p].reshape(n, h, w)
    lab = jnp.round(out_lab.reshape(n, p_pad)[:, :p]
                    ).astype(jnp.int32).reshape(n, h, w)
    return img, lab


def _reflect_idx(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Whole-sample mirror (-1 -> 1, n -> n-2) + clip, matching
    ops/spline.sample_cubic's tap extension (scipy mode='constant')."""
    idx = jnp.where(idx < 0, -idx, idx)
    idx = jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)
    return jnp.clip(idx, 0, n - 1)


def _warp_cubic_kernel(coord_ref, coef_ref, lab_ref, out_img_ref,
                       out_lab_ref):
    """Cubic variant of `_warp_kernel`: the interpolation matrices are
    FOUR-hot (B-spline weights at floor-1..floor+2, mirror-reflected at
    the rim) applied to the PREFILTERED spline coefficients — same
    [TILE_P, H] x [H, W] matmul shape as bilinear, so order-3 warping
    costs the MXU exactly what order-1 does.

    coord_ref: [1, TILE_P, 8] f32 — columns are
      0: floor(y)  1: wy (frac)  2: floor(x)  3: wx
      4: cubic inside mask       5: nearest inside mask  (6,7 unused)
    coef_ref: [1, H, W] f32 spline coefficients (ops/spline.spline_filter2d)
    lab_ref:  [1, H, W] f32 raw labels (nearest path, ids exact in f32)
    """
    coords = coord_ref[0]
    coef = coef_ref[0]
    lab = lab_ref[0]
    h_src, w_src = coef.shape

    y0 = coords[:, 0:1].astype(jnp.int32)
    wy = coords[:, 1:2]
    x0 = coords[:, 2:3].astype(jnp.int32)
    wx = coords[:, 3:4]

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, h_src), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, w_src), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    def bweights(t):
        t2 = t * t
        t3 = t2 * t
        return ((1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0,
                (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0,
                (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0,
                t3 / 6.0)

    def fourhot(iota, base, frac, n):
        ws = bweights(frac)
        acc = zero * iota.astype(jnp.float32)
        for k in range(4):
            tap = _reflect_idx(base + (k - 1), n)
            acc = acc + jnp.where(iota == tap, one, zero) * ws[k]
        return acc

    row_c = fourhot(iota_h, y0, wy, h_src)
    col_c = fourhot(iota_w, x0, wx, w_src)
    # nearest one-hot for labels (round-half-up, same as bilinear kernel)
    y_n = jnp.clip(jnp.where(wy >= 0.5, y0 + 1, y0), 0, h_src - 1)
    x_n = jnp.clip(jnp.where(wx >= 0.5, x0 + 1, x0), 0, w_src - 1)
    row_n = jnp.where(iota_h == y_n, one, zero)
    col_n = jnp.where(iota_w == x_n, one, zero)

    t_img = jnp.dot(row_c, coef, preferred_element_type=jnp.float32)
    t_lab = jnp.dot(row_n, lab, preferred_element_type=jnp.float32)

    img_val = jnp.sum(t_img * col_c, axis=1)
    lab_val = jnp.sum(t_lab * col_n, axis=1)

    out_img_ref[0] = (img_val * coords[:, 4]).reshape(TILE_P // 128, 128)
    out_lab_ref[0] = (lab_val * coords[:, 5]).reshape(TILE_P // 128, 128)


def _pack_coords_cubic(sy: jnp.ndarray, sx: jnp.ndarray,
                       src_hw: Tuple[int, int], tile_p: int) -> jnp.ndarray:
    h_src, w_src = src_hw
    n = sy.shape[0]
    ys = sy.reshape(n, -1)
    xs = sx.reshape(n, -1)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    inside_c = ((ys >= 0) & (ys <= h_src - 1)
                & (xs >= 0) & (xs <= w_src - 1)).astype(jnp.float32)
    inside_n = ((ys >= -0.5) & (ys <= h_src - 0.5)
                & (xs >= -0.5) & (xs <= w_src - 0.5)).astype(jnp.float32)
    zeros = jnp.zeros_like(ys)
    coords = jnp.stack([y0f, ys - y0f, x0f, xs - x0f,
                        inside_c, inside_n, zeros, zeros], axis=-1)
    p = coords.shape[1]
    pad = (-p) % tile_p
    if pad:
        coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    return coords


@partial(jax.jit, static_argnames=("out_hw", "interpret"))
def warp_cubic_nearest(images: jnp.ndarray, labels: jnp.ndarray,
                       sy: jnp.ndarray, sx: jnp.ndarray,
                       out_hw: Tuple[int, int], interpret: bool = False):
    """Batched fused CUBIC warp: images order-3 B-spline
    (ops/spline.map_coordinates_cubic semantics), labels nearest.

    The recursive prefilter runs as lax.scans outside the kernel (once
    per sample, VPU-bound); the per-pixel 16-tap evaluation rides the
    MXU as four-hot matmuls at the same cost as the bilinear kernel."""
    from maxstyle_tpu.ops.spline import spline_filter2d

    n, h_src, w_src = images.shape
    h, w = out_hw
    p = h * w
    p_pad = p + ((-p) % TILE_P)
    num_tiles = p_pad // TILE_P

    coeffs = jax.vmap(spline_filter2d)(images.astype(jnp.float32))
    coords = _pack_coords_cubic(sy, sx, (h_src, w_src), TILE_P)
    lab_f = labels.astype(jnp.float32)

    flops = 2 * n * p_pad * h_src * (w_src + 2)
    out_img, out_lab = pl.pallas_call(
        _warp_cubic_kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_P, 8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_src, w_src), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_src, w_src), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_P // 128, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_P // 128, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, p_pad // 128, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(coeffs.size + lab_f.size + coords.size
                            + 2 * n * p_pad) * 4,
            transcendentals=0),
        interpret=interpret,
    )(coords, coeffs, lab_f)

    img = out_img.reshape(n, p_pad)[:, :p].reshape(n, h, w)
    lab = jnp.round(out_lab.reshape(n, p_pad)[:, :p]
                    ).astype(jnp.int32).reshape(n, h, w)
    return img, lab


def warp_backend_default() -> str:
    """'pallas' on real TPU, 'gather' elsewhere (the jnp reference path)."""
    from maxstyle_tpu.utils.backend import default_backend
    return "pallas" if default_backend() not in ("cpu", "gpu") else "gather"
