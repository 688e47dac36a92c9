"""Fused Pallas TPU kernels for the MaxStyle hot path.

Three kernels cover the op end-to-end (BASELINE.json north star: fuse the
per-channel instance-stat extraction, style mixing and eps*std noise
injection instead of separate framework ops):

* `_stats_kernel`  — per-sample channel stats: one VMEM pass over x[b]
  producing sum and sum-of-squares via MXU dot (ones-vector contraction), so
  the [HW, C] reduction rides the systolic array instead of the VPU tree.
* `_apply_kernel`  — out[b] = scale[b] ⊙ x[b] + shift[b]: the normalize /
  mix / noise chain algebraically folded into one affine map per (b, c)
  (scale = (sig_mix + eps_g*gamma_std)/sig, shift = mu_mix + eps_b*beta_std
  - mu*scale), one read + one write.
* `_bwd_kernel`    — the custom VJP: in a single pass over (g, x) computes
  dx = g ⊙ scale AND the two reductions Σg, Σgx that all parameter
  gradients (d_lmda, d_eps_gamma, d_eps_beta) are linear functions of.

Gradient semantics match the reference exactly (maxstyle.py:157-188):
mu/sig and the batch-level stat spreads are detached; lmda is clamped to
[0,1] with clamp-interior-only gradients.

The batch-level algebra (permutation gather, std-over-batch, clamp, gate)
operates on [B, C] tensors — negligible, left in jnp between kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maxstyle_tpu.config import MaxStyleConfig
from maxstyle_tpu.ops.maxstyle import (MaxStyleParams, MaxStyleState,
                                       _group_size, _group_std)


def _interpret() -> bool:
    """Pallas compiles natively on TPU; interpret elsewhere (CPU tests)."""
    from maxstyle_tpu.utils.backend import default_backend
    return default_backend() != "tpu"


def _stats_kernel(x_ref, out_ref):
    """x_ref: [1, HW, C] -> out_ref: [1, 2, C] = [sum, sum_sq]."""
    x = x_ref[0]
    ones = jnp.ones((1, x.shape[0]), dtype=jnp.float32)
    s = jnp.dot(ones, x, preferred_element_type=jnp.float32)
    sq = jnp.dot(ones, x * x, preferred_element_type=jnp.float32)
    out_ref[0, 0:1, :] = s
    out_ref[0, 1:2, :] = sq


def _apply_kernel(x_ref, scale_ref, shift_ref, out_ref):
    """out = scale (1,1,C) * x (1,HW,C) + shift (1,1,C)."""
    out_ref[0] = x_ref[0] * scale_ref[0] + shift_ref[0]


def _bwd_kernel(g_ref, x_ref, scale_ref, dx_ref, sums_ref):
    """dx = g * scale;  sums = [Σ_hw g, Σ_hw g*x] per channel."""
    g = g_ref[0]
    x = x_ref[0]
    dx_ref[0] = g * scale_ref[0]
    ones = jnp.ones((1, g.shape[0]), dtype=jnp.float32)
    sums_ref[0, 0:1, :] = jnp.dot(ones, g, preferred_element_type=jnp.float32)
    sums_ref[0, 1:2, :] = jnp.dot(ones, g * x, preferred_element_type=jnp.float32)


LANES = 128


def _pack_factor(hw: int, c: int) -> int:
    """Channels per 128-lane row repeat: avoid catastrophic lane padding for
    small C by reshaping [HW, C] -> [HW*C/128, 128] (a row then holds
    rep = 128/C consecutive pixels of all C channels)."""
    if c % LANES == 0:
        return 1
    if LANES % c == 0 and (hw * c) % LANES == 0:
        return LANES // c
    return 1  # fallback: correct but lane-padded


def _pack_x(x2d: jnp.ndarray, rep: int) -> jnp.ndarray:
    if rep == 1:
        return x2d
    b, hw, c = x2d.shape
    return x2d.reshape(b, hw * c // LANES, LANES)


def _pack_vec(v: jnp.ndarray, rep: int) -> jnp.ndarray:
    """[B, C] -> [B, 1, rep*C] (channel pattern repeated across the row)."""
    if rep != 1:
        v = jnp.tile(v, (1, rep))
    return v[:, None, :]


def _unpack_sums(sums: jnp.ndarray, rep: int, c: int) -> jnp.ndarray:
    """[B, 2, L] -> [B, 2, C] (sum the rep groups)."""
    if rep == 1:
        return sums
    b = sums.shape[0]
    return sums.reshape(b, 2, rep, c).sum(axis=2)


def _batched_stats(x2d: jnp.ndarray) -> jnp.ndarray:
    """[B, HW, C] -> [B, 2, C] via the stats kernel (grid over B)."""
    b, hw, c = x2d.shape
    rep = _pack_factor(hw, c)
    xp = _pack_x(x2d, rep)
    _, rows, lanes = xp.shape
    sums = pl.pallas_call(
        _stats_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, lanes), jnp.float32),
        interpret=_interpret(),
    )(xp)
    return _unpack_sums(sums, rep, c)


def _batched_apply(x2d: jnp.ndarray, scale: jnp.ndarray,
                   shift: jnp.ndarray) -> jnp.ndarray:
    """x2d [B,HW,C]; scale/shift [B,C] -> out [B,HW,C]."""
    b, hw, c = x2d.shape
    rep = _pack_factor(hw, c)
    xp = _pack_x(x2d, rep)
    _, rows, lanes = xp.shape
    out = pl.pallas_call(
        _apply_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, lanes), x2d.dtype),
        interpret=_interpret(),
    )(xp, _pack_vec(scale, rep), _pack_vec(shift, rep))
    return out.reshape(b, hw, c)


def _batched_bwd(g2d: jnp.ndarray, x2d: jnp.ndarray, scale: jnp.ndarray):
    """g2d/x2d [B,HW,C]; scale [B,C] -> (dx [B,HW,C], sums [B,2,C])."""
    b, hw, c = g2d.shape
    rep = _pack_factor(hw, c)
    gp = _pack_x(g2d, rep)
    xp = _pack_x(x2d, rep)
    _, rows, lanes = gp.shape
    dx, sums = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, lanes), g2d.dtype),
            jax.ShapeDtypeStruct((b, 2, lanes), jnp.float32),
        ],
        interpret=_interpret(),
    )(gp, xp, _pack_vec(scale, rep))
    return dx.reshape(b, hw, c), _unpack_sums(sums, rep, c)


def _coefficients(cfg: MaxStyleConfig, lmda, gn, bn, mu, sig, mu2, sig2,
                  gstd, bstd, gate):
    """Fold the whole MaxStyle chain into per-(b,c) (scale, shift);
    all inputs [B, C] (lmda [B, 1])."""
    if cfg.mix_style:
        lm = jnp.clip(lmda, 0.0, 1.0)
        sig_mix = sig * (1.0 - lm) + sig2 * lm
        mu_mix = mu * (1.0 - lm) + mu2 * lm
    else:
        sig_mix, mu_mix = sig, mu
    if cfg.no_noise:
        scale = sig_mix / sig
        shift = mu_mix - mu * scale
    else:
        scale = (sig_mix + gn * gstd) / sig
        shift = (mu_mix + bn * bstd) - mu * scale
    # gate folds into the affine map: off -> identity
    scale = gate * scale + (1.0 - gate)
    shift = gate * shift
    return scale, shift


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_core(cfg: MaxStyleConfig, x2d, lmda, gn, bn, mu, sig, mu2, sig2,
                gstd, bstd, gate):
    scale, shift = _coefficients(cfg, lmda, gn, bn, mu, sig, mu2, sig2,
                                 gstd, bstd, gate)
    return _batched_apply(x2d, scale, shift)


def _fused_fwd(cfg, x2d, lmda, gn, bn, mu, sig, mu2, sig2, gstd, bstd, gate):
    scale, shift = _coefficients(cfg, lmda, gn, bn, mu, sig, mu2, sig2,
                                 gstd, bstd, gate)
    out = _batched_apply(x2d, scale, shift)
    return out, (x2d, lmda, scale, mu, sig, mu2, sig2, gstd, bstd, gate)


def _fused_bwd(cfg, res, g2d):
    x2d, lmda, scale, mu, sig, mu2, sig2, gstd, bstd, gate = res
    dx2d, sums = _batched_bwd(g2d, x2d, scale)
    s_g = sums[:, 0, :]            # Σ_hw g          [B, C]
    s_gx = sums[:, 1, :]           # Σ_hw g*x        [B, C]
    s_gxn = (s_gx - mu * s_g) / sig  # Σ_hw g*x_normed

    zeros_like = jnp.zeros_like
    if cfg.no_noise:
        d_gn = zeros_like(s_g)
        d_bn = zeros_like(s_g)
    else:
        d_gn = gate * gstd * s_gxn
        d_bn = gate * bstd * s_g
    if cfg.mix_style:
        interior = ((lmda >= 0.0) & (lmda <= 1.0)).astype(s_g.dtype)
        # s_gxn = Σ g·x_normed already carries the 1/sig factor
        d_lm_full = ((sig2 - sig) * s_gxn + (mu2 - mu) * s_g)
        d_lmda = gate * interior * jnp.sum(d_lm_full, axis=1, keepdims=True)
    else:
        d_lmda = zeros_like(lmda)
    z = zeros_like
    return (dx2d, d_lmda, d_gn, d_bn, z(mu), z(sig), z(mu2), z(sig2),
            z(gstd), z(bstd), z(gate))


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def apply_maxstyle_pallas(x: jnp.ndarray, params: MaxStyleParams,
                          state: MaxStyleState, cfg: MaxStyleConfig
                          ) -> Tuple[jnp.ndarray, MaxStyleState]:
    """Drop-in replacement for ops.maxstyle.apply_maxstyle backed by the
    fused kernels. Same (out, state') contract incl. the first-application
    stat-spread caching."""
    b, h, w, c = x.shape
    if b <= 1 or h * w == 1 or (not cfg.mix_style and cfg.no_noise):
        return x, state
    in_dtype = x.dtype
    if in_dtype != jnp.float32:
        # kernels are written for f32 tiles; the op is a tiny slice of the
        # step, and its stat math must stay full precision anyway
        out, new_state = apply_maxstyle_pallas(
            x.astype(jnp.float32), params, state, cfg)
        return out.astype(in_dtype), new_state
    x2d = x.reshape(b, h * w, c)
    hw = h * w

    # stats computed on a detached copy: no tangents ever enter this kernel
    # (matches the reference's mu/sig detach, maxstyle.py:160)
    stats = _batched_stats(jax.lax.stop_gradient(x2d))
    s, sq = stats[:, 0, :], stats[:, 1, :]
    mu = s / hw
    # unbiased variance (torch x.var default), like the jnp reference impl
    var = jnp.maximum(sq / hw - mu * mu, 0.0) * (hw / max(hw - 1, 1))
    sig = jnp.sqrt(var + cfg.eps)

    # spreads are [1,C] batch-level or [B,C] per-group (style_group_size);
    # _coefficients broadcasts either against the [B,C] stats
    g = _group_size(cfg, b)
    gamma_std = jnp.where(jnp.isnan(state.gamma_std[:, 0, 0, :]),
                          _group_std(sig[:, None, None, :], g)[:, 0, 0, :],
                          state.gamma_std[:, 0, 0, :])
    beta_std = jnp.where(jnp.isnan(state.beta_std[:, 0, 0, :]),
                         _group_std(mu[:, None, None, :], g)[:, 0, 0, :],
                         state.beta_std[:, 0, 0, :])
    new_state = state.replace(gamma_std=gamma_std[:, None, None, :],
                              beta_std=beta_std[:, None, None, :])

    out2d = _fused_core(cfg, x2d,
                        params.lmda[:, 0, 0, :],        # [B,1]
                        params.gamma_noise[:, 0, 0, :],  # [B,C]
                        params.beta_noise[:, 0, 0, :],
                        mu, sig, mu[state.perm], sig[state.perm],
                        gamma_std, beta_std,
                        jnp.reshape(state.gate, (1, 1)))
    return out2d.reshape(b, h, w, c), new_state
