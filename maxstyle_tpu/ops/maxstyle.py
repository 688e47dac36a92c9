"""MaxStyle: adversarial style composition op (functional, NHWC).

TPU-native redesign of /root/reference/src/advanced/maxstyle.py:6-189.
Instead of a stateful nn.Module with `reset()`/cached tensors, the op is a
pure function over an explicit parameter/state pytree:

* `MaxStyleParams` — the three learnable style tensors optimized by the
  inner adversarial loop: `lmda` [B,1,1,1], `gamma_noise`/`beta_noise`
  [B,1,1,C] (maxstyle.py:87-110).
* `MaxStyleState`  — per-batch non-learnable state: the non-identity batch
  permutation, the Bernoulli application gate (rand_p < p), and the cached
  batch-level stat spreads `gamma_std`/`beta_std` [1,1,1,C] which the
  reference computes once on the FIRST forward of a batch and then freezes
  across the inner-loop iterations (maxstyle.py:116-117, 165-168).

Gradient semantics match torch autograd exactly: instance statistics mu/sig
and the stat spreads are detached (stop_gradient), lmda is clamped to [0,1]
with clamp-interior gradients, so the VJP only flows through x_normed, lmda,
eps_gamma, eps_beta.

The fused Pallas kernel for this op lives in ops/maxstyle_pallas.py and is
selected via `use_pallas=True`; this jnp version is the semantics reference
that the kernel is tested against.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from maxstyle_tpu import prng
from maxstyle_tpu.config import MaxStyleConfig


@struct.dataclass
class MaxStyleParams:
    lmda: jnp.ndarray         # [B,1,1,1]
    gamma_noise: jnp.ndarray  # [B,1,1,C]
    beta_noise: jnp.ndarray   # [B,1,1,C]


@struct.dataclass
class MaxStyleState:
    perm: jnp.ndarray       # [B] int32, non-identity
    gate: jnp.ndarray       # [] float32 — 1.0 apply / 0.0 no-op
    gamma_std: jnp.ndarray  # [1,1,1,C]; NaN sentinel => not yet cached
    beta_std: jnp.ndarray   # [1,1,1,C]


def init_maxstyle(key: jax.Array, batch_size: int, num_features: int,
                  cfg: MaxStyleConfig) -> Tuple[MaxStyleParams, MaxStyleState]:
    """Fresh per-batch style parameters (maxstyle.py:48-123).

    lmda ~ Beta(alpha, alpha) when `always_use_beta` else U[0,1);
    noise ~ N(0,1) when learnable (nn.init.normal_), else zero (the
    reference's non-learnable zero-noise path).
    """
    k_perm, k_gate, k_lmda, k_gn, k_bn = jax.random.split(key, 5)
    g = _group_size(cfg, batch_size)
    if g == batch_size:
        perm = prng.non_identity_permutation(k_perm, batch_size)
    else:
        # block-diagonal permutation: style partners stay inside each
        # G-sample group, so a scaled batch keeps the reference's tuned
        # batch-20 mixing semantics (style_group_size, config.py)
        n_groups = batch_size // g
        sub = jax.vmap(lambda k: prng.non_identity_permutation(k, g))(
            jax.random.split(k_perm, n_groups))
        perm = (sub + jnp.arange(n_groups)[:, None] * g).reshape(batch_size)
    gate = (jax.random.uniform(k_gate) < cfg.p).astype(jnp.float32)

    if cfg.mix_style:
        if cfg.always_use_beta:
            lmda = jax.random.beta(k_lmda, cfg.alpha, cfg.alpha, (batch_size, 1, 1, 1))
        else:
            lmda = jax.random.uniform(k_lmda, (batch_size, 1, 1, 1))
    else:
        lmda = jnp.zeros((batch_size, 1, 1, 1))

    if cfg.noise_learnable and not cfg.no_noise:
        gamma_noise = jax.random.normal(k_gn, (batch_size, 1, 1, num_features))
        beta_noise = jax.random.normal(k_bn, (batch_size, 1, 1, num_features))
    else:
        gamma_noise = jnp.zeros((batch_size, 1, 1, num_features))
        beta_noise = jnp.zeros((batch_size, 1, 1, num_features))

    nan_c = jnp.full((1 if g == batch_size else batch_size, 1, 1,
                      num_features), jnp.nan)
    return (MaxStyleParams(lmda=lmda, gamma_noise=gamma_noise, beta_noise=beta_noise),
            MaxStyleState(perm=perm, gate=gate, gamma_std=nan_c, beta_std=nan_c))


def learnable_mask(cfg: MaxStyleConfig) -> MaxStyleParams:
    """0/1 mask with the MaxStyleParams structure: which leaves the inner
    optimizer may update (requires_grad choreography, maxstyle.py:84-115)."""
    mix = 1.0 if (cfg.mix_style and cfg.mix_learnable) else 0.0
    noi = 1.0 if (cfg.noise_learnable and not cfg.no_noise) else 0.0
    return MaxStyleParams(lmda=jnp.asarray(mix), gamma_noise=jnp.asarray(noi),
                          beta_noise=jnp.asarray(noi))


def instance_stats(x: jnp.ndarray, eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Detached per-(sample, channel) spatial mean and std with Bessel's
    correction, matching torch `x.var(dim, unbiased=True)`
    (maxstyle.py:157-160)."""
    hw = x.shape[1] * x.shape[2]
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True) * (hw / max(hw - 1, 1))
    sig = jnp.sqrt(var + eps)
    return jax.lax.stop_gradient(mu), jax.lax.stop_gradient(sig)


def _batch_std(v: jnp.ndarray) -> jnp.ndarray:
    """torch.std(v, dim=0) — unbiased over batch; [B,1,1,C] -> [1,1,1,C]."""
    b = v.shape[0]
    var = jnp.var(v, axis=0, keepdims=True) * (b / max(b - 1, 1))
    return jax.lax.stop_gradient(jnp.sqrt(var))


def _group_size(cfg, batch_size: int) -> int:
    """Effective style group (config.MaxStyleConfig.style_group_size):
    the whole batch unless a smaller divisor is configured."""
    g = getattr(cfg, "style_group_size", None)
    if g is None or g >= batch_size:
        return batch_size
    if batch_size % g:
        raise ValueError(
            f"style_group_size={g} must divide the style batch "
            f"({batch_size}) — pad or change the batch")
    return g


def _group_std(v: jnp.ndarray, g: int) -> jnp.ndarray:
    """Per-group unbiased std over the batch axis, broadcast back to rows:
    [B,1,1,C] -> [1,1,1,C] when g == B (== _batch_std), else [B,1,1,C]
    where each row carries its own group's spread."""
    b, _, _, c = v.shape
    if g == b:
        return _batch_std(v)
    vg = v.reshape(b // g, g, c)
    var = jnp.var(vg, axis=1, keepdims=True) * (g / max(g - 1, 1))
    std = jnp.broadcast_to(jnp.sqrt(var), vg.shape)
    return jax.lax.stop_gradient(std.reshape(b, 1, 1, c))


def apply_maxstyle(x: jnp.ndarray, params: MaxStyleParams, state: MaxStyleState,
                   cfg: MaxStyleConfig) -> Tuple[jnp.ndarray, MaxStyleState]:
    """Forward pass (maxstyle.py:140-189). Returns (out, state') where state'
    carries the stat spreads cached on first application.

    No-op conditions: gate off; (no mixing AND no noise); B<=1; spatial
    size 1 — the last two are static shape facts handled in python.
    """
    b, h, w, c = x.shape
    if b <= 1 or h * w == 1 or (not cfg.mix_style and cfg.no_noise):
        return x, state

    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # style stats + mixing run in f32
    mu, sig = instance_stats(x, cfg.eps)
    x_normed = (x - mu) / sig

    g = _group_size(cfg, b)
    gamma_std = jnp.where(jnp.isnan(state.gamma_std), _group_std(sig, g),
                          state.gamma_std)
    beta_std = jnp.where(jnp.isnan(state.beta_std), _group_std(mu, g),
                         state.beta_std)
    new_state = state.replace(gamma_std=gamma_std, beta_std=beta_std)

    if cfg.mix_style:
        lm = jnp.clip(params.lmda, 0.0, 1.0)
        sig2 = sig[state.perm]
        mu2 = mu[state.perm]
        sig_mix = sig * (1.0 - lm) + sig2 * lm
        mu_mix = mu * (1.0 - lm) + mu2 * lm
    else:
        sig_mix, mu_mix = sig, mu

    if cfg.no_noise:
        x_aug = sig_mix * x_normed + mu_mix
    else:
        x_aug = ((sig_mix + params.gamma_noise * gamma_std) * x_normed
                 + (mu_mix + params.beta_noise * beta_std))

    out = state.gate * x_aug + (1.0 - state.gate) * x
    return out.astype(in_dtype), new_state


# ---------------------------------------------------------------------------
# MixStyle / DSU (non-learnable style mixing; advanced/mixstyle.py:6-108)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MixStyleConfig:
    p: float = 0.5
    alpha: float = 0.1
    eps: float = 1e-8
    mix: str = "random"  # 'random' | 'crossdomain' | 'gaussian' (DSU)
    lmda: Optional[float] = None
    # fixed batch permutation (tuple of ints) — mirrors the reference's
    # explicit-perm argument (mixstyle.py forward(x, perm=None) :44);
    # None draws a fresh permutation per call
    perm: Optional[Tuple[int, ...]] = None


def apply_mixstyle(key: jax.Array, x: jnp.ndarray,
                   cfg: MixStyleConfig) -> jnp.ndarray:
    """One MixStyle/DSU application. The reference's per-call Bernoulli gate
    (mixstyle.py:45-48), fresh lmda ~ Beta(alpha, alpha) (:58-62) and fresh
    permutation per call (:81-84) are reproduced with explicit sub-keys.

    mix='gaussian' is DSU (Domain Shifts with Uncertainty): adds
    N(0,1)*std-over-batch noise to mu/sig instead of mixing (:98-106).
    """
    k_gate, k_lmda, k_perm, k_g1, k_g2 = jax.random.split(key, 5)
    b, h, w, c = x.shape
    if b <= 1:
        return x

    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    gate = (jax.random.uniform(k_gate) <= cfg.p).astype(x.dtype)

    mu, sig = instance_stats(x, cfg.eps)
    x_normed = (x - mu) / sig

    if cfg.lmda is None:
        lmda = jax.random.beta(k_lmda, cfg.alpha, cfg.alpha, (b, 1, 1, 1))
    else:
        lmda = jnp.full((b, 1, 1, 1), cfg.lmda)

    if cfg.mix in ("random", "crossdomain"):
        if cfg.perm is not None:
            perm = jnp.asarray(cfg.perm)
        elif cfg.mix == "random":
            perm = jax.random.permutation(k_perm, b)
        else:
            # reverse, then shuffle within each half (mixstyle.py:85-92)
            perm = jnp.arange(b - 1, -1, -1)
            half = b // 2
            top = jax.random.permutation(k_perm, perm[:half])
            bot = jax.random.permutation(k_g1, perm[half:])
            perm = jnp.concatenate([top, bot])
        mu_mix = mu * (1 - lmda) + mu[perm] * lmda
        sig_mix = sig * (1 - lmda) + sig[perm] * lmda
    elif cfg.mix == "gaussian":
        g_mu = jax.random.normal(k_g1, (b, 1, 1, c)) * _batch_std(mu)
        g_sig = jax.random.normal(k_g2, (b, 1, 1, c)) * _batch_std(sig)
        mu_mix = mu + g_mu
        sig_mix = sig + g_sig
    else:
        raise NotImplementedError(cfg.mix)

    out = x_normed * sig_mix + mu_mix
    return (gate * out + (1.0 - gate) * x).astype(in_dtype)
