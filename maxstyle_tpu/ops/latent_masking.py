"""Gradient-based latent-code masking (LSM / RSC), NHWC.

Functional redesign of model_util.mask_latent_code_channel_wise (:240-312)
and mask_latent_code_spatial_wise (:315-374): compute a task loss of
decoder(code) vs target, take grad wrt the code, and zero (hard) or shrink
(soft: x U[0,0.5]) the top-percentile-gradient channels / pixels.

jit-compatibility notes:
* the reference draws a random threshold `np.random.rand()*percentile`
  (:287-288) — here the resulting cut index is a *traced* integer used via
  take_along_axis on the sorted gradient magnitudes (static shapes).
* the mask is computed under stop_gradient on a detached copy of the code
  (the reference rebuilds a fresh requires-grad Variable, :262), so the
  outer model gradient never differentiates through the mask itself.
* the reference's `random.shuffle`-based method selection (:597-607) becomes
  a `lax.switch` over the statically-shaped branches.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from maxstyle_tpu import losses


def _mask_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str,
               num_classes: int) -> jnp.ndarray:
    """Loss menu for the grad probe (model_util.py:271-281)."""
    if target.ndim < pred.ndim:
        gt = losses.one_hot(target.astype(jnp.int32), num_classes)
    else:
        gt = target
    if loss_type == "corr":
        return jnp.mean(pred * gt)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(pred - gt))
    if loss_type in ("mse", "l2"):
        return jnp.mean((pred - gt) ** 2)
    if loss_type == "ce":
        return losses.cross_entropy_2d(pred, target)
    raise NotImplementedError(loss_type)


def _threshold_mask(score: jnp.ndarray, k: jnp.ndarray, if_soft: bool,
                    key: jax.Array) -> jnp.ndarray:
    """score [B, M] -> 0/1 (or soft) mask [B, M]; entries with score strictly
    above the value at descending-sorted index k are masked."""
    order = jnp.sort(score, axis=1)[:, ::-1]  # descending
    k = jnp.clip(k, 0, score.shape[1] - 1).astype(jnp.int32)
    idx = jnp.full((score.shape[0], 1), 1, jnp.int32) * k  # [B,1] broadcast of scalar
    thresh = jnp.take_along_axis(order, idx, axis=1)
    above = score > thresh
    if if_soft:
        soft = 0.5 * jax.random.uniform(key, score.shape)
        return jnp.where(above, soft, jnp.ones_like(score))
    return jnp.where(above, jnp.zeros_like(score), jnp.ones_like(score))


def _grad_wrt_code(code: jnp.ndarray, decode_fn: Callable, target: jnp.ndarray,
                   loss_type: str, num_classes: int) -> jnp.ndarray:
    code_sg = jax.lax.stop_gradient(code)

    def f(c):
        return _mask_loss(decode_fn(c), target, loss_type, num_classes)

    return jax.lax.stop_gradient(jax.grad(f)(code_sg))


def mask_latent_code_channel_wise(code: jnp.ndarray, decode_fn: Callable,
                                  target: jnp.ndarray, *, num_classes: int,
                                  percentile: float = 1 / 3.0,
                                  random_threshold: bool = False,
                                  loss_type: str = "corr", if_detach: bool = True,
                                  if_soft: bool = False,
                                  key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero/shrink the top-percentile-gradient channels; mask [B,1,1,C]."""
    b, h, w, c = code.shape
    k_pct, k_soft = jax.random.split(key)
    grad = _grad_wrt_code(code, decode_fn, target, loss_type, num_classes)
    score = jnp.mean(grad.reshape(b, h * w, c), axis=1)  # [B, C]
    pct = percentile * (jax.random.uniform(k_pct) if random_threshold else 1.0)
    k = jnp.floor(c * pct).astype(jnp.int32)
    mask = _threshold_mask(score, k, if_soft, k_soft).reshape(b, 1, 1, c)
    base = jax.lax.stop_gradient(code) if if_detach else code
    return base * mask, mask


def mask_latent_code_spatial_wise(code: jnp.ndarray, decode_fn: Callable,
                                  target: jnp.ndarray, *, num_classes: int,
                                  percentile: float = 1 / 3.0,
                                  random_threshold: bool = False,
                                  loss_type: str = "corr", if_detach: bool = True,
                                  if_soft: bool = False,
                                  key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero/shrink the top-percentile-gradient spatial positions; mask
    [B,H,W,1]."""
    b, h, w, c = code.shape
    k_pct, k_soft = jax.random.split(key)
    grad = _grad_wrt_code(code, decode_fn, target, loss_type, num_classes)
    score = jnp.mean(grad, axis=-1).reshape(b, h * w)  # [B, HW]
    pct = percentile * (jax.random.uniform(k_pct) if random_threshold else 1.0)
    k = jnp.floor(h * w * pct).astype(jnp.int32)
    mask = _threshold_mask(score, k, if_soft, k_soft).reshape(b, h, w, 1)
    base = jax.lax.stop_gradient(code) if if_detach else code
    return base * mask, mask


def dropout2d_mask(code: jnp.ndarray, rate: float,
                   key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel dropout perturbation (model_util dispatch 'dropout' via
    F.dropout2d, advanced_triplet…:610-614). Returns (masked, keep_mask)."""
    b, _, _, c = code.shape
    keep = jax.random.bernoulli(key, 1.0 - rate, (b, 1, 1, c)).astype(code.dtype)
    return code * keep / (1.0 - rate), jnp.broadcast_to(keep, code.shape)


def perturb_latent_code(code: jnp.ndarray, decode_fn: Callable,
                        target: jnp.ndarray, *, num_classes: int,
                        perturb_type: str = "random", threshold: float = 0.5,
                        if_soft: bool = False, random_threshold: bool = False,
                        loss_type: str = "mse", if_detach: bool = False,
                        key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch over mask methods (advanced_triplet…perturb_latent_code
    :573-629). 'random' draws uniformly from {dropout, spatial, channel};
    'RSC'/'no_dropout' from {spatial, channel} — via lax.switch.

    All branches are cast to code.dtype: the grad-probe branches compute the
    mask in f32 (loss/one-hot promotion) while the dropout branch stays in
    the code's dtype, and lax.switch requires identical output types."""
    k_sel, k_op = jax.random.split(key)

    def do_channel(k):
        masked, m = mask_latent_code_channel_wise(
            code, decode_fn, target, num_classes=num_classes,
            percentile=threshold, random_threshold=random_threshold,
            loss_type=loss_type, if_detach=if_detach, if_soft=if_soft, key=k)
        return (masked.astype(code.dtype),
                jnp.broadcast_to(m, code.shape).astype(code.dtype))

    def do_spatial(k):
        masked, m = mask_latent_code_spatial_wise(
            code, decode_fn, target, num_classes=num_classes,
            percentile=threshold, random_threshold=random_threshold,
            loss_type=loss_type, if_detach=if_detach, if_soft=if_soft, key=k)
        return (masked.astype(code.dtype),
                jnp.broadcast_to(m, code.shape).astype(code.dtype))

    def do_dropout(k):
        masked, m = dropout2d_mask(code, threshold, k)
        if if_detach:
            masked = jax.lax.stop_gradient(masked)
        return masked.astype(code.dtype), m.astype(code.dtype)

    if perturb_type == "dropout":
        return do_dropout(k_op)
    if perturb_type == "channel":
        return do_channel(k_op)
    if perturb_type == "spatial":
        return do_spatial(k_op)
    if perturb_type == "random":
        idx = jax.random.randint(k_sel, (), 0, 3)
        return jax.lax.switch(idx, [do_dropout, do_spatial, do_channel], k_op)
    if perturb_type in ("RSC", "no_dropout"):
        idx = jax.random.randint(k_sel, (), 0, 2)
        return jax.lax.switch(idx, [do_spatial, do_channel], k_op)
    raise ValueError(perturb_type)
