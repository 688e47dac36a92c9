"""Native adversarial data-augmentation attacks: AdvNoise + AdvBias.

The reference depends on the external `advchain` submodule (absent from the
snapshot; .gitmodules:1-3) for its AdvNoise / AdvBias baselines; the full
configuration is visible at the call sites
(train_adv_supervised_segmentation_triplet.py:434-530):

* AdvNoise — VAT-style additive noise: epsilon=0.1, xi=1e-6, one power
  iteration, KL divergence, `if_norm_image=True` (re-min-max the attacked
  image before the model forward).
* AdvBias — adversarial multiplicative bias field: epsilon=0.4,
  control-point spacing = image_size/2, downscale 2 (ACDC) / 4 (prostate),
  order-3 interpolation, log space, divergences kl+contour weighted
  [1.0, 0.5].

Both are re-implemented natively (MICCAI 2020, "Realistic Adversarial Data
Augmentation for MR Image Segmentation"): optimize the transform parameters
to maximize the consistency divergence between the clean prediction
`init_output` and the prediction on attacked data, with model parameters
frozen; then return (adv_image, consistency_loss) where the consistency
loss is differentiable wrt model params (the reference adds it to the
training objective, train_adv…:472-473, 526-527).

The reference runs these forwards with the solver in eval() mode (running
BN stats; train_adv…:446, 500) — `forward_fn` must therefore be an
eval-mode FTN forward.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from maxstyle_tpu import losses
from maxstyle_tpu.ops.intensity import rescale_intensity


def _l2_normalize_per_sample(d: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Rescale by per-sample abs-max then L2-normalize (the advchain
    `unit_norm` recipe mirrored at model_util.unit_norm:450-465)."""
    b = d.shape[0]
    flat = d.reshape(b, -1)
    flat = flat / (eps + jnp.max(jnp.abs(flat), axis=1, keepdims=True))
    flat = flat / (eps + jnp.linalg.norm(flat, axis=1, keepdims=True))
    return flat.reshape(d.shape)


def adv_noise_attack(forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     image: jnp.ndarray, init_output: jnp.ndarray, *,
                     epsilon: float = 0.1, xi: float = 1e-6, n_iter: int = 1,
                     key: jax.Array,
                     if_norm_image: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VAT power iteration. Returns (adv_image detached, consistency_loss).

    forward_fn maps image -> segmentation logits; it should close over
    stop_gradient'd params for the attack phase. The returned consistency
    loss re-runs the live forward so model gradients flow.
    """
    sg = jax.lax.stop_gradient
    p0 = sg(init_output)
    d = jax.random.normal(key, image.shape)

    def attack_div(r):
        x = image + r
        if if_norm_image:
            x = rescale_intensity(x)
        pred = forward_fn(x)
        return losses.kl_divergence(reference=p0, pred=pred)

    for _ in range(max(n_iter, 1)):
        r = xi * _l2_normalize_per_sample(d)
        d = sg(jax.grad(attack_div)(r))

    r_adv = epsilon * _l2_normalize_per_sample(d)
    adv_image = sg(image + r_adv)
    if if_norm_image:
        adv_image = sg(rescale_intensity(adv_image))
    consistency = losses.kl_divergence(reference=p0, pred=forward_fn(adv_image))
    return adv_image, consistency


def _control_grid_shape(hw: Tuple[int, int], spacing: Tuple[int, int]
                        ) -> Tuple[int, int]:
    """Number of control points per axis (spacing = image_size/2 -> 3-4
    points after the +3 cubic-spline border pad)."""
    return (hw[0] // spacing[0] + 3, hw[1] // spacing[1] + 3)


def bias_field_from_control_points(cp: jnp.ndarray, out_hw: Tuple[int, int],
                                   downscale: int = 2) -> jnp.ndarray:
    """Smooth multiplicative bias field from a coarse control grid:
    cubic (order-3) upsampling to the downscaled grid, then bilinear to full
    resolution — the two-stage interpolation mirroring advchain's
    `downscale` compute trick. cp: [B, gh, gw, 1] -> field [B, H, W, 1]."""
    b = cp.shape[0]
    h, w = out_hw
    low = jax.image.resize(cp, (b, max(h // downscale, 1), max(w // downscale, 1), 1),
                           method="bicubic")
    return jax.image.resize(low, (b, h, w, 1), method="bilinear")


def _project_field(field: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """Constrain the log-space field magnitude to epsilon per sample."""
    b = field.shape[0]
    mx = jnp.max(jnp.abs(field.reshape(b, -1)), axis=1).reshape(b, 1, 1, 1)
    return epsilon * field / (mx + 1e-10)


def compose_adversarial_attack(forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
                               image: jnp.ndarray, init_output: jnp.ndarray, *,
                               transforms=("noise",), key: jax.Array,
                               n_iter: int = 1,
                               divergence_types=("kl",),
                               divergence_weights=(1.0,),
                               if_norm_image: bool = True,
                               downscale: int = 2):
    """Chain of adversarial transforms applied sequentially — the
    ComposeAdversarialTransformSolver surface (advchain; used with
    single-element chains at the reference call sites,
    train_adv…:444,501). Each transform attacks the CURRENT image;
    the returned consistency is measured on the final composition."""
    sg = jax.lax.stop_gradient
    x = image
    for i, t in enumerate(transforms):
        k = jax.random.fold_in(key, i)
        if t == "noise":
            x, _ = adv_noise_attack(forward_fn, x, init_output, n_iter=n_iter,
                                    key=k, if_norm_image=if_norm_image)
        elif t == "bias":
            x, _ = adv_bias_attack(forward_fn, x, init_output, n_iter=n_iter,
                                   key=k, downscale=downscale,
                                   divergence_types=divergence_types,
                                   divergence_weights=divergence_weights,
                                   if_norm_image=if_norm_image)
        else:
            raise NotImplementedError(t)
    x = sg(x)
    consistency = losses.segmentation_consistency(
        output=forward_fn(x), reference=sg(init_output),
        divergence_types=divergence_types,
        divergence_weights=divergence_weights)
    return x, consistency


def adv_bias_attack(forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
                    image: jnp.ndarray, init_output: jnp.ndarray, *,
                    epsilon: float = 0.4, downscale: int = 2, n_iter: int = 1,
                    key: jax.Array,
                    divergence_types=("kl", "contour"),
                    divergence_weights=(1.0, 0.5),
                    step_size: float = 0.3,
                    if_norm_image: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adversarial bias field in log space: x_adv = x * exp(field), field
    spanned by an order-3-interpolated control grid with spacing H/2 x W/2,
    optimized by n_iter normalized-gradient-ascent steps of the kl+contour
    consistency divergence. Returns (adv_image detached, consistency_loss)."""
    sg = jax.lax.stop_gradient
    b, h, w, _ = image.shape
    p0 = sg(init_output)
    gh, gw = _control_grid_shape((h, w), (h // 2, w // 2))
    cp = jax.random.uniform(key, (b, gh, gw, 1), minval=-1.0, maxval=1.0)

    def apply_bias(cp_):
        field = _project_field(
            bias_field_from_control_points(cp_, (h, w), downscale), epsilon)
        x = image * jnp.exp(field)
        if if_norm_image:
            x = rescale_intensity(x)
        return x

    def attack_div(cp_):
        pred = forward_fn(apply_bias(cp_))
        return losses.segmentation_consistency(
            output=pred, reference=p0, divergence_types=divergence_types,
            divergence_weights=divergence_weights)

    for _ in range(max(n_iter, 1)):
        g = sg(jax.grad(attack_div)(cp))
        cp = cp + step_size * _l2_normalize_per_sample(g)

    adv_image = sg(apply_bias(cp))
    consistency = losses.segmentation_consistency(
        output=forward_fn(adv_image), reference=p0,
        divergence_types=divergence_types,
        divergence_weights=divergence_weights)
    return adv_image, consistency
