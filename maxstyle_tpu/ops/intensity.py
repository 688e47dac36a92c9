"""Per-sample intensity normalization ops (NHWC layout).

Functional equivalents of the reference's batch intensity helpers
(/root/reference/src/common_utils/basic_operations.py:257-311
`rescale_intensity` / `z_score_intensity`) plus the instance-norm activation
used as the image decoder's `z_score` output head
(advanced_triplet_recon_segmentation_model.py:142-151).

All ops are pure, shape-static and vectorize over (N, C) so XLA fuses them
into neighbouring kernels; reductions run over the spatial axes only.
"""

from __future__ import annotations

import jax.numpy as jnp


def rescale_intensity(x: jnp.ndarray, new_min: float = 0.0, new_max: float = 1.0,
                      eps: float = 1e-20) -> jnp.ndarray:
    """Min-max rescale each (sample, channel) plane to [new_min, new_max].

    x: [N, H, W, C] (or [N, H, W]); reduction over spatial dims per channel.
    """
    spatial_axes = (1, 2)
    old_min = jnp.min(x, axis=spatial_axes, keepdims=True)
    old_max = jnp.max(x, axis=spatial_axes, keepdims=True)
    return (x - old_min) / (old_max - old_min + eps) * (new_max - new_min) + new_min


def z_score_intensity(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean / unit-std per (sample, channel) plane; std<=0 treated as 1.

    Matches basic_operations.py:291-311 (std with Bessel's correction, as
    torch.std_mean defaults to unbiased=True).
    """
    spatial_axes = (1, 2)
    n = 1
    for ax in spatial_axes:
        n *= x.shape[ax]
    mean = jnp.mean(x, axis=spatial_axes, keepdims=True)
    var = jnp.var(x, axis=spatial_axes, keepdims=True) * (n / max(n - 1, 1))
    std = jnp.sqrt(var)
    std = jnp.where(std <= 0, jnp.ones_like(std), std)
    return (x - mean) / std


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """F.instance_norm equivalent (biased variance, eps inside sqrt).

    Used as the image decoder's output activation for `z_score` /
    `intensity_norm_type=='z_score'` variants.
    """
    spatial_axes = (1, 2)
    xf = x.astype(jnp.float32)  # stats in f32 under mixed precision
    mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.var(xf, axis=spatial_axes, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def intensity_norm_fn(intensity_norm_type: str):
    """Selector mirroring basic_operations.intensity_norm_fn_selector."""
    if intensity_norm_type == "min_max":
        return rescale_intensity
    if intensity_norm_type == "z_score":
        return z_score_intensity
    raise ValueError(f"unknown intensity_norm_type: {intensity_norm_type}")
