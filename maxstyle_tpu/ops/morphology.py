"""Differentiable-free morphology on device (NHWC).

≙ common_utils/morphology.py:8-107 (torch Dilation2d/Erosion2d built on
unfold) — here expressed as `lax.reduce_window` max/min pooling, which XLA
maps directly onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dilation2d(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Grayscale dilation with a square structuring element; [N,H,W,C]."""
    k = kernel_size
    pad = k // 2
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, 1, 1, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def erosion2d(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    k = kernel_size
    pad = k // 2
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, (1, k, k, 1),
                                 (1, 1, 1, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def morphological_gradient(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Boundary extraction: dilation - erosion."""
    return dilation2d(x, kernel_size) - erosion2d(x, kernel_size)
