"""Entropy-based uncertainty maps from logits.

≙ common_utils/uncertainty.py:7-72 (per-image and batch entropy maps),
computed in jnp so they fuse with the inference forward under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def entropy_map(logits: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """logits [N,H,W,C] -> entropy [N,H,W]; normalized to [0,1] by log(C)."""
    p = jax.nn.softmax(logits, axis=-1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    ent = -jnp.sum(p * log_p, axis=-1)
    if normalize:
        ent = ent / jnp.log(logits.shape[-1])
    return ent


def batch_entropy_maps(logits: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    return entropy_map(logits, normalize)
