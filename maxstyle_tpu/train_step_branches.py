"""Method-branch implementations composed into the train step.

Each branch mirrors one `if <flag>:` block of the reference training loop
(train_adv_supervised_segmentation_triplet.py:201-530): latent_DA (LSM),
rand_conv, RSC, mix_style, DSU, adv_noise, adv_bias. `SUPPORTED` lists the
flags currently wired; make_train_step refuses configs requesting others.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

SUPPORTED: set[str] = set()


def apply_enabled_branches(solver, L, cfg, params, stats, aux, *, clean_image,
                           image_n, label, rng, rngs, metrics: Dict) -> jnp.ndarray:
    """Sum of the enabled auxiliary branch losses (0 when none enabled)."""
    return jnp.zeros(())
