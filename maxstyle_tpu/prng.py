"""Explicit PRNG-key threading utilities.

The reference relies on global RNG state mutation (`torch.manual_seed`,
`random.shuffle`, seeded DataLoader workers — see
/root/reference/src/common_utils/basic_operations.py:34-48). A functional JAX
framework instead threads `jax.random` keys explicitly. These helpers give the
rest of the framework a single vocabulary for deriving per-purpose streams.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp

Key = jax.Array


def make_key(seed: int | None) -> Key:
    """Root key for a run. `None` seeds from 0 (deterministic default)."""
    return jax.random.key(seed if seed is not None else 0)


def fold_name(key: Key, name: str) -> Key:
    """Derive a named sub-stream. Stable across runs for the same name."""
    # Cheap deterministic string hash; jnp.uint32 wraps naturally.
    h = 0
    for ch in name:
        h = (h * 131 + ord(ch)) % (2**31 - 1)
    return jax.random.fold_in(key, h)


def split_dict(key: Key, names: tuple[str, ...]) -> dict[str, Key]:
    return {name: fold_name(key, name) for name in names}


def key_iter(key: Key) -> Iterator[Key]:
    """Infinite iterator of fresh keys (host-side loop use only)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def non_identity_permutation(key: Key, batch_size: int) -> jax.Array:
    """Random permutation of [0, B) that is guaranteed not to be the identity.

    The reference re-rolls until non-identity
    (/root/reference/src/advanced/maxstyle.py:55-58). Re-rolling is a
    data-dependent loop, hostile to XLA; instead we sample once and fall back
    to the cyclic shift (a derangement) in the measure-zero identity case,
    which preserves the "never identity" contract with static shapes.
    """
    perm = jax.random.permutation(key, batch_size)
    identity = jnp.arange(batch_size)
    is_identity = jnp.all(perm == identity)
    return jnp.where(is_identity, jnp.roll(identity, 1), perm)
