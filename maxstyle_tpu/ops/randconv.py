"""RandConv pixel-space augmentation (ICLR'21), NHWC.

Re-design of /root/reference/src/advanced/rand_conv_aug.py:13-48. The
reference picks a data-dependent kernel size k in {1,3,5,7} per call and
builds a fresh torch Conv2d; under jit that would be a dynamic shape, so we
sample weights for the LARGEST kernel once and mask down to the selected
size — a k x k kernel is the 7x7 kernel with the outer ring zeroed, so one
static conv covers all four sizes (identical math, XLA-friendly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

KERNEL_CANDIDATES: Tuple[int, ...] = (1, 3, 5, 7)
_KMAX = max(KERNEL_CANDIDATES)


def rand_conv_augment(key: jax.Array, image: jnp.ndarray, prob: float = 0.5,
                      mix: bool = True, fixed=None) -> jnp.ndarray:
    """One RandConv transform: random kernel size, weights ~ N(0, 1/(c k^2)),
    optional alpha-blend with the input; output detached
    (rand_conv_aug.py:19-48; with mix=True the transform always applies).

    ``fixed=(k, weights_hwio, alpha)`` is a test/parity hook injecting a
    static kernel size, its (k,k,c,c) weights and the mix alpha in place of
    the random draws (mirrors pinning the reference's torch.randn/rand).
    """
    k_gate, k_size, k_w, k_alpha = jax.random.split(key, 4)
    c = image.shape[-1]

    if fixed is not None:
        k_static, w_small, alpha_fixed = fixed
        k = jnp.asarray(k_static)
        pad = (_KMAX - k_static) // 2
        w_full = jnp.pad(jnp.asarray(w_small),
                         ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    else:
        size_idx = jax.random.randint(k_size, (), 0, len(KERNEL_CANDIDATES))
        k_sizes = jnp.asarray(KERNEL_CANDIDATES)
        k = k_sizes[size_idx]

        # full-size weight draw; sigma depends on the selected k
        sigma = 1.0 / jnp.sqrt(c * k.astype(jnp.float32) ** 2)
        w_full = jax.random.normal(k_w, (_KMAX, _KMAX, c, c)) * sigma

    # zero the outer ring beyond the selected kernel (centered mask)
    r = jax.lax.broadcasted_iota(jnp.int32, (_KMAX, _KMAX), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (_KMAX, _KMAX), 1)
    half = (k - 1) // 2
    center = (_KMAX - 1) // 2
    inside = ((jnp.abs(r - center) <= half) & (jnp.abs(s - center) <= half))
    w = w_full * inside[:, :, None, None]

    dn = jax.lax.conv_dimension_numbers(image.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    conv = jax.lax.conv_general_dilated(image, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    if mix:
        alpha = (jnp.asarray(fixed[2]) if fixed is not None and fixed[2]
                 is not None else jax.random.uniform(k_alpha))
        out = alpha * image + (1.0 - alpha) * conv
    else:
        p0 = jax.random.uniform(k_gate)
        out = jnp.where(p0 < prob, image, conv)
    return jax.lax.stop_gradient(out)
