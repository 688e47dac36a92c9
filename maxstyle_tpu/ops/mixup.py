"""MixUp / ManifoldMixup + random window masking utilities (jnp, NHWC).

≙ /root/reference/src/advanced/mixup.py:9-127 (input- and feature-space
mixup with one-hot label interpolation; ManifoldMixup reuses one (lam, perm)
draw across layers) and advanced/random_window_masking.py:5-64
(Model-Genesis-style inpainting/outpainting). Library surface — available
utilities, not wired into the main training loop (SURVEY §2.1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from maxstyle_tpu import losses


class MixupDraw(NamedTuple):
    lam: jnp.ndarray   # scalar
    perm: jnp.ndarray  # [B]


def sample_mixup(key: jax.Array, batch_size: int, alpha: float = 0.2) -> MixupDraw:
    """One (lam, perm) draw, shared across layers for ManifoldMixup
    (mixup.py:99-127)."""
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha)
    return MixupDraw(lam=lam, perm=jax.random.permutation(k2, batch_size))


def mixup_data(draw: MixupDraw, x: jnp.ndarray, labels: jnp.ndarray,
               num_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Input/feature mixup (mixup.get_mixup_data:31-73): mixed x and mixed
    one-hot targets."""
    x_mix = draw.lam * x + (1.0 - draw.lam) * x[draw.perm]
    y = losses.one_hot(labels.astype(jnp.int32), num_classes)
    y_mix = draw.lam * y + (1.0 - draw.lam) * y[draw.perm]
    return x_mix, y_mix


def mixup_loss(logits: jnp.ndarray, labels: jnp.ndarray, draw: MixupDraw,
               num_classes: int) -> jnp.ndarray:
    """lam*CE(y) + (1-lam)*CE(y[perm]) (mixup.get_mixup_loss:75-86)."""
    ce_a = losses.cross_entropy_2d(logits, labels)
    ce_b = losses.cross_entropy_2d(logits, labels[draw.perm])
    return draw.lam * ce_a + (1.0 - draw.lam) * ce_b


# ---------------------------------------------------------------------------
# random window masking (Model Genesis)
# ---------------------------------------------------------------------------


def _random_blocks_mask(key: jax.Array, batch: int, h: int, w: int,
                        cnt: int = 5, keep_prob: float = 0.95) -> jnp.ndarray:
    """[B,H,W,1] float mask: 1 inside up-to-`cnt` random blocks per sample
    (block side in [dim/6, dim/3]; each successive block drawn with
    `keep_prob` continuation, random_window_masking.py:22-31)."""
    def one_sample(k):
        def one_block(i, acc):
            kk = jax.random.fold_in(k, i)
            ks = jax.random.split(kk, 5)
            bh = jax.random.randint(ks[0], (), h // 6, h // 3 + 1)
            bw = jax.random.randint(ks[1], (), w // 6, w // 3 + 1)
            y0 = jax.random.randint(ks[2], (), 3, h - h // 3 - 3)
            x0 = jax.random.randint(ks[3], (), 3, w - w // 3 - 3)
            go = jax.random.uniform(ks[4]) < keep_prob
            yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            block = ((yy >= y0) & (yy < y0 + bh) & (xx >= x0) & (xx < x0 + bw))
            return jnp.where(go, jnp.maximum(acc, block.astype(jnp.float32)), acc)

        return jax.lax.fori_loop(0, cnt, one_block, jnp.zeros((h, w)))

    keys = jax.random.split(key, batch)
    return jax.vmap(one_sample)(keys)[..., None]


def random_inpainting(key: jax.Array, image: jnp.ndarray, cnt: int = 5
                      ) -> jnp.ndarray:
    """Replace random window blocks by U[0,1] noise
    (random_window_masking.random_inpainting:5-32). image [B,H,W,C]."""
    b, h, w, c = image.shape
    k_mask, k_noise = jax.random.split(key)
    mask = _random_blocks_mask(k_mask, b, h, w, cnt)
    noise = jax.random.uniform(k_noise, image.shape)
    return image * (1.0 - mask) + noise * mask


def random_outpainting(key: jax.Array, image: jnp.ndarray, cnt: int = 5
                       ) -> jnp.ndarray:
    """Noise canvas with the image kept only inside random blocks
    (random_window_masking.random_outpainting:35-64)."""
    b, h, w, c = image.shape
    k_mask, k_noise = jax.random.split(key)
    mask = _random_blocks_mask(k_mask, b, h, w, cnt)
    noise = jax.random.uniform(k_noise, image.shape)
    return noise * (1.0 - mask) + image * mask
