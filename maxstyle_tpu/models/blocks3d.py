"""3D building blocks (NDHWC) — library surface.

≙ unet_parts.UnetConv3/UnetUp3 (:657-715) and custom_layers.Fixable3DDropout
(:39-67): the reference keeps 3D variants of its conv/up/dropout blocks for
volumetric experiments; provided here for the same capability surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from maxstyle_tpu.models import layers


class FixableDropout3d(nn.Module):
    """Channel-wise 3D dropout with an explicit rng stream (replay = reuse
    the 'dropout' key), like FixableDropout but over [N,D,H,W,C]."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        if self.rate == 0.0 or deterministic:
            return x
        key = self.make_rng("dropout")
        n, _, _, _, c = x.shape
        keep = jax.random.bernoulli(key, 1.0 - self.rate, (n, 1, 1, 1, c))
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


class UnetConv3(nn.Module):
    """(conv3x3x3 -> norm -> relu) x2 (unet_parts.UnetConv3:657-684)."""

    out_ch: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(2):
            x = nn.Conv(self.out_ch, (3, 3, 3), padding=1,
                        kernel_init=layers.kaiming_normal_fan_in,
                        name=f"conv{i + 1}")(x)
            if self.norm == "batch":
                x = layers.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     scale_init=layers.bn_scale_init,
                                     name=f"norm{i + 1}")(x)
            x = nn.relu(x)
        return x


class UnetUp3(nn.Module):
    """Transposed-conv 3D up + concat skip + UnetConv3
    (unet_parts.UnetUp3:687-715)."""

    out_ch: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = nn.ConvTranspose(self.out_ch, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID",
                             kernel_init=layers.normal_002)(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return UnetConv3(self.out_ch, self.norm)(x, train=train)
