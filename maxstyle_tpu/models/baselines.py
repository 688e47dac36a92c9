"""Plain baseline segmentation networks: FCN and ResConvUNet (Flax, NHWC).

* `FCN` ≙ segmentation_models/fcn.py:10-197 — Bai-style multi-scale FCN:
  VGG-ish trunk (64,128,256,512,512 / feature_scale), five lateral 64-ch
  heads bilinearly upsampled x1..x16, concat -> 1x1 aggregate -> classifier.
  NOTE (fcn.py vs the triplet solver): configs named `FCN_16_standard*`
  build the Dual_Branch_Encoder+Decoder pair, NOT this class — this FCN only
  backs the plain `SegmentationModel` solver (SURVEY §2.3).
* `ResConvUNet` ≙ segmentation_models/resconvunet.py:18-198 — residual UNet
  with transposed-conv ups and optional bottleneck self-attention.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from maxstyle_tpu.models import layers


class ConvBNRelu(nn.Module):
    out_ch: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, dtype=self.dtype,
                    kernel_init=layers.kaiming_normal_fan_in)(x)
        x = layers.Norm2d("batch", dtype=self.dtype)(x, train=train)
        return nn.relu(x)


def _align_corners_matrix(l_in: int, l_out: int) -> np.ndarray:
    """Row-stochastic interpolation matrix reproducing torch
    nn.Upsample(mode='bilinear', align_corners=True): output index i samples
    source coordinate i*(l_in-1)/(l_out-1) (corner-aligned grid)."""
    if l_in == 1:
        return np.ones((l_out, 1), np.float32)
    x = np.arange(l_out) * (l_in - 1) / (l_out - 1)
    i0 = np.minimum(np.floor(x).astype(int), l_in - 2)
    w = (x - i0).astype(np.float32)
    m = np.zeros((l_out, l_in), np.float32)
    m[np.arange(l_out), i0] = 1.0 - w
    m[np.arange(l_out), i0 + 1] += w
    return m


def _upsample(x, factor: int):
    """Bilinear x{factor} with align_corners=True (fcn.py:56-59 uses
    nn.Upsample(..., align_corners=True)), expressed as two compile-time
    constant interpolation matmuls — exact torch parity, and separable
    matmuls map onto the MXU instead of a gather-based resize."""
    n, h, w, c = x.shape
    mh = jnp.asarray(_align_corners_matrix(h, h * factor), x.dtype)
    mw = jnp.asarray(_align_corners_matrix(w, w * factor), x.dtype)
    return jnp.einsum("Hh,nhwc,Ww->nHWc", mh, x, mw)


class FCN(nn.Module):
    num_classes: int = 4
    feature_scale: int = 1
    dropout: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, deterministic_dropout: bool = False):
        fs = self.feature_scale
        f = [64 // fs, 128 // fs, 256 // fs, 512 // fs, 512 // fs]
        l1 = ConvBNRelu(f[0], dtype=self.dtype)(ConvBNRelu(f[0], dtype=self.dtype)(x, train=train), train=train)
        h = ConvBNRelu(f[1], stride=2, dtype=self.dtype)(l1, train=train)
        l2 = ConvBNRelu(f[1], dtype=self.dtype)(h, train=train)
        h = ConvBNRelu(f[2], stride=2, dtype=self.dtype)(l2, train=train)
        h = ConvBNRelu(f[2], dtype=self.dtype)(h, train=train)
        l3 = ConvBNRelu(f[2], dtype=self.dtype)(h, train=train)
        h = ConvBNRelu(f[3], stride=2, dtype=self.dtype)(l3, train=train)
        h = ConvBNRelu(f[3], dtype=self.dtype)(h, train=train)
        l4 = ConvBNRelu(f[3], dtype=self.dtype)(h, train=train)
        h = ConvBNRelu(f[4], stride=2, dtype=self.dtype)(l4, train=train)
        h = ConvBNRelu(f[4], dtype=self.dtype)(h, train=train)
        l5 = ConvBNRelu(f[4], dtype=self.dtype)(h, train=train)

        heads = [
            ConvBNRelu(f[0], dtype=self.dtype)(l1, train=train),
            _upsample(ConvBNRelu(f[0], dtype=self.dtype)(l2, train=train), 2),
            _upsample(ConvBNRelu(f[0], dtype=self.dtype)(l3, train=train), 4),
            _upsample(ConvBNRelu(f[0], dtype=self.dtype)(l4, train=train), 8),
            _upsample(ConvBNRelu(f[0], dtype=self.dtype)(l5, train=train), 16),
        ]
        agg = ConvBNRelu(64, kernel=1, dtype=self.dtype)(jnp.concatenate(heads, axis=-1), train=train)
        if self.dropout is not None:
            agg = layers.FixableDropout(self.dropout)(
                agg, deterministic=deterministic_dropout)
        agg = ConvBNRelu(64, kernel=1, dtype=self.dtype)(agg, train=train)
        if self.dropout is not None:
            agg = layers.FixableDropout(self.dropout)(
                agg, deterministic=deterministic_dropout)
        return layers.conv1x1(self.num_classes, name="outS",
                              dtype=self.dtype)(agg)


class ResConv(nn.Module):
    """Stride-1 residual double conv (unet_parts.res_conv:303-345)."""

    out_ch: int
    norm: str = "batch"
    dropout: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, deterministic_dropout: bool = False):
        h = layers.conv3x3(self.out_ch, name="conv1", dtype=self.dtype)(x)
        h = layers.Norm2d(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
        h = layers.lrelu(h)
        h = layers.conv3x3(self.out_ch, name="conv2", dtype=self.dtype)(h)
        h = layers.Norm2d(self.norm, dtype=self.dtype, name="norm2")(h, train=train)
        res = layers.conv1x1(self.out_ch, name="conv_input", dtype=self.dtype)(x) + h
        res = layers.lrelu(res)
        if self.dropout is not None:
            res = layers.FixableDropout(self.dropout)(
                res, deterministic=deterministic_dropout)
        return res


class ResConvUp(nn.Module):
    """Transposed-conv up + concat skip + residual conv
    (unet_parts.res_conv_up:410-483)."""

    out_ch: int
    norm: str = "batch"
    dropout: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, train: bool = True,
                 deterministic_dropout: bool = False):
        x = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                             padding="VALID", kernel_init=layers.normal_002,
                             dtype=self.dtype)(x)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        return ResConv(self.out_ch, self.norm, self.dropout, dtype=self.dtype)(
            x, train=train, deterministic_dropout=deterministic_dropout)


class ResConvUNet(nn.Module):
    num_classes: int = 4
    feature_scale: int = 1
    norm: str = "batch"
    encoder_dropout: Optional[float] = None
    decoder_dropout: Optional[float] = None
    self_attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, deterministic_dropout: bool = False):
        fs = self.feature_scale
        d = self.dtype
        kw = dict(train=train, deterministic_dropout=deterministic_dropout)
        x1 = ResConv(64 // fs, self.norm, self.encoder_dropout, dtype=d,
                     name="inc")(x, **kw)
        x2 = layers.ResConvDown(128 // fs, self.norm, self.encoder_dropout,
                                dtype=d, name="down1")(x1, **kw)
        x3 = layers.ResConvDown(256 // fs, self.norm, self.encoder_dropout,
                                dtype=d, name="down2")(x2, **kw)
        x4 = layers.ResConvDown(512 // fs, self.norm, self.encoder_dropout,
                                dtype=d, name="down3")(x3, **kw)
        x5 = layers.ResConvDown(512 // fs, self.norm, self.encoder_dropout,
                                dtype=d, name="down4")(x4, **kw)
        if self.self_attention:
            x5 = layers.SelfAttention2d(name="self_attn")(x5)
        h = ResConvUp(256 // fs, self.norm, self.decoder_dropout, dtype=d,
                      name="up1")(x5, x4, **kw)
        h = ResConvUp(128 // fs, self.norm, self.decoder_dropout, dtype=d,
                      name="up2")(h, x3, **kw)
        h = ResConvUp(64 // fs, self.norm, self.decoder_dropout, dtype=d,
                      name="up3")(h, x2, **kw)
        h = ResConvUp(64 // fs, self.norm, self.decoder_dropout, dtype=d,
                      name="up4")(h, x1, **kw)
        return layers.conv1x1(self.num_classes, name="outc", dtype=d)(h)
