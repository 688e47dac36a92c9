"""UNet model family (Flax, NHWC).

Redesign of /root/reference/src/models/segmentation_models/unet.py:15-136
(UnetEncoder / UnetDecoder with skip connections + per-level CodeFilters +
`apply_max_style`) and the building blocks of unet_parts.py (double_conv
:41-67, inconv/down/up/outconv :178-212, 517-548, 628-635, CodeFilter
:13-40), plus the monolithic `UNet` (:138-331).

The decoder's style hooks use the same index protocol as the FCN decoder:
0 = bottom feature (detached on entry in the reference's apply_max_style,
unet.py:104-136), 1..4 = after up1..4, 5 = after the output conv — and the
per-hook channel plan coincides with encoder_decoder.decoder_style_channels.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from maxstyle_tpu.models import layers
from maxstyle_tpu.models.encoder_decoder import StyleFns, _maybe_style


class DoubleConv(nn.Module):
    """(conv3 -> norm -> act) x2 (unet_parts.double_conv:41-67)."""

    out_ch: int
    norm: str = "batch"
    act: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = nn.relu if self.act == "relu" else layers.lrelu
        x = layers.conv3x3(self.out_ch, name="conv1", dtype=self.dtype)(x)
        x = layers.Norm2d(self.norm, dtype=self.dtype, name="norm1")(x, train=train)
        x = act(x)
        x = layers.conv3x3(self.out_ch, name="conv2", dtype=self.dtype)(x)
        x = layers.Norm2d(self.norm, dtype=self.dtype, name="norm2")(x, train=train)
        return act(x)


class Down(nn.Module):
    """maxpool(2) + double_conv (unet_parts.down:517-535)."""

    out_ch: int
    norm: str = "batch"
    act: str = "relu"
    dropout: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, deterministic_dropout: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = DoubleConv(self.out_ch, self.norm, self.act, dtype=self.dtype,
                       name="conv")(x, train=train)
        if self.dropout is not None:
            x = layers.FixableDropout(self.dropout)(x, deterministic=deterministic_dropout)
        return x


class Up(nn.Module):
    """upsample + concat skip + double_conv (unet_parts.up:552-584)."""

    out_ch: int
    up_type: str = "bilinear"
    norm: str = "batch"
    act: str = "relu"
    dropout: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, train: bool = True,
                 deterministic_dropout: bool = False):
        if self.up_type in ("bilinear", "nearest", "NN"):
            x = layers.upsample2x(x, "NN" if self.up_type in ("nearest", "NN")
                                  else "bilinear")
        elif self.up_type == "Conv2":
            x = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                                 padding="VALID", kernel_init=layers.normal_002,
                                 dtype=self.dtype)(x)
        else:
            raise ValueError(self.up_type)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        if self.dropout is not None:
            x = layers.FixableDropout(self.dropout)(x, deterministic=deterministic_dropout)
        return DoubleConv(self.out_ch, self.norm, self.act, dtype=self.dtype,
                          name="conv")(x, train=train)


class CodeFilter(nn.Module):
    """Per-level code decoupler (unet_parts.CodeFilter:13-40): same stack as
    the dual-branch code_decoupler."""

    out_ch: int
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = layers.conv3x3(self.out_ch, use_bias=False, name="conv1",
                           dtype=self.dtype)(z)
        h = layers.Norm2d(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
        h = layers.lrelu(h)
        h = layers.conv3x3(self.out_ch, use_bias=False, name="conv2",
                           dtype=self.dtype)(h)
        h = layers.Norm2d(self.norm, dtype=self.dtype, name="norm2")(h, train=train)
        return nn.relu(h)


class UnetEncoder(nn.Module):
    """Returns the 5-level skip pyramid [x1..x5] (unet.py:15-63);
    `filter_code` applies optional per-level CodeFilters."""

    feature_reduce: int = 1
    norm: str = "batch"
    act: str = "relu"
    dropout: Optional[float] = None
    enable_code_filter: bool = False
    dtype: Any = None

    def setup(self):
        r = self.feature_reduce
        d = self.dtype
        self.inc = DoubleConv(64 // r, self.norm, self.act, dtype=d)
        self.down1 = Down(128 // r, self.norm, self.act, self.dropout, dtype=d)
        self.down2 = Down(256 // r, self.norm, self.act, self.dropout, dtype=d)
        self.down3 = Down(512 // r, self.norm, self.act, self.dropout, dtype=d)
        self.down4 = Down(512 // r, self.norm, self.act, self.dropout, dtype=d)
        if self.enable_code_filter:
            chans = [64 // r, 128 // r, 256 // r, 512 // r, 512 // r]
            self.code_filters = [CodeFilter(c, self.norm, dtype=d) for c in chans]

    def encode(self, x, train: bool = True, domain_id: int = 0,
               style_fns: StyleFns = None, deterministic_dropout: bool = False):
        """Hook indices for MixStyle replay: 1=after inc, 2..5=after
        down1..4 (there is no separate final conv, so index 6 is unused)."""
        kw = dict(train=train, deterministic_dropout=deterministic_dropout)
        x1 = self.inc(x, train=train)
        x1 = _maybe_style(x1, style_fns, 1)
        x2 = self.down1(x1, **kw)
        x2 = _maybe_style(x2, style_fns, 2)
        x3 = self.down2(x2, **kw)
        x3 = _maybe_style(x3, style_fns, 3)
        x4 = self.down3(x3, **kw)
        x4 = _maybe_style(x4, style_fns, 4)
        x5 = self.down4(x4, **kw)
        x5 = _maybe_style(x5, style_fns, 5)
        return [x1, x2, x3, x4, x5]

    def filter_code(self, z: Sequence[jnp.ndarray], train: bool = True):
        if not self.enable_code_filter:
            return list(z)
        return [f(zi, train=train) for f, zi in zip(self.code_filters, z)]

    def __call__(self, x, train: bool = True, domain_id: int = 0):
        z = self.encode(x, train=train)
        return z, self.filter_code(z, train=train)


class UnetDecoder(nn.Module):
    """Skip-connected decoder over the [x1..x5] pyramid (unet.py:65-136)
    with MaxStyle hooks at {0: bottom, 1..4: after ups, 5: after outc}."""

    out_ch: int
    feature_reduce: int = 1
    up_type: str = "bilinear"
    norm: str = "batch"
    act: str = "relu"
    dropout: Optional[float] = None
    last_act: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = True,
                 style_fns: StyleFns = None, deterministic_dropout: bool = False):
        r = self.feature_reduce
        d = self.dtype
        x1, x2, x3, x4, x5 = features
        kw = dict(train=train, deterministic_dropout=deterministic_dropout)
        x5 = _maybe_style(x5, style_fns, 0)
        x = Up(256 // r, self.up_type, self.norm, self.act, self.dropout,
               dtype=d, name="up1")(x5, x4, **kw)
        x = _maybe_style(x, style_fns, 1)
        x = Up(128 // r, self.up_type, self.norm, self.act, self.dropout,
               dtype=d, name="up2")(x, x3, **kw)
        x = _maybe_style(x, style_fns, 2)
        x = Up(64 // r, self.up_type, self.norm, self.act, self.dropout,
               dtype=d, name="up3")(x, x2, **kw)
        x = _maybe_style(x, style_fns, 3)
        x = Up(64 // r, self.up_type, self.norm, self.act, self.dropout,
               dtype=d, name="up4")(x, x1, **kw)
        x = _maybe_style(x, style_fns, 4)
        x = layers.conv1x1(self.out_ch, name="outc", dtype=d)(x)
        if self.last_act == "sigmoid":
            x = nn.sigmoid(x)
        elif self.last_act == "instance_norm":
            from maxstyle_tpu.ops.intensity import instance_norm
            x = instance_norm(x)
        x = _maybe_style(x, style_fns, 5)
        return x


class UNet(nn.Module):
    """Monolithic UNet (unet.py:138-331) — the plain baseline network used
    by the SegmentationModel solver family."""

    num_classes: int
    feature_reduce: int = 1
    norm: str = "batch"
    dropout: Optional[float] = None

    def setup(self):
        self.encoder = UnetEncoder(self.feature_reduce, self.norm,
                                   dropout=self.dropout)
        self.decoder = UnetDecoder(self.num_classes, self.feature_reduce,
                                   norm=self.norm, dropout=self.dropout)

    def __call__(self, x, train: bool = True):
        z = self.encoder.encode(x, train=train)
        return self.decoder(z, train=train)


class DeeplySupervisedUNet(nn.Module):
    """UNet emitting auxiliary predictions from intermediate decoder levels,
    upsampled to full resolution (unet.DeeplySupervisedUNet:333-454).
    Returns [aux_1/4, aux_1/2, final] logits lists for hierarchical or
    deep-supervision losses."""

    num_classes: int
    feature_reduce: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = True):
        r = self.feature_reduce
        enc = UnetEncoder(self.feature_reduce, self.norm, name="encoder")
        x1, x2, x3, x4, x5 = enc.encode(x, train=train)
        u1 = Up(256 // r, "bilinear", self.norm, name="up1")(x5, x4, train=train)
        u2 = Up(128 // r, "bilinear", self.norm, name="up2")(u1, x3, train=train)
        u3 = Up(64 // r, "bilinear", self.norm, name="up3")(u2, x2, train=train)
        u4 = Up(64 // r, "bilinear", self.norm, name="up4")(u3, x1, train=train)

        def head(feat, name):
            logits = layers.conv1x1(self.num_classes, name=name)(feat)
            n, h, w, c = logits.shape
            hh, ww = x.shape[1], x.shape[2]
            return jax.image.resize(logits, (n, hh, ww, c), method="linear")

        aux2 = head(u2, "aux_head_2")
        aux3 = head(u3, "aux_head_3")
        final = layers.conv1x1(self.num_classes, name="outc")(u4)
        return [aux2, aux3, final]


class UNetv2(nn.Module):
    """UNet variant with Conv2-transposed upsampling (unet.UNetv2:457-537)."""

    num_classes: int
    feature_reduce: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = True):
        enc = UnetEncoder(self.feature_reduce, self.norm, name="encoder")
        dec = UnetDecoder(self.num_classes, self.feature_reduce,
                          up_type="Conv2", norm=self.norm, name="decoder")
        return dec(enc.encode(x, train=train), train=train)


def build_unet_modules(spec, image_ch=1, num_classes=4, encoder_dropout=None,
                       decoder_dropout=None, image_size=192, dtype=None):
    """Unet-family module bundle (advanced_triplet…get_network:204-251):
    UnetEncoder + UnetDecoder seg head; image decoder is the standard conv
    decoder over the bottom feature (or a UnetDecoder for `Unet_im_recon`);
    UNETR variants use the transformer encoder."""
    from maxstyle_tpu.models.encoder_decoder import Decoder, Encoder

    r = spec.feature_reduce
    act = "leaky_relu" if "leaky_relu" in spec.network_type else "relu"
    modules = {}
    if spec.is_transformer:
        from maxstyle_tpu.models.unetr import UNETREncoder, UNETRDecoder
        modules["image_encoder"] = UNETREncoder(
            img_size=image_size, feature_size=64 // r, hidden_size=768,
            enable_code_filter=spec.unet_code_filter,
            dropout_rate=encoder_dropout or 0.0, dtype=dtype)
        modules["segmentation_decoder"] = UNETRDecoder(
            out_ch=num_classes, feature_size=64 // r, hidden_size=768,
            dtype=dtype)
    else:
        modules["image_encoder"] = UnetEncoder(
            feature_reduce=r, act=act, dropout=encoder_dropout,
            enable_code_filter=spec.unet_code_filter, dtype=dtype)
        modules["segmentation_decoder"] = UnetDecoder(
            out_ch=num_classes, feature_reduce=r, act=act,
            dropout=decoder_dropout, last_act=None, dtype=dtype)
    if spec.has_image_recon:
        if "Unet_im_recon" in spec.network_type:
            modules["image_decoder"] = UnetDecoder(
                out_ch=image_ch, feature_reduce=r, up_type="Conv2", act=act,
                dropout=decoder_dropout, last_act=spec.image_decoder_last_act,
                dtype=dtype)
        else:
            modules["image_decoder"] = Decoder(
                out_ch=image_ch, feature_reduce=r, up_type="Conv2",
                dropout=decoder_dropout, last_act=spec.image_decoder_last_act,
                dtype=dtype)
    if spec.has_stn:
        modules["shape_encoder"] = Encoder(out_ch=512 // r, feature_reduce=r,
                                           dropout=encoder_dropout, act="relu",
                                           dtype=dtype)
        modules["shape_decoder"] = Decoder(out_ch=num_classes, feature_reduce=r,
                                           up_type="NN", dropout=decoder_dropout,
                                           dtype=dtype)
    return modules
