"""UNETR (2D) — transformer-encoder segmentation family (Flax, NHWC).

Redesign of /root/reference/src/models/segmentation_models/unetr.py:206-466
(itself built on MONAI's ViT/UNETR blocks): a 12-layer ViT over 16x16
patches (hidden 768, 12 heads, MLP 3072) with hidden states tapped at
layers 3/6/9/12, projected through progressive deconv stacks into a 5-level
skip pyramid [enc1@1x, enc2@1/2, enc3@1/4, enc4@1/8, dec4@1/16] consumed by
a deconv+residual-conv decoder. The attention operates on (192/16)^2 = 144
tokens — plain dense attention, ideal MXU shape; no sequence parallelism is
needed (SURVEY §5).

Encoder exposes the same `encode` / `filter_code` protocol as the other
families (per-level CodeFilters, unetr.py:325-341) so the solver treats it
identically.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from maxstyle_tpu.models import layers
from maxstyle_tpu.models.encoder_decoder import StyleFns, _maybe_style
from maxstyle_tpu.models.unet import CodeFilter


class SelfAttention(nn.Module):
    """MONAI SABlock semantics (monai/networks/blocks/selfattention.py):
    fused qkv Linear WITHOUT bias (qkv_bias=False default), scaled
    dot-product with dropout on the attention weights, out-projection
    Linear WITH bias + output dropout. Hand-rolled (not flax MHA) so the
    bias structure and weight layout map 1:1 onto MONAI checkpoints
    (utils/torch_import.convert_unetr_vit).

    Layout note: the fused feature axis here is HEAD-MAJOR —
    (head, qkv, head_dim) — not MONAI's (qkv, head, head_dim) `b h
    (qkv l d)` rearrange. Numerically identical (the converter permutes
    imported checkpoint columns), but under Megatron tensor parallelism an
    even column split over the 'model' axis then keeps WHOLE heads (with
    their q, k and v together) on one shard for any
    num_heads % model_parallel == 0, so the attention einsums stay
    shard-local with no resharding collectives (parallel/tp.py)."""

    hidden_size: int = 768
    num_heads: int = 12
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, _ = x.shape
        heads = self.num_heads
        head_dim = self.hidden_size // heads
        qkv = nn.Dense(3 * self.hidden_size, use_bias=False,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, heads, 3, head_dim)
        q = jnp.transpose(qkv[:, :, :, 0], (0, 2, 1, 3))  # [b, heads, n, d]
        k = jnp.transpose(qkv[:, :, :, 1], (0, 2, 1, 3))
        v = jnp.transpose(qkv[:, :, :, 2], (0, 2, 1, 3))
        att = jnp.einsum("bhxd,bhyd->bhxy", q, k) * (head_dim ** -0.5)
        att = jax.nn.softmax(att, axis=-1)
        if self.dropout_rate > 0.0:
            att = nn.Dropout(self.dropout_rate,
                             deterministic=deterministic)(att)
        out = jnp.einsum("bhxy,bhyd->bhxd", att, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, self.hidden_size)
        out = nn.Dense(self.hidden_size, dtype=self.dtype,
                       name="out_proj")(out)
        if self.dropout_rate > 0.0:
            out = nn.Dropout(self.dropout_rate,
                             deterministic=deterministic)(out)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm ViT block (MONAI TransformerBlock):
    x = x + attn(norm1(x)); x = x + mlp(norm2(x)). MLPBlock is
    linear1 -> exact-erf GELU -> drop -> linear2 -> drop (torch nn.GELU is
    the exact erf form, NOT flax's default tanh approximation)."""

    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + SelfAttention(self.hidden_size, self.num_heads,
                              self.dropout_rate, dtype=self.dtype,
                              name="attn")(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        if self.dropout_rate > 0.0:
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="linear2")(h)
        if self.dropout_rate > 0.0:
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return x + h


class ViT(nn.Module):
    """Patch-conv embedding + learned position embedding + 12 blocks;
    returns the final tokens and all intermediate hidden states."""

    img_size: int = 192
    patch_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        n_patch = (self.img_size // self.patch_size) ** 2
        x = nn.Conv(self.hidden_size, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, n_patch, self.hidden_size))
        x = x + pos.astype(x.dtype)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        hidden_states = []
        for i in range(self.num_layers):
            x = TransformerBlock(self.hidden_size, self.mlp_dim,
                                 self.num_heads, self.dropout_rate,
                                 dtype=self.dtype,
                                 name=f"block{i}")(x, deterministic=not train)
            hidden_states.append(x)
        # MONAI ViT applies a trailing LayerNorm to the FINAL tokens only
        # (vit.py: x = self.norm(x)); hidden_states stay un-normed
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, hidden_states


class ResConvBlock(nn.Module):
    """UnetrBasicBlock: conv3-norm-lrelu x2 + 1x1 skip (res_block=True)."""

    out_ch: int
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = layers.conv3x3(self.out_ch, name="conv1", dtype=self.dtype)(x)
        h = layers.Norm2d(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
        h = layers.lrelu(h)
        h = layers.conv3x3(self.out_ch, name="conv2", dtype=self.dtype)(h)
        h = layers.Norm2d(self.norm, dtype=self.dtype, name="norm2")(h, train=train)
        skip = (layers.conv1x1(self.out_ch, name="skip", dtype=self.dtype)(x)
                if x.shape[-1] != self.out_ch else x)
        return layers.lrelu(skip.astype(h.dtype) + h)


class PrUpBlock(nn.Module):
    """UnetrPrUpBlock: n x [deconv2x -> res conv block], projecting a
    1/16-resolution hidden map up by 2^n."""

    out_ch: int
    num_layer: int
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                             padding="VALID", kernel_init=layers.normal_002,
                             dtype=self.dtype, name="up0")(x)
        for i in range(self.num_layer):
            x = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                                 padding="VALID", kernel_init=layers.normal_002,
                                 dtype=self.dtype, name=f"up{i + 1}")(x)
            x = ResConvBlock(self.out_ch, self.norm, dtype=self.dtype,
                             name=f"conv{i + 1}")(x, train=train)
        return x


class UpCatBlock(nn.Module):
    """UnetrUpBlock: deconv2x, concat skip, res conv block."""

    out_ch: int
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                             padding="VALID", kernel_init=layers.normal_002,
                             dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return ResConvBlock(self.out_ch, self.norm, dtype=self.dtype)(x, train=train)


class UNETREncoder(nn.Module):
    """ViT trunk + progressive projections -> 5-level skip pyramid
    (unetr.py:206-375)."""

    img_size: int = 192
    feature_size: int = 16
    hidden_size: int = 768
    norm: str = "batch"
    enable_code_filter: bool = False
    dropout_rate: float = 0.0
    dtype: Any = None

    def setup(self):
        self.vit = ViT(img_size=self.img_size, hidden_size=self.hidden_size,
                       dropout_rate=self.dropout_rate, dtype=self.dtype)
        f = self.feature_size
        d = self.dtype
        self.encoder1 = ResConvBlock(f, self.norm, dtype=d)
        self.encoder2 = PrUpBlock(f * 2, num_layer=2, norm=self.norm, dtype=d)
        self.encoder3 = PrUpBlock(f * 4, num_layer=1, norm=self.norm, dtype=d)
        self.encoder4 = PrUpBlock(f * 8, num_layer=0, norm=self.norm, dtype=d)
        if self.enable_code_filter:
            chans = [f, f * 2, f * 4, f * 8, self.hidden_size]
            self.code_filters = [CodeFilter(c, self.norm, dtype=d) for c in chans]

    def _proj(self, tokens):
        b, n, c = tokens.shape
        g = self.img_size // 16
        return tokens.reshape(b, g, g, c)

    def encode(self, x, train: bool = True, domain_id: int = 0,
               style_fns: StyleFns = None, deterministic_dropout: bool = False):
        # reference taps hidden_states_out[3]/[6]/[9] — the outputs of
        # blocks 4/7/10 (0-indexed list appended AFTER each block), and
        # dec4 is the final tokens AFTER the ViT's trailing LayerNorm
        # (unetr.py:353-363 + monai vit.py forward)
        final, hidden = self.vit(x, train=train)
        z4, z7, z10 = hidden[3], hidden[6], hidden[9]
        enc1 = self.encoder1(x, train=train)
        enc1 = _maybe_style(enc1, style_fns, 1)
        enc2 = self.encoder2(self._proj(z4), train=train)
        enc2 = _maybe_style(enc2, style_fns, 2)
        enc3 = self.encoder3(self._proj(z7), train=train)
        enc3 = _maybe_style(enc3, style_fns, 3)
        enc4 = self.encoder4(self._proj(z10), train=train)
        enc4 = _maybe_style(enc4, style_fns, 4)
        dec4 = self._proj(final)
        dec4 = _maybe_style(dec4, style_fns, 5)
        return [enc1, enc2, enc3, enc4, dec4]

    def filter_code(self, z: Sequence[jnp.ndarray], train: bool = True):
        if not self.enable_code_filter:
            return list(z)
        return [f(zi, train=train) for f, zi in zip(self.code_filters, z)]

    def __call__(self, x, train: bool = True, domain_id: int = 0):
        z = self.encode(x, train=train)
        return z, self.filter_code(z, train=train)


class UNETRDecoder(nn.Module):
    """Deconv + residual-conv decoder over the UNETR pyramid
    (unetr.py:378-466), with the standard style-hook protocol."""

    out_ch: int
    feature_size: int = 16
    hidden_size: int = 768
    norm: str = "batch"
    last_act: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = True,
                 style_fns: StyleFns = None, deterministic_dropout: bool = False):
        enc1, enc2, enc3, enc4, dec4 = features
        f = self.feature_size
        d = self.dtype
        dec4 = _maybe_style(dec4, style_fns, 0)
        x = UpCatBlock(f * 8, self.norm, dtype=d, name="decoder5")(dec4, enc4, train=train)
        x = _maybe_style(x, style_fns, 1)
        x = UpCatBlock(f * 4, self.norm, dtype=d, name="decoder4")(x, enc3, train=train)
        x = _maybe_style(x, style_fns, 2)
        x = UpCatBlock(f * 2, self.norm, dtype=d, name="decoder3")(x, enc2, train=train)
        x = _maybe_style(x, style_fns, 3)
        x = UpCatBlock(f, self.norm, dtype=d, name="decoder2")(x, enc1, train=train)
        x = _maybe_style(x, style_fns, 4)
        x = layers.conv1x1(self.out_ch, name="out", dtype=d)(x)
        if self.last_act == "sigmoid":
            x = nn.sigmoid(x)
        elif self.last_act == "instance_norm":
            from maxstyle_tpu.ops.intensity import instance_norm
            x = instance_norm(x)
        x = _maybe_style(x, style_fns, 5)
        return x
