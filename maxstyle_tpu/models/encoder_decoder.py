"""Dual-branch encoder / decoder model family (FTN) — Flax, NHWC.

TPU-first redesign of /root/reference/src/models/ebm/encoder_decoder.py:
* `Encoder`       ≙ MyEncoder (:423-482) / DomainSpecificEncoder (:485-558)
                    (the two are unified via `num_domains`; per-domain BN is a
                    static branch, not a separate class)
* `Decoder`       ≙ MyDecoder (:561-631), including the `apply_max_style`
                    hook protocol — expressed here as an optional
                    ``style_fns: {hook_index: callable}`` argument on the
                    plain forward, so the style-augmented replay is the SAME
                    compiled graph rather than a duplicated method.
* `CodeDecoupler` ≙ Dual_Branch_Encoder.code_decoupler (:648-668)
* `DualBranchEncoder` ≙ Dual_Branch_Encoder (:634-680)

Style hook indices (matching MyDecoder.apply_max_style:598-631):
  0 = input latent code, 1..4 = after up1..up4, 5 = after final conv + act.
Channel schedule for feature_reduce=4: [128, 64, 32, 16, 16, out_ch]
(train_adv…:255-260).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from maxstyle_tpu.models import layers
from maxstyle_tpu.ops.intensity import instance_norm


StyleFns = Optional[Dict[int, Callable[[jnp.ndarray], jnp.ndarray]]]


def _maybe_style(x, style_fns: StyleFns, idx: int):
    if style_fns is not None and idx in style_fns:
        return style_fns[idx](x)
    return x


class Encoder(nn.Module):
    """Five-stage strided-conv encoder, output stride 16.

    Channel plan: 64,128,256,512,512 (÷ feature_reduce), then 1x1 to
    `out_ch` + norm + optional activation (encoder_decoder.MyEncoder).
    """

    out_ch: int
    feature_reduce: int = 1
    norm: str = "batch"
    dropout: Optional[float] = None
    act: Optional[str] = "relu"  # 'relu' | 'sigmoid' | None
    num_domains: int = 1
    if_sn: bool = False  # spectral-norm the down blocks (res_convdown if_SN)
    dtype: Any = None  # activation/compute dtype; params + BN stats stay f32

    @nn.compact
    def __call__(self, x, train: bool = True, domain_id: int = 0,
                 style_fns: StyleFns = None, deterministic_dropout: bool = False):
        """`style_fns` hooks (MixStyle encoder replay, advanced_triplet…:632-670):
        1 = after inc+lrelu, 2..5 = after down1..4, 6 = after final act."""
        r = self.feature_reduce
        kw = dict(train=train, domain_id=domain_id)
        x1 = layers.InConv(64 // r, self.norm, num_domains=self.num_domains,
                           dtype=self.dtype, name="inc")(x, **kw)
        x1 = layers.lrelu(x1)
        x1 = _maybe_style(x1, style_fns, 1)
        down_kw = dict(train=train, domain_id=domain_id,
                       deterministic_dropout=deterministic_dropout)
        x2 = layers.ResConvDown(128 // r, self.norm, self.dropout,
                                num_domains=self.num_domains, if_sn=self.if_sn,
                                dtype=self.dtype, name="down1")(x1, **down_kw)
        x2 = _maybe_style(x2, style_fns, 2)
        x3 = layers.ResConvDown(256 // r, self.norm, self.dropout,
                                num_domains=self.num_domains, if_sn=self.if_sn,
                                dtype=self.dtype, name="down2")(x2, **down_kw)
        x3 = _maybe_style(x3, style_fns, 3)
        x4 = layers.ResConvDown(512 // r, self.norm, self.dropout,
                                num_domains=self.num_domains, if_sn=self.if_sn,
                                dtype=self.dtype, name="down3")(x3, **down_kw)
        x4 = _maybe_style(x4, style_fns, 4)
        x5 = layers.ResConvDown(512 // r, self.norm, self.dropout,
                                num_domains=self.num_domains, if_sn=self.if_sn,
                                dtype=self.dtype, name="down4")(x4, **down_kw)
        x5 = _maybe_style(x5, style_fns, 5)

        z = layers.conv1x1(self.out_ch, name="final_conv", dtype=self.dtype)(x5)
        if self.num_domains > 1:
            z = layers.DomainSpecificNorm2d(self.num_domains, dtype=self.dtype,
                                            name="final_norm")(
                z, domain_id=domain_id, train=train)
        else:
            z = layers.Norm2d(self.norm, dtype=self.dtype,
                              name="final_norm")(z, train=train)
        if self.act == "relu":
            z = nn.relu(z)
        elif self.act == "sigmoid":
            z = nn.sigmoid(z)
        elif self.act is not None:
            raise NotImplementedError(self.act)
        z = _maybe_style(z, style_fns, 6)
        return z


class CodeDecoupler(nn.Module):
    """z_i -> z_s filter: conv3(no bias)-norm-lrelu-conv3(no bias)-norm-relu
    (encoder_decoder.py:648-668)."""

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


class DualBranchEncoder(nn.Module):
    """general_encoder (ReLU head) producing z, plus the code decoupler
    producing z_s (encoder_decoder.Dual_Branch_Encoder:634-680).

    Exposed methods (for targeted application via `method=`):
      * encode(x)      -> z            (general encoder only)
      * filter_code(z) -> z_s          (decoupler only)
      * __call__(x)    -> (z, z_s)
    """

    z_level_1_ch: int
    z_level_2_ch: int
    feature_reduce: int = 1
    norm: str = "batch"
    dropout: Optional[float] = None
    num_domains: int = 1
    if_sn: bool = False
    dtype: Any = None

    def setup(self):
        self.general_encoder = Encoder(self.z_level_1_ch, self.feature_reduce,
                                       self.norm, self.dropout, act="relu",
                                       num_domains=self.num_domains,
                                       if_sn=self.if_sn, dtype=self.dtype)
        self.code_decoupler = CodeDecoupler(self.z_level_2_ch, self.norm,
                                            dtype=self.dtype)

    def encode(self, x, train: bool = True, domain_id: int = 0,
               style_fns: StyleFns = None, deterministic_dropout: bool = False):
        return self.general_encoder(x, train=train, domain_id=domain_id,
                                    style_fns=style_fns,
                                    deterministic_dropout=deterministic_dropout)

    def filter_code(self, z, train: bool = True):
        return self.code_decoupler(z, train=train)

    def __call__(self, x, train: bool = True, domain_id: int = 0):
        z = self.encode(x, train=train, domain_id=domain_id)
        z_s = self.filter_code(z, train=train)
        return z, z_s


class Decoder(nn.Module):
    """Four-stage residual up decoder with MaxStyle hook points
    (encoder_decoder.MyDecoder:561-631).

    Channel plan: in -> 256/r -> 128/r -> 64/r -> 64/r -> out_ch (1x1).
    `last_act`: 'sigmoid' (min_max image decoder), 'instance_norm'
    (z_score head), or None (segmentation logits / identity head).
    """

    out_ch: int
    feature_reduce: int = 1
    up_type: str = "NN"
    norm: str = "batch"
    dropout: Optional[float] = None
    last_act: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, style_fns: StyleFns = None,
                 deterministic_dropout: bool = False,
                 start_at_hook: Optional[int] = None,
                 stop_before_hook: Optional[int] = None):
        """The forward is organized as six (conv, hook) stages:
        stage 0 = (identity, hook0), stages 1-4 = (up_i, hook_i),
        stage 5 = (final 1x1 + activation, hook5).

        `stop_before_hook=k` runs stages 0..k-1 plus stage k's conv and
        returns the PRE-hook-k activation; `start_at_hook=k` takes that
        activation, applies hook k and runs the rest. This lets the
        MaxStyle inner loop hoist the style-independent decoder prefix out
        of the adversarial scan (solver.generate_max_style_image) — the
        split is exact because 'frozen'-mode BN recomputes identical batch
        statistics from the identical prefix input every iteration."""
        r = self.feature_reduce
        d = self.dtype
        kw = dict(train=train, deterministic_dropout=deterministic_dropout)
        chans = [256 // r, 128 // r, 64 // r, 64 // r]

        def conv_stage(i, v):
            if i == 0:
                return v
            if i == 5:
                v = layers.conv1x1(self.out_ch, name="final_conv", dtype=d)(v)
                if self.last_act == "sigmoid":
                    v = nn.sigmoid(v)
                elif self.last_act == "instance_norm":
                    v = instance_norm(v)
                elif self.last_act is not None:
                    raise NotImplementedError(self.last_act)
                return v
            return layers.ResUp(chans[i - 1], self.up_type, self.norm,
                                self.dropout, dtype=d, name=f"up{i}")(v, **kw)

        start = 0 if start_at_hook is None else start_at_hook
        for i in range(start, 6):
            if not (start_at_hook is not None and i == start):
                x = conv_stage(i, x)
            if stop_before_hook is not None and i == stop_before_hook:
                return x
            x = _maybe_style(x, style_fns, i)
        return x


def decoder_style_channels(feature_reduce: int, out_ch: int) -> list[int]:
    """Per-hook channel counts for the MaxStyle dict
    (train_adv…:255-260: [128,64,32,16,16,1] for `_16`, [512,...] for `_64`);
    hook 0 additionally depends on the latent width = 512//r."""
    r = feature_reduce
    return [512 // r, 256 // r, 128 // r, 64 // r, 64 // r, out_ch]
