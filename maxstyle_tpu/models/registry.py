"""network_type string grammar -> module bundle construction.

Reproduces the grammar accepted by the reference solver's `get_network`
(/root/reference/src/models/advanced_triplet_recon_segmentation_model.py:125-266):

  FCN_{16|64}[_standard][_no_STN][_no_im_recon][_w_image|_w_recon_image|
      _w_dual_image][_w_o_filter][_share_code][_NN_decoder]
      [_z_score|_identity]
  DS_FCN_16_standard                      (dual-domain BN)
  Unet… / UnetTransformer…                (see models/unet.py, models/unetr.py)

`16` -> feature_reduce 4, `64` -> feature_reduce 1 (:166-170).
The bundle is a dict of independently-parameterized Flax modules, mirroring
the reference's per-module dict {image_encoder, segmentation_decoder,
[image_decoder], [shape_encoder], [shape_decoder]} so per-module optimizers
and per-module checkpoints fall out naturally.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from flax import linen as nn

from maxstyle_tpu.models.encoder_decoder import Decoder, DualBranchEncoder, Encoder


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    """Parsed network_type with everything the solver needs statically."""

    network_type: str
    feature_reduce: int
    has_stn: bool
    has_image_recon: bool
    share_code: bool
    no_filter: bool
    num_domains: int
    image_decoder_up: str
    image_decoder_last_act: Optional[str]
    shape_input_mode: Optional[str]  # None | 'seg_only' | 'w_image' | 'w_recon_image' | 'w_dual_image'
    is_unet: bool
    unet_code_filter: bool = False
    is_transformer: bool = False

    @property
    def latent_ch(self) -> int:
        return 512 // self.feature_reduce


def parse_network_type(network_type: str, intensity_norm_type: str = "min_max") -> NetworkSpec:
    nt = network_type
    if "16" in nt:
        reduce = 4
    elif "64" in nt:
        reduce = 1
    else:
        raise ValueError(f"network_type must contain 16 or 64: {nt}")

    # image decoder output head (advanced_triplet…:142-151)
    if intensity_norm_type == "min_max":
        last_act: Optional[str] = "sigmoid"
    elif intensity_norm_type == "z_score":
        last_act = "instance_norm"
    else:
        raise NotImplementedError(intensity_norm_type)
    if "z_score" in nt:
        last_act = "instance_norm"
    elif "identity" in nt:
        last_act = None

    has_stn = "no_STN" not in nt
    shape_mode: Optional[str] = None
    if has_stn:
        if "w_dual_image" in nt:
            shape_mode = "w_dual_image"
        elif "w_recon_image" in nt:
            shape_mode = "w_recon_image"
        elif "w_image" in nt:
            shape_mode = "w_image"
        else:
            shape_mode = "seg_only"

    return NetworkSpec(
        network_type=nt,
        feature_reduce=reduce,
        has_stn=has_stn,
        has_image_recon="no_im_recon" not in nt,
        share_code="share_code" in nt,
        no_filter="w_o_filter" in nt,
        num_domains=2 if nt.startswith("DS_") else 1,
        image_decoder_up="NN" if "NN_decoder" in nt else "Conv2",
        image_decoder_last_act=last_act,
        shape_input_mode=shape_mode,
        is_unet=nt.startswith("Unet"),
        unet_code_filter="enable_code_filter" in nt,
        is_transformer="UnetTransformer" in nt,
    )


def build_modules(spec: NetworkSpec, image_ch: int = 1, num_classes: int = 4,
                  encoder_dropout: Optional[float] = None,
                  decoder_dropout: Optional[float] = None,
                  image_size: int = 192, dtype=None) -> Dict[str, nn.Module]:
    """Build the module bundle for a parsed spec (FCN family; Unet/UNETR
    bundles are built by their own factories and merged here).

    `dtype` is the activation/compute dtype (mixed precision: params,
    optimizer state and BN running statistics always stay float32)."""
    if spec.is_unet:
        from maxstyle_tpu.models.unet import build_unet_modules  # lazy import
        return build_unet_modules(spec, image_ch=image_ch, num_classes=num_classes,
                                  encoder_dropout=encoder_dropout,
                                  decoder_dropout=decoder_dropout,
                                  image_size=image_size, dtype=dtype)
    r = spec.feature_reduce
    modules: Dict[str, nn.Module] = {}
    modules["image_encoder"] = DualBranchEncoder(
        z_level_1_ch=512 // r, z_level_2_ch=512 // r, feature_reduce=r,
        norm="batch", dropout=encoder_dropout, num_domains=spec.num_domains,
        dtype=dtype)
    modules["segmentation_decoder"] = Decoder(
        out_ch=num_classes, feature_reduce=r, up_type="NN", norm="batch",
        dropout=decoder_dropout, last_act=None, dtype=dtype)
    if spec.has_image_recon:
        modules["image_decoder"] = Decoder(
            out_ch=image_ch, feature_reduce=r, up_type=spec.image_decoder_up,
            norm="batch", dropout=decoder_dropout,
            last_act=spec.image_decoder_last_act, dtype=dtype)
    if spec.has_stn:
        shape_in_ch = num_classes
        if spec.shape_input_mode in ("w_image", "w_recon_image"):
            shape_in_ch = num_classes + image_ch
        elif spec.shape_input_mode == "w_dual_image":
            shape_in_ch = num_classes + 2 * image_ch
        del shape_in_ch  # input channels are inferred lazily by flax
        modules["shape_encoder"] = Encoder(
            out_ch=512 // r, feature_reduce=r, norm="batch",
            dropout=encoder_dropout, act="relu", dtype=dtype)
        modules["shape_decoder"] = Decoder(
            out_ch=num_classes, feature_reduce=r, up_type="NN", norm="batch",
            dropout=decoder_dropout, last_act=None, dtype=dtype)
    return modules
