"""Import reference PyTorch checkpoints into this framework's parameters.

The reference saves per-module state dicts ({image_encoder, image_decoder,
segmentation_decoder, ...}.pth — advanced_triplet…save_model:936-948). This
module converts them to the Flax parameter/batch-stats trees of the
equivalent modules here, so users of the reference can carry trained models
over directly (and so tests can prove numerical parity against the
pretrained decoder fixtures shipped in the reference's notebooks).

Layout conversions:
  conv weight        (O,I,kh,kw)  -> kernel (kh,kw,I,O)
  conv-transpose w.  (I,O,kh,kw)  -> kernel (kh,kw,I,O)  [flax ConvTranspose]
  batchnorm          weight/bias/running_mean/running_var ->
                     params {scale,bias} + batch_stats {mean,var}
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _conv_transpose(sd, name):
    # torch ConvTranspose2d weight: (in, out, kh, kw) -> flax (kh, kw, in, out)
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 0, 1)
    # torch's transposed conv correlates with the kernel flipped relative to
    # flax's gather formulation — flip the spatial taps
    w = w[::-1, ::-1].copy()
    out = {"kernel": w}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _bn(sd, name) -> Tuple[dict, dict]:
    params = {"scale": np.asarray(sd[f"{name}.weight"]),
              "bias": np.asarray(sd[f"{name}.bias"])}
    stats = {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])}
    return params, stats


def _norm2d(sd, name) -> Tuple[dict, dict]:
    """Norm2d wraps a single BatchNorm child named BatchNorm_0."""
    p, s = _bn(sd, name)
    return {"BatchNorm_0": p}, {"BatchNorm_0": s}


def convert_res_up(sd, prefix: str, up_type: str) -> Tuple[dict, dict]:
    """res_up_family block (encoder_decoder.py:289-357): torch children
    up(.weight for Conv2/Conv4), conv.0/1/3/4, conv_input."""
    params: Dict = {}
    stats: Dict = {}
    if f"{prefix}.up.weight" in sd:
        params["up"] = {"ConvTranspose_0": _conv_transpose(sd, f"{prefix}.up")}
    params["conv1"] = _conv(sd, f"{prefix}.conv.0")
    params["norm1"], stats["norm1"] = _norm2d(sd, f"{prefix}.conv.1")
    params["conv2"] = _conv(sd, f"{prefix}.conv.3")
    params["norm2"], stats["norm2"] = _norm2d(sd, f"{prefix}.conv.4")
    params["conv_input"] = _conv(sd, f"{prefix}.conv_input")
    return params, stats


def convert_res_down(sd, prefix: str) -> Tuple[dict, dict]:
    """res_convdown block (encoder_decoder.py:22-74)."""
    params: Dict = {"down": _conv(sd, f"{prefix}.down")}
    stats: Dict = {}
    params["conv1"] = _conv(sd, f"{prefix}.conv.0")
    params["norm1"], stats["norm1"] = _norm2d(sd, f"{prefix}.conv.1")
    params["conv2"] = _conv(sd, f"{prefix}.conv.3")
    params["norm2"], stats["norm2"] = _norm2d(sd, f"{prefix}.conv.4")
    params["conv_input"] = _conv(sd, f"{prefix}.conv_input")
    return params, stats


def convert_decoder(sd, up_type: str = "NN") -> Tuple[dict, dict]:
    """MyDecoder (encoder_decoder.py:561-631) -> models.Decoder variables."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(1, 5):
        p, s = convert_res_up(sd, f"up{i}", up_type)
        params[f"up{i}"] = p
        stats[f"up{i}"] = s
    params["final_conv"] = _conv(sd, "final_conv")
    return params, stats


def convert_encoder(sd, prefix: str = "") -> Tuple[dict, dict]:
    """MyEncoder (encoder_decoder.py:423-482) -> models.Encoder variables."""
    pre = f"{prefix}." if prefix else ""
    params: Dict = {"inc": {}}
    stats: Dict = {"inc": {}}
    params["inc"]["conv1"] = _conv(sd, f"{pre}inc.0")
    params["inc"]["norm1"], stats["inc"]["norm1"] = _norm2d(sd, f"{pre}inc.1")
    params["inc"]["conv2"] = _conv(sd, f"{pre}inc.3")
    params["inc"]["norm2"], stats["inc"]["norm2"] = _norm2d(sd, f"{pre}inc.4")
    for i in range(1, 5):
        p, s = convert_res_down(sd, f"{pre}down{i}")
        params[f"down{i}"] = p
        stats[f"down{i}"] = s
    params["final_conv"] = _conv(sd, f"{pre}final_conv.0")
    params["final_norm"], stats["final_norm"] = _norm2d(sd, f"{pre}final_conv.1")
    return params, stats


def _ds_bn(sd, name, num_domains: int = 2) -> Tuple[dict, dict]:
    """DomainSpecificBatchNorm2d (custom_layers.py:69-104): children
    ``bns.{d}`` -> our DomainSpecificNorm2d children ``bn_domain{d}``."""
    params: Dict = {}
    stats: Dict = {}
    for d in range(num_domains):
        p, s = _bn(sd, f"{name}.bns.{d}")
        params[f"bn_domain{d}"] = p
        stats[f"bn_domain{d}"] = s
    return params, stats


def _sn_conv(sd, name) -> Tuple[dict, dict]:
    """torch.nn.utils.spectral_norm'd conv: weight_orig + u/v power-iteration
    buffers -> TorchSNConv3x3 params {kernel,bias} + stats {u,v}."""
    w = np.asarray(sd[f"{name}.weight_orig"]).transpose(2, 3, 1, 0)
    params = {"kernel": w}
    if f"{name}.bias" in sd:
        params["bias"] = np.asarray(sd[f"{name}.bias"])
    stats = {"u": np.asarray(sd[f"{name}.weight_u"]),
             "v": np.asarray(sd[f"{name}.weight_v"])}
    return params, stats


def convert_ds_res_down(sd, prefix: str, num_domains: int = 2) -> Tuple[dict, dict]:
    """ds_res_convdown (encoder_decoder.py:360-420). Unlike res_convdown's
    Sequential (conv.0/.1/.3/.4), the DS block names its children explicitly:
    conv_1/norm_1/conv_2/norm_2 — and conv_1 is spectral-normed even in the
    if_SN=False branch (:386)."""
    params: Dict = {"down": _conv(sd, f"{prefix}.down"),
                    "conv2": _conv(sd, f"{prefix}.conv_2"),
                    "conv_input": _conv(sd, f"{prefix}.conv_input")}
    stats: Dict = {}
    params["conv1"], stats["conv1"] = _sn_conv(sd, f"{prefix}.conv_1")
    params["norm1"], stats["norm1"] = _ds_bn(sd, f"{prefix}.norm_1", num_domains)
    params["norm2"], stats["norm2"] = _ds_bn(sd, f"{prefix}.norm_2", num_domains)
    return params, stats


def convert_ds_encoder(sd, prefix: str = "", num_domains: int = 2) -> Tuple[dict, dict]:
    """DomainSpecificEncoder (encoder_decoder.py:485-558) -> models.Encoder
    variables with num_domains>1. Same topology as MyEncoder; the stem convs
    are named inc_conv_1/2 (not a Sequential) and final_conv is a bare conv."""
    pre = f"{prefix}." if prefix else ""
    params: Dict = {"inc": {"conv1": _conv(sd, f"{pre}inc_conv_1"),
                            "conv2": _conv(sd, f"{pre}inc_conv_2")}}
    stats: Dict = {"inc": {}}
    params["inc"]["norm1"], stats["inc"]["norm1"] = _ds_bn(
        sd, f"{pre}norm_1", num_domains)
    params["inc"]["norm2"], stats["inc"]["norm2"] = _ds_bn(
        sd, f"{pre}norm_2", num_domains)
    for i in range(1, 5):
        p, s = convert_ds_res_down(sd, f"{pre}down{i}", num_domains)
        params[f"down{i}"] = p
        stats[f"down{i}"] = s
    params["final_conv"] = _conv(sd, f"{pre}final_conv")
    params["final_norm"], stats["final_norm"] = _ds_bn(
        sd, f"{pre}final_norm", num_domains)
    return params, stats


def convert_code_decoupler(sd, prefix: str = "code_decoupler") -> Tuple[dict, dict]:
    params: Dict = {"conv1": _conv(sd, f"{prefix}.0")}
    stats: Dict = {}
    params["norm1"], stats["norm1"] = _norm2d(sd, f"{prefix}.1")
    params["conv2"] = _conv(sd, f"{prefix}.3")
    params["norm2"], stats["norm2"] = _norm2d(sd, f"{prefix}.4")
    return params, stats


def convert_dual_branch_encoder(sd) -> Tuple[dict, dict]:
    """Dual_Branch_Encoder (encoder_decoder.py:634-680). The general encoder
    is DomainSpecificEncoder when built with num_domains>1 (DS_FCN,
    advanced_triplet…:174-177) — detected from its distinct child naming."""
    if "general_encoder.inc_conv_1.weight" in sd:
        nd = 1 + max(int(k.split(".bns.")[1].split(".")[0])
                     for k in sd if ".bns." in k)
        enc_p, enc_s = convert_ds_encoder(sd, "general_encoder", nd)
    else:
        enc_p, enc_s = convert_encoder(sd, "general_encoder")
    dec_p, dec_s = convert_code_decoupler(sd)
    return ({"general_encoder": enc_p, "code_decoupler": dec_p},
            {"general_encoder": enc_s, "code_decoupler": dec_s})


def convert_double_conv(sd, prefix: str) -> Tuple[dict, dict]:
    """unet_parts.double_conv (:41-67): Sequential conv-norm-act-conv-norm-act
    -> DoubleConv {conv1, norm1, conv2, norm2}."""
    params: Dict = {"conv1": _conv(sd, f"{prefix}.0")}
    stats: Dict = {}
    params["norm1"], stats["norm1"] = _norm2d(sd, f"{prefix}.1")
    params["conv2"] = _conv(sd, f"{prefix}.3")
    params["norm2"], stats["norm2"] = _norm2d(sd, f"{prefix}.4")
    return params, stats


def convert_unet_encoder(sd) -> Tuple[dict, dict]:
    """segmentation_models.UnetEncoder (unet.py:15-63): inc.conv.conv,
    down{i}.mpconv.1.conv (Sequential[maxpool, double_conv])."""
    params: Dict = {}
    stats: Dict = {}
    p, s = convert_double_conv(sd, "inc.conv.conv")
    params["inc"], stats["inc"] = p, s
    for i in range(1, 5):
        p, s = convert_double_conv(sd, f"down{i}.mpconv.1.conv")
        params[f"down{i}"] = {"conv": p}
        stats[f"down{i}"] = {"conv": s}
    # optional per-level CodeFilters (unet.py:25-36)
    if "code_filter_1.code_decoupler.0.weight" in sd:
        for i in range(1, 6):
            p, s = convert_code_decoupler(sd, f"code_filter_{i}.code_decoupler")
            params[f"code_filters_{i - 1}"] = p
            stats[f"code_filters_{i - 1}"] = s
    return params, stats


def convert_unet_decoder(sd, up_type: str = "bilinear") -> Tuple[dict, dict]:
    """segmentation_models.UnetDecoder (unet.py:65-136): up{i}.conv.conv
    double convs (+ up{i}.up for Conv2), outc.conv 1x1."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(1, 5):
        p, s = convert_double_conv(sd, f"up{i}.conv.conv")
        block: Dict = {"conv": p}
        if f"up{i}.up.weight" in sd:
            block["ConvTranspose_0"] = _conv_transpose(sd, f"up{i}.up")
        params[f"up{i}"] = block
        stats[f"up{i}"] = {"conv": s}
    params["outc"] = _conv(sd, "outc.conv")
    return params, stats


_FCN_MODULE_ORDER = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
    "conv5_3", "level_1_out", "level_2_out", "level_3_out", "level_4_out",
    "level_5_out", "aggregate_layers", "conv_final")


def convert_fcn(sd) -> Tuple[dict, dict]:
    """Bai-style FCN (segmentation_models/fcn.py:13-113, the base solver's
    'FCN_16'/'FCN_64' zoo entry). Each named conv2DBatchNormRelu maps to our
    auto-numbered ConvBNRelu_{i} in call-construction order; conv1_1/conv1_2
    swap indices because the compact expression `outer(inner(x))`
    (baselines.py FCN.__call__ first line) registers the OUTER module
    before the inner one."""
    idx = {name: i for i, name in enumerate(_FCN_MODULE_ORDER)}
    idx["conv1_1"], idx["conv1_2"] = 1, 0
    params: Dict = {}
    stats: Dict = {}
    for name, i in idx.items():
        norm_p, norm_s = _norm2d(sd, f"{name}.cbr_unit.1")
        params[f"ConvBNRelu_{i}"] = {"Conv_0": _conv(sd, f"{name}.cbr_unit.0"),
                                     "Norm2d_0": norm_p}
        stats[f"ConvBNRelu_{i}"] = {"Norm2d_0": norm_s}
    params["outS"] = _conv(sd, "outS")
    return params, stats


def load_torch_state_dict(path: str) -> dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model_state" in sd:
        sd = sd["model_state"]
    return {k: v.numpy() for k, v in sd.items()}


def convert_module_state_dict(sd: dict, module_name: str,
                              spec=None) -> Tuple[dict, dict]:
    """Dispatch a single module's state dict to its converter."""
    is_unet = spec is not None and getattr(spec, "is_unet", False)
    if module_name == "image_encoder":
        if is_unet:
            return convert_unet_encoder(sd)
        return convert_dual_branch_encoder(sd)
    if module_name == "segmentation_decoder" and is_unet:
        return convert_unet_decoder(sd)
    if (module_name == "image_decoder" and is_unet
            and "Unet_im_recon" in getattr(spec, "network_type", "")):
        # Unet_im_recon's image branch is a UnetDecoder over the skip
        # pyramid (advanced_triplet…:245), not a MyDecoder
        return convert_unet_decoder(sd)
    if module_name in ("image_decoder", "segmentation_decoder",
                       "shape_decoder"):
        return convert_decoder(sd)
    if module_name == "shape_encoder":
        return convert_encoder(sd)
    raise ValueError(module_name)


def import_module_checkpoint(path: str, module_name: str,
                              spec=None) -> Tuple[dict, dict]:
    """Load a reference `{module_name}.pth` into (params, batch_stats) for
    the corresponding module of this framework."""
    return convert_module_state_dict(load_torch_state_dict(path),
                                     module_name, spec)


def import_snapshot(path: str, spec=None):
    """Import a reference monolithic interrupt snapshot
    (advanced_triplet…save_snapshots:961-980: {network_type, epoch,
    model_state: {module: sd}, optimizer_state}) -> (params, batch_stats,
    meta). Optimizer state is NOT carried over (torch Adam moments don't map
    onto optax pytrees 1:1; resume restarts the optimizer like the
    reference's best-checkpoint path does)."""
    import torch
    snap = torch.load(path, map_location="cpu")
    params: Dict = {}
    stats: Dict = {}
    for name, sd in snap["model_state"].items():
        sd_np = {k: v.numpy() for k, v in sd.items()}
        p, s = convert_module_state_dict(sd_np, name, spec)
        params[name] = p
        stats[name] = s
    meta = {"epoch": int(snap.get("epoch", 0)),
            "network_type": snap.get("network_type", "")}
    return params, stats, meta


def _linear(sd, name):
    """torch nn.Linear weight [out,in] -> flax Dense kernel [in,out]."""
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _layernorm(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _qkv_to_head_major(qkv_params: dict, num_heads: int) -> dict:
    """Permute a fused-qkv Dense from MONAI's (qkv, head, dim) column
    layout (`b h (qkv l d)` rearrange) to our HEAD-MAJOR (head, qkv, dim)
    layout (models/unetr.SelfAttention — keeps whole heads shard-local
    under Megatron tensor parallelism, parallel/tp.py)."""
    out = {}
    for name, w in qkv_params.items():
        w = np.asarray(w)
        d = w.shape[-1] // (3 * num_heads)
        shape = w.shape[:-1]
        w = w.reshape(shape + (3, num_heads, d))
        w = np.moveaxis(w, -3, -2)  # (..., head, qkv, dim)
        out[name] = w.reshape(shape + (3 * num_heads * d,))
    return out


def convert_unetr_vit(sd, num_layers: int = 12, num_heads: int = 12) -> dict:
    """MONAI ViT state dict -> Flax models.unetr.ViT params.

    MONAI naming (monai/networks/nets/vit.py + blocks): patch_embedding.
    patch_embeddings (conv), patch_embedding.position_embeddings,
    blocks.{i}.{norm1,attn.qkv,attn.out_proj,norm2,mlp.linear1,mlp.linear2},
    trailing `norm`. The fused qkv columns are permuted from MONAI's
    (qkv, head, dim) layout to our head-major layout (_qkv_to_head_major).
    """
    params = {
        "patch_embed": _conv(sd, "patch_embedding.patch_embeddings"),
        "pos_embedding": np.asarray(sd["patch_embedding.position_embeddings"]),
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(num_layers):
        p = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "attn": {"qkv": _qkv_to_head_major(
                         _linear(sd, f"{p}.attn.qkv"), num_heads),
                     "out_proj": _linear(sd, f"{p}.attn.out_proj")},
            "linear1": _linear(sd, f"{p}.mlp.linear1"),
            "linear2": _linear(sd, f"{p}.mlp.linear2"),
        }
    return params
