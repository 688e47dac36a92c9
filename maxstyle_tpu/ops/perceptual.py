"""VGG16 perceptual loss (gated; library surface).

≙ custom_loss.VGGPerceptualLoss:692-738 — imported by the reference trainer
but never used in the main loop (SURVEY §2.4). Implemented as a Flax VGG16
feature trunk whose weights load from a local .npz (no network access is
assumed); without weights the loss degrades to random-feature perceptual
distance, which is still a valid (weaker) perceptual metric — callers that
need ImageNet features must supply `weights_path`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (out_channels, n_convs) per block
_VGG16_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# `layers` uses the reference's 1-based block numbering
# (custom_loss.py:731-738: block i contributes when i+1 in layers); the
# reference builds only blocks 1..4 (features[:23], through conv4_3+relu)
_DEFAULT_LAYERS = (1, 2, 3, 4)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """Conv trunk emitting per-block activations (pre-pool)."""

    n_blocks: int = 4  # the reference builds features[:23] = blocks 1..4

    @nn.compact
    def __call__(self, x):
        feats = []
        for bi, (ch, n_convs) in enumerate(_VGG16_PLAN[:self.n_blocks]):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1,
                            name=f"block{bi + 1}_conv{ci + 1}")(x)
                x = nn.relu(x)
            feats.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def load_vgg_params(weights_path: str):
    """Load parameters from an .npz of {block{i}_conv{j}/kernel, .../bias}
    arrays (HWIO kernels)."""
    data = np.load(weights_path)
    params = {}
    for key in data.files:
        name, leaf = key.rsplit("/", 1)
        params.setdefault(name, {})[leaf] = jnp.asarray(data[key])
    return {"params": params}


def vgg_perceptual_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        variables=None, weights_path: Optional[str] = None,
                        layers: Sequence[int] = _DEFAULT_LAYERS,
                        resize: bool = True) -> jnp.ndarray:
    """L1 distance between VGG features of pred/target ([N,H,W,1] or
    [N,H,W,3] in [0,1]); grayscale inputs are channel-replicated and
    ImageNet-normalized like the reference."""
    model = VGG16Features(n_blocks=max(layers))
    if variables is None:
        if weights_path is not None:
            variables = load_vgg_params(weights_path)
        else:
            variables = model.init(jax.random.key(0),
                                   jnp.zeros((1, 64, 64, 3)))

    def prep(x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        if resize:
            n = x.shape[0]
            x = jax.image.resize(x, (n, 224, 224, 3), method="linear")
        return x

    f_pred = model.apply(variables, prep(pred))
    f_tgt = model.apply(variables, prep(jax.lax.stop_gradient(target)))
    loss = 0.0
    for li in layers:
        # 1-based block number -> feats index (reference block i taps when
        # i+1 in layers == our feats[li-1])
        loss = loss + jnp.mean(jnp.abs(f_pred[li - 1] - f_tgt[li - 1]))
    return loss


# torchvision vgg16().features conv indices per block (0-based Sequential
# positions of the Conv2d layers; ReLU/MaxPool occupy the gaps)
_TORCHVISION_CONV_IDX = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21),
                         (24, 26, 28)]


def convert_vgg16_torchvision(sd) -> dict:
    """torchvision vgg16 state dict ('features.{i}.weight' OIHW convs) ->
    our VGG16Features params tree (HWIO). Accepts partial dicts covering at
    least blocks 1..4 (the reference never builds block 5)."""
    params = {}
    for bi, conv_ids in enumerate(_TORCHVISION_CONV_IDX):
        for ci, fi in enumerate(conv_ids):
            key = f"features.{fi}.weight"
            if key not in sd:
                continue
            params[f"block{bi + 1}_conv{ci + 1}"] = {
                "kernel": np.asarray(sd[key]).transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"features.{fi}.bias"]),
            }
    return params
