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
# block boundaries after which the reference taps features (blocks 1..4)
_DEFAULT_LAYERS = (1, 2, 3, 4)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """Conv trunk emitting per-block activations (pre-pool)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for bi, (ch, n_convs) in enumerate(_VGG16_PLAN):
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
    model = VGG16Features()
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
        loss = loss + jnp.mean(jnp.abs(f_pred[li] - f_tgt[li]))
    return loss
