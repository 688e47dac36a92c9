"""Plain single-network segmentation solver (baseline family).

≙ /root/reference/src/models/base_segmentation_model.py:24-331
(`SegmentationModel`): one network from the {UNet, FCN, ResConvUNet} zoo
(:80-140), Adam (+StepLR), optional EMA teacher (:62-66, 193-204),
best/periodic checkpointing — the simple supervised baseline the triplet
solver supersedes. Functional: a TrainState-like pytree + one jitted step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from maxstyle_tpu import losses
from maxstyle_tpu.solver import make_optimizer
from maxstyle_tpu.utils.ema import ema_init, ema_update


@struct.dataclass
class BasicState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any]
    step: jnp.ndarray


def build_network(network_type: str, num_classes: int,
                  encoder_dropout=None, decoder_dropout=None):
    """Zoo dispatch (base_segmentation_model.get_network:80-140):
    'UNet_16'/'UNet_64', 'FCN_16'/'FCN_64', 'ResUNet_16'/'ResUNet_64'."""
    if "16" in network_type:
        scale = 4
    elif "64" in network_type:
        scale = 1
    else:
        raise ValueError(network_type)
    if network_type.startswith("UNet"):
        from maxstyle_tpu.models.unet import UNet
        return UNet(num_classes=num_classes, feature_reduce=scale,
                    dropout=decoder_dropout)
    if network_type.startswith("FCN"):
        from maxstyle_tpu.models.baselines import FCN
        return FCN(num_classes=num_classes, feature_scale=scale,
                   dropout=decoder_dropout)
    if network_type.startswith("ResUNet") or network_type.startswith("ResConvUNet"):
        from maxstyle_tpu.models.baselines import ResConvUNet
        return ResConvUNet(num_classes=num_classes, feature_scale=scale,
                           encoder_dropout=encoder_dropout,
                           decoder_dropout=decoder_dropout)
    raise NotImplementedError(network_type)


class SegmentationModel:
    """Single-net supervised solver."""

    def __init__(self, network_type: str = "UNet_16", num_classes: int = 4,
                 lr: float = 1e-4, optimizer_type: str = "Adam",
                 use_ema: bool = False, ema_decay: float = 0.999,
                 encoder_dropout=None, decoder_dropout=None,
                 class_weights=None):
        self.network = build_network(network_type, num_classes,
                                     encoder_dropout, decoder_dropout)
        self.num_classes = num_classes
        self.tx = make_optimizer(optimizer_type, lr)
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.class_weights = class_weights

    def init_state(self, rng: jax.Array, image_hw: Tuple[int, int],
                   batch_size: int = 2, image_ch: int = 1) -> BasicState:
        x = jnp.zeros((batch_size, *image_hw, image_ch))
        variables = jax.jit(partial(self.network.init, train=False))(rng, x)
        params = variables["params"]
        return BasicState(params=params,
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=self.tx.init(params),
                          ema_params=ema_init(params) if self.use_ema else None,
                          step=jnp.zeros((), jnp.int32))

    def make_train_step(self):
        def step(state: BasicState, batch, rng):
            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                logits, upd = self.network.apply(
                    variables, batch["image"], train=True,
                    mutable=["batch_stats"])
                loss = losses.cross_entropy_2d(logits, batch["label"],
                                               weight=self.class_weights)
                return loss, upd.get("batch_stats", {})

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            # warmup decay like the reference teacher (use_num_updates=True,
            # base_segmentation_model.py:64): n is 1-based incl. this update
            ema = (ema_update(state.ema_params, params, self.ema_decay,
                              num_updates=state.step + 1)
                   if self.use_ema else None)
            return BasicState(params=params, batch_stats=new_stats,
                              opt_state=opt_state, ema_params=ema,
                              step=state.step + 1), {"loss": loss}

        return jax.jit(step, donate_argnums=(0,))

    def predict(self, state: BasicState, image, softmax: bool = False,
                use_ema: bool = False):
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        logits = self.network.apply(
            {"params": params, "batch_stats": state.batch_stats}, image,
            train=False)
        return jax.nn.softmax(logits, axis=-1) if softmax else logits
