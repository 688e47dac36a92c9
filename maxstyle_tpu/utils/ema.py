"""Exponential moving average of parameters + LR schedules.

≙ model_util.ExponentialMovingAverage:86-165 (teacher/student EMA used by
the plain SegmentationModel solver, base_segmentation_model.py:62-66,
193-204) and model_util.get_scheduler:677-722 (the reference uses
StepLR(step=5, gamma=0.1) for SGD; advanced_triplet…:1070-1077).
Functional: EMA params are just a pytree updated per step.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def ema_init(params: Any) -> Any:
    # a real copy: aliasing the param buffers breaks donation (the same
    # buffer would be donated twice in the train step)
    return jax.tree_util.tree_map(jnp_copy, params)


def jnp_copy(x):
    import jax.numpy as jnp
    return jnp.array(x)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999,
               num_updates=None) -> Any:
    """One EMA step. `num_updates` (1-based count INCLUDING this update)
    enables the reference's warmup: decay = min(decay, (1+n)/(10+n))
    (model_util.ExponentialMovingAverage.update:108-125, used by the
    teacher EMA with use_num_updates=True)."""
    import jax.numpy as jnp
    if num_updates is not None:
        n = jnp.asarray(num_updates, jnp.float32)
        decay = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def make_lr_schedule(policy: str, base_lr: float, *, lr_decay_epochs: int = 5,
                     gamma: float = None, steps_per_epoch: int = 1,
                     total_epochs: int = 100):
    """LR schedule menu (model_util.get_scheduler:677-722): 'step'
    (StepLR gamma=0.5 — the policy the triplet solver attaches to SGD,
    advanced_triplet…:1070-1077), 'step2' (gamma=0.1), 'lambda' (linear
    decay), 'step_warmstart'/'step_warmstart2', 'constant'. 'plateau' is a
    driver-level policy (validation-metric dependent), not a schedule."""
    if policy == "constant":
        return base_lr
    if policy in ("step", "step2"):
        g = gamma if gamma is not None else (0.5 if policy == "step" else 0.1)
        boundaries = {e * steps_per_epoch: g
                      for e in range(lr_decay_epochs, total_epochs,
                                     lr_decay_epochs)}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if policy == "lambda":
        return optax.linear_schedule(base_lr, 0.0, total_epochs * steps_per_epoch)
    if policy in ("step_warmstart", "step_warmstart2"):
        hi = 100 if policy == "step_warmstart" else 50
        lo2 = 200 if policy == "step_warmstart" else 100

        def sched(step):
            import jax.numpy as jnp
            epoch = step // steps_per_epoch
            scale = jnp.where(epoch < 5, 0.1,
                              jnp.where(epoch < hi, 1.0,
                                        jnp.where(epoch < lo2, 0.1, 0.01)))
            return base_lr * scale

        return sched
    raise NotImplementedError(policy)
