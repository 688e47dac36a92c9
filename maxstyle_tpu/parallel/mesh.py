"""Device mesh + sharding helpers.

The reference is single-GPU (`CUDA_VISIBLE_DEVICES`, train_adv…:612,637; no
torch.distributed anywhere — SURVEY.md §2.8). The TPU-native replacement is
SPMD data parallelism over an ICI mesh: batch sharded on axis 'data', params
replicated, XLA inserting the gradient all-reduce under jit. A 'model' axis
is exposed for generality (the nets here are <10M params, so tensor
parallelism is available but not required).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1D 'data' mesh by default; optionally 2D ('data', 'model')."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch with the batch axis split across 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_train_step(step_fn, mesh: Mesh, donate_state: bool = True):
    """Jit a (state, batch, rng) -> (state, metrics) step with explicit
    shardings: state replicated, batch split on 'data'. XLA turns the
    batch-mean loss gradients into an ICI all-reduce automatically."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
