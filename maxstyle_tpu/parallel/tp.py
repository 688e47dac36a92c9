"""Tensor parallelism for the transformer family (UNETR ViT).

SURVEY §2.8: the conv families (<10M params) need no model parallelism, so
the 'model' mesh axis exists "for generality". This module makes that axis
real for the one family with genuinely TP-shardable layers — the ViT trunk
of UNETR — using the standard Megatron pattern:

  * MLP linear1 column-parallel (kernel [H, M] -> P(None, 'model'),
    bias [M] -> P('model')), linear2 row-parallel ([M, H] ->
    P('model', None)): one all-reduce per MLP, inserted by GSPMD;
  * fused qkv column-parallel ([H, 3H] -> P(None, 'model'); bias [3H] ->
    P('model')), out_proj row-parallel ([H, H] -> P('model', None)). The
    fused feature axis is HEAD-MAJOR — (head, qkv, head_dim), see
    models/unetr.SelfAttention — so an even split across `model` keeps
    whole heads (with their q, k AND v) on one shard whenever
    num_heads % model_parallel == 0, and the attention einsums stay
    shard-local;
  * everything else (LayerNorms, patch embed, position embeddings, conv
    pyramid) replicated.

Under `jit` with these in_shardings, XLA inserts exactly the Megatron
collectives (all-reduce after out_proj and linear2) over the ICI mesh.

Training is supported, not just inference: `train_state_tp_shardings`
derives a sharding tree for the full solver TrainState — the same
suffix rules match the gradient/Adam-moment leaves (their paths end with
the identical module suffixes), so parameters AND optimizer state shard
together, and `shard_tp_train_step` jits a train step over the 2D
(data x model) mesh (VERDICT r2 #4; the reference has no TP at all —
SURVEY §2.8 'expose mesh axis anyway').
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maxstyle_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# path-suffix -> PartitionSpec for the ViT trunk (our models.unetr naming)
_RULES = (
    (("attn", "qkv", "kernel"), P(None, MODEL_AXIS)),
    (("attn", "qkv", "bias"), P(MODEL_AXIS)),
    (("attn", "out_proj", "kernel"), P(MODEL_AXIS, None)),
    (("attn", "out_proj", "bias"), P()),
    (("linear1", "kernel"), P(None, MODEL_AXIS)),
    (("linear1", "bias"), P(MODEL_AXIS)),
    (("linear2", "kernel"), P(MODEL_AXIS, None)),
    (("linear2", "bias"), P()),
)


def _spec_for_path(path) -> P:
    keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
    for suffix, spec in _RULES:
        if keys[-len(suffix):] == suffix:
            return spec
    return P()


def vit_tp_shardings(params: Any, mesh: Mesh):
    """Sharding tree for a ViT / UNETR-encoder param tree: Megatron specs
    for transformer-block leaves, replicated for everything else."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path)), params)


def shard_vit_params(params: Any, mesh: Mesh):
    """Place a param tree on the mesh under the TP layout."""
    return jax.device_put(params, vit_tp_shardings(params, mesh))


def train_state_tp_shardings(state: Any, mesh: Mesh):
    """Sharding tree matching a solver TrainState (or any pytree bundling
    params + optimizer state): Megatron specs on every leaf whose path ends
    with a transformer-weight suffix — this covers `params`, and the Adam
    mu/nu moments inside `opt_states` whose paths carry the same suffixes —
    replicated everywhere else (BN stats, conv pyramid, step counters)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path)), state)


def shard_train_state(state: Any, mesh: Mesh):
    """Place a TrainState on the mesh under the TP layout."""
    return jax.device_put(state, train_state_tp_shardings(state, mesh))


def shard_tp_train_step(step_fn, state_shardings, mesh: Mesh,
                        donate_state: bool = True):
    """Jit a (state, batch, rng) -> (state, metrics) step over a 2D
    (data x model) mesh: TrainState sharded by the Megatron specs, batch
    split on 'data', metrics replicated. XLA inserts the gradient
    all-reduce over 'data' AND the Megatron activation all-reduces over
    'model' (after out_proj / linear2) in one SPMD program."""
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, bsh, rep),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,) if donate_state else (),
    )
