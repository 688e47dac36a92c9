"""Tensor parallelism for the transformer family (UNETR ViT).

SURVEY §2.8: the conv families (<10M params) need no model parallelism, so
the 'model' mesh axis exists "for generality". This module makes that axis
real for the one family with genuinely TP-shardable layers — the ViT trunk
of UNETR — using the standard Megatron pattern:

  * MLP linear1 column-parallel (kernel [H, M] -> P(None, 'model'),
    bias [M] -> P('model')), linear2 row-parallel ([M, H] ->
    P('model', None)): one all-reduce per MLP, inserted by GSPMD;
  * fused qkv column-parallel ([H, 3H] -> P(None, 'model')), out_proj
    row-parallel ([H, H] -> P('model', None)). The fused feature axis is
    laid out (qkv, head, head_dim) outermost-first, so an even split
    across `model` shards whole (qkv, head) groups whenever
    3*num_heads % model_parallel == 0 — GSPMD propagates the sharding
    through the reshape/transpose and keeps attention head-local;
  * everything else (LayerNorms, patch embed, position embeddings, conv
    pyramid) replicated.

Under `jit` with these in_shardings, XLA inserts exactly the Megatron
collectives (all-reduce after out_proj and linear2) over the ICI mesh.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maxstyle_tpu.parallel.mesh import MODEL_AXIS

# path-suffix -> PartitionSpec for the ViT trunk (our models.unetr naming)
_RULES = (
    (("attn", "qkv", "kernel"), P(None, MODEL_AXIS)),
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
