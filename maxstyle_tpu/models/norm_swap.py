"""Normalization-layer swapping (model_util.replace_bn_with_in:43-62,
recover_model_w_bn:66-71).

The reference mutates a torch module tree in place, replacing every
``nn.BatchNorm2d`` with ``InstanceNorm2d`` (optionally carrying the affine
weight/bias over) or ``BatchInstanceNorm2d``, and later swapping fresh
``BatchNorm2d`` layers back in. flax modules are immutable declarations and
the variables live in a separate pytree, so the tpu-native equivalent is a
*reconfigure + re-init + merge*:

1. clone the module with its ``norm`` field switched (every model in
   `maxstyle_tpu.models` threads a top-level ``norm: str`` down to each
   `layers.Norm2d` site, mirroring how the reference's recursion reaches
   every ``nn.BatchNorm2d`` child);
2. ``init`` the reconfigured module to get the target variable structure;
3. merge: any path that exists in both trees keeps the trained value
   (convs, attention, untouched DomainSpecific norms); norm-specific paths
   follow the reference's carry-over rules — with ``affine=True`` the old
   BN scale/bias move into the new instance/batch-instance layer, running
   stats and BIN gates start fresh (model_util.py:48-59: only
   ``weight``/``bias`` are copied, buffers are new).

Deviations from the reference, both documented in MIGRATION.md:
- ``replace_bn_with_in(..., BN_IN=True, affine=False)`` CRASHES in the
  reference (custom_layers.py:343 ``self.gate.data.fill_(1)`` on a None
  param); here it works (gate stays a real parameter).
- ``recover_model_w_bn`` builds reference ``nn.BatchNorm2d`` layers with
  weight=1 exactly; our fresh init follows the network's own BN init
  scheme (N(1, 0.02), networks/custom_layers init parity) — both are
  "fresh affine, fresh stats".
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from flax import traverse_util


def _swap_kind(affine: bool, bn_in: bool) -> str:
    if bn_in:
        return "batch_instance" if affine else "batch_instance_noaffine"
    return "instance_affine" if affine else "instance"


def _merge(fresh: Dict[str, Any], old: Dict[str, Any],
           carry_norm_affine: bool) -> Dict[str, Any]:
    """fresh structure wins; trained values carry over where paths match;
    optionally map old BatchNorm scale/bias onto the new norm's affine."""
    out = {}
    for coll, fresh_tree in fresh.items():
        f_flat = traverse_util.flatten_dict(fresh_tree)
        o_flat = (traverse_util.flatten_dict(old[coll])
                  if coll in old else {})
        merged = {}
        for path, val in f_flat.items():
            if path in o_flat and o_flat[path].shape == val.shape:
                merged[path] = o_flat[path]
                continue
            if carry_norm_affine and coll == "params" and path[-1] in (
                    "scale", "bias"):
                # instance_affine: (..., scale) <- (..., BatchNorm_0, scale)
                # batch_instance: (..., BatchInstanceNorm_0, scale)
                #                 <- (..., BatchNorm_0, scale)
                if any(p.startswith("BatchInstanceNorm") for p in path):
                    cand = tuple("BatchNorm_0"
                                 if p.startswith("BatchInstanceNorm") else p
                                 for p in path)
                else:
                    cand = path[:-1] + ("BatchNorm_0", path[-1])
                if cand in o_flat and o_flat[cand].shape == val.shape:
                    merged[path] = o_flat[cand]
                    continue
            merged[path] = val  # fresh: BIN gate=1, fresh running stats, ...
        out[coll] = traverse_util.unflatten_dict(merged)
    return out


def replace_bn_with_in(module, variables, rng, *init_args,
                       affine: bool = False, bn_in: bool = False,
                       **init_kwargs) -> Tuple[Any, Dict[str, Any]]:
    """Return (new_module, new_variables) with every BatchNorm site swapped
    to InstanceNorm (``bn_in=False``) or BatchInstanceNorm (``bn_in=True``),
    carrying the BN affine over when ``affine=True``
    (model_util.replace_bn_with_in:43-62).

    ``init_args``/``init_kwargs`` are forwarded to ``new_module.init`` to
    materialize the target variable structure (flax's functional equivalent
    of the reference's in-place child mutation).
    """
    new_module = module.clone(norm=_swap_kind(affine, bn_in))
    fresh = new_module.init(rng, *init_args, **init_kwargs)
    return new_module, _merge(dict(fresh), dict(variables),
                              carry_norm_affine=affine)


def recover_model_w_bn(module, variables, rng, *init_args,
                       **init_kwargs) -> Tuple[Any, Dict[str, Any]]:
    """Return (new_module, new_variables) with every instance/batch-instance
    norm replaced by a FRESH BatchNorm — new affine, new running stats —
    while all other trained parameters carry over
    (model_util.recover_model_w_bn:66-71 builds brand-new nn.BatchNorm2d
    layers, discarding the IN/BIN weights)."""
    new_module = module.clone(norm="batch")
    fresh = new_module.init(rng, *init_args, **init_kwargs)
    return new_module, _merge(dict(fresh), dict(variables),
                              carry_norm_affine=False)
