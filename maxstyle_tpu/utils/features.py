"""Intermediate-activation capture.

≙ model_util.HookBasedFeatureExtractor:725-778 — in Flax this is
`capture_intermediates`, wrapped here with name filtering.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


def extract_features(module, variables, *args, filter_names=None,
                     **kwargs) -> Dict[str, Any]:
    """Run a forward pass capturing every submodule's outputs; returns a
    flat {path: activation} dict (optionally filtered by substring)."""
    _, state = module.apply(variables, *args, capture_intermediates=True,
                            mutable=["intermediates"], **kwargs)
    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, tuple) and len(tree) == 1:
            flat[prefix] = tree[0]
        else:
            flat[prefix] = tree

    walk(state["intermediates"])
    if filter_names:
        flat = {k: v for k, v in flat.items()
                if any(f in k for f in filter_names)}
    return flat
