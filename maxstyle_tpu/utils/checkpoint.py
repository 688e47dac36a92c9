"""Checkpoint / resume via orbax.

Capability match for the reference's two formats (SURVEY §5):
* per-module best / every-N-epoch checkpoints under
  `{model_dir}/{best|<epoch>}/checkpoints` (advanced_triplet…save_model
  :936-948), selected by validation mIoU (train_adv…:555-559);
* monolithic interrupt snapshots with optimizer state + epoch
  (save_snapshots :961-980 / load_snapshots :982-1016, `--resume_pkl_path`).

Here both are the same thing: one orbax checkpoint of the full TrainState
pytree (params + batch_stats + opt_states + step) plus a small metadata
dict {epoch, best_score, network_type} — saved under names 'best',
'epoch_<N>' or 'interrupted'.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from maxstyle_tpu.solver import TrainState


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, name: str, state: TrainState,
                    epoch: int = 0, best_score: float = float("-inf"),
                    network_type: str = "") -> str:
    """Save state under {directory}/{name}; returns the path."""
    path = os.path.abspath(os.path.join(directory, name))
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state)
    meta = {"epoch": int(epoch), "best_score": float(best_score),
            "network_type": network_type}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(directory: str, name: str,
                    template: TrainState) -> Tuple[TrainState, dict]:
    """Restore (state, meta) from {directory}/{name}; `template` supplies
    the pytree structure/shapes (an init_state result)."""
    path = os.path.abspath(os.path.join(directory, name))
    with ocp.StandardCheckpointer() as ckptr:
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        state = ckptr.restore(os.path.join(path, "state"), target)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_epoch_checkpoint(directory: str) -> Optional[str]:
    """Name of the highest-numbered 'epoch_*' checkpoint, if any."""
    if not os.path.isdir(directory):
        return None
    epochs = []
    for entry in os.listdir(directory):
        if entry.startswith("epoch_"):
            try:
                epochs.append((int(entry.split("_", 1)[1]), entry))
            except ValueError:
                pass
    return max(epochs)[1] if epochs else None
