"""Tracing / profiling hooks (SURVEY §5: the reference has only tqdm +
SizeEstimator; the TPU equivalent is jax.profiler traces + step-time
metrics)."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step-time statistics (compile step excluded by skipping
    the first `warmup` samples)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.samples = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.samples.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {"steps": 0}
        arr = np.asarray(self.samples)
        return {"steps": len(arr), "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
                "steps_per_sec": float(1.0 / arr.mean())}


def parameter_count(params: Any) -> int:
    """Total parameter count (the reference's SizeEstimator analogue,
    model_util.py:513-589)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def parameter_bytes(params: Any) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(params))


def reestimate_batch_stats(apply_fn, variables, batches, momentum: float = 0.9):
    """BN running-stat re-estimation over a dataset — the functional
    equivalent of the reference's `adaptive_bn`/`reset_bn` test-time
    adaptation helpers (unet.py adaptive_bn; init_weight.reset_bn:7-12).

    apply_fn(variables, batch, mutable=['batch_stats']) -> (out, updates)
    """
    stats = variables.get("batch_stats", {})
    for batch in batches:
        _, upd = apply_fn({**variables, "batch_stats": stats}, batch)
        stats = upd["batch_stats"]
    return stats
