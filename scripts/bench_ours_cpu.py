"""Measure OUR MaxStyle training step on this host's CPU (same-host
comparison against scripts/bench_reference_cpu.py for BASELINE.md).

Identical workload semantics to bench.py (effective batch 20 @192x192,
inner adversarial loop n_iter=5 on layers [3,4,5], AdamW) plus the
on-device augmentation pipeline (the reference does augmentation on CPU
workers outside its measured training thread, so including ours here is
conservative in our disfavor).

Usage: python scripts/bench_ours_cpu.py [--calls 2] [--k_inner 4]
Prints one JSON line {"ours_cpu_steps_per_sec": ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# pin CPU BEFORE any jax import (the axon TPU plugin silently overrides the
# env var after import — see tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu_bench")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--hw", type=int, default=192)
    ap.add_argument("--batch", type=int, default=20)
    opt = ap.parse_args()
    assert jax.default_backend() == "cpu", jax.default_backend()

    from __graft_entry__ import _flagship_solver
    from maxstyle_tpu.train_step import make_train_step

    # the plain train step, no augmentation — matching the reference
    # measurement (scripts/bench_reference_cpu.py), which also excludes
    # augmentation (the reference runs it on DataLoader workers). Also
    # avoids the pallas warp kernel, whose XLA:CPU lowering at 192x192
    # compiles pathologically slowly on this host.
    crop = opt.hw
    solver = _flagship_solver(hw=crop, batch=opt.batch, max_style=True)
    state = solver.init_state(jax.random.key(0), (crop, crop),
                              batch_size=opt.batch)
    batch = {"image": jnp.clip(0.5 + 0.25 * jax.random.normal(
        jax.random.key(1), (opt.batch, crop, crop, 1)), 0, 1),
        "label": jax.random.randint(jax.random.key(2),
                                    (opt.batch, crop, crop), 0, 4)}
    step = make_train_step(solver)

    state, metrics = step(state, batch, jax.random.key(10))  # compile
    float(jax.device_get(metrics["loss/total"]))

    t0 = time.perf_counter()
    for i in range(opt.calls):
        state, metrics = step(state, batch,
                              jax.random.fold_in(jax.random.key(11), i))
    float(jax.device_get(metrics["loss/total"]))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "ours_cpu_steps_per_sec": round(opt.calls / dt, 4),
        "sec_per_step": round(dt / opt.calls, 3),
        "backend": jax.default_backend(),
        "batch": opt.batch, "hw": opt.hw,
        "workload": "full MaxStyle train step (std + inner adv x5 + "
                    "hard-example + AdamW), no aug — like-for-like with "
                    "scripts/bench_reference_cpu.py",
    }))


if __name__ == "__main__":
    main()
