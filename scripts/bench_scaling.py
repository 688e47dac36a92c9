"""Throughput-vs-batch scaling curve on the real TPU chip (VERDICT r2 #5).

Sweeps effective batch {20, 40, 80, 160} at fixed workload semantics (the
bench.py MaxStyle step: on-device aug + standard training + 5-step inner
adversarial loop + hard-example training + AdamW). Reports steps/s,
slices/s and TF/s sustained (FLOPs scale linearly with batch from the
467.8 GFLOP/step XLA cost analysis at batch 20, docs/VALIDATION.md).

A flat TF/s curve = the chip is workload-bound (small-channel conv floor);
a rising curve = implementation headroom at the production batch size.

Usage: python scripts/bench_scaling.py   (on the TPU host; ~10 min incl.
four compiles). One JSON line per batch size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

GFLOP_PER_STEP_B20 = 467.8  # XLA cost analysis, docs/VALIDATION.md


def main():
    from __graft_entry__ import _flagship_solver
    from maxstyle_tpu.data import augment as A
    from maxstyle_tpu.train_step import make_fused_train_step

    pad, crop = 224, 192
    policy = A.get_policy("ACDC_affine_elastic_intensity", (pad, pad),
                          (crop, crop))
    print(json.dumps({"backend": jax.default_backend()}))
    from maxstyle_tpu.utils.backend import enable_persistent_cache
    enable_persistent_cache()

    for eff_batch in (20, 40, 80, 160):
        half = eff_batch // 2
        # scaled batches train the PRODUCTION semantics: per-20-sample
        # style groups (config.MaxStyleConfig.style_group_size), so the
        # curve's samples/s carries method fidelity (docs/VALIDATION.md)
        group = 20 if eff_batch > 20 else None
        solver = _flagship_solver(hw=crop, batch=eff_batch, max_style=True,
                                  style_group_size=group)
        state = solver.init_state(jax.random.key(0), (crop, crop),
                                  batch_size=eff_batch)
        raw = {"image": jnp.clip(0.5 + 0.25 * jax.random.normal(
            jax.random.key(1), (half, pad, pad)), 0, 1),
            "label": jax.random.randint(jax.random.key(2),
                                        (half, pad, pad), 0, 4)}
        step = make_fused_train_step(solver, policy, keep_orig=True)

        state, metrics = step(state, raw, jax.random.key(10))  # compile
        float(jax.device_get(metrics["loss/total"]))

        n_calls = max(4, 40 // (eff_batch // 20))
        t0 = time.perf_counter()
        for i in range(n_calls):
            state, metrics = step(state, raw,
                                  jax.random.fold_in(jax.random.key(11), i))
        float(jax.device_get(metrics["loss/total"]))
        dt = time.perf_counter() - t0

        steps = n_calls / dt
        gflop = GFLOP_PER_STEP_B20 * eff_batch / 20.0
        print(json.dumps({
            "effective_batch": eff_batch,
            "steps_per_sec": round(steps, 3),
            "slices_per_sec": round(steps * eff_batch, 1),
            "tf_per_sec_sustained": round(steps * gflop / 1e3, 3),
            "sec_per_step": round(dt / n_calls, 4),
            "style_group_size": group,
        }))


if __name__ == "__main__":
    from maxstyle_tpu.utils.tpulock import chip_lock, yield_to_bench

    yield_to_bench()  # let a waiting official bench go first
    with chip_lock("bench_scaling"):
        main()
