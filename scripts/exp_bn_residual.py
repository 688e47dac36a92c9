"""Isolate the BN running-stat update's throughput cost (ADVICE r4 #3).

Round 4 recovered most of the 2.5% torch-BN cost with the single-pass
f32 batch variance (4.17 -> 4.245 steps/s) and HYPOTHESIZED the ~0.6%
residual was "the Bessel-corrected running-stat update itself". The
advisor correctly objected: that update is an O(C) per-channel op,
unlikely to cost 0.6% of a 467-GFLOP step — measure it or label it a
hypothesis. This measures it.

Three arms on the OFFICIAL bench workload (bench.measure_throughput,
identical timing discipline), varying only `models.layers._BN_UPDATE_MODE`
at trace time:

  torch   — shipped semantics: Bessel-corrected running update (baseline)
  biased  — running update without the n/(n-1) factor (isolates the
            Bessel multiply alone)
  off     — no running update at all (isolates the whole update chain:
            two O(C) FMAs per BN per step + the state plumbing)

If torch ~= biased ~= off, the residual lives elsewhere (scheduling /
reduction order) and the docs' hypothesis is dead. Results land in
benchmarks/bn_residual_r5.txt and docs/VALIDATION.md either way.

Usage: python scripts/exp_bn_residual.py [--repeats 3]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", type=str, default="torch,biased,off")
    opt = ap.parse_args(argv)

    from __graft_entry__ import _flagship_solver
    from bench import measure_throughput
    from maxstyle_tpu.models import layers
    from maxstyle_tpu.utils.backend import (enable_persistent_cache,
                                            wait_for_backend)
    from maxstyle_tpu.utils.tpulock import chip_lock, yield_to_bench

    # The tunnel can hang *inside* jax.devices() with no exception (seen
    # again 2026-08-19 09:04 — this script sat blocked for 7 min). Probe
    # in a bounded subprocess first so a down tunnel is a loud RuntimeError.
    wait_for_backend(tag="exp_bn_residual")
    print(f"devices: {jax.devices()}", flush=True)
    enable_persistent_cache()
    yield_to_bench()
    try:
        with chip_lock("exp_bn_residual"):
            for mode in opt.modes.split(","):
                layers._BN_UPDATE_MODE = mode
                # fresh solver per mode: the knob is read at trace time
                solver = _flagship_solver(hw=192, batch=20, max_style=True)
                rate = measure_throughput(solver, n_repeats=opt.repeats)
                print(f"bn_update={mode}: {rate:.3f} steps/s", flush=True)
    finally:
        layers._BN_UPDATE_MODE = "torch"


if __name__ == "__main__":
    main()
