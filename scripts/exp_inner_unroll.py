"""Perf experiment (round 4): unrolling the 5-iteration inner adversarial
scan.

The MaxStyle generation loop (solver.py generate_max_style_image,
advanced_triplet…:458-571) is compiled as `lax.scan(body, …, length=5)`.
The loop is semantically sequential (Adam state threads through), but
`unroll=k` lets XLA schedule and fuse ACROSS iteration bodies — the
question is whether cross-iteration fusion buys anything at the step's
small-channel conv floor (docs/VALIDATION.md roofline section), at the
cost of a k-times-larger program.

Runs the OFFICIAL bench workload (bench.measure_throughput — identical
timing discipline) with inner_unroll in {1, 5} and prints both rates.
Negative results are recorded in docs/VALIDATION.md either way.

Usage: python scripts/exp_inner_unroll.py [--unrolls 1,5] [--repeats 3]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", type=str, default="1,5")
    ap.add_argument("--repeats", type=int, default=3)
    opt = ap.parse_args(argv)

    from __graft_entry__ import _flagship_solver
    from bench import measure_throughput

    print(f"devices: {jax.devices()}", flush=True)
    from maxstyle_tpu.utils.backend import enable_persistent_cache
    from maxstyle_tpu.utils.tpulock import chip_lock, yield_to_bench
    enable_persistent_cache()
    yield_to_bench()
    with chip_lock("exp_inner_unroll"):
        for unroll in [int(u) for u in opt.unrolls.split(",")]:
            # THE flagship workload, varied only in unroll — never a copy
            # of the config (drift between bench.py and this experiment
            # would silently invalidate the A/B)
            solver = _flagship_solver(hw=192, batch=20, max_style=True,
                                      inner_unroll=unroll)
            rate = measure_throughput(solver, n_repeats=opt.repeats)
            print(f"inner_unroll={unroll}: {rate:.3f} steps/s", flush=True)


if __name__ == "__main__":
    main()
