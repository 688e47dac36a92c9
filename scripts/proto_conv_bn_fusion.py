"""Prototype: fused conv3x3 + BN-statistics Pallas kernel (VERDICT r2 #3).

docs/VALIDATION.md names "fusing the per-layer BN-stat reductions into the
convs" as the only kernel-level lever left (bounded ~10-15% of the step).
The fusion saves one HBM read pass over each conv output: XLA's schedule is
conv (write y) -> read y for the channel mean/var reduction -> read y again
for normalize+activation; a conv kernel that accumulates per-channel
sum/sum-of-squares in its epilogue eliminates the middle pass.

This script measures, at the encoder's hot shapes (B=20, 192x192, small
channel counts), three variants:
  xla_conv        — lax.conv alone (floor)
  xla_conv_stats  — lax.conv + mean/var reduction (status quo)
  pallas_fused    — this kernel: conv + stats in one pass
and prints a JSON verdict. Run on TPU:   python scripts/proto_conv_bn_fusion.py
Numerics check (CPU, interpreted):       python scripts/proto_conv_bn_fusion.py --check

Result feeds VALIDATION.md: land behind the backend flag if it wins,
record the negative result and close the item if it loses.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TILE_H = 16


def _kernel(x_ref, w_ref, b_ref, y_ref, sum_ref, sq_ref):
    """Grid (B,). x block [1, H+2, W+2, C_in] in VMEM; conv computed in
    STATIC row stripes of TILE_H so only one stripe's tap values are live
    at a time (a whole-image unrolled tap chain stack-allocates ~74 MB and
    blows the 16 MB scoped-vmem limit). Stats accumulate across stripes
    and across the sequential grid."""
    i = pl.program_id(0)
    h = y_ref.shape[1]
    w = y_ref.shape[2]
    c_in = x_ref.shape[3]
    c_out = y_ref.shape[3]

    s_tot = jnp.zeros((1, c_out), jnp.float32)
    sq_tot = jnp.zeros((1, c_out), jnp.float32)
    for r0 in range(0, h, TILE_H):
        acc = jnp.zeros((TILE_H, w, c_out), jnp.float32)
        # 9 shifted contractions on the LAST axis — no [HW, C] reshape
        # (that relayout blows scoped vmem)
        for dy in range(3):
            for dx in range(3):
                tap = x_ref[0, r0 + dy:r0 + dy + TILE_H, dx:dx + w, :]
                k0 = (dy * 3 + dx) * c_in
                acc += jax.lax.dot_general(
                    tap, w_ref[k0:k0 + c_in, :],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc += b_ref[0][None, None, :]
        y_ref[0, r0:r0 + TILE_H] = acc
        # fused BN-stat epilogue: y never re-read from HBM
        s_tot += jnp.sum(acc, axis=(0, 1)).reshape(1, c_out)
        sq_tot += jnp.sum(acc * acc, axis=(0, 1)).reshape(1, c_out)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = s_tot
        sq_ref[:] = sq_tot

    @pl.when(i > 0)
    def _():
        sum_ref[:] += s_tot
        sq_ref[:] += sq_tot


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_bn_stats_pallas(x, w, b, interpret=False):
    """x [B,H,W,C_in] -> (y [B,H,W,C_out], mean [C_out], var [C_out]).
    Same-padding 3x3 stride-1 conv with per-channel batch statistics
    computed in the conv epilogue."""
    bsz, h, wd, c_in = x.shape
    c_out = w.shape[-1]
    assert h % TILE_H == 0, (h, TILE_H)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * c_in, c_out)
    y, s, sq = pl.pallas_call(
        _kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, wd, c_out), lambda i: (i, 0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wd, c_out), jnp.float32),
            jax.ShapeDtypeStruct((1, c_out), jnp.float32),
            jax.ShapeDtypeStruct((1, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wf, b.reshape(1, c_out))
    n = bsz * h * wd
    mean = s[0] / n
    var = sq[0] / n - mean * mean
    return y, mean, var


@jax.jit
def conv3x3_bn_stats_xla(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    mean = jnp.mean(y, axis=(0, 1, 2))
    var = jnp.var(y, axis=(0, 1, 2))
    return y, mean, var


@jax.jit
def conv3x3_xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def check():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 16), jnp.float32)
    w = jnp.asarray(0.1 * rng.randn(3, 3, 16, 16), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(16), jnp.float32)
    y0, m0, v0 = conv3x3_bn_stats_xla(x, w, b)
    y1, m1, v1 = conv3x3_bn_stats_pallas(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-4, atol=1e-5)
    print("numerics OK (conv + mean + var match XLA)")


def bench(shapes):
    REPS = 50

    def timed(fn, *args):
        """Scan-amortized: REPS invocations inside ONE compiled dispatch
        (per-dispatch tunnel latency on this host is ~10 ms — far above
        these sub-ms kernels). The conv output feeds the next iteration's
        input (scaled), so iterations serialize and nothing folds."""
        x0, w, b = args

        @jax.jit
        def loop(x, w, b):
            def body(carry, _):
                out = fn(carry, w, b)
                y = out[0] if isinstance(out, tuple) else out
                extra = (out[1][0] * 1e-20 if isinstance(out, tuple)
                         else 0.0)
                nxt = y * (0.1 / (1.0 + jnp.abs(jnp.mean(y)))) + extra
                return nxt, ()
            final, _ = jax.lax.scan(body, x, None, length=REPS)
            return jnp.mean(final)

        r = loop(x0, w, b)
        _ = float(jax.device_get(r))  # compile + warm
        t0 = time.perf_counter()
        r = loop(x0, w, b)
        _ = float(jax.device_get(r))
        return (time.perf_counter() - t0) / REPS

    results = []
    for (bsz, hw, c) in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(bsz, hw, hw, c), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(3, 3, c, c), jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        t_conv = timed(conv3x3_xla, x, w, b)
        t_stat = timed(conv3x3_bn_stats_xla, x, w, b)
        row = {
            "shape": f"B{bsz} {hw}x{hw} C{c}",
            "xla_conv_ms": round(t_conv * 1e3, 3),
            "xla_conv_stats_ms": round(t_stat * 1e3, 3),
            "stat_pass_cost_ms": round((t_stat - t_conv) * 1e3, 3),
            "stat_pass_pct_of_conv": round(100 * (t_stat - t_conv)
                                           / max(t_conv, 1e-9), 1),
        }
        print(json.dumps(row))  # XLA bound first: survives a pallas failure
        try:
            t_fused = timed(conv3x3_bn_stats_pallas, x, w, b)
            row["pallas_fused_ms"] = round(t_fused * 1e3, 3)
            row["fused_vs_xla_stats"] = round(t_fused / t_stat, 3)
        except Exception as e:  # Mosaic limitation — record, keep going
            row["pallas_error"] = f"{type(e).__name__}: {str(e)[:1200]}"
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check()
    else:
        shapes = [(20, 192, 16), (20, 96, 32), (20, 48, 64)]
        print(json.dumps({"backend": jax.default_backend()}))
        bench(shapes)
