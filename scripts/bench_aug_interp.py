"""On-device augmentation throughput: bilinear vs cubic warp (round 4).

The cubic path costs the MXU the same matmul shape as bilinear
(ops/warp_pallas.py four-hot kernel) plus a per-sample recursive
prefilter (4 lax.scans over the padded image). This measures what
order-3 interpolation actually costs end-to-end at the production shape
(224 padded -> 192 crop, batch 10), scan-amortized and
device_get-barriered like every other bench in this repo.

Usage: python scripts/bench_aug_interp.py [--batch 10] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--pad", type=int, default=224)
    ap.add_argument("--crop", type=int, default=192)
    opt = ap.parse_args(argv)

    from maxstyle_tpu.data import augment as A
    from maxstyle_tpu.utils.backend import enable_persistent_cache
    from maxstyle_tpu.utils.tpulock import chip_lock, yield_to_bench

    print(f"devices: {jax.devices()}", flush=True)
    enable_persistent_cache()
    yield_to_bench()
    imgs = jnp.clip(0.5 + 0.25 * jax.random.normal(
        jax.random.key(1), (opt.batch, opt.pad, opt.pad)), 0, 1)
    labs = jax.random.randint(jax.random.key(2),
                              (opt.batch, opt.pad, opt.pad), 0, 4)

    with chip_lock("bench_aug_interp"):
        for interp in ("bilinear", "cubic"):
            pol = A.get_policy("ACDC_affine_elastic_intensity",
                               (opt.pad, opt.pad), (opt.crop, opt.crop),
                               image_interp=interp)

            @jax.jit
            def many(key, imgs, labs, _pol=pol):
                def body(carry, k):
                    img, lab = A.augment_batch_inner(k, imgs, labs, _pol)
                    # keep the chain live (XLA must not DCE the iterations)
                    return carry + jnp.float32(1e-20) * img.sum(), None
                keys = jax.random.split(key, opt.iters)
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
                return acc

            acc = many(jax.random.key(0), imgs, labs)
            float(jax.device_get(acc))  # compile + barrier
            t0 = time.perf_counter()
            acc = many(jax.random.key(3), imgs, labs)
            float(jax.device_get(acc))
            dt = time.perf_counter() - t0
            per_batch_ms = dt / opt.iters * 1e3
            print(f"{interp}: {per_batch_ms:.3f} ms / {opt.batch}-slice "
                  f"batch ({opt.batch / (dt / opt.iters):.0f} slices/s)",
                  flush=True)


if __name__ == "__main__":
    main()
