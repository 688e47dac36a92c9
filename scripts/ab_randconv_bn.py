"""A/B: RandConv view-forward BN choreography — frozen vs reference-exact.

VERDICT round-1 weak #5: our rand_conv branch runs its three random-conv
view forwards with frozen BN stats, the reference updates running stats
(train_adv_supervised_segmentation_triplet.py:289-326). Gradients are
provably identical (tests/test_branches.py::TestRandConvViewBN); the only
possible effect is eval-mode behavior through drifted running statistics.
This script measures that effect end-to-end on the synthetic 3-class
phantom task (same task as the round-1 learnability run): identical seeds,
identical data stream, only `learning.randconv_view_bn` differs.

Usage: python scripts/ab_randconv_bn.py [--steps 320] [--hw 192]
Writes a short report to stdout; paste the numbers into docs/VALIDATION.md.
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.config import (DataConfig, ExperimentConfig,  # noqa: E402
                                 LearningConfig, SegmentationModelConfig)
from maxstyle_tpu.solver import TripletSegmentationSolver  # noqa: E402
from maxstyle_tpu.train_step import make_train_step  # noqa: E402


def phantom_batch(rng: np.random.RandomState, n: int, hw: int):
    """Disks of 3 radius classes on a noisy background (round-1 task)."""
    imgs = np.zeros((n, hw, hw), np.float32)
    labs = np.zeros((n, hw, hw), np.int32)
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    for i in range(n):
        k = rng.randint(1, 4)  # class 1..3
        r = hw * (0.08 + 0.07 * k)
        cy = rng.uniform(0.3, 0.7) * hw
        cx = rng.uniform(0.3, 0.7) * hw
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        mask = d < r
        imgs[i] = 0.2 + 0.15 * rng.randn(hw, hw).astype(np.float32)
        imgs[i][mask] += 0.25 * k
        labs[i][mask] = k
        imgs[i] = np.clip(imgs[i], 0, 1)
    return imgs[..., None], labs


def dice_per_class(pred, lab, n_classes=4):
    out = []
    for c in range(1, n_classes):
        p = pred == c
        g = lab == c
        denom = p.sum() + g.sum()
        out.append(2.0 * np.logical_and(p, g).sum() / denom if denom else np.nan)
    return out


def run(view_bn: str, steps: int, hw: int, batch: int, seed: int):
    cfg = ExperimentConfig(
        data=DataConfig(crop_size=(hw, hw, 1), num_classes=4),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN"),
        learning=LearningConfig(batch_size=batch, rand_conv=True,
                                randconv_view_bn=view_bn, n_epochs=1))
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(seed), (hw, hw), batch_size=batch)
    step = make_train_step(solver)

    data_rng = np.random.RandomState(seed + 1)
    metrics = {"loss/total": float("nan")}  # --steps 0 = eval-only
    t0 = time.time()
    for i in range(steps):
        imgs, labs = phantom_batch(data_rng, batch, hw)
        state, metrics = step(state,
                              {"image": jnp.asarray(imgs),
                               "label": jnp.asarray(labs)},
                              jax.random.fold_in(jax.random.key(seed + 2), i))
        if i % 80 == 0:
            print(f"  [{view_bn}] step {i}: "
                  f"total={float(metrics['loss/total']):.4f} "
                  f"rc={float(metrics['loss/hard/rand_conv']):.4f}",
                  flush=True)
    train_s = time.time() - t0

    # eval-mode validation (running stats — where the two modes can differ)
    @jax.jit
    def predict(params, stats, image):
        (_, z_s), _ = solver.encode_image(params, stats, image, mode="eval")
        pred, _ = solver.decode("segmentation_decoder", params, stats, z_s,
                                mode="eval")
        return jnp.argmax(pred, axis=-1)

    val_rng = np.random.RandomState(999)  # same val set for both arms
    dices = []
    for _ in range(4):
        imgs, labs = phantom_batch(val_rng, batch, hw)
        pred = np.asarray(predict(state.params, state.batch_stats,
                                  jnp.asarray(imgs)))
        for j in range(batch):
            dices.append(np.nanmean(dice_per_class(pred[j], labs[j])))
    return float(np.nanmean(dices)), float(metrics["loss/total"]), train_s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--hw", type=int, default=192)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    opt = ap.parse_args(argv)

    print(f"devices: {jax.devices()}")
    results = {}
    for mode in ("frozen", "train"):
        print(f"== arm: randconv_view_bn={mode}")
        d, loss, secs = run(mode, opt.steps, opt.hw, opt.batch, opt.seed)
        results[mode] = (d, loss)
        print(f"  -> val Dice(fg mean) {d:.4f}  final loss {loss:.4f} "
              f"({secs:.0f}s)")
    df, dt = results["frozen"][0], results["train"][0]
    print(f"\nA/B summary ({opt.steps} steps, batch {opt.batch}, {opt.hw}^2):")
    print(f"  frozen view BN : Dice {df:.4f}")
    print(f"  train  view BN : Dice {dt:.4f}")
    print(f"  delta (train - frozen): {dt - df:+.4f}")


if __name__ == "__main__":
    main()
