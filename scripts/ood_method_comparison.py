"""End-to-end reproduction of the reference's CORE claim on synthetic data:
adversarial style augmentation (MaxStyle) improves out-of-domain robustness
over standard training (MICCAI 2022 paper, README.md:78 table).

Real ACDC/prostate data cannot be mounted in this environment, so the
strongest available evidence is a controlled synthetic domain shift:

  * train domain: the 3-class disk phantom (same task as the round-1
    learnability run) — clean, fixed intensity profile;
  * OOD test domains: the SAME phantoms corrupted by the k-space artefact
    simulators that power the artefacted-ACDC benchmark
    (data/artefacts.py: bias field / ghosting / spike) plus a gamma shift
    — none of these corruptions are seen in training.

Each method trains with identical seeds and data stream; only the method
flag differs. Expected (paper claim): IID Dice comparable, OOD Dice higher
for max_style. Numbers land in docs/VALIDATION.md.

Usage: python scripts/ood_method_comparison.py [--steps 600]
       [--methods standard,max_style,rand_conv]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ab_randconv_bn import dice_per_class, phantom_batch  # noqa: E402
from maxstyle_tpu.config import (DataConfig, ExperimentConfig,  # noqa: E402
                                 LearningConfig, MaxStyleConfig,
                                 SegmentationModelConfig)
from maxstyle_tpu.data import artefacts  # noqa: E402
from maxstyle_tpu.solver import TripletSegmentationSolver  # noqa: E402
from maxstyle_tpu.train_step import make_train_step  # noqa: E402


def corrupt(kind: str, imgs: np.ndarray, rng: np.random.RandomState):
    """[N,H,W,1] -> corrupted copy; per-volume k-space artefacts."""
    x = imgs[..., 0]
    if kind == "iid":
        return imgs
    if kind == "gamma":
        out = np.clip(x, 0, 1) ** 2.2
    elif kind == "bias":
        out = artefacts.random_bias_field(x, rng)
    elif kind == "ghosting":
        out = artefacts.random_ghosting(x, rng)
    elif kind == "spike":
        out = artefacts.random_spike(x, rng)
    else:
        raise ValueError(kind)
    # per-slice min-max back to [0,1] (the eval pipeline normalizes too)
    mn = out.min(axis=(1, 2), keepdims=True)
    mx = out.max(axis=(1, 2), keepdims=True)
    return ((out - mn) / (mx - mn + 1e-8)).astype(np.float32)[..., None]


def make_config(method: str, hw: int, batch: int):
    kw = {} if method == "standard" else {method: True}
    return ExperimentConfig(
        data=DataConfig(crop_size=(hw, hw, 1), num_classes=4),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN"),
        learning=LearningConfig(batch_size=batch, n_epochs=1, **kw),
        max_style=MaxStyleConfig())


def train_and_eval(method: str, steps: int, hw: int, batch: int, seed: int,
                   domains):
    cfg = make_config(method, hw, batch)
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(seed), (hw, hw),
                              batch_size=batch)
    step = make_train_step(solver)
    data_rng = np.random.RandomState(seed + 1)
    metrics = {"loss/total": jnp.nan}  # --steps 0 = eval-only smoke run
    t0 = time.time()
    for i in range(steps):
        imgs, labs = phantom_batch(data_rng, batch, hw)
        state, metrics = step(state,
                              {"image": jnp.asarray(imgs),
                               "label": jnp.asarray(labs)},
                              jax.random.fold_in(jax.random.key(seed + 2), i))
    train_s = time.time() - t0

    # the library's inference path (solver.predict == what `infer` ships);
    # inputs are already [0,1]-normalized by corrupt()/phantom_batch
    @jax.jit
    def predict(params, stats, image):
        logits = solver.predict(params, stats, image, softmax=False,
                                normalize_input=False)
        return jnp.argmax(logits, axis=-1)

    results = {}
    for kind in domains:
        val_rng = np.random.RandomState(999)   # same val volumes everywhere
        cor_rng = np.random.RandomState(777)   # same corruption draws
        dices = []
        for _ in range(6):
            imgs, labs = phantom_batch(val_rng, batch, hw)
            imgs = corrupt(kind, imgs, cor_rng)
            pred = np.asarray(predict(state.params, state.batch_stats,
                                      jnp.asarray(imgs)))
            for j in range(batch):
                dices.append(np.nanmean(dice_per_class(pred[j], labs[j])))
        results[kind] = float(np.nanmean(dices))
    return results, float(metrics["loss/total"]), train_s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--hw", type=int, default=192)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--methods", type=str,
                    default="standard,max_style")
    opt = ap.parse_args(argv)
    domains = ["iid", "gamma", "bias", "ghosting", "spike"]

    print(f"devices: {jax.devices()}")
    table = {}
    for method in opt.methods.split(","):
        print(f"== training {method} ({opt.steps} steps)", flush=True)
        res, loss, secs = train_and_eval(method, opt.steps, opt.hw,
                                         opt.batch, opt.seed, domains)
        table[method] = res
        row = "  ".join(f"{k}={v:.4f}" for k, v in res.items())
        print(f"  {method}: {row}  (final loss {loss:.3f}, {secs:.0f}s)",
              flush=True)

    print("\nOOD Dice summary (mean over foreground classes):")
    hdr = "method".ljust(12) + "".join(d.rjust(10) for d in domains) + "   OOD avg"
    print(hdr)
    for method, res in table.items():
        ood = float(np.mean([res[d] for d in domains if d != "iid"]))
        print(method.ljust(12)
              + "".join(f"{res[d]:.4f}".rjust(10) for d in domains)
              + f"   {ood:.4f}")


if __name__ == "__main__":
    main()
