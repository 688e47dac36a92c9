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
       [--methods standard,max_style,rand_conv] [--seeds 0,1,2]
       [--batch 10] [--style_group_size 10] [--out results.jsonl]

`--seeds` runs every method at each seed and reports mean+/-std per cell
(the paper's claim is an ordering; one seed at this scale is fragile).
`--out` appends one JSON line per (method, seed) as it lands, and on
restart already-recorded cells are skipped — a tunnel flake mid-sweep
costs only the in-flight arm.
"""

import argparse
import json
import os
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
    """[N,H,W,1] -> corrupted copy; per-volume k-space artefacts.

    Gamma variants for the eval-artifact probe (round-4 verdict: adv_bias's
    gamma column collapsed to 0.003 — artifact or method behavior?):
      gamma       — x**2.2 then per-slice min-max re-norm (canonical column)
      gamma{X}    — x**X   then re-norm, e.g. gamma1.5 / gamma3.0
      gamma_raw   — x**2.2 WITHOUT the re-norm (x in [0,1] stays in [0,1];
                    isolates whether the re-norm stretch, not the gamma
                    curve itself, pushes inputs off the trained manifold)
    """
    x = imgs[..., 0]
    if kind == "iid":
        return imgs
    if kind == "gamma_raw":
        out = np.clip(x, 0, 1) ** 2.2
        return out.astype(np.float32)[..., None]
    if kind.startswith("gamma"):
        out = np.clip(x, 0, 1) ** (2.2 if kind == "gamma"
                                   else float(kind[5:]))
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


def make_config(method: str, hw: int, batch: int, style_group_size=None):
    kw = {} if method == "standard" else {method: True}
    return ExperimentConfig(
        data=DataConfig(crop_size=(hw, hw, 1), num_classes=4),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN"),
        learning=LearningConfig(batch_size=batch, n_epochs=1, **kw),
        max_style=MaxStyleConfig(style_group_size=style_group_size))


def train_and_eval(method: str, steps: int, hw: int, batch: int, seed: int,
                   domains, style_group_size=None):
    cfg = make_config(method, hw, batch, style_group_size)
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
    ap.add_argument("--seed", type=int, default=0,
                    help="single seed (ignored when --seeds is given)")
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma list, e.g. 0,1,2 — mean+/-std table")
    ap.add_argument("--style_group_size", type=int, default=None,
                    help="MaxStyle stat-group size for scaled batches "
                         "(config.MaxStyleConfig.style_group_size)")
    ap.add_argument("--out", type=str, default=None,
                    help="JSONL checkpoint: append one line per "
                         "(method, seed); skip cells already present")
    ap.add_argument("--methods", type=str,
                    default="standard,max_style")
    ap.add_argument("--domains", type=str,
                    default="iid,gamma,bias,ghosting,spike",
                    help="eval domains; gamma1.5/gamma3.0/gamma_raw probe "
                         "the gamma-column eval artifact")
    ap.add_argument("--stop_file", type=str,
                    default="/tmp/maxstyle_campaign_stop",
                    help="if this path exists, exit cleanly before the "
                         "next arm (bounds a background campaign)")
    opt = ap.parse_args(argv)
    domains = opt.domains.split(",")
    seeds = ([int(s) for s in opt.seeds.split(",")] if opt.seeds
             else [opt.seed])
    methods = opt.methods.split(",")

    done = {}
    if opt.out and os.path.exists(opt.out):
        with open(opt.out) as f:
            for line in f:
                rec = json.loads(line)
                if (rec.get("steps") == opt.steps
                        and rec.get("batch") == opt.batch
                        and rec.get("hw") == opt.hw
                        and rec.get("style_group_size")
                        == opt.style_group_size):
                    done[(rec["method"], rec["seed"])] = rec["dice"]

    print(f"devices: {jax.devices()}")
    from maxstyle_tpu.utils.backend import enable_persistent_cache
    from maxstyle_tpu.utils.tpulock import chip_lock, yield_to_bench
    print(f"compilation cache: {enable_persistent_cache()}", flush=True)
    table = {}  # method -> seed -> {domain: dice}
    stopped = False
    for method in methods:
        table[method] = {}
        for seed in seeds:
            if (method, seed) in done:
                table[method][seed] = done[(method, seed)]
                print(f"== {method} seed {seed}: cached from {opt.out}",
                      flush=True)
                continue
            if opt.stop_file and os.path.exists(opt.stop_file):
                print(f"== stop file {opt.stop_file} present — exiting "
                      f"before {method} seed {seed}", flush=True)
                stopped = True
                break
            yield_to_bench()  # let a waiting official bench go first
            print(f"== training {method} seed {seed} ({opt.steps} steps, "
                  f"batch {opt.batch}, group {opt.style_group_size})",
                  flush=True)
            with chip_lock(f"ood:{method}:s{seed}"):
                res, loss, secs = train_and_eval(
                    method, opt.steps, opt.hw, opt.batch, seed, domains,
                    opt.style_group_size)
            table[method][seed] = res
            row = "  ".join(f"{k}={v:.4f}" for k, v in res.items())
            print(f"  {method} s{seed}: {row}  (final loss {loss:.3f}, "
                  f"{secs:.0f}s)", flush=True)
            if opt.out:
                with open(opt.out, "a") as f:
                    f.write(json.dumps({
                        "method": method, "seed": seed, "steps": opt.steps,
                        "batch": opt.batch, "hw": opt.hw,
                        "style_group_size": opt.style_group_size,
                        "platform": jax.default_backend(),
                        "dice": res, "final_loss": loss,
                        "train_s": secs}) + "\n")
        if stopped:
            break

    print("\nOOD Dice summary (mean over foreground classes"
          + (f", mean+/-std over seeds {seeds}" if len(seeds) > 1 else "")
          + "):")
    hdr = ("method".ljust(14)
           + "".join(d.rjust(16) for d in domains) + "         OOD avg")
    print(hdr)
    for method, per_seed in table.items():
        have = [s for s in seeds if s in per_seed]  # stop file may truncate
        if not have:
            continue
        cells = []
        for d in domains:
            vals = [per_seed[s][d] for s in have]
            cells.append(f"{np.mean(vals):.3f}+/-{np.std(vals):.3f}"
                         if len(have) > 1 else f"{np.mean(vals):.4f}")
        ood_per_seed = [np.mean([per_seed[s][d] for d in domains
                                 if d != "iid"]) for s in have]
        ood = (f"{np.mean(ood_per_seed):.3f}+/-{np.std(ood_per_seed):.3f}"
               if len(have) > 1 else f"{np.mean(ood_per_seed):.4f}")
        print(method.ljust(14) + "".join(c.rjust(16) for c in cells)
              + ood.rjust(17))


if __name__ == "__main__":
    main()
