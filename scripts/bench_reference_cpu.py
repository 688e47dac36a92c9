"""Measure the REFERENCE's MaxStyle training iteration on this host's CPU.

Anchors bench.py's vs_baseline (VERDICT r2 missing #2): the reference
publishes no throughput numbers, so we measure its actual executable code
(via tests/reference_shim.py) running the headline workload — the
MICCAI2022_MaxStyle configuration's full training iteration
(train_adv_supervised_segmentation_triplet.py:158-541):

  standard_training (+input noise)                      :176-199
  generate_max_style_image (inner Adam x5, layers 3,4,5) :252-281
  hard_example_traininng on the stylized images          :279-281
  total-loss backward + all-module optimizer steps       :531-535

batch 20 @ 192x192, FCN_16_standard_no_STN, AdamW 1e-4 — identical
semantics to bench.py's workload (minus data augmentation, which the
reference does on CPU workers off the training thread).

Usage: python scripts/bench_reference_cpu.py [--iters 5] [--warmup 2]
Prints one JSON line {"ref_cpu_steps_per_sec": ..., ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--hw", type=int, default=192)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch thread cap (0 = leave default)")
    opt = ap.parse_args()

    import torch
    if opt.threads:
        torch.set_num_threads(opt.threads)
    from tests.reference_shim import reference_module, reference_solver_class
    Cls = reference_solver_class()
    # generate_max_style_image constructs MaxStyle() without use_gpu and the
    # default is True (advanced_triplet…:524); pin CPU for this host
    import functools
    solver_mod = reference_module(
        "src.models.advanced_triplet_recon_segmentation_model")
    solver_mod.MaxStyle = functools.partial(solver_mod.MaxStyle,
                                            use_gpu=False)

    torch.manual_seed(0)
    solver = Cls(network_type="FCN_16_standard_no_STN", image_ch=1,
                 num_classes=4, use_gpu=False, image_size=opt.hw,
                 intensity_norm_type="min_max", optimizer_type="AdamW",
                 learning_rate=1e-4)

    rng = np.random.RandomState(0)
    clean = torch.from_numpy(rng.rand(opt.batch, 1, opt.hw, opt.hw)
                             .astype(np.float32))
    label = torch.from_numpy(
        (rng.rand(opt.batch, opt.hw, opt.hw) * 4).astype(np.int64))

    ms = dict(p=0.5, decoder_layers_indexes=[3, 4, 5], n_iter=5,
              mix_style=True, lr=0.1, no_noise=False, noise_learnable=True,
              mix_learnable=True, loss_types=["seg"], loss_weights=[1],
              always_use_beta=False)

    def one_iteration():
        solver.train()
        solver.reset_all_optimizers()
        noise = 0.05 * torch.randn_like(clean)
        image_l = torch.clamp(clean + noise, clean.min(), clean.max())

        (seg_loss, image_recon_loss, gt_recon_loss, shape_recon_loss,
         easy_recon_image, p0, p_refine) = solver.standard_training(
            clean, label, perturbed_image=image_l, return_output=True)
        standard_loss = (seg_loss + image_recon_loss + shape_recon_loss
                         + gt_recon_loss)

        solver.reset_all_optimizers()
        stylized = solver.generate_max_style_image(
            image_code=solver.z_i, channel_num=[128, 64, 32, 16, 16, 1],
            reference_image=clean, reference_segmentation=label, **ms)
        stylized = stylized.detach().clone()
        l_seg, l_rec, l_sh1, l_sh2 = solver.hard_example_traininng(
            perturbed_image=stylized, perturbed_seg=None, clean_image_l=clean,
            label_l=label, standard_input_image=image_l.detach().clone(),
            standard_recon_image=easy_recon_image, use_gpu=False)
        max_style_loss = l_rec + l_seg + l_sh1 + l_sh2

        loss = standard_loss + max_style_loss
        solver.reset_all_optimizers()
        loss.backward()
        solver.optimize_all_params()
        return float(loss)

    for _ in range(opt.warmup):
        one_iteration()
    t0 = time.perf_counter()
    for _ in range(opt.iters):
        one_iteration()
    dt = time.perf_counter() - t0

    print(json.dumps({
        "ref_cpu_steps_per_sec": round(opt.iters / dt, 4),
        "sec_per_step": round(dt / opt.iters, 3),
        "iters": opt.iters,
        "batch": opt.batch, "hw": opt.hw,
        "torch_threads": torch.get_num_threads(),
        "workload": "MICCAI2022_MaxStyle full iteration (std + inner adv x5 "
                    "+ hard-example + backward + AdamW steps)",
    }))


if __name__ == "__main__":
    main()
