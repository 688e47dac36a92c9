"""Demo: generate MaxStyle-augmented images from a trained (or fresh) model.

Equivalent of the reference's vis_hard_example notebook path (README.md:29,
34; the notebook body is absent from the snapshot — SURVEY §2.7): load a
dual-branch checkpoint, encode an image, run `generate_max_style_image` with
and without adversarial optimization, and save a comparison grid.

Usage:
  python -m maxstyle_tpu.demo_generate_styles [--ckpt_dir DIR --ckpt best]
      [--image path.npy] [--n_iter 5] [--out styles.png]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from maxstyle_tpu.config import (DataConfig, ExperimentConfig,
                                     LearningConfig, MaxStyleConfig,
                                     SegmentationModelConfig)
    from maxstyle_tpu.solver import TripletSegmentationSolver
    from maxstyle_tpu.utils import checkpoint as ckpt
    from maxstyle_tpu.utils.visualize import save_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default="best")
    parser.add_argument("--image", type=str, default=None,
                        help=".npy image [H,W] in [0,1]")
    parser.add_argument("--network_type", type=str,
                        default="FCN_16_standard_no_STN")
    parser.add_argument("--crop", type=int, default=192)
    parser.add_argument("--n_iter", type=int, default=5)
    parser.add_argument("--n_samples", type=int, default=8)
    parser.add_argument("--out", type=str, default="maxstyle_samples.png")
    parser.add_argument("--seed", type=int, default=0)
    opt = parser.parse_args(argv)

    hw = opt.crop
    cfg = ExperimentConfig(
        data=DataConfig(crop_size=(hw, hw, 1)),
        segmentation_model=SegmentationModelConfig(network_type=opt.network_type),
        learning=LearningConfig(batch_size=opt.n_samples, max_style=True),
        max_style=MaxStyleConfig(n_iter=opt.n_iter))
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(opt.seed), (hw, hw),
                              batch_size=opt.n_samples)
    if opt.ckpt_dir:
        state, _ = ckpt.load_checkpoint(opt.ckpt_dir, opt.ckpt, state)

    if opt.image:
        img = np.load(opt.image).astype(np.float32)
        img = np.broadcast_to(img[None, :, :, None],
                              (opt.n_samples, hw, hw, 1)).copy()
    else:
        # synthetic phantom: blobby circles
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
        img = np.stack([
            np.exp(-(((yy - hw / 2) / (hw / 5)) ** 2
                     + ((xx - hw / 2) / (hw / 4)) ** 2))
            for _ in range(opt.n_samples)])[..., None]
    image = jnp.asarray(img)
    label = (image[..., 0] > 0.5).astype(jnp.int32)

    from functools import partial

    @partial(jax.jit, static_argnums=5)  # n_iter selects the compiled graph
    def gen(params, stats, image, label, rng, n_iter):
        (z_i, _), _ = solver.encode_image(params, stats, image, mode="frozen")
        import dataclasses
        ms_cfg = dataclasses.replace(cfg.max_style, n_iter=n_iter)
        return solver.generate_max_style_image(
            params, stats, z_i, reference_segmentation=label, ms_cfg=ms_cfg,
            rng=rng)

    rng = jax.random.key(opt.seed + 1)
    plain = gen(state.params, state.batch_stats, image, label, rng, 0)
    adv = gen(state.params, state.batch_stats, image, label, rng, opt.n_iter)

    panels, titles = [], []
    for i in range(min(opt.n_samples, 4)):
        panels += [np.asarray(image)[i, ..., 0], np.asarray(plain)[i, ..., 0],
                   np.asarray(adv)[i, ..., 0]]
        titles += ["input", "styled (n_iter=0)", f"adversarial (n_iter={opt.n_iter})"]
    path = save_image_grid(panels, opt.out, titles, cols=3)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
