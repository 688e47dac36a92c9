"""Demo: generate MaxStyle-augmented images from a trained (or fresh) model.

Equivalent of the reference's vis_hard_example notebook path (README.md:29,
34; the notebook body is absent from the snapshot — SURVEY §2.7). By default
this loads the reference's OWN shipped fixtures
(notebooks/model/{image_decoder,segmentation_decoder}.pth via
utils/torch_import + notebooks/data/image.npy, real cardiac slices) so the
one reference fixture path is a user-facing showcase with no flags:

  python -m maxstyle_tpu.demo_generate_styles

The fixtures contain no encoder, so the latent code is recovered by
decoder inversion — Adam on z minimizing ||dec(z) - image||^2 with the
pretrained decoder frozen (a jitted lax.scan) — then MaxStyle is applied to
the fitted code: the styled samples are style-varied reconstructions of the
real cardiac anatomy. With --ckpt_dir (a full orbax checkpoint incl. the
encoder) the code comes from the encoder and the adversarial n_iter loop
optimizes against the segmentation prediction as in training.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

REF_TORCH_DIR = "/root/reference/notebooks/model"
REF_IMAGE = "/root/reference/notebooks/data/image.npy"


def fit_latent_code(solver, params, stats, image, z_shape, *, iters=200,
                    lr=0.05):
    """Invert the frozen image decoder: argmin_z ||dec(z) - image||^2."""
    import optax

    def loss_fn(z):
        recon, _ = solver.decode("image_decoder", params, stats, z,
                                 mode="frozen")
        return jnp.mean((recon - image) ** 2)

    tx = optax.adam(lr)

    @jax.jit
    def fit(z0):
        opt0 = tx.init(z0)

        def body(carry, _):
            z, opt = carry
            l, g = jax.value_and_grad(loss_fn)(z)
            updates, opt = tx.update(g, opt)
            return (optax.apply_updates(z, updates), opt), l

        (z, _), ls = jax.lax.scan(body, (z0, opt0), None, length=iters)
        return z, ls

    z0 = jnp.zeros(z_shape)
    z, losses = fit(z0)
    return z, np.asarray(losses)


def main(argv=None):
    from maxstyle_tpu.config import (DataConfig, ExperimentConfig,
                                     LearningConfig, MaxStyleConfig,
                                     SegmentationModelConfig)
    from maxstyle_tpu.solver import TripletSegmentationSolver
    from maxstyle_tpu.utils import checkpoint as ckpt
    from maxstyle_tpu.utils.visualize import save_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="orbax checkpoint dir (full model incl. encoder)")
    parser.add_argument("--ckpt", type=str, default="best")
    parser.add_argument("--torch_ckpt_dir", type=str,
                        default=REF_TORCH_DIR if os.path.isdir(REF_TORCH_DIR)
                        else None,
                        help="dir of reference per-module .pth files "
                             "(default: the reference's shipped notebook "
                             "decoders when present)")
    parser.add_argument("--image", type=str,
                        default=REF_IMAGE if os.path.exists(REF_IMAGE)
                        else None,
                        help=".npy image [H,W] or [N,H,W] in [0,1] "
                             "(default: the reference's real cardiac slices)")
    parser.add_argument("--network_type", type=str,
                        default="FCN_16_standard_no_STN")
    parser.add_argument("--crop", type=int, default=192)
    parser.add_argument("--n_iter", type=int, default=5)
    parser.add_argument("--n_samples", type=int, default=8)
    parser.add_argument("--fit_iters", type=int, default=200,
                        help="decoder-inversion Adam iterations (used when "
                             "no encoder checkpoint is available)")
    parser.add_argument("--out", type=str, default="maxstyle_samples.png")
    parser.add_argument("--seed", type=int, default=0)
    opt = parser.parse_args(argv)
    # 'none' opts out of the reference-fixture defaults (synthetic phantom)
    if opt.image == "none":
        opt.image = None
    if opt.torch_ckpt_dir == "none":
        opt.torch_ckpt_dir = None

    hw = opt.crop
    cfg = ExperimentConfig(
        data=DataConfig(crop_size=(hw, hw, 1)),
        segmentation_model=SegmentationModelConfig(network_type=opt.network_type),
        learning=LearningConfig(batch_size=opt.n_samples, max_style=True),
        max_style=MaxStyleConfig(n_iter=opt.n_iter))
    solver = TripletSegmentationSolver(cfg)
    state = solver.init_state(jax.random.key(opt.seed), (hw, hw),
                              batch_size=opt.n_samples)
    have_encoder = False
    if opt.ckpt_dir:
        state, _ = ckpt.load_checkpoint(opt.ckpt_dir, opt.ckpt, state)
        have_encoder = True
    elif opt.torch_ckpt_dir:
        from maxstyle_tpu.utils.torch_import import import_module_checkpoint
        new_params = dict(state.params)
        new_stats = dict(state.batch_stats)
        for name in state.params:
            path = os.path.join(opt.torch_ckpt_dir, f"{name}.pth")
            if os.path.exists(path):
                p, s = import_module_checkpoint(path, name, solver.spec)
                new_params[name] = jax.tree_util.tree_map(jnp.asarray, p)
                new_stats[name] = jax.tree_util.tree_map(jnp.asarray, s)
                print(f"imported reference torch weights for {name}")
                have_encoder |= name == "image_encoder"
        state = state.replace(params=new_params, batch_stats=new_stats)

    if opt.image:
        img = np.load(opt.image).astype(np.float32)
        if img.ndim == 2:
            img = np.broadcast_to(img[None], (opt.n_samples,) + img.shape)
        img = img[:opt.n_samples, :hw, :hw, None].copy()
        n = img.shape[0]
    else:
        # synthetic phantom: blobby circles
        n = opt.n_samples
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
        img = np.stack([
            np.exp(-(((yy - hw / 2) / (hw / 5)) ** 2
                     + ((xx - hw / 2) / (hw / 4)) ** 2))
            for _ in range(n)])[..., None]
    image = jnp.asarray(img)
    label = (image[..., 0] > 0.5).astype(jnp.int32)

    params, stats = state.params, state.batch_stats
    if have_encoder:
        (z_i, _), _ = solver.encode_image(params, stats, image, mode="frozen")
        n_iter = opt.n_iter
    else:
        # decoder inversion: recover z for the REAL image with the shipped
        # pretrained decoder (no encoder in the reference fixtures)
        z_shape = (n, hw // 16, hw // 16, solver.spec.latent_ch)
        z_i, fit_losses = fit_latent_code(solver, params, stats, image,
                                          z_shape, iters=opt.fit_iters)
        print(f"decoder inversion: recon mse {fit_losses[0]:.4f} -> "
              f"{fit_losses[-1]:.4f} in {opt.fit_iters} iters")
        # the adversarial loop needs a trained encoder for its inner loss;
        # without one, draw independent style samples instead
        n_iter = opt.n_iter if have_encoder else 0

    from functools import partial

    @partial(jax.jit, static_argnums=(3, 4))  # n_iter selects the graph
    def gen(z_i, label, rng, n_iter, seed_fold):
        import dataclasses
        ms_cfg = dataclasses.replace(cfg.max_style, n_iter=n_iter)
        return solver.generate_max_style_image(
            params, stats, z_i, reference_segmentation=label, ms_cfg=ms_cfg,
            rng=jax.random.fold_in(rng, seed_fold))

    rng = jax.random.key(opt.seed + 1)
    recon, _ = solver.decode("image_decoder", params, stats, z_i,
                             mode="frozen")
    styled = [gen(z_i, label, rng, n_iter, k) for k in range(2)]

    panels, titles = [], []
    for i in range(min(n, 4)):
        panels += [np.asarray(image)[i, ..., 0],
                   np.asarray(recon)[i, ..., 0],
                   np.asarray(styled[0])[i, ..., 0],
                   np.asarray(styled[1])[i, ..., 0]]
        suffix = (f"adv n_iter={n_iter}" if n_iter else "sampled")
        titles += ["input", "recon", f"styled #1 ({suffix})",
                   f"styled #2 ({suffix})"]
    path = save_image_grid(panels, opt.out, titles, cols=4)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
