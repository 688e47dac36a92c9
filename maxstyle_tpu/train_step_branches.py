"""Method-branch implementations composed into the train step.

Each function mirrors one `if <flag>:` block of the reference training loop
(train_adv_supervised_segmentation_triplet.py:201-530). All branches are
pure: they take (params, stats, aux) and return a scalar loss contribution,
writing their channel into `metrics`. `SUPPORTED` lists the flags wired;
make_train_step refuses configs requesting others (adv_noise/adv_bias live
in ops/advchain.py and are registered once implemented).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from maxstyle_tpu import losses

SUPPORTED = {"latent_DA", "RSC", "mix_style", "DSU", "rand_conv",
             "adv_noise", "adv_bias"}


def latent_da_branch(solver, cfg, params, stats, aux, *, clean_image, image_n,
                     label, rng, rngs, metrics):
    """LSM (MICCAI 2021): latent-code masking hard examples
    (train_adv…:201-246)."""
    sg = jax.lax.stop_gradient
    perturbed_image, perturbed_seg = solver.hard_example_generation(
        params, stats, sg(clean_image), label, aux.z_i, aux.z_s,
        lda_cfg=cfg.latent_DA, rng=rng, rngs=rngs)
    (h_seg, h_rec, h_shape, h_pseg), _ = solver.hard_example_training(
        params, stats, perturbed_image, clean_image, label,
        perturbed_seg=perturbed_seg, standard_input_image=sg(image_n),
        standard_recon_image=aux.recon_image, rngs=rngs)
    lda_loss = h_seg + h_rec + h_shape + h_pseg
    metrics["loss/hard/total"] += lda_loss
    metrics["loss/hard/seg"] += h_seg
    metrics["loss/hard/image"] += h_rec
    metrics["loss/hard/shape"] += h_shape + h_pseg
    return lda_loss


def rsc_branch(solver, cfg, params, stats, aux, *, clean_image, image_n, label,
               rng, rngs, metrics):
    """RSC self-challenging regularization (train_adv…:330-383): targeted
    hard masking (corr loss, threshold 1/3, hard mask, if_detach=False) on
    both codes; losses on the masked-code decodes."""
    from maxstyle_tpu.ops import latent_masking as lm
    sg = jax.lax.stop_gradient
    p_sg = jax.tree_util.tree_map(sg, params)
    threshold = 1.0 / 3
    k_i, k_s = jax.random.split(rng)

    def dec_img(code):
        out, _ = solver.decode("image_decoder", p_sg, stats, code,
                               mode="frozen", rngs=rngs)
        return out

    def dec_seg(code):
        out, _ = solver.decode("segmentation_decoder", p_sg, stats, code,
                               mode="frozen", rngs=rngs)
        return out

    _, img_mask = lm.perturb_latent_code(
        aux.z_i, dec_img, sg(clean_image), num_classes=solver.num_classes,
        perturb_type="RSC", threshold=threshold, loss_type="corr",
        random_threshold=False, if_soft=False, if_detach=False, key=k_i)
    _, shape_mask = lm.perturb_latent_code(
        aux.z_s, dec_seg, label, num_classes=solver.num_classes,
        perturb_type="RSC", threshold=threshold, loss_type="corr",
        random_threshold=False, if_soft=False, if_detach=False, key=k_s)

    # seg with corrupted shape code (graph kept: grads flow into encoder)
    seg_logit, _ = solver.decode("segmentation_decoder", params, stats,
                                 aux.z_s * shape_mask, mode="frozen", rngs=rngs)
    l_seg_2 = losses.cross_entropy_2d(seg_logit, label, weight=solver.class_weights)

    # recon + seg with corrupted image code
    recon, _ = solver.decode("image_decoder", params, stats,
                             aux.z_i * img_mask, mode="frozen", rngs=rngs)
    l_rec_reg = losses.image_recon_loss(recon, sg(clean_image), solver.rec_loss_type)
    (_, new_z_s), _ = solver.filter_code(params, stats, aux.z_i * img_mask,
                                         mode="frozen", rngs=rngs)
    seg_logit_1, _ = solver.decode("segmentation_decoder", params, stats,
                                   new_z_s, mode="frozen", rngs=rngs)
    l_seg_reg = losses.cross_entropy_2d(seg_logit_1, label, weight=solver.class_weights)

    l_shape = jnp.zeros(())
    if solver.spec.has_stn:
        refined, _ = solver.recon_shape(params, stats, seg_logit,
                                        is_label_map=False, image=image_n,
                                        recon_image=aux.recon_image,
                                        mode="frozen", rngs=rngs)
        l1 = losses.cross_entropy_2d(refined, label, weight=solver.class_weights)
        refined_1, _ = solver.recon_shape(params, stats, seg_logit_1,
                                          is_label_map=False, image=image_n,
                                          recon_image=recon, mode="frozen",
                                          rngs=rngs)
        l2 = losses.cross_entropy_2d(refined_1, label, weight=solver.class_weights)
        l_shape = l1 + l2

    rsc_loss = l_rec_reg + l_seg_2 + l_seg_reg + l_shape
    metrics["loss/hard/RSC"] += rsc_loss
    return rsc_loss


def mixstyle_dsu_branch(solver, cfg, params, stats, aux, *, clean_image,
                        image_n, label, rng, rngs, metrics, use_dsu: bool):
    """MixStyle (layers [1,2,3], mix='random') / DSU (layers [1..6],
    mix='gaussian') feature-style regularization (train_adv…:388-427)."""
    sg = jax.lax.stop_gradient
    if use_dsu:
        layers, mix = (1, 2, 3, 4, 5, 6), "gaussian"
    else:
        layers, mix = (1, 2, 3), "random"
    aug_z_i, aug_z_s = solver.generate_style_augmented_latent_code(
        params, stats, image_n, layers_indexes=layers, mix=mix, p=0.5,
        lmda=None, rng=rng, rngs=rngs)
    seg_logit, _ = solver.decode("segmentation_decoder", params, stats, aug_z_s,
                                 mode="frozen", rngs=rngs)
    l_seg = losses.cross_entropy_2d(seg_logit, label, weight=solver.class_weights)
    if solver.spec.has_image_recon:
        recon, _ = solver.decode("image_decoder", params, stats, aug_z_i,
                                 mode="frozen", rngs=rngs)
        l_rec = losses.image_recon_loss(recon, sg(clean_image), solver.rec_loss_type)
    else:
        l_rec = jnp.zeros(())
    l_shape = jnp.zeros(())
    if solver.spec.has_stn:
        refined, _ = solver.recon_shape(params, stats, seg_logit,
                                        is_label_map=False, image=image_n,
                                        recon_image=aux.recon_image,
                                        mode="frozen", rngs=rngs)
        l_shape = losses.cross_entropy_2d(refined, label, weight=solver.class_weights)
    loss = l_rec + l_seg + l_shape
    metrics["loss/hard/DSU" if use_dsu else "loss/hard/mix_style"] += loss
    return loss


def rand_conv_branch(solver, cfg, params, stats, aux, *, clean_image, image_n,
                     label, rng, rngs, metrics):
    """RandConv consistency branch (train_adv…:289-326): three random-conv
    views, JS-style KL to the mean prediction (lambda=10) + recon losses.

    BN choreography is selected by `learning.randconv_view_bn`:
    * 'frozen' (default) — views use batch statistics but do NOT write
      running stats. Both modes normalize with batch stats, so the composed
      loss and gradients are IDENTICAL; only the incidental running-stat
      drift from the random-conv views is dropped.
    * 'train' — reference-exact: each view forward updates running stats
      sequentially (train_adv…:289-326), threaded back into the step's
      batch_stats. The measured effect of the difference on phantom-task
      Dice is documented in docs/VALIDATION.md (VERDICT round-1 weak #5).

    Returns (loss, stats) — stats unchanged under 'frozen'.
    """
    from maxstyle_tpu.ops.randconv import rand_conv_augment
    sg = jax.lax.stop_gradient
    lamda = 10.0
    n_views = 3
    view_mode = ("train" if getattr(cfg.learning, "randconv_view_bn",
                                    "frozen") == "train" else "frozen")
    recs, init_probs, final_probs = [], [], []
    for i in range(n_views):
        aug = rand_conv_augment(jax.random.fold_in(rng, i), image_n)
        recon, y0, refined, stats_i = solver.run(
            params, stats, aug, mode=view_mode, normalize_input=True,
            rngs=rngs)
        if view_mode == "train":
            stats = stats_i
        recs.append(recon)
        init_probs.append(jax.nn.softmax(y0, axis=-1))
        final_probs.append(jax.nn.softmax(refined, axis=-1))

    def kl_to_mean(probs_list, p):
        """F.kl_div(log(mean), p, batchmean over pixels) (train_adv…:303-314)."""
        mean_log = jnp.log(jnp.clip(sum(probs_list) / n_views, 1e-8, 1.0))
        n_pix = p.shape[0] * p.shape[1] * p.shape[2]
        return jnp.sum(p * (jnp.log(jnp.clip(p, 1e-30, 1.0)) - mean_log)) / n_pix

    loss = jnp.zeros(())
    for rec, p_init, p_final in zip(recs, init_probs, final_probs):
        l_rec = (losses.image_recon_loss(rec, sg(clean_image), solver.rec_loss_type)
                 if rec is not None else jnp.zeros(()))
        l_seg = lamda * kl_to_mean(init_probs, p_init)
        l_shape = (lamda * kl_to_mean(final_probs, p_final)
                   if solver.spec.has_stn else jnp.zeros(()))
        loss += l_rec + l_seg + l_shape
    loss = loss / n_views
    metrics["loss/hard/rand_conv"] += loss
    return loss, stats


def _adv_branch(solver, cfg, params, stats, aux, *, clean_image, image_n,
                label, rng, rngs, metrics, kind: str):
    """AdvNoise / AdvBias branches (train_adv…:434-530): attack the clean
    image in eval mode, then hard-example-train on the attacked image and
    add the consistency divergence."""
    from maxstyle_tpu.ops import advchain
    sg = jax.lax.stop_gradient

    def forward_eval(x):
        (_, z_s), _ = solver.encode_image(params, stats, x, mode="eval")
        pred, _ = solver.decode("segmentation_decoder", params, stats, z_s,
                                mode="eval")
        return pred

    p0 = sg(aux.y0)
    if kind == "adv_noise":
        adv_image, consistency = advchain.adv_noise_attack(
            forward_eval, clean_image, p0, epsilon=0.1, xi=1e-6, n_iter=1,
            key=rng, if_norm_image=True)
    else:
        downscale = 2 if "ACDC" in cfg.data.dataset_name else 4
        adv_image, consistency = advchain.adv_bias_attack(
            forward_eval, clean_image, p0, epsilon=0.4, downscale=downscale,
            n_iter=1, key=rng, if_norm_image=False)

    (h_seg, h_rec, h_shape, h_pseg), _ = solver.hard_example_training(
        params, stats, adv_image, clean_image, label, perturbed_seg=None,
        standard_input_image=sg(image_n), standard_recon_image=aux.recon_image,
        rngs=rngs)
    loss = h_seg + h_rec + h_shape + h_pseg + consistency
    metrics[f"loss/hard/{kind}"] += loss
    return loss


def apply_enabled_branches(solver, L, cfg, params, stats, aux, *, clean_image,
                           image_n, label, rng, rngs, metrics: Dict):
    """Sum of enabled auxiliary branch losses (0 when none enabled).

    Returns (total_loss, stats): stats passes through unchanged except for
    the rand_conv branch under `randconv_view_bn='train'`, which threads its
    view-forward running-stat updates back out (reference semantics)."""
    total = jnp.zeros(())
    kw = dict(clean_image=clean_image, image_n=image_n, label=label, rngs=rngs,
              metrics=metrics)
    if L.latent_DA:
        total += latent_da_branch(solver, cfg, params, stats, aux,
                                  rng=jax.random.fold_in(rng, 1), **kw)
    if L.RSC:
        total += rsc_branch(solver, cfg, params, stats, aux,
                            rng=jax.random.fold_in(rng, 2), **kw)
    if L.mix_style or L.DSU:
        total += mixstyle_dsu_branch(solver, cfg, params, stats, aux,
                                     rng=jax.random.fold_in(rng, 3),
                                     use_dsu=bool(L.DSU), **kw)
    if L.rand_conv:
        rc_loss, stats = rand_conv_branch(solver, cfg, params, stats, aux,
                                          rng=jax.random.fold_in(rng, 4), **kw)
        total += rc_loss
    if L.adv_noise:
        total += _adv_branch(solver, cfg, params, stats, aux,
                             rng=jax.random.fold_in(rng, 5), kind="adv_noise", **kw)
    if L.adv_bias:
        total += _adv_branch(solver, cfg, params, stats, aux,
                             rng=jax.random.fold_in(rng, 6), kind="adv_bias", **kw)
    return total, stats
