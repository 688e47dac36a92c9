"""Single-program training step composition.

One jitted function reproduces one iteration of the reference training loop
(train_adv_supervised_segmentation_triplet.py:158-541): input-noise
injection, standard triplet training, plus every method branch enabled by the
config flags (train_adv…:134-141). Branch enablement is *static* — each
experiment config compiles its own XLA program with exactly the enabled
branches, no runtime dispatch.

Loss channel names mirror the reference's TensorBoard keys
(train_adv…:152-153) so dashboards line up 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from maxstyle_tpu import prng
from maxstyle_tpu.solver import TrainState, TripletSegmentationSolver

LOSS_KEYS = (
    "loss/standard/total", "loss/standard/seg", "loss/standard/image",
    "loss/standard/shape", "loss/standard/gt_shape",
    "loss/hard/total", "loss/hard/seg", "loss/hard/image", "loss/hard/shape",
    "loss/hard/rand_conv", "loss/hard/RSC", "loss/hard/mix_style",
    "loss/hard/DSU", "loss/hard/adv_noise", "loss/hard/adv_bias",
)


def add_input_noise(clean_image: jnp.ndarray, key: jax.Array,
                    intensity_norm_type: str) -> jnp.ndarray:
    """Denoising-autoencoder input corruption (train_adv…:179-186):
    +0.05*N(0,1), then clamp to the clean batch's global [min, max]
    (min_max) or re-instance-normalize (z_score)."""
    noise = 0.05 * jax.random.normal(key, clean_image.shape, clean_image.dtype)
    noisy = clean_image + noise
    if intensity_norm_type == "min_max":
        return jnp.clip(noisy, jnp.min(clean_image), jnp.max(clean_image))
    if intensity_norm_type == "z_score":
        # F.instance_norm with eps=1e-5
        mean = jnp.mean(noisy, axis=(1, 2), keepdims=True)
        var = jnp.var(noisy, axis=(1, 2), keepdims=True)
        return (noisy - mean) / jnp.sqrt(var + 1e-5)
    raise ValueError(intensity_norm_type)


def make_train_step(solver: TripletSegmentationSolver, jit_compile: bool = True):
    """Build the per-iteration update for the solver's config.

    `jit_compile=False` returns the raw python function so callers can apply
    their own jit with explicit shardings (parallel.mesh.shard_train_step).
    """
    cfg = solver.config
    L = cfg.learning
    intensity_norm_type = cfg.data.intensity_norm_type

    from maxstyle_tpu import train_step_branches as br
    requested = {name for name in ("latent_DA", "rand_conv", "RSC", "mix_style",
                                   "DSU", "adv_noise", "adv_bias")
                 if getattr(L, name)}
    unsupported = requested - br.SUPPORTED
    if unsupported:
        raise NotImplementedError(f"method branches not yet wired: {sorted(unsupported)}")

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
             overrides: Dict[str, Any] | None = None,
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # ``overrides`` is a test/parity hook pinning the step's random
        # draws: {'image_n': fixed noisy input, 'style_init': fixed MaxStyle
        # params/state} — mirrors seeding the reference's torch RNG.
        clean_image = batch["image"]          # [N,H,W,C] aug+orig concat
        if clean_image.ndim != 4:
            raise ValueError(
                f"batch['image'] must be [N,H,W,C], got {clean_image.shape} "
                "— a missing channel axis otherwise surfaces as a confusing "
                "parameter-shape error deep inside the encoder")
        label = batch["label"].astype(jnp.int32)  # [N,H,W]
        if label.ndim != 3:
            raise ValueError(
                f"batch['label'] must be [N,H,W], got {label.shape}")
        k = prng.split_dict(rng, ("noise", "maxstyle", "dropout", "branches"))
        ov = overrides or {}
        image_n = (ov["image_n"] if "image_n" in ov else
                   add_input_noise(clean_image, k["noise"], intensity_norm_type))
        rngs = {"dropout": k["dropout"]}
        metrics: Dict[str, jnp.ndarray] = {}

        def loss_fn(params):
            m = {key: jnp.zeros(()) for key in LOSS_KEYS}
            (seg_l, img_l, gt_l, shape_l), aux, stats = solver.standard_training(
                params, state.batch_stats, clean_image, label, image_n,
                mode="train", compute_gt_recon=True, rngs=rngs)
            standard_loss = seg_l + img_l + shape_l + gt_l
            m["loss/standard/total"] = standard_loss
            m["loss/standard/seg"] = seg_l
            m["loss/standard/image"] = img_l
            m["loss/standard/shape"] = shape_l
            m["loss/standard/gt_shape"] = gt_l
            total = standard_loss

            if L.max_style:
                stylized = solver.generate_max_style_image(
                    params, stats, aux.z_i,
                    reference_segmentation=label, ms_cfg=cfg.max_style,
                    rng=k["maxstyle"], rngs=rngs,
                    style_init=ov.get("style_init"))
                (h_seg, h_rec, h_shape1, h_shape2), stats = \
                    solver.hard_example_training(
                        params, stats, stylized, clean_image, label,
                        perturbed_seg=None,
                        standard_input_image=jax.lax.stop_gradient(image_n),
                        standard_recon_image=aux.recon_image, rngs=rngs)
                ms_loss = h_rec + h_seg + h_shape1 + h_shape2
                m["loss/hard/total"] += ms_loss
                m["loss/hard/seg"] += h_seg
                m["loss/hard/image"] += h_rec
                m["loss/hard/shape"] += h_shape1 + h_shape2
                total = total + ms_loss

            extra, stats = br.apply_enabled_branches(
                solver, L, cfg, params, stats, aux,
                clean_image=clean_image, image_n=image_n, label=label,
                rng=k["branches"], rngs=rngs, metrics=m)
            total = total + extra

            return total, (m, stats)

        (total, (m, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        new_params = dict(state.params)
        new_opt_states = dict(state.opt_states)
        for name in state.params:
            updates, new_opt_states[name] = solver.tx.update(
                grads[name], state.opt_states[name], state.params[name])
            new_params[name] = optax.apply_updates(state.params[name], updates)

        m["loss/total"] = total
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_states=new_opt_states, step=state.step + 1)
        return new_state, m

    if jit_compile:
        return jax.jit(step, donate_argnums=(0,))
    return step


def interleave_style_groups(aug, orig, group_size: int):
    """Reorder the (aug, orig) pair concat into consecutive style groups of
    ``group_size``, each [G/2 aug | G/2 orig] — the reference's effective
    batch-20 composition (10 augmented + 10 original,
    train_adv…:46-77 with keep_orig_image_label_pair) replicated per group
    so a scaled batch keeps MaxStyle's tuned mixing semantics
    (config.MaxStyleConfig.style_group_size). Downstream losses/BN are
    order-invariant; only the style ops' block permutation + per-group
    spreads are order-sensitive, which is exactly what this layout feeds."""
    half, hg = aug.shape[0], group_size // 2
    n = half // hg
    a = aug.reshape((n, hg) + aug.shape[1:])
    o = orig.reshape((n, hg) + orig.shape[1:])
    return jnp.concatenate([a, o], axis=1).reshape((2 * half,)
                                                   + aug.shape[1:])


def make_fused_train_step(solver: TripletSegmentationSolver, aug_policy,
                          keep_orig: bool, jit_compile: bool = True,
                          mesh=None):
    """Augmentation + training in ONE dispatch: takes RAW padded slices
    [N,H,W] and performs the device-side augment (aug pair + norm pair
    concat, train.make_device_batch) inside the same XLA program as the
    optimizer step — halving per-iteration dispatch overhead, which
    dominates once the step itself is ~ms-scale.

    `mesh`: under data-parallel sharding the augmentation runs inside a
    shard_map over the mesh's 'data' axis (augment_batch_sharded) — GSPMD
    cannot partition the pallas warp kernel, so without this the fast
    augmentation path would silently all-gather and run replicated on
    every chip."""
    from maxstyle_tpu.data import augment as A
    base_step = make_train_step(solver, jit_compile=False)
    crop_hw = aug_policy.crop_hw

    def fused(state: TrainState, raw: Dict[str, jnp.ndarray], rng: jax.Array):
        k_aug, k_step = jax.random.split(rng)
        if mesh is not None:
            img, lab = A.augment_batch_sharded(k_aug, raw["image"],
                                               raw["label"], aug_policy, mesh)
        else:
            img, lab = A.augment_batch_inner(k_aug, raw["image"],
                                             raw["label"], aug_policy)
        batch = {"image": img, "label": lab}
        if keep_orig:
            oi, ol = jax.vmap(lambda i, l: A.center_crop_norm(i, l, crop_hw))(
                raw["image"].astype(jnp.float32), raw["label"])
            half = img.shape[0]
            g = (solver.config.max_style.style_group_size
                 if solver.config.learning.max_style else None)
            if g and 2 * half > g:
                # grouping is active below the full batch: the interleave
                # preconditions must hold, otherwise groups would silently
                # be all-aug / all-orig instead of the documented
                # [G/2 aug | G/2 orig] reference composition — refuse
                # loudly like init_maxstyle does for non-divisible batches
                if g % 2 or half % (g // 2):
                    raise ValueError(
                        f"style_group_size={g} with keep_orig pairing "
                        f"needs an even group that divides both batch "
                        f"halves (half={half}); adjust batch_size or "
                        f"style_group_size")
                batch = {"image": interleave_style_groups(
                             batch["image"], oi[..., None], g),
                         "label": interleave_style_groups(
                             batch["label"], ol, g)}
            else:
                batch = {"image": jnp.concatenate([batch["image"],
                                                   oi[..., None]], 0),
                         "label": jnp.concatenate([batch["label"], ol], 0)}
        return base_step(state, batch, k_step)

    if jit_compile:
        return jax.jit(fused, donate_argnums=(0,))
    return fused


def make_multi_step(solver: TripletSegmentationSolver, aug_policy,
                    keep_orig: bool, n_inner: int = 4):
    """lax.scan over `n_inner` pre-stacked raw batches: one dispatch per
    `n_inner` optimizer steps. Input: raw batches stacked on a leading axis
    ({'image': [K,N,H,W], 'label': [K,N,H,W]})."""
    fused = make_fused_train_step(solver, aug_policy, keep_orig,
                                  jit_compile=False)

    def multi(state: TrainState, raw_stack, rng: jax.Array):
        def body(carry, inp):
            st = carry
            raw, k = inp
            st, metrics = fused(st, raw, k)
            return st, metrics

        keys = jax.random.split(rng, n_inner)
        state, metrics = jax.lax.scan(body, state, (raw_stack, keys))
        # report the mean over the scanned steps
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m), metrics)

    return jax.jit(multi, donate_argnums=(0,))
