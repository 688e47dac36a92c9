"""Triplet reconstruction/segmentation solver — the method layer.

TPU-native redesign of
/root/reference/src/models/advanced_triplet_recon_segmentation_model.py:41-1101.
The reference is an imperative nn.Module owning a dict of sub-networks,
per-module optimizers, and Python-side training procedures; here the same
capability surface is expressed as:

* `TrainState` — a single pytree {params, batch_stats, opt_states, step}
  with one entry per sub-module ({image_encoder, segmentation_decoder,
  [image_decoder], [shape_encoder], [shape_decoder]}), mirroring the
  reference's module dict so per-module optimizers (set_optimizers
  :1055-1068) and per-module checkpoints (:936-948) map 1:1.
* pure functions (`standard_training`, `generate_max_style_image`,
  `hard_example_training`, …) that thread (params, batch_stats) explicitly.
* ONE jitted train step per experiment config: every enabled method branch —
  including the 5-step MaxStyle inner adversarial loop — compiles into a
  single XLA program (`make_train_step`).

BatchNorm mode choreography (the reference's #1 correctness trap,
model_util._disable_tracking_bn_stats:468-510) becomes explicit:
  mode='train'  — batch stats used, running stats committed;
  mode='frozen' — batch stats used, running-stat updates DISCARDED;
  mode='eval'   — running stats used.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from maxstyle_tpu import losses, prng
from maxstyle_tpu.config import ExperimentConfig, MaxStyleConfig
from maxstyle_tpu.models.registry import NetworkSpec, build_modules, parse_network_type
from maxstyle_tpu.models.encoder_decoder import decoder_style_channels
from maxstyle_tpu.ops import maxstyle as ms
from maxstyle_tpu.ops.intensity import intensity_norm_fn


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_states: Any
    step: jnp.ndarray

    def module_names(self):
        return list(self.params.keys())


@struct.dataclass
class ForwardAux:
    """Intermediate tensors a training branch may reuse (the reference caches
    these on `self`: z_i/z_s at :753-754, recon_image at :766)."""

    z_i: Any
    z_s: Any
    recon_image: Optional[jnp.ndarray]
    y0: jnp.ndarray
    p_recon: Optional[jnp.ndarray]


def make_optimizer(optimizer_type: str, lr: float,
                   steps_per_epoch: Optional[int] = None,
                   n_epochs: int = 600) -> optax.GradientTransformation:
    """Per-module optimizer factory (advanced_triplet…:1055-1068), with
    torch-default hyperparameters. SGD gets the reference's StepLR(5, 0.5)
    schedule (set_schedulers :1070-1077) when steps_per_epoch is known."""
    if optimizer_type == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if optimizer_type == "AdamW":
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    if optimizer_type == "SGD":
        rate = lr
        if steps_per_epoch:
            from maxstyle_tpu.utils.ema import make_lr_schedule
            rate = make_lr_schedule("step", lr, lr_decay_epochs=5,
                                    steps_per_epoch=steps_per_epoch,
                                    total_epochs=n_epochs)
        return optax.sgd(rate, momentum=0.99)
    raise NotImplementedError(optimizer_type)


def construct_input(segmentation: jnp.ndarray, image: Optional[jnp.ndarray],
                    num_classes: int, apply_softmax: bool, is_labelmap: bool,
                    temperature: float = 2.0, smooth_label: bool = False,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
    """STN input builder (basic_operations.construct_input:124-173):
    temperature-softened softmax for logits, one-hot (optionally smoothed)
    for label maps, optional image concat along channels."""
    if is_labelmap:
        seg = losses.one_hot(segmentation.astype(jnp.int32), num_classes)
        if smooth_label:
            assert key is not None
            alpha = jax.random.uniform(key) * 0.1
            seg = (1 - alpha) * seg + alpha / num_classes
        seg = jax.lax.stop_gradient(seg)
    elif apply_softmax:
        seg = jax.nn.softmax(segmentation / temperature, axis=-1)
    else:
        seg = segmentation
    if image is not None:
        return jnp.concatenate([seg, jax.lax.stop_gradient(image)], axis=-1)
    return seg


class TripletSegmentationSolver:
    """Owns module definitions + static config; all compute is in pure
    functions over TrainState fields."""

    def __init__(self, config: ExperimentConfig, image_ch: int = 1,
                 maxstyle_backend: str = "auto"):
        """maxstyle_backend: 'jnp' (XLA-fused reference impl), 'pallas'
        (fused TPU kernels, ops/maxstyle_pallas.py), or 'auto' (pallas on
        TPU, jnp elsewhere)."""
        self.config = config
        self.image_ch = image_ch
        # tolerant probe: a transient tunnel-init failure must not kill the
        # constructor (it only picks defaults here; see utils/backend.py)
        from .utils.backend import on_tpu as _on_tpu
        on_tpu = _on_tpu()
        if maxstyle_backend == "auto":
            maxstyle_backend = "pallas" if on_tpu else "jnp"
        self.maxstyle_backend = maxstyle_backend
        # mixed precision: bf16 activations on TPU (MXU-native), f32 params/
        # optimizer/BN stats everywhere (flax param_dtype default + BN
        # force_float32_reductions)
        cd = config.learning.compute_dtype
        if cd == "auto":
            self.compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
        elif cd in ("bfloat16", "bf16"):
            self.compute_dtype = jnp.bfloat16
        elif cd in ("float32", "f32"):
            self.compute_dtype = jnp.float32
        else:
            raise ValueError(f"compute_dtype {cd}")
        module_dtype = (None if self.compute_dtype == jnp.float32
                        else self.compute_dtype)
        self.num_classes = config.segmentation_model.num_classes
        self.spec: NetworkSpec = parse_network_type(
            config.segmentation_model.network_type,
            config.data.intensity_norm_type)
        self.modules = build_modules(
            self.spec, image_ch=image_ch, num_classes=self.num_classes,
            encoder_dropout=config.learning.encoder_dropout,
            decoder_dropout=config.learning.decoder_dropout,
            image_size=config.crop_hw[0], dtype=module_dtype)
        self.tx = make_optimizer(config.learning.optimizer_type, config.learning.lr)
        self.class_weights = config.learning.class_weights
        self.rec_loss_type = config.learning.rec_loss_type
        self.temperature = 2.0  # advanced_triplet…:87

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array, image_hw: Optional[Tuple[int, int]] = None,
                   batch_size: int = 2) -> TrainState:
        h, w = image_hw if image_hw is not None else self.config.crop_hw
        x = jnp.zeros((batch_size, h, w, self.image_ch))
        params: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}
        keys = prng.split_dict(rng, tuple(self.modules.keys()))

        enc = self.modules["image_encoder"]
        enc_vars = jax.jit(partial(enc.init, train=False))(keys["image_encoder"], x)
        params["image_encoder"] = enc_vars["params"]
        stats["image_encoder"] = enc_vars.get("batch_stats", {})
        # template latent codes drive decoder initialization (handles both
        # single-tensor FCN codes and Unet skip-feature pyramids)
        z, z_s_tpl = jax.eval_shape(partial(enc.apply, enc_vars, train=False), x)
        z_i_tpl, z_s_tpl = self._route_codes(z, z_s_tpl)

        def zeros_like_shape(t):
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), t)

        z_i0 = zeros_like_shape(z_i_tpl)
        z_s0 = zeros_like_shape(z_s_tpl)

        for name, module in self.modules.items():
            if name == "image_encoder":
                continue
            if name == "shape_encoder":
                c = self.num_classes
                if self.spec.shape_input_mode in ("w_image", "w_recon_image"):
                    c += self.image_ch
                elif self.spec.shape_input_mode == "w_dual_image":
                    c += 2 * self.image_ch
                arg = jnp.zeros((batch_size, h, w, c))
            elif name == "shape_decoder":
                lh, lw = h // 16, w // 16
                arg = jnp.zeros((batch_size, lh, lw, self.spec.latent_ch))
            elif name == "segmentation_decoder":
                arg = z_s0
            else:  # image_decoder
                arg = z_i0
            variables = jax.jit(partial(module.init, train=False))(keys[name], arg)
            params[name] = variables["params"]
            stats[name] = variables.get("batch_stats", {})
        opt_states = {name: self.tx.init(params[name]) for name in params}
        return TrainState(params=params, batch_stats=stats, opt_states=opt_states,
                          step=jnp.zeros((), jnp.int32))

    def _route_codes(self, z, z_s):
        """(z, filtered) -> (z_i, z_s) per the network_type routing
        (advanced_triplet…filter_code:347-385)."""
        if self.spec.is_unet:
            z_i = z if "Unet_im_recon" in self.spec.network_type else z[-1]
            return z_i, z_s
        if self.spec.no_filter:
            return z, z
        z_i = z_s if self.spec.share_code else z
        return z_i, z_s

    # ------------------------------------------------------------------
    # module application with BN-mode choreography
    # ------------------------------------------------------------------

    def apply_module(self, name: str, params, stats, *args, mode: str = "train",
                     method=None, rngs=None, **kwargs):
        """Returns (out, stats') where stats' reflects mode semantics."""
        module = self.modules[name]
        variables = {"params": params[name]}
        has_stats = bool(stats.get(name))
        if has_stats:
            variables["batch_stats"] = stats[name]
        if mode == "eval":
            out = module.apply(variables, *args, train=False, method=method, **kwargs)
            return out, stats
        if mode not in ("train", "frozen"):
            raise ValueError(mode)
        out, upd = module.apply(variables, *args, train=True,
                                mutable=["batch_stats"] if has_stats else [],
                                method=method, rngs=rngs, **kwargs)
        if mode == "train" and has_stats:
            stats = {**stats, name: upd["batch_stats"]}
        return out, stats

    # ------------------------------------------------------------------
    # forward paths
    # ------------------------------------------------------------------

    def encode_image(self, params, stats, x, *, mode: str, domain_id: int = 0,
                     rngs=None):
        """z from the general encoder, then (z_i, z_s) per the network_type
        variants (advanced_triplet…:330-385)."""
        enc = self.modules["image_encoder"]
        z, stats = self.apply_module("image_encoder", params, stats, x,
                                     mode=mode, method=enc.encode,
                                     domain_id=domain_id, rngs=rngs)
        return self.filter_code(params, stats, z, mode=mode, rngs=rngs)

    def filter_code(self, params, stats, z, *, mode: str, rngs=None):
        enc = self.modules["image_encoder"]
        if self.spec.is_unet:
            if self.spec.unet_code_filter:
                z_s, stats = self.apply_module("image_encoder", params, stats, z,
                                               mode=mode, method=enc.filter_code,
                                               rngs=rngs)
            else:
                z_s = z
            return self._route_codes(z, z_s), stats
        if self.spec.no_filter:
            return (z, z), stats
        z_s, stats = self.apply_module("image_encoder", params, stats, z,
                                       mode=mode, method=enc.filter_code, rngs=rngs)
        return self._route_codes(z, z_s), stats

    def decode(self, name: str, params, stats, code, *, mode: str, rngs=None,
               style_fns=None, **extra):
        kwargs = dict(extra)
        if style_fns is not None:
            kwargs["style_fns"] = style_fns
        return self.apply_module(name, params, stats, code, mode=mode,
                                 rngs=rngs, **kwargs)

    def recon_shape(self, params, stats, seg, *, is_label_map: bool,
                    image=None, recon_image=None, mode: str,
                    separate_training: Optional[bool] = None, rngs=None):
        """STN refinement S' = STN(S) (advanced_triplet…:403-429)."""
        if not self.spec.has_stn:
            return seg, stats
        if separate_training is None:
            separate_training = self.config.learning.separate_training
        if separate_training and not is_label_map:
            seg = jax.lax.stop_gradient(seg)
        mode_in = self.spec.shape_input_mode
        if mode_in == "w_image":
            img = image
        elif mode_in == "w_recon_image":
            img = recon_image
        elif mode_in == "w_dual_image":
            img = jnp.concatenate([image, recon_image], axis=-1)
        else:
            img = None
        inp = construct_input(seg, img, self.num_classes,
                              apply_softmax=not is_label_map,
                              is_labelmap=is_label_map,
                              temperature=self.temperature)
        code, stats = self.apply_module("shape_encoder", params, stats, inp,
                                        mode=mode, rngs=rngs)
        shape, stats = self.apply_module("shape_decoder", params, stats, code,
                                         mode=mode, rngs=rngs)
        return shape, stats

    # ------------------------------------------------------------------
    # standard training loss (advanced_triplet…:731-786)
    # ------------------------------------------------------------------

    def standard_training(self, params, stats, clean_image, label,
                          perturbed_image, *, mode: str = "train",
                          domain_id: int = 0, compute_gt_recon: bool = True,
                          rngs=None):
        zero = jnp.zeros(())
        (z_i, z_s), stats = self.encode_image(params, stats, perturbed_image,
                                              mode=mode, domain_id=domain_id,
                                              rngs=rngs)
        y0, stats = self.decode("segmentation_decoder", params, stats, z_s,
                                mode=mode, rngs=rngs)
        seg_loss = losses.cross_entropy_2d(y0, label, weight=self.class_weights)

        if self.spec.has_image_recon:
            recon, stats = self.decode("image_decoder", params, stats, z_i,
                                       mode=mode, rngs=rngs)
            image_recon_loss = losses.image_recon_loss(recon, clean_image,
                                                       self.rec_loss_type)
        else:
            recon = None
            image_recon_loss = zero

        if self.spec.has_stn:
            if compute_gt_recon:
                gt_recon, stats = self.recon_shape(
                    params, stats, label, is_label_map=True,
                    image=perturbed_image, recon_image=recon, mode=mode, rngs=rngs)
                gt_shape_loss = losses.cross_entropy_2d(gt_recon, label,
                                                        weight=self.class_weights)
            else:
                gt_shape_loss = zero
            p_recon, stats = self.recon_shape(
                params, stats, y0, is_label_map=False,
                image=perturbed_image, recon_image=recon, mode=mode, rngs=rngs)
            pred_shape_loss = losses.cross_entropy_2d(p_recon, label,
                                                      weight=self.class_weights)
        else:
            gt_shape_loss, pred_shape_loss = zero, zero
            p_recon = y0

        aux = ForwardAux(z_i=z_i, z_s=z_s, recon_image=recon, y0=y0, p_recon=p_recon)
        return (seg_loss, image_recon_loss, gt_shape_loss, pred_shape_loss), aux, stats

    # ------------------------------------------------------------------
    # hard-example training (advanced_triplet…:843-889)
    # ------------------------------------------------------------------

    def hard_example_training(self, params, stats, perturbed_image, clean_image,
                              label, perturbed_seg=None, standard_input_image=None,
                              standard_recon_image=None, rngs=None):
        zero = jnp.zeros(())
        if self.spec.num_domains > 1:  # DS_FCN: domain-1 stats ARE tracked
            mode, domain_id = "train", 1
        else:
            mode, domain_id = "frozen", 0

        if perturbed_image is not None:
            norm = intensity_norm_fn(self.config.data.intensity_norm_type)
            perturbed_image = jax.lax.stop_gradient(norm(perturbed_image))
            (seg_loss, recon_loss, _, shape_loss), _, stats = self.standard_training(
                params, stats, clean_image, label, perturbed_image,
                mode=mode, domain_id=domain_id, compute_gt_recon=False, rngs=rngs)
        else:
            seg_loss, recon_loss, shape_loss = zero, zero, zero

        if self.spec.has_stn and perturbed_seg is not None:
            p_recon, stats = self.recon_shape(
                params, stats, perturbed_seg, is_label_map=False,
                image=standard_input_image, recon_image=standard_recon_image,
                mode=mode, rngs=rngs)
            perturbed_recon_loss = losses.basic_loss_fn(p_recon, label,
                                                        loss_type="cross entropy")
        else:
            perturbed_recon_loss = zero
        return (seg_loss, recon_loss, shape_loss, perturbed_recon_loss), stats

    # ------------------------------------------------------------------
    # MaxStyle generation — the inner adversarial loop
    # (advanced_triplet…:458-571, compiled to a lax.scan)
    # ------------------------------------------------------------------

    def generate_max_style_image(self, params, stats, image_code, *,
                                 reference_segmentation, ms_cfg: MaxStyleConfig,
                                 rng: jax.Array, rngs=None, style_init=None,
                                 return_style: bool = False):
        """Style-augmented reconstruction via adversarial optimization of the
        per-batch style parameters {lmda, eps_gamma, eps_beta}.

        Model parameters and BN stats are constants here (the reference
        freezes grads + BN stats, :508-527); the inner Adam(lr) optimizes
        only the style pytree by jax.grad of -CE(seg(dec(style)), label).
        The stat spreads gamma_std/beta_std are cached from the FIRST decode
        and frozen across iterations, matching MaxStyle's lazy stat caching.
        Returns stop_gradient(stylized image).
        """
        sg = jax.lax.stop_gradient
        p_sg = jax.tree_util.tree_map(sg, params)
        s_sg = jax.tree_util.tree_map(sg, stats)
        code = sg(image_code)
        indexes = tuple(ms_cfg.decoder_layers_indexes)
        if len(indexes) == 0:
            recon, _ = self.decode("image_decoder", p_sg, s_sg, code, mode="frozen",
                                   rngs=rngs)
            return (sg(recon), None) if return_style else sg(recon)

        chans = decoder_style_channels(self.spec.feature_reduce, self.image_ch)
        batch = jax.tree_util.tree_leaves(code)[0].shape[0]
        if style_init is not None:
            # test/demo hook: inject fixed per-layer style parameters/state
            # (mirrors overwriting the reference MaxStyle modules' .data)
            style_params, style_state = style_init
            style_params = {idx: style_params[idx] for idx in indexes}
            style_state = {idx: style_state[idx] for idx in indexes}
        else:
            keys = jax.random.split(rng, len(indexes))
            style_params = {}
            style_state = {}
            for k, idx in zip(keys, indexes):
                sp, st = ms.init_maxstyle(k, batch, chans[idx], ms_cfg)
                style_params[idx] = sp
                style_state[idx] = st
        lmask = ms.learnable_mask(ms_cfg)

        if self.maxstyle_backend == "pallas":
            from maxstyle_tpu.ops.maxstyle_pallas import apply_maxstyle_pallas
            apply_style = apply_maxstyle_pallas
        else:
            apply_style = ms.apply_maxstyle

        # hoist the style-independent decoder prefix out of the inner loop:
        # with hooks at e.g. [3,4,5], up1..up3 never see a style op, so we
        # compute them ONCE and rerun only the suffix per Adam iteration
        # (the reference re-decodes the whole path every iteration,
        # advanced_triplet…:530-552). Only the plain Decoder supports the
        # split; Unet/UNETR image decoders fall back to full decodes.
        from maxstyle_tpu.models.encoder_decoder import Decoder as _PlainDecoder
        min_idx = min(indexes)
        split = (min_idx > 0
                 and isinstance(self.modules.get("image_decoder"), _PlainDecoder))
        if split:
            prefix, _ = self.decode("image_decoder", p_sg, s_sg, code,
                                    mode="frozen", rngs=rngs,
                                    stop_before_hook=min_idx)
            prefix = sg(prefix)

        def decode_with_styles(sp, st):
            new_st = dict(st)

            def make_hook(idx):
                def hook(x):
                    out, s2 = apply_style(x, sp[idx], st[idx], ms_cfg)
                    new_st[idx] = s2
                    return out
                return hook

            style_fns = {idx: make_hook(idx) for idx in indexes}
            if split:
                recon, _ = self.decode("image_decoder", p_sg, s_sg, prefix,
                                       mode="frozen", rngs=rngs,
                                       style_fns=style_fns,
                                       start_at_hook=min_idx)
            else:
                recon, _ = self.decode("image_decoder", p_sg, s_sg, code,
                                       mode="frozen", rngs=rngs,
                                       style_fns=style_fns)
            return recon, new_st

        # first decode caches the stat spreads
        recon0, style_state = decode_with_styles(style_params, style_state)

        optimize = (ms_cfg.mix_style and ms_cfg.mix_learnable) or \
                   (ms_cfg.noise_learnable and not ms_cfg.no_noise)
        if ms_cfg.n_iter <= 0 or not optimize:
            return (sg(recon0), style_params) if return_style else sg(recon0)

        inner_tx = optax.adam(ms_cfg.lr)
        inner_opt = inner_tx.init(style_params)

        def inner_loss(sp):
            recon, _ = decode_with_styles(sp, style_state)
            (_, z_s2), _ = self.encode_image(p_sg, s_sg, recon, mode="frozen",
                                             rngs=rngs)
            pred, _ = self.decode("segmentation_decoder", p_sg, s_sg, z_s2,
                                  mode="frozen", rngs=rngs)
            total = 0.0
            for l_w, ltype in zip(ms_cfg.loss_weights, ms_cfg.loss_types):
                if ltype == "seg":
                    l = -losses.basic_loss_fn(pred, reference_segmentation,
                                              loss_type="cross entropy",
                                              class_weights=self.class_weights)
                else:
                    raise ValueError(f"maxstyle loss type {ltype}")
                total = total + l_w * l
            return total

        def body(carry, _):
            sp, opt_state = carry
            grads = jax.grad(inner_loss)(sp)
            grads = {idx: jax.tree_util.tree_map(
                lambda g, m: g * m, g_idx, lmask)
                for idx, g_idx in grads.items()}
            updates, opt_state = inner_tx.update(grads, opt_state, sp)
            sp = optax.apply_updates(sp, updates)
            return (sp, opt_state), None

        unroll = max(1, min(int(getattr(ms_cfg, "inner_unroll", 1)),
                            ms_cfg.n_iter))
        (style_params, _), _ = jax.lax.scan(body, (style_params, inner_opt),
                                            None, length=ms_cfg.n_iter,
                                            unroll=unroll)
        recon, _ = decode_with_styles(style_params, style_state)
        return (sg(recon), style_params) if return_style else sg(recon)

    # ------------------------------------------------------------------
    # MixStyle / DSU encoder replay (advanced_triplet…:632-670)
    # ------------------------------------------------------------------

    def generate_style_augmented_latent_code(self, params, stats, image, *,
                                             layers_indexes=(1, 2, 3),
                                             mix: str = "random", p: float = 0.5,
                                             lmda=None, perm=None,
                                             rng: jax.Array, rngs=None):
        """Replay the encoder with MixStyle/DSU injected after the chosen
        layers (1=after stem, 2..5=after down1..4, 6=after final act), BN
        stats frozen; returns (z_i, z_s)."""
        x = jax.lax.stop_gradient(image)
        cfg = ms.MixStyleConfig(p=p, alpha=0.1, mix=mix, lmda=lmda, perm=perm)
        enc = self.modules["image_encoder"]

        def make_hook(idx):
            k = jax.random.fold_in(rng, idx)

            def hook(v):
                return ms.apply_mixstyle(k, v, cfg)
            return hook

        style_fns = {i: make_hook(i) for i in layers_indexes}
        z, _ = self.apply_module("image_encoder", params, stats, x,
                                 mode="frozen", method=enc.encode,
                                 style_fns=style_fns, rngs=rngs)
        (z_i, z_s), _ = self.filter_code(params, stats, z, mode="frozen", rngs=rngs)
        return z_i, z_s

    # ------------------------------------------------------------------
    # latent-space hard example generation (LSM; advanced_triplet…:788-841)
    # ------------------------------------------------------------------

    def hard_example_generation(self, params, stats, clean_image, label,
                                z_i, z_s, *, lda_cfg, rng: jax.Array, rngs=None):
        """Mask z_i -> decode corrupted image; mask z_s -> decode corrupted
        segmentation (both with frozen BN stats). Returns
        (perturbed_image or None, perturbed_seg or None)."""
        from maxstyle_tpu.ops import latent_masking as lm
        sg = jax.lax.stop_gradient
        p_sg = jax.tree_util.tree_map(sg, params)
        perturbed_image = None
        perturbed_seg = None
        k_img, k_seg = jax.random.split(rng)

        if lda_cfg.mask_image_code and self.spec.has_image_recon:
            c = lda_cfg.image_code

            def dec_img(code):
                out, _ = self.decode("image_decoder", p_sg, stats, code,
                                     mode="frozen", rngs=rngs)
                return out

            masked, _ = lm.perturb_latent_code(
                sg(z_i), dec_img, sg(clean_image), num_classes=self.num_classes,
                perturb_type=c.mask_type, threshold=c.max_threshold,
                if_soft=c.if_soft, random_threshold=c.random_threshold,
                loss_type=c.loss_name, if_detach=True, key=k_img)
            perturbed_image, _ = self.decode("image_decoder", p_sg, stats,
                                             sg(masked), mode="frozen", rngs=rngs)
            perturbed_image = sg(perturbed_image)

        if lda_cfg.mask_shape_code:
            c = lda_cfg.shape_code

            def dec_seg(code):
                out, _ = self.decode("segmentation_decoder", p_sg, stats, code,
                                     mode="frozen", rngs=rngs)
                return out

            masked, _ = lm.perturb_latent_code(
                sg(z_s), dec_seg, label, num_classes=self.num_classes,
                perturb_type=c.mask_type, threshold=c.max_threshold,
                if_soft=c.if_soft, random_threshold=c.random_threshold,
                loss_type=c.loss_name, if_detach=True, key=k_seg)
            perturbed_seg, _ = self.decode("segmentation_decoder", params, stats,
                                           sg(masked), mode="frozen", rngs=rngs)
        return perturbed_image, perturbed_seg

    # ------------------------------------------------------------------
    # full forward (advanced_triplet…run:310-328)
    # ------------------------------------------------------------------

    def run(self, params, stats, image, *, mode: str = "train",
            normalize_input: bool = False, rngs=None):
        """Returns (recon_image, init_predict, refined_predict, stats)."""
        if normalize_input:
            norm = intensity_norm_fn(self.config.data.intensity_norm_type)
            image = norm(image)
        (z_i, z_s), stats = self.encode_image(params, stats, image, mode=mode,
                                              rngs=rngs)
        y0, stats = self.decode("segmentation_decoder", params, stats, z_s,
                                mode=mode, rngs=rngs)
        recon = None
        if self.spec.has_image_recon:
            recon, stats = self.decode("image_decoder", params, stats, z_i,
                                       mode=mode, rngs=rngs)
        refined = y0
        if self.spec.has_stn:
            refined, stats = self.recon_shape(params, stats, y0,
                                              is_label_map=False, image=image,
                                              recon_image=recon, mode=mode,
                                              rngs=rngs)
        return recon, y0, refined, stats

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def predict(self, params, stats, image, *, softmax: bool = False,
                n_iter: int = 1, normalize_input: bool = True):
        """Inference forward (advanced_triplet…:673-691): eval-mode BN, FTN
        output for n_iter<=1 else STN refinement."""
        if normalize_input:
            norm = intensity_norm_fn(self.config.data.intensity_norm_type)
            image = norm(image)
        (z_i, z_s), _ = self.encode_image(params, stats, image, mode="eval")
        y0, _ = self.decode("segmentation_decoder", params, stats, z_s, mode="eval")
        pred = y0
        if self.spec.has_stn and n_iter > 1:
            recon = None
            if self.spec.has_image_recon:
                recon, _ = self.decode("image_decoder", params, stats, z_i, mode="eval")
            pred, _ = self.recon_shape(params, stats, y0, is_label_map=False,
                                       image=image, recon_image=recon, mode="eval",
                                       separate_training=False)
        if softmax:
            pred = jax.nn.softmax(pred, axis=-1)
        return pred
