"""Building-block Flax modules (NHWC, TPU-friendly).

Re-designed equivalents of the reference building blocks
(/root/reference/src/models/ebm/encoder_decoder.py:22-420 and
/root/reference/src/models/custom_layers.py), with torch-matching
initialization semantics:

* conv kernels: Kaiming-normal fan-in (init_weight.py:52-61 — the solver path
  always re-initializes with ``init_weights(..., 'kaiming')``); biases zero.
* transposed-conv kernels: N(0, 0.02) (encoder_decoder.normal_init:16-18 —
  ConvTranspose2d is NOT matched by the Kaiming pass, which only checks
  nn.Conv2d, so the N(0,0.02) init survives).
* BatchNorm: scale ~ N(1.0, 0.02), bias 0, eps 1e-5, torch momentum 0.1
  (flax momentum 0.9).

Mode protocol: every module takes ``train: bool``. BatchNorm uses batch
statistics when ``train=True`` and running statistics otherwise. The
*frozen-stats* mode of the reference (`_disable_tracking_bn_stats`,
model_util.py:468-510 — batch stats used, running stats not written) is the
caller's responsibility: apply with ``mutable=['batch_stats']`` and discard
the updates (see solver.apply_module).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import SpectralNorm

# ---------------------------------------------------------------------------
# Initializers matching the reference's effective init
# ---------------------------------------------------------------------------

kaiming_normal_fan_in = jax.nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")  # torch kaiming_normal_(a=0, mode='fan_in')


def normal_002(key, shape, dtype=jnp.float32):
    return 0.02 * jax.random.normal(key, shape, dtype)


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


LRELU_SLOPE = 0.2


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


# Perf-experiment knob (scripts/exp_bn_residual.py ONLY — never set in
# production or tests): "torch" = shipped semantics (Bessel-corrected
# running update); "biased" = running update without the n/(n-1) factor;
# "off" = no running update at all. Read at TRACE time — change it before
# building/jitting a model. Exists to MEASURE the throughput attribution
# that docs/ROUND4_RESPONSE.md §2 could previously only hypothesize.
_BN_UPDATE_MODE = "torch"


class BatchNorm(nn.Module):
    """BatchNorm with torch.nn.BatchNorm2d running-stat semantics.

    flax's nn.BatchNorm stores the BIASED batch variance in its running
    average; torch stores the Bessel-corrected (unbiased, n/(n-1)) one
    (torch.nn.BatchNorm2d docs; verified against the reference's own
    executable models in tests/test_reference_base_solver_parity.py). The
    correction is ~1.6% per update on a 4x4 deep feature map, so eval-mode
    behavior measurably drifts without it. Normalization itself uses the
    biased batch variance (both frameworks agree there). Stats are computed
    single-pass in float32 — E[x^2]-mean^2, clamped at 0 — so the input is
    read from HBM once (the two-pass mean((x-mean)^2) form cost a measured
    2.5% of train-step throughput in round 3, docs/VALIDATION.md). With the
    reduction in f32 over bf16/f32 activations in ~[-10, 10], cancellation
    error stays ~1e-6 relative — far inside the 5e-4 torch-parity gates
    (tests/test_torch_import.py, test_reference_executable_parity.py).
    Known limit of the form (shared with flax nn.BatchNorm and XLA's own
    batch-norm expansion, which use the same E[x^2]-E[x]^2): a channel
    with |mean|/std >~ 1e3 (near-constant large-offset activations) loses
    relative variance precision; post-conv pre-BN activations in this
    model family are zero-centered by initialization and stay orders of
    magnitude away from that regime.

    The class name keeps flax's auto-naming ('BatchNorm_0') and the
    param/stat layout ({scale,bias}/{mean,var}) so converted reference
    checkpoints and existing orbax snapshots load unchanged.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones
    use_scale: bool = True
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = (self.param("scale", self.scale_init, (feat,), jnp.float32)
                 if self.use_scale else jnp.ones((feat,), jnp.float32))
        bias = (self.param("bias", nn.initializers.zeros, (feat,),
                           jnp.float32)
                if self.use_bias else jnp.zeros((feat,), jnp.float32))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean), 0.0)
            if not self.is_initializing() and _BN_UPDATE_MODE != "off":
                n = x.size // feat
                m = self.momentum
                bessel = (n / max(n - 1, 1)
                          if _BN_UPDATE_MODE == "torch" else 1.0)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * var * bessel)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class Norm2d(nn.Module):
    """Norm selector: 'batch' (affine BN), 'instance' (no affine, like torch
    nn.InstanceNorm2d defaults), 'instance_affine' (torch InstanceNorm2d
    affine=True — the model_util.replace_bn_with_in:43-62 swap target),
    'batch_instance' / 'batch_instance_noaffine' (the BN_IN=True swap
    target, custom_layers.BatchInstanceNorm2d), or 'none'."""

    kind: str = "batch"
    dtype: Any = None  # compute/output dtype; params + running stats stay f32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "batch":
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=bn_scale_init,
                             dtype=self.dtype)(x)
        if self.kind in ("instance", "instance_affine"):
            xf = x.astype(jnp.float32)  # stats in f32 for half-precision inputs
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.var(xf, axis=(1, 2), keepdims=True)
            out = (xf - mean) / jnp.sqrt(var + 1e-5)
            if self.kind == "instance_affine":
                c = x.shape[-1]
                scale = self.param("scale", nn.initializers.ones, (c,),
                                   jnp.float32)
                bias = self.param("bias", nn.initializers.zeros, (c,),
                                  jnp.float32)
                out = out * scale + bias
            return out.astype(self.dtype or x.dtype)
        if self.kind in ("batch_instance", "batch_instance_noaffine"):
            affine = self.kind == "batch_instance"
            return BatchInstanceNorm(
                affine=affine, track_running_stats=affine,
                dtype=self.dtype)(x, train=train)
        if self.kind == "none":
            return x
        raise ValueError(self.kind)


class DomainSpecificNorm2d(nn.Module):
    """Per-domain BatchNorm (custom_layers.DomainSpecificBatchNorm2d:69-104).

    ``domain_id`` must be a static python int — the reference selects the
    domain per-branch (clean=0, hard-example=1), which is compile-time
    constant inside each jitted branch.
    """

    num_domains: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, domain_id: int = 0, train: bool = True):
        norms = [BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, scale_init=bn_scale_init,
                           dtype=self.dtype, name=f"bn_domain{d}")
                 for d in range(self.num_domains)]
        if self.is_initializing():
            # materialize params/stats for every domain, not just the selected one
            outs = [norm(x) for norm in norms]
            return outs[domain_id]
        return norms[domain_id](x)


def conv3x3(features: int, use_bias: bool = True, name: str | None = None,
            dtype: Any = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), padding=1, use_bias=use_bias,
                   kernel_init=kaiming_normal_fan_in, name=name, dtype=dtype)


def conv1x1(features: int, use_bias: bool = True, name: str | None = None,
            dtype: Any = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), use_bias=use_bias,
                   kernel_init=kaiming_normal_fan_in, name=name, dtype=dtype)


def _align_corners_matrix(h: int) -> jnp.ndarray:
    """[2H, H] bilinear interpolation matrix with align_corners=True
    (torch nn.UpsamplingBilinear2d semantics: out j samples input at
    j*(H-1)/(2H-1)) — NOT jax.image.resize's half-pixel convention."""
    import numpy as np
    ys = np.linspace(0.0, h - 1.0, 2 * h)
    y0 = np.floor(ys).astype(np.int64)
    wgt = ys - y0
    y1 = np.minimum(y0 + 1, h - 1)
    m = np.zeros((2 * h, h), np.float32)
    m[np.arange(2 * h), y0] += 1.0 - wgt
    m[np.arange(2 * h), y1] += wgt
    return jnp.asarray(m)


def upsample2x(x: jnp.ndarray, method: str = "nearest") -> jnp.ndarray:
    n, h, w, c = x.shape
    if method in ("NN", "nearest"):
        return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
    # bilinear, align_corners=True (both reference up families use
    # UpsamplingBilinear2d / Upsample(align_corners=True)); expressed as two
    # small constant-matrix contractions, which XLA maps onto the MXU
    my = _align_corners_matrix(h)
    mx = _align_corners_matrix(w)
    out = jnp.einsum("ph,nhwc->npwc", my, x.astype(jnp.float32))
    out = jnp.einsum("qw,npwc->npqc", mx, out)
    return out.astype(x.dtype)


class Upsampler(nn.Module):
    """Up-sampling front of res_up_family (encoder_decoder.py:294-310):
    NN / bilinear resize, or learned transposed conv (Conv2 = 2x2 stride 2,
    Conv4 = 4x4 stride 2 pad 1). Transposed convs keep the reference's
    N(0, 0.02) init."""

    up_type: str = "NN"
    features: int | None = None  # only needed for Conv2/Conv4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.up_type in ("NN", "bilinear"):
            return upsample2x(x, self.up_type)
        if self.up_type == "Conv2":
            return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                    padding="VALID", kernel_init=normal_002,
                                    dtype=self.dtype)(x)
        if self.up_type == "Conv4":
            return nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                    padding="SAME", kernel_init=normal_002,
                                    dtype=self.dtype)(x)
        raise NotImplementedError(self.up_type)


class FixableDropout(nn.Module):
    """Channel-wise (2D) dropout with an explicit rng stream.

    The reference's Fixable2DDropout (custom_layers.py:9-37) replays its last
    mask when ``lazy_load`` is toggled so hard-example passes see the same
    mask. With explicit keys, replay = passing the same 'dropout' rng; the
    solver threads one dropout key per optimization step.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        if self.rate == 0.0 or deterministic:
            return x
        key = self.make_rng("dropout")
        n, _, _, c = x.shape
        keep = jax.random.bernoulli(key, 1.0 - self.rate, shape=(n, 1, 1, c))
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


def _l2_normalize(x, eps: float = 1e-12):
    # torch F.normalize(dim=0): x / max(||x||, eps)
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


class TorchSNConv3x3(nn.Module):
    """3x3 conv under torch-semantics spectral normalization
    (torch.nn.utils.spectral_norm, n_power_iterations=1).

    ds_res_convdown wraps conv_1 in spectral_norm in BOTH its branches
    (encoder_decoder.py:372 AND :386) — the if_SN=False branch included —
    so the DS_FCN encoder always runs this quirk; we preserve it.

    Faithful to torch (unlike flax.linen.SpectralNorm, used for the if_sn
    path): BOTH u and v persist as state; eval uses them as-is with no
    fresh iteration; a training forward first runs one power iteration
    (v = normalize(W^T u); u = normalize(W v), no grad) and then computes
    sigma = u . (W v) with u, v stopped but W live, so the backward carries
    torch's quotient-rule term d(W/sigma)/dW exactly.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_fan_in,
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param("bias", jax.nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # torch weight_mat: weight (O,I,kh,kw) viewed as (O, I*kh*kw)
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)

        def init_vec(n):
            def init(key):
                return _l2_normalize(jax.random.normal(key, (n,), jnp.float32))
            return init

        u_var = self.variable("batch_stats", "u", init_vec(self.features),
                              self.make_rng("params") if
                              not self.has_variable("batch_stats", "u") else None)
        v_var = self.variable("batch_stats", "v", init_vec(w_mat.shape[1]),
                              self.make_rng("params") if
                              not self.has_variable("batch_stats", "v") else None)
        u, v = u_var.value, v_var.value
        if train:
            w_sg = jax.lax.stop_gradient(w_mat)
            v = _l2_normalize(w_sg.T @ u)
            u = _l2_normalize(w_sg @ v)
            if not self.is_initializing():
                u_var.value, v_var.value = u, v
        sigma = jnp.dot(jax.lax.stop_gradient(u),
                        w_mat @ jax.lax.stop_gradient(v))
        w = kernel / sigma
        if self.dtype is not None:
            x, w, bias = (a.astype(self.dtype) for a in (x, w, bias))
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias


class ResConvDown(nn.Module):
    """Strided-conv residual down block (encoder_decoder.res_convdown:22-74):
    down-conv(s2) -> [conv3-norm-lrelu-conv3-norm] + 1x1(skip) -> lrelu
    -> optional 2D dropout."""

    out_ch: int
    norm: str = "batch"
    dropout: Optional[float] = None
    num_domains: int = 1  # >1 => domain-specific BN (ds_res_convdown:360-420)
    if_sn: bool = False  # spectral-norm every conv (res_convdown if_SN, :29-51)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, domain_id: int = 0,
                 deterministic_dropout: bool = False):
        in_ch = x.shape[-1]

        def make_norm(name):
            if self.num_domains > 1:
                ds = DomainSpecificNorm2d(self.num_domains, dtype=self.dtype,
                                          name=name)
                return lambda v: ds(v, domain_id=domain_id, train=train)
            n2d = Norm2d(self.norm, dtype=self.dtype, name=name)
            return lambda v: n2d(v, train=train)

        def sn(conv):
            # torch's spectral_norm runs one power iteration per training
            # forward; flax's nn.SpectralNorm does the same with
            # update_stats=train (u/sigma live in 'batch_stats').
            if not self.if_sn:
                return conv
            wrapped = SpectralNorm(conv)
            return lambda v: wrapped(v, update_stats=train)

        x = sn(nn.Conv(in_ch, (3, 3), strides=(2, 2), padding=1,
                       kernel_init=kaiming_normal_fan_in, dtype=self.dtype,
                       name="down"))(x)
        if self.num_domains > 1 and not self.if_sn:
            # ds_res_convdown's if_SN=False branch STILL spectral-norms
            # conv_1 (encoder_decoder.py:386) — preserve the quirk with
            # torch-exact semantics.
            h = TorchSNConv3x3(self.out_ch, dtype=self.dtype,
                               name="conv1")(x, train=train)
        else:
            h = sn(conv3x3(self.out_ch, name="conv1", dtype=self.dtype))(x)
        h = make_norm("norm1")(h)
        h = lrelu(h)
        h = sn(conv3x3(self.out_ch, name="conv2", dtype=self.dtype))(h)
        h = make_norm("norm2")(h)
        res = sn(conv1x1(self.out_ch, name="conv_input", dtype=self.dtype))(x) + h
        res = lrelu(res)
        if self.dropout is not None:
            res = FixableDropout(self.dropout)(res, deterministic=deterministic_dropout)
        return res


class ResUp(nn.Module):
    """Residual up block (encoder_decoder.res_up_family:289-357):
    upsample -> [conv3-norm-lrelu-conv3-norm] + 1x1(skip) -> lrelu
    -> optional dropout."""

    out_ch: int
    up_type: str = "NN"
    norm: str = "batch"
    dropout: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, deterministic_dropout: bool = False):
        in_ch = x.shape[-1]
        x = Upsampler(self.up_type, features=in_ch, dtype=self.dtype, name="up")(x)
        h = conv3x3(self.out_ch, name="conv1", dtype=self.dtype)(x)
        h = Norm2d(self.norm, dtype=self.dtype, name="norm1")(h, train=train)
        h = lrelu(h)
        h = conv3x3(self.out_ch, name="conv2", dtype=self.dtype)(h)
        h = Norm2d(self.norm, dtype=self.dtype, name="norm2")(h, train=train)
        res = conv1x1(self.out_ch, name="conv_input", dtype=self.dtype)(x) + h
        res = lrelu(res)
        if self.dropout is not None:
            res = FixableDropout(self.dropout)(res, deterministic=deterministic_dropout)
        return res


class InConv(nn.Module):
    """Input stem of MyEncoder (encoder_decoder.py:440-446):
    conv3-norm-lrelu-conv3-norm (the trailing lrelu is applied by the
    caller, matching the reference forward at :470-471)."""

    out_ch: int
    norm: str = "batch"
    num_domains: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, domain_id: int = 0):
        def make_norm(name):
            if self.num_domains > 1:
                ds = DomainSpecificNorm2d(self.num_domains, dtype=self.dtype,
                                          name=name)
                return lambda v: ds(v, domain_id=domain_id, train=train)
            n2d = Norm2d(self.norm, dtype=self.dtype, name=name)
            return lambda v: n2d(v, train=train)

        x = conv3x3(self.out_ch, name="conv1", dtype=self.dtype)(x)
        x = make_norm("norm1")(x)
        x = lrelu(x)
        x = conv3x3(self.out_ch, name="conv2", dtype=self.dtype)(x)
        x = make_norm("norm2")(x)
        return x


class SqueezeExcite(nn.Module):
    """Channel SE block (custom_layers.ChannelSELayer:107-137)."""

    reduction: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(c // self.reduction, kernel_init=kaiming_normal_fan_in)(s))
        s = nn.sigmoid(nn.Dense(c, kernel_init=kaiming_normal_fan_in)(s))
        return x * s[:, None, None, :]


class SpatialSqueezeExcite(nn.Module):
    """Spatial SE (sSE; custom_layers.SpatialSELayer:140-160)."""

    @nn.compact
    def __call__(self, x):
        s = nn.sigmoid(conv1x1(1)(x))
        return x * s


class ChannelSpatialSqueezeExcite(nn.Module):
    """scSE = max(cSE, sSE) (custom_layers.ChannelSpatialSELayer:163-178)."""

    reduction: int = 2

    @nn.compact
    def __call__(self, x):
        return jnp.maximum(SqueezeExcite(self.reduction)(x),
                           SpatialSqueezeExcite()(x))


class SelfAttention2d(nn.Module):
    """SAGAN-style self-attention (custom_layers.Self_Attn:214-254) with a
    learnable gamma gate initialized at zero."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        q = conv1x1(max(c // 8, 1), name="query")(x).reshape(n, h * w, -1)
        k = conv1x1(max(c // 8, 1), name="key")(x).reshape(n, h * w, -1)
        v = conv1x1(c, name="value")(x).reshape(n, h * w, c)
        attn = jax.nn.softmax(jnp.einsum("nqd,nkd->nqk", q, k,
                                         preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c)
        gamma = self.param("gamma", jax.nn.initializers.zeros, ())
        return gamma * out + x


class AdaptiveInstanceNorm2d(nn.Module):
    """AdaIN with externally-supplied affine params
    (custom_layers.AdaptiveInstanceNorm2d:261-290): instance-normalize, then
    scale/shift with style-derived (gamma, beta)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, gamma, beta):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normed = (x - mean) / jnp.sqrt(var + self.eps)
        return normed * gamma.reshape(x.shape[0], 1, 1, -1) + \
            beta.reshape(x.shape[0], 1, 1, -1)


def spatial_pyramid_pool(x: jnp.ndarray, levels=(1, 2, 4)) -> jnp.ndarray:
    """SPP: concat of adaptively max-pooled grids flattened per sample
    (custom_layers.spatial_pyramid_pool:391-416)."""
    n, h, w, c = x.shape
    outs = []
    for lv in levels:
        kh, kw = -(-h // lv), -(-w // lv)
        pooled = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                       (1, kh, kw, 1), (1, kh, kw, 1), "SAME")
        outs.append(pooled.reshape(n, -1))
    return jnp.concatenate(outs, axis=1)


def bilinear_additive_upsampling(x: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    """Bilinear 2x upsample, then average groups of C/out_ch channels
    (custom_layers.bilinear_additive_upsampling:181-211)."""
    n, h, w, c = x.shape
    assert c % out_ch == 0, (c, out_ch)
    up = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")
    group = c // out_ch
    return up.reshape(n, 2 * h, 2 * w, out_ch, group).mean(axis=-1)


class AdaptiveBatchNorm2d(nn.Module):
    """BN with learnable identity mixing: out = a * BN(x) + b * x
    (custom_layers.AdaptiveBatchNorm2d:296-326; a init 1, b init 0)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        a = self.param("a", jax.nn.initializers.ones, (1,))
        b = self.param("b", jax.nn.initializers.zeros, (1,))
        bn = BatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, scale_init=bn_scale_init)(x)
        return a * bn + b * x


class AdaptiveBatchInstanceNorm(nn.Module):
    """Batch-Instance norm with learnable clamped gate rho
    (custom_layers.BatchInstanceNorm:331-388)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        bn = BatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, use_bias=False, use_scale=False)(x)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        inorm = (x - mean) / jnp.sqrt(var + 1e-5)
        # straight-through projection: clipped value, identity gradient —
        # torch clamps rho.data in-place, so the boundary never kills the
        # gradient (see BatchInstanceNorm.gate below)
        rho_raw = self.param("rho", jax.nn.initializers.ones, (c,))
        rho = rho_raw - jax.lax.stop_gradient(
            rho_raw - jnp.clip(rho_raw, 0.0, 1.0))
        gamma = self.param("gamma", jax.nn.initializers.ones, (c,))
        beta = self.param("beta", jax.nn.initializers.zeros, (c,))
        return (rho * bn + (1.0 - rho) * inorm) * gamma + beta


class BatchInstanceNorm(nn.Module):
    """Batch-Instance Normalization (Nam & Kim, NeurIPS 2018) with the
    reference's exact gating semantics (custom_layers._BatchInstanceNorm:
    331-372): out = BN(x)·(w·g) + b + IN(x)·(w·(1-g)), gate g clamped to
    [0,1] per use, init 1 (pure BN). Dim-generic over channels-last inputs —
    (N,L,C) / (N,H,W,C) / (N,D,H,W,C) — so the reference's three classes
    BatchInstanceNorm{1,2,3}d (custom_layers.py:374-388) collapse to one
    module plus ndim-checking aliases below.

    torch-parity notes: the BN branch updates running stats with the
    Bessel-corrected batch variance (like our `BatchNorm`); with
    ``track_running_stats=False`` both train and eval use batch stats
    (torch F.batch_norm with None running buffers). The IN branch always
    uses per-sample biased stats. The reference CRASHES when constructed
    with ``affine=False`` (custom_layers.py:340 assigns gate=None then :343
    does ``self.gate.data.fill_(1)`` — AttributeError); we keep the gate a
    real parameter in that case so the documented API works.
    """

    affine: bool = True
    track_running_stats: bool = True
    momentum: float = 0.9  # flax convention; == torch momentum 0.1
    epsilon: float = 1e-5
    expected_ndim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.expected_ndim is not None and x.ndim != self.expected_ndim:
            raise ValueError(
                f"expected {self.expected_ndim}D channels-last input "
                f"(got {x.ndim}D)")
        if x.ndim < 3:
            raise ValueError("BatchInstanceNorm needs spatial dims "
                             f"(got {x.ndim}D input)")
        c = x.shape[-1]
        # the reference clamps gate.data IN-PLACE each forward
        # (custom_layers.py:343-ish), so the stored parameter never leaves
        # [0,1] and keeps a live gradient at the boundary. A plain
        # jnp.clip would zero the gradient the moment an optimizer step
        # overshoots the bound and freeze the gate forever; the
        # straight-through projection below uses the clipped VALUE while
        # passing the identity gradient, reproducing the torch dynamics.
        gate_raw = self.param("gate", nn.initializers.ones, (c,),
                              jnp.float32)
        gate = gate_raw - jax.lax.stop_gradient(
            gate_raw - jnp.clip(gate_raw, 0, 1))
        if self.affine:
            w = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        else:
            w, b = jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)

        xf = x.astype(jnp.float32)
        red_bn = tuple(range(x.ndim - 1))
        if self.track_running_stats:
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))
        if train or not self.track_running_stats:
            mean = jnp.mean(xf, axis=red_bn)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=red_bn) - jnp.square(mean), 0.0)
            if (train and self.track_running_stats
                    and not self.is_initializing()):
                n = x.size // c
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * var * (n / max(n - 1, 1)))
        else:
            mean, var = ra_mean.value, ra_var.value
        bn = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)

        red_in = tuple(range(1, x.ndim - 1))
        m_in = jnp.mean(xf, axis=red_in, keepdims=True)
        v_in = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=red_in, keepdims=True)
            - jnp.square(m_in), 0.0)
        inn = (xf - m_in) * jax.lax.rsqrt(v_in + self.epsilon)

        out = bn * (w * gate) + b + inn * (w * (1.0 - gate))
        return out.astype(self.dtype or x.dtype)


class BatchInstanceNorm1d(BatchInstanceNorm):
    """(N, L, C) — custom_layers.BatchInstanceNorm1d:374-377."""
    expected_ndim: Optional[int] = 3


class BatchInstanceNorm2d(BatchInstanceNorm):
    """(N, H, W, C) — custom_layers.BatchInstanceNorm2d:380-382."""
    expected_ndim: Optional[int] = 4


class BatchInstanceNorm3d(BatchInstanceNorm):
    """(N, D, H, W, C) — custom_layers.BatchInstanceNorm3d:385-388."""
    expected_ndim: Optional[int] = 5
