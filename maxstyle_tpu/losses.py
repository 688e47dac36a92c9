"""Segmentation / reconstruction / consistency losses (pure jnp, NHWC).

Functional re-implementations of the reference loss surface
(/root/reference/src/models/custom_loss.py) with the exact reduction and
weighting semantics, but in TPU-native NHWC layout and free of per-call module
construction (the reference builds fresh Sobel conv modules on every call —
here the filters are compile-time constants that XLA folds).

Conventions:
  * logits: float [N, H, W, C]
  * hard labels: int [N, H, W]
  * soft targets: float [N, H, W, C] (logits unless `is_gt=True`)
  * masks: [N, H, W, 1] (broadcastable), 0 entries are excluded from the sum
    but (matching custom_loss.py:1076-1078) the denominator stays N*H*W.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np



def _f32(x):
    """Losses are computed in float32: under the bf16 mixed-precision policy
    model outputs arrive as bfloat16 and log/softmax/reduction numerics must
    not run at half precision."""
    if x is not None and hasattr(x, "dtype") and x.dtype != jnp.float32 \
            and jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(jnp.float32)
    return x

def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[N, H, W] int -> [N, H, W, C] float one-hot."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def _normalized_class_weights(weight, num_classes: int) -> jnp.ndarray:
    """Reference normalizes weights to sum to C (custom_loss.py:1072-1075)."""
    w = jnp.asarray(weight, dtype=jnp.float32)
    return w / (jnp.sum(w) * 1.0) * num_classes


def cross_entropy_2d(logits: jnp.ndarray, target: jnp.ndarray, weight=None,
                     size_average: bool = True, mask: jnp.ndarray | None = None,
                     is_gt: bool = False) -> jnp.ndarray:
    """Pixelwise CE supporting hard labels and soft (logit or prob) targets.

    Mirrors custom_loss.cross_entropy_2D (custom_loss.py:1043-1105): the
    denominator under `size_average` is always N*H*W (the mask's numel), not
    the mask sum.
    """
    logits, target = _f32(logits), _f32(target)
    n, h, w, c = logits.shape
    log_p = jax.nn.log_softmax(logits, axis=-1)
    denom = float(n * h * w)
    if mask is None:
        mask = jnp.ones((n, h, w, 1), dtype=logits.dtype)
    else:
        mask = mask.reshape(n, h, w, 1).astype(logits.dtype)
    mask = jax.lax.stop_gradient(mask)

    if target.ndim == 3:  # hard labels
        tgt = jax.lax.stop_gradient(target)
        picked = jnp.take_along_axis(log_p, tgt[..., None].astype(jnp.int32), axis=-1)
        nll = -picked  # [N,H,W,1]
        if weight is not None:
            wvec = _normalized_class_weights(weight, c)
            nll = nll * wvec[tgt][..., None]
        loss = jnp.sum(nll * mask)
        if size_average:
            loss = loss / denom
        return loss

    if target.ndim == 4:  # soft targets
        q = target if is_gt else jax.nn.softmax(target, axis=-1)
        if weight is None:
            plogq = jnp.sum(q * log_p * mask)
        else:
            wvec = _normalized_class_weights(weight, c)
            plogq = jnp.sum(q * log_p * mask * wvec.reshape(1, 1, 1, c))
        if size_average:
            plogq = plogq / denom
        return -plogq

    raise NotImplementedError(f"bad target rank {target.ndim}")


def soft_dice_loss(logits: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                   weight=None, mask: jnp.ndarray | None = None, is_gt: bool = False,
                   squared_union: bool = False, class_ids: Sequence[int] | None = None,
                   smooth: float = 0.01) -> jnp.ndarray:
    """Soft Dice (custom_loss.SoftDiceLoss:546-600 / SelectiveSoftDiceLoss:604-645).

    `class_ids` selects a class subset ("foreground dice"); when set, the
    smooth term moves outside the per-class sums to match the selective
    variant's arithmetic.
    """
    logits, target = _f32(logits), _f32(target)
    b = logits.shape[0]
    probs = jax.nn.softmax(logits, axis=-1)
    if target.ndim == logits.ndim - 1:
        # integer label map, 2D [B,H,W] or 3D [B,D,H,W]
        # (SoftDiceLoss3D:589-623 is this same arithmetic over NDHW)
        tgt = one_hot(target, num_classes)
    else:
        tgt = target if is_gt else jax.nn.softmax(target, axis=-1)
    if mask is not None:
        probs = probs * mask
        tgt = tgt * mask
    p = probs.reshape(b, -1, num_classes)
    t = tgt.reshape(b, -1, num_classes)
    if class_ids is not None:
        idx = jnp.asarray(list(class_ids))
        p = p[:, :, idx]
        t = t[:, :, idx]
        inter = jnp.sum(p * t, axis=1)
        if squared_union:
            union = jnp.sum(p**2, axis=1) + jnp.sum(t**2, axis=1)
        else:
            union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
        score = jnp.sum((2.0 * inter + smooth) / (union + smooth))
        return 1.0 - score / (float(b) * float(len(list(class_ids))))
    inter = jnp.sum(p * t, axis=1) + smooth
    if squared_union:
        union = jnp.sum(p**2, axis=1) + jnp.sum(t**2, axis=1) + smooth
    else:
        union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth
    if weight is not None:
        # Reference SoftDiceLoss accepts weight but does not use it in the
        # published call sites; keep unweighted arithmetic.
        pass
    score = jnp.sum(2.0 * inter / union)
    return 1.0 - score / (float(b) * float(num_classes))


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray, gamma: float = 2.0,
               alpha=None, size_average: bool = True) -> jnp.ndarray:
    """Focal loss (custom_loss.FocalLoss:412-445). `pt` is detached, matching
    the reference's `Variable(logpt.data.exp())`."""
    logits = _f32(logits)
    c = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(log_p, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    if alpha is not None:
        avec = jnp.asarray(alpha, dtype=logits.dtype)
        if avec.ndim == 0:
            avec = jnp.stack([avec, 1.0 - avec])
        logpt = logpt * avec[target]
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def entropy_loss_probs(probs: jnp.ndarray, base=2, normalize: bool = False,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Entropy of probabilistic maps (custom_loss.entropy_loss:664-689)."""
    n, h, w, c = probs.shape
    if mask is None:
        denom = float(n * h * w)
    else:
        denom = jnp.sum(mask)
    if base == 2:
        emap = probs * jnp.log2(probs + 1e-30)
        loss = -jnp.sum(emap) / denom
        if normalize:
            loss = loss / np.log2(c)
    else:
        emap = probs * jnp.log(probs + 1e-30)
        loss = -jnp.sum(emap) / denom
        if normalize:
            loss = loss / np.log(c)
    return loss


def entropy_loss_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pixel softmax entropy (custom_loss.EntropyLoss:346-361)."""
    p = jax.nn.softmax(logits, axis=-1)
    ent = -jnp.sum(p * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return jnp.mean(ent)


# ---------------------------------------------------------------------------
# Sobel gradients / contour losses
# ---------------------------------------------------------------------------

_SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=np.float32)
_SOBEL_Y = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float32)


def _dense_sobel(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (all-channels-to-all-channels) Sobel conv, padding SAME.

    The reference builds a DENSE conv whose every (out, in) tap is the Sobel
    kernel (custom_loss.py:1155-1175), i.e. each output channel sees the sum
    of Sobel responses over all input channels. We reproduce that by summing
    over channels once and broadcasting — C× fewer FLOPs, identical result.
    """
    c = x.shape[-1]
    summed = jnp.sum(x, axis=-1, keepdims=True)  # [N,H,W,1]
    kx = _SOBEL_X.reshape(3, 3, 1, 1)
    ky = _SOBEL_Y.reshape(3, 3, 1, 1)
    dn = jax.lax.conv_dimension_numbers(summed.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    gx = jax.lax.conv_general_dilated(summed, jnp.asarray(kx), (1, 1), "SAME", dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(summed, jnp.asarray(ky), (1, 1), "SAME", dimension_numbers=dn)
    return jnp.broadcast_to(gx, x.shape[:-1] + (c,)), jnp.broadcast_to(gy, x.shape[:-1] + (c,))


def _depthwise_sobel(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Sobel gradients (depthwise), padding SAME."""
    c = x.shape[-1]
    kx = jnp.asarray(np.tile(_SOBEL_X.reshape(3, 3, 1, 1), (1, 1, 1, c)))
    ky = jnp.asarray(np.tile(_SOBEL_Y.reshape(3, 3, 1, 1), (1, 1, 1, c)))
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    gx = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn,
                                      feature_group_count=c)
    gy = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn,
                                      feature_group_count=c)
    return gx, gy


def contour_loss(probs: jnp.ndarray, target, num_classes: int | None = None,
                 ignore_background: bool = True, one_hot_target: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sobel-gradient MSE over per-class probability maps
    (custom_loss.contour_loss:1120-1197)."""
    probs = _f32(probs)
    if not one_hot_target:
        target = _f32(target)
    if one_hot_target:
        assert num_classes is not None
        tgt = one_hot(target.astype(jnp.int32), num_classes)
    else:
        tgt = target
    if ignore_background:
        probs = probs[..., 1:]
        tgt = tgt[..., 1:]
    if mask is None:
        mask = jnp.ones_like(probs)
    else:
        mask = jnp.broadcast_to(mask, probs.shape)
    gx_p, gy_p = _dense_sobel(probs)
    gx_t, gy_t = _dense_sobel(jax.lax.stop_gradient(tgt))
    gx_p, gy_p = gx_p * mask, gy_p * mask
    gx_t, gy_t = gx_t * mask, gy_t * mask
    loss = jnp.mean((gx_p - gx_t) ** 2) + jnp.mean((gy_p - gy_t) ** 2)
    return 0.5 * loss


# ---------------------------------------------------------------------------
# Divergence / consistency family
# ---------------------------------------------------------------------------


def kl_divergence(reference: jnp.ndarray, pred: jnp.ndarray,
                  mask: jnp.ndarray | None = None, is_gt: bool = False) -> jnp.ndarray:
    """DKL(P||Q) with P from `reference` (custom_loss.kl_divergence:1200-1227).

    Both args are logits unless `is_gt` (then `reference` is a onehot map and
    the reference code uses p=1 on the support, log p = 0 elsewhere trick).
    """
    reference, pred = _f32(reference), _f32(pred)
    if mask is None:
        mask = jnp.ones_like(pred)
    if not is_gt:
        p = jax.nn.softmax(reference, axis=-1)
        log_p = jax.nn.log_softmax(reference, axis=-1)
    else:
        p = jnp.where(reference == 0.0, 1e-8, 1.0)
        log_p = jnp.log(p)
    plogp = jnp.sum(mask * (p * log_p), axis=-1, keepdims=True)
    plogq = jnp.sum(mask * (p * jax.nn.log_softmax(pred, axis=-1)), axis=-1, keepdims=True)
    return jnp.mean(plogp - plogq)


def js_divergence(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """JS divergence between two logit maps (custom_loss.calc_js_divergece:
    1230-1258). `batchmean` there divides by N*H*W after the NCHW→(NHW, C)
    reshape, i.e. a per-pixel mean of the class-summed KL."""
    pred, target = _f32(pred), _f32(target)
    p = jax.nn.softmax(pred, axis=-1)
    q = jax.nn.softmax(target, axis=-1)
    m_log = jnp.log(jnp.clip(0.5 * (p + q), 1e-8, 1.0))
    n_pix = float(np.prod(pred.shape[:-1]))
    kl1 = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-30, 1.0)) - m_log)) / n_pix
    kl2 = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-30, 1.0)) - m_log)) / n_pix
    return 0.5 * (kl1 + kl2)


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1),
                                 "VALID") / float(k * k)


def segmentation_consistency(output: jnp.ndarray, reference: jnp.ndarray,
                             divergence_types=("kl", "contour"),
                             divergence_weights=(1.0, 0.5), class_weights=None,
                             scales=(0,), mask: jnp.ndarray | None = None,
                             is_gt: bool = False) -> jnp.ndarray:
    """Multi-scale consistency (custom_loss.calc_segmentation_consistency:
    1261-1341). `output`/`reference` are logits NHWC."""
    num_classes = reference.shape[-1]
    if mask is None:
        mask = jnp.ones_like(output)
    dist = 0.0
    for scale in scales:
        if scale > 0:
            ref_s = _avg_pool(reference, 2 ** scale)
            out_s = _avg_pool(output, 2 ** scale)
            mask_s = _avg_pool(mask, 2 ** scale)
        else:
            ref_s, out_s, mask_s = reference, output, mask
        for div_type, d_weight in zip(divergence_types, divergence_weights):
            if div_type == "kl":
                loss = kl_divergence(reference=ref_s, pred=out_s, mask=mask_s, is_gt=is_gt)
            elif div_type == "ce":
                loss = cross_entropy_2d(out_s, ref_s, mask=mask_s[..., :1], is_gt=is_gt)
            elif div_type == "weighted ce":
                assert class_weights is not None
                loss = cross_entropy_2d(out_s, ref_s, weight=class_weights,
                                        mask=mask_s[..., :1], is_gt=is_gt)
            elif div_type == "Dice":
                loss = soft_dice_loss(out_s, ref_s, num_classes, mask=mask_s, is_gt=is_gt)
            elif div_type == "mse":
                tgt = ref_s if is_gt else jax.nn.softmax(ref_s, axis=-1)
                inp = jax.nn.softmax(out_s, axis=-1)
                n, h, w = out_s.shape[0], out_s.shape[1], out_s.shape[2]
                loss = jnp.sum((tgt * mask_s - inp * mask_s) ** 2) / float(n * h * w)
            elif div_type == "contour":
                tgt = ref_s if is_gt else jax.nn.softmax(ref_s, axis=-1)
                inp = jax.nn.softmax(out_s, axis=-1)
                loss = 0.0
                for i in range(1, num_classes):
                    loss += contour_loss(inp[..., i:i + 1], tgt[..., i:i + 1],
                                         ignore_background=False, one_hot_target=False,
                                         mask=mask_s[..., :1])
                if num_classes > 1:
                    loss = loss / float(num_classes - 1)
            else:
                raise NotImplementedError(div_type)
            dist += (2 ** scale) * d_weight * loss
    return dist / float(len(scales))


# ---------------------------------------------------------------------------
# Reconstruction losses
# ---------------------------------------------------------------------------


def mse_recon_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.5 * mean squared error (advanced_triplet…:721-722)."""
    return 0.5 * jnp.mean((_f32(pred) - jax.lax.stop_gradient(_f32(target))) ** 2)


def l1_recon_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(_f32(pred) - jax.lax.stop_gradient(_f32(target))))


def normalized_cross_correlation(x: jnp.ndarray, y: jnp.ndarray,
                                 eps: float = 1e-8) -> jnp.ndarray:
    """Batchwise NCC scalar (custom_loss.normalized_cross_correlation:76-127,
    reduction='mean')."""
    b = x.shape[0]
    xf = x.reshape(b, -1)
    yf = y.reshape(b, -1)
    xf = xf - jnp.mean(xf, axis=1, keepdims=True)
    yf = yf - jnp.mean(yf, axis=1, keepdims=True)
    dev_xy = xf * yf
    denom = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True)
                     * jnp.sum(yf * yf, axis=1, keepdims=True)) + eps
    ncc = (dev_xy + eps / xf.shape[1]) / denom
    return jnp.mean(jnp.sum(ncc, axis=1))


def _gaussian_blur3(x: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise gaussian smoothing (NGF_Loss.get_gaussian_kernel,
    custom_loss.py:283-326). The reference requests kernel_size=3 but its
    min-size rule `kernel_size < 2*int(3.5*sigma)+1` grows it to 7x7 for
    sigma=1 — replicate that effective kernel exactly."""
    ks = max(3, 2 * int(3.5 * sigma) + 1)
    coords = np.arange(ks, dtype=np.float32)
    gx, gy = np.meshgrid(coords, coords, indexing="ij")
    mean = (ks - 1) / 2.0
    k = np.exp(-((gx - mean) ** 2 + (gy - mean) ** 2) / (2 * sigma**2))
    k = (k / k.sum()).astype(np.float32)
    c = x.shape[-1]
    kern = jnp.asarray(np.tile(k.reshape(ks, ks, 1, 1), (1, 1, 1, c)))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kern, (1, 1), "SAME", dimension_numbers=dn,
                                        feature_group_count=c)


def ngf_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Normalized-gradient-field recon loss (custom_loss.NGF_Loss:215-343):
    gaussian-smooth, Sobel gradients, per-axis NCC, 1 - mean."""
    pred, target = _f32(pred), jax.lax.stop_gradient(_f32(target))
    gx_t, gy_t = _dense_sobel(_gaussian_blur3(target))
    gx_p, gy_p = _dense_sobel(_gaussian_blur3(pred))
    value = 0.5 * (normalized_cross_correlation(gx_t, gx_p)
                   + normalized_cross_correlation(gy_t, gy_p))
    return 1.0 - value


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Total variation (custom_loss.TVLoss:1024-1040); NHWC."""
    b, h, w, c = x.shape
    count_h = float(c * (h - 1) * w)
    count_w = float(c * h * (w - 1))
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :h - 1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :w - 1, :]) ** 2)
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / float(b)


def image_recon_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     rec_loss_type: str = "l2") -> jnp.ndarray:
    """Dispatch mirroring solver.compute_image_recon_loss
    (advanced_triplet…:718-729)."""
    if rec_loss_type == "l2":
        return mse_recon_loss(pred, target)
    if rec_loss_type == "l1":
        return l1_recon_loss(pred, target)
    if rec_loss_type == "ngf":
        return ngf_loss(pred, target)
    raise NotImplementedError(rec_loss_type)


def basic_loss_fn(pred: jnp.ndarray, target: jnp.ndarray,
                  loss_type: str = "cross entropy", class_weights=None) -> jnp.ndarray:
    """Supervised-segmentation loss dispatch (custom_loss.basic_loss_fn:13-45)."""
    num_classes = pred.shape[-1]
    if class_weights is None:
        class_weights = [1.0 / num_classes] * num_classes
    if loss_type == "cross entropy":
        return cross_entropy_2d(pred, target)
    if loss_type == "weighted cross entropy":
        return cross_entropy_2d(pred, target, weight=class_weights)
    if loss_type == "dice":
        return soft_dice_loss(pred, target, num_classes)
    if loss_type == "weighted dice":
        # reference parity: SoftDiceLoss.forward accepts `weight` but never
        # uses it (custom_loss.py:556-586), so 'weighted dice' == 'dice'
        return soft_dice_loss(pred, target, num_classes)
    if loss_type == "foreground dice":
        return soft_dice_loss(pred, target, num_classes,
                              class_ids=list(range(1, num_classes)))
    if loss_type == "focal":
        return focal_loss(pred, target, gamma=2.0)
    if loss_type == "contour_smooth":
        return contour_loss(jax.nn.softmax(pred, axis=-1), target,
                            num_classes=num_classes)
    raise NotImplementedError(loss_type)


def cosine_similarity_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1 - mean cosine similarity over [N, C, HW] rows
    (custom_loss.calc_angular_loss:48-60); NHWC input."""
    n, h, w, c = a.shape
    af = a.transpose(0, 3, 1, 2).reshape(n, c, -1)
    bf = b.transpose(0, 3, 1, 2).reshape(n, c, -1)
    num = jnp.sum(af * bf, axis=-1)
    den = jnp.linalg.norm(af, axis=-1) * jnp.linalg.norm(bf, axis=-1) + 1e-8
    return jnp.mean(1.0 - num / den)
