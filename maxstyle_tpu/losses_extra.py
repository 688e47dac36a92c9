"""Library-surface losses beyond the main training path.

≙ the remaining rows of SURVEY §2.4 (custom_loss.py): gram/style losses
(:160-189), contrastive/triplet (:130-159, 982-1021), Brier (:762-778),
(local) normalized cross-correlation losses (:835-979), 3D CE (:192-213),
smooth-L1 (:500-509), Laplacian smoothness (:511-543), hierarchical cardiac
loss (:373-409). None are used by the reference's main loop; they are the
importable loss surface.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from maxstyle_tpu import losses


def gram_matrix_2d(feat: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,C,C] normalized Gram (custom_loss.gram_matrix_2D)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f,
                      preferred_element_type=jnp.float32) / float(h * w * c)


def style_loss(feat_a: jnp.ndarray, feat_b: jnp.ndarray) -> jnp.ndarray:
    """MSE between Gram matrices (custom_loss.style_loss)."""
    return jnp.mean((gram_matrix_2d(feat_a) - gram_matrix_2d(feat_b)) ** 2)


def contrastive_loss(a: jnp.ndarray, b: jnp.ndarray, label: jnp.ndarray,
                     margin: float = 1.0) -> jnp.ndarray:
    """Pairwise contrastive loss (custom_loss.ContrastiveLoss:142-159):
    label 1 = similar pair."""
    d = jnp.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
    sim = label * d ** 2
    dis = (1 - label) * jnp.maximum(margin - d, 0.0) ** 2
    return jnp.mean(sim + dis)


def triplet_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                 negative: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """Angular-distance triplet loss (custom_loss.calc_triplet_loss:130-141)."""
    d_pos = losses.cosine_similarity_loss(anchor, positive)
    d_neg = losses.cosine_similarity_loss(anchor, negative)
    return jnp.maximum(d_pos - d_neg + margin, 0.0)


def brier_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Squared error between softmax probs and one-hot targets
    (custom_loss.CustomBrierLoss:762-778). Reference normalization: the
    squared error is SUMMED over pixels and divided by batch*classes only
    (not by the pixel count) — matched exactly."""
    num_classes = logits.shape[-1]
    b = logits.shape[0]
    p = jax.nn.softmax(logits, axis=-1)
    y = losses.one_hot(labels.astype(jnp.int32), num_classes)
    return jnp.sum((p - y) ** 2) / (float(b) * float(num_classes))


def ncc_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - NCC (custom_loss.CustomNormalizedCrossCorrelationLoss:835-889)."""
    return 1.0 - losses.normalized_cross_correlation(pred,
                                                     jax.lax.stop_gradient(target))


def local_ncc_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   window: int = 9) -> jnp.ndarray:
    """1 - mean local NCC over sliding windows
    (custom_loss.CustomLocalNormalizedCrossCorrelationLoss:892-979)."""
    target = jax.lax.stop_gradient(target)

    def box(x):
        return jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                     (1, window, window, 1), (1, 1, 1, 1),
                                     "SAME")

    n_win = float(window * window)
    s_p, s_t = box(pred), box(target)
    s_pp, s_tt, s_pt = box(pred * pred), box(target * target), box(pred * target)
    cross = s_pt - s_p * s_t / n_win
    var_p = s_pp - s_p * s_p / n_win
    var_t = s_tt - s_t * s_t / n_win
    cc = (cross * cross) / (var_p * var_t + 1e-5)
    return 1.0 - jnp.mean(cc)


def cross_entropy_3d(logits: jnp.ndarray, labels: jnp.ndarray, weight=None,
                     size_average: bool = True) -> jnp.ndarray:
    """3D CE over [N,S,H,W,C] logits / [N,S,H,W] labels
    (custom_loss.cross_entropy_3D:192-213)."""
    c = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_p, labels[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    nll = -picked
    if weight is not None:
        w = jnp.asarray(weight)
        nll = nll * w[labels]
    loss = jnp.sum(nll)
    if size_average:
        loss = loss / labels.size
    return loss


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   beta: float = 1.0 / 9) -> jnp.ndarray:
    """Huber/smooth-L1 (custom_loss.smooth_l1_loss:500-509; the reference
    default beta is 1/9)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def laplacian_smoothness_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean |Laplacian| of a field [N,H,W,C]
    (custom_loss.laplacian_smoothness_loss:511-543)."""
    lap = (-4.0 * x
           + jnp.roll(x, 1, axis=1) + jnp.roll(x, -1, axis=1)
           + jnp.roll(x, 1, axis=2) + jnp.roll(x, -1, axis=2))
    return jnp.mean(jnp.abs(lap[:, 1:-1, 1:-1, :]))


def hierarchical_loss(multi_logits: Sequence[jnp.ndarray], labels: jnp.ndarray,
                      weights: Sequence[float] = (1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Three-level cardiac hierarchy loss (custom_loss.get_hierachical_loss:
    373-409): binary object (fg/bg), biventricle grouping (LV+MYO vs RV),
    full 4-class with the paper's [0.2, 0.25, 0.3, 0.25] class weights."""
    bin_target = jnp.where(labels > 1, 0, labels)
    l0 = losses.cross_entropy_2d(multi_logits[0], bin_target)
    bivent = jnp.where(labels <= 2, 1, 2)
    l1 = losses.cross_entropy_2d(multi_logits[1], bivent)
    l2 = losses.cross_entropy_2d(multi_logits[2], labels,
                                 weight=(0.2, 0.25, 0.3, 0.25))
    return weights[0] * l0 + weights[1] * l1 + weights[2] * l2


# ---------------------------------------------------------------------------
# semi-supervised helpers (model_util.py:399-422)
# ---------------------------------------------------------------------------


def filter_unlabelled_predictions(probs: jnp.ndarray,
                                  threshold: float = 0.8) -> jnp.ndarray:
    """Per-pixel confidence map: 1 where max prob exceeds threshold
    (model_util.filter_unlabelled_predictions:399-412)."""
    probs = jax.lax.stop_gradient(probs)
    conf = jnp.max(probs, axis=-1, keepdims=True) > threshold
    return jnp.broadcast_to(conf.astype(probs.dtype), probs.shape)


def sharpen_predictions(logits: jnp.ndarray,
                        temperature: float = 0.5) -> jnp.ndarray:
    """Temperature sharpening of softmax predictions
    (model_util.sharpen_predictions:415-422)."""
    p = jax.nn.softmax(logits, axis=-1) ** (1.0 / temperature)
    return p / jnp.sum(p, axis=-1, keepdims=True)
