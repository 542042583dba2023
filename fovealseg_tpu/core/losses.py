"""Losses (pure jnp, NHWC logits [B, H, W, C], integer labels [B, H, W]).

Covers the reference's loss inventory (SURVEY.md §2.3):

* training loss = multiclass soft Dice + Focal(gamma=5) + edge MSE
  (/root/reference/models/models.py:482, 886-898, 1057-1069)
* module-local FocalLoss (models/models.py:87-120), SoftDiceLossV1 (59-84),
  TVLoss (122-138)
* criterion.py family: CrossEntropy, OHEM CE, per-class DiceLoss, DiceCoeff
  (/root/reference/criterion.py:12-343)
* DynamicFocus: BMSE (area-balanced MSE), BCOSIM, WCE
  (/root/reference/DynamicFocus/d_model/nn_A2_loss.py:5-95)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# primary training losses
# --------------------------------------------------------------------------

def dice_loss_multiclass(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smooth: float = 0.0,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """pytorch_toolbelt DiceLoss('multiclass') semantics (the reference's
    ``self.crit``, models/models.py:482): softmax probs, one-hot target, soft
    dice per class over (batch, pixels); classes absent from the target
    contribute 0; mean over all classes."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=probs.dtype)
    dims = (0, 1, 2)
    intersection = jnp.sum(probs * onehot, axis=dims)
    cardinality = jnp.sum(probs + onehot, axis=dims)
    score = (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)
    loss = 1.0 - score
    present = jnp.sum(onehot, axis=dims) > 0
    return jnp.mean(loss * present.astype(loss.dtype))


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 5.0) -> jnp.ndarray:
    """Module-local FocalLoss (models/models.py:87-120): log-softmax gather,
    ``-(1-pt)^gamma * logpt``, mean over pixels. ``pt`` is treated as a
    constant w.r.t. gradients (reference wraps it in ``Variable(...data...)``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    return jnp.mean(-((1.0 - pt) ** gamma) * logpt)


def minmax_normalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Global (whole-tensor) min-max normalization as used by the edge loss
    (models/models.py:893-895 normalizes across the entire batch tensor)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps)


def edge_loss(
    saliency: jnp.ndarray,
    target: jnp.ndarray,
    edge_loss_scale: float = 100.0,
    normalize: bool = True,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Deformation edge loss (models/models.py:886-898). The
    TRAIN.opt_deform_LabelEdge_norm=True branch is
    ``0.05 * MSE(norm(xs), norm(xs_target_area)) * TRAIN.edge_loss_scale``
    with both tensors globally min-max normalized; the non-norm branch is a
    plain ``MSE(xs, xs_target) * edge_loss_scale`` (no 0.05 factor)."""
    if normalize:
        saliency = minmax_normalize(saliency, eps)
        target = minmax_normalize(target, eps)
    factor = 0.05 if normalize else 1.0
    return factor * jnp.mean((saliency - target) ** 2) * edge_loss_scale


# --------------------------------------------------------------------------
# criterion.py family
# --------------------------------------------------------------------------

def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = -2,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """nn.CrossEntropyLoss with ignore_index (criterion.py:12-29)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    mask = (labels != ignore_label) & (labels >= 0)
    if weight is not None:
        w = weight[safe] * mask
    else:
        w = mask.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    thresh: float = 0.7,
    min_kept: int = 100000,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """Online hard-example mining CE (criterion.py:125-162, HRNet variant):
    keep pixels whose target-class score is below max(thresh, k-th smallest
    score), average their CE. Fixed-shape via sort + masking."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.maximum(jnp.where(labels == ignore_label, 0, labels), 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    score = jnp.take_along_axis(jax.nn.softmax(logits, axis=-1), safe[..., None], axis=-1)[..., 0]
    valid = labels != ignore_label
    score_v = jnp.where(valid, score, jnp.inf).reshape(-1)
    nll_v = jnp.where(valid, nll, 0.0).reshape(-1)
    order = jnp.argsort(score_v)
    sorted_scores = score_v[order]
    k = min(min_kept, score_v.shape[0] - 1)
    min_value = sorted_scores[k]
    threshold = jnp.maximum(min_value, thresh)
    keep = (score_v < threshold) & valid.reshape(-1)
    return jnp.sum(nll_v * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def dice_loss_scores(
    scores: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """criterion.py DiceLoss (162-196): soft dice over *raw scores* (no
    softmax in the multiclass path), per class over (batch, pixels), mean."""
    c = scores.shape[-1]
    onehot = jax.nn.one_hot(labels, c, dtype=scores.dtype)
    dims = (0, 1, 2)
    intersection = jnp.sum(scores * onehot, axis=dims)
    cardinality = jnp.sum(scores + onehot, axis=dims)
    return 1.0 - jnp.mean(2.0 * intersection / (cardinality + eps))


def soft_dice_v1(logits: jnp.ndarray, labels: jnp.ndarray, p: float = 2.0, smooth: float = 0.0) -> jnp.ndarray:
    """SoftDiceLossV1 (models/models.py:59-84), binary sigmoid dice."""
    probs = jax.nn.sigmoid(logits)
    numer = jnp.sum(probs * labels)
    denor = jnp.sum(probs**p + labels**p)
    return 1.0 - (2.0 * numer + smooth) / (denor + smooth)


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Total-variation loss (models/models.py:122-138). x: [B, H, W, 1]."""
    b, h, w, _ = x.shape
    h_tv = jnp.sum(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]))
    w_tv = jnp.sum(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return (h_tv / ((h - 1) * w) + w_tv / (h * (w - 1))) / b


# --------------------------------------------------------------------------
# DynamicFocus family (nn_A2_loss.py)
# --------------------------------------------------------------------------

def bmse_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Area-balanced MSE (nn_A2_loss.py:5-42): fg/bg regions weighted
    inversely to their area, averaged 50/50."""
    ones = target >= 0.5
    zeros = ~ones
    mse = (pred - target) ** 2
    axes = (-2, -1)
    mse_one = jnp.sum(mse * ones, axis=axes) / (jnp.sum(ones, axis=axes) + eps)
    mse_zero = jnp.sum(mse * zeros, axis=axes) / (jnp.sum(zeros, axis=axes) + eps)
    return jnp.mean(0.5 * mse_one + 0.5 * mse_zero)


def bcosim_loss(scores: jnp.ndarray, target: jnp.ndarray, class_num: int, eps: float = 1e-6) -> jnp.ndarray:
    """Class-balanced similarity loss (nn_A2_loss.py:46-90): mean over
    *present* classes of the mean target-class score; returns 1 - that."""
    tgt = target.reshape(-1)
    picked = jnp.take_along_axis(scores, tgt[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(tgt, class_num, dtype=scores.dtype)  # [B, K]
    per_class_sum = onehot.T @ picked
    per_class_cnt = jnp.sum(onehot, axis=0)
    present = per_class_cnt > 0
    k_loss = per_class_sum / (per_class_cnt + eps)
    return 1.0 - jnp.sum(k_loss * present) / jnp.maximum(jnp.sum(present), 1.0)


def dice_coeff(inputs: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Batch-mean binary Dice coefficient (criterion.py DiceCoeff:304-343):
    per sample ``(2<x,y> + eps) / (sum(x) + sum(y) + eps)``, averaged."""
    b = inputs.shape[0]
    x = inputs.reshape(b, -1)
    y = target.reshape(b, -1).astype(x.dtype)
    inter = jnp.sum(x * y, axis=1)
    union = jnp.sum(x, axis=1) + jnp.sum(y, axis=1) + eps
    return jnp.mean((2.0 * inter + eps) / union)


def wce_loss(scores: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(CrossEntropy) classification loss (nn_A2_loss.py:92-100)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, target.reshape(-1)[:, None], axis=-1)
    return jax.nn.sigmoid(jnp.mean(nll))
