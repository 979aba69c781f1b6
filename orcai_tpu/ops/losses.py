"""Masked multi-label loss and metrics.

Equivalents of the reference's MaskedBinaryCrossentropy /
MaskedBinaryAccuracy / MaskedAUC (architectures.py:244-304): positions where
y_true == MASK_VALUE ("presence not possible") are excluded from every
reduction. Implemented as fully-shaped masked means (no boolean_mask /
dynamic shapes) so they jit and shard cleanly; the BCE takes logits for
numerical stability — mathematically identical to the reference's
probability-space BCE up to Keras' epsilon clipping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orcai_tpu.utils.seeds import MASK_VALUE


def _mask(y_true: jnp.ndarray) -> jnp.ndarray:
    return y_true != MASK_VALUE


def masked_bce_from_logits(logits: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy over unmasked positions, from logits."""
    mask = _mask(y_true)
    y = jnp.where(mask, y_true, 0.0)
    # stable elementwise BCE: max(z, 0) - z*y + log(1 + exp(-|z|))
    z = logits
    per_elem = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    total = jnp.sum(jnp.where(mask, per_elem, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def masked_bce_from_probs(probs: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Probability-space masked BCE with Keras' epsilon clipping (1e-7)."""
    eps = 1e-7
    p = jnp.clip(probs, eps, 1.0 - eps)
    mask = _mask(y_true)
    y = jnp.where(mask, y_true, 0.0)
    per_elem = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
    total = jnp.sum(jnp.where(mask, per_elem, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def masked_binary_accuracy_counts(
    probs: jnp.ndarray, y_true: jnp.ndarray, threshold: float = 0.5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(correct, total) over unmasked positions — accumulable across batches."""
    mask = _mask(y_true)
    pred = probs > threshold
    correct = jnp.sum(jnp.where(mask, pred == (y_true > 0.5), False))
    return correct, jnp.sum(mask)


def masked_binary_accuracy(
    probs: jnp.ndarray, y_true: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    correct, total = masked_binary_accuracy_counts(probs, y_true, threshold)
    return correct / jnp.maximum(total, 1)


def weighted_masked_bce_from_logits(
    logits: jnp.ndarray, y_true: jnp.ndarray, call_weights: jnp.ndarray | None
) -> jnp.ndarray:
    """Masked BCE with per-call weights applied to positive positions.

    Mirrors Keras' class_weight handling for multi-label outputs: samples
    where a call is present are scaled by that call's weight.
    """
    if call_weights is None:
        return masked_bce_from_logits(logits, y_true)
    mask = _mask(y_true)
    y = jnp.where(mask, y_true, 0.0)
    z = logits
    per_elem = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    w = jnp.where(y > 0.5, call_weights, 1.0)
    total = jnp.sum(jnp.where(mask, per_elem * w, 0.0))
    count = jnp.maximum(jnp.sum(jnp.where(mask, w, 0.0)), 1.0)
    return total / count


def masked_auc_roc(probs, y_true, num_thresholds: int = 200) -> jnp.ndarray:
    """Masked ROC-AUC by trapezoidal integration over threshold bins.

    Device-friendly analogue of the reference's MaskedAUC
    (architectures.py:289-304; Keras AUC with default 200 thresholds).
    """
    mask = _mask(y_true)
    y = jnp.where(mask, y_true, 0.0)
    # Keras AUC threshold grid: [-eps, 1/(n-1), ..., (n-2)/(n-1), 1+eps] —
    # the epsilon endpoints close the ROC curve at (0,0)/(1,1) even when
    # probabilities saturate to exactly 0.0 or 1.0
    eps = 1e-7
    inner = jnp.arange(1, num_thresholds - 1) / (num_thresholds - 1)
    thresholds = jnp.concatenate(
        [jnp.array([-eps]), inner, jnp.array([1.0 + eps])]
    )

    def rates(t):
        pred = probs >= t
        tp = jnp.sum(jnp.where(mask, pred & (y > 0.5), False))
        fp = jnp.sum(jnp.where(mask, pred & (y <= 0.5), False))
        return tp, fp

    tps, fps = jax.vmap(rates)(thresholds)
    pos = jnp.maximum(jnp.sum(jnp.where(mask, y > 0.5, False)), 1)
    neg = jnp.maximum(jnp.sum(mask) - pos, 1)
    tpr = tps / pos
    fpr = fps / neg
    # thresholds ascending -> fpr descending; integrate |dx| * mean(y)
    return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)
