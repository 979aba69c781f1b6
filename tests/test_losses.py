import numpy as np
import jax.numpy as jnp

from orcai_tpu.ops.losses import (
    masked_auc_roc,
    masked_bce_from_logits,
    masked_bce_from_probs,
    masked_binary_accuracy,
    masked_binary_accuracy_counts,
    weighted_masked_bce_from_logits,
)

MASK = -1.0


def _numpy_masked_bce(y_true, probs, eps=1e-7):
    mask = y_true != MASK
    p = np.clip(probs[mask], eps, 1 - eps)
    y = y_true[mask]
    return float(np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p))))


def test_masked_bce_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, size=(4, 6, 3)).astype(np.float32)
    y[:, :, 2] = MASK  # whole call masked
    y[0, 0, 0] = MASK
    p = rng.uniform(0.01, 0.99, size=y.shape).astype(np.float32)
    expected = _numpy_masked_bce(y, p)
    got = float(masked_bce_from_probs(jnp.asarray(p), jnp.asarray(y)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    logits = np.log(p / (1 - p)).astype(np.float32)
    got_logits = float(masked_bce_from_logits(jnp.asarray(logits), jnp.asarray(y)))
    np.testing.assert_allclose(got_logits, expected, rtol=1e-4)


def test_masked_bce_ignores_masked_positions():
    y = np.array([[1.0, MASK], [0.0, MASK]], dtype=np.float32)
    p = np.array([[0.9, 0.0001], [0.1, 0.9999]], dtype=np.float32)
    got = float(masked_bce_from_probs(jnp.asarray(p), jnp.asarray(y)))
    expected = float(np.mean(-np.log([0.9, 0.9])))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_masked_binary_accuracy():
    y = np.array([[1.0, 0.0, MASK], [0.0, 1.0, MASK]], dtype=np.float32)
    p = np.array([[0.8, 0.4, 0.99], [0.6, 0.2, 0.99]], dtype=np.float32)
    # unmasked: correct = [1, 1, 0, 0] -> 0.5
    acc = float(masked_binary_accuracy(jnp.asarray(p), jnp.asarray(y)))
    assert acc == 0.5
    c, t = masked_binary_accuracy_counts(jnp.asarray(p), jnp.asarray(y))
    assert int(c) == 2 and int(t) == 4


def test_weighted_bce_reduces_to_unweighted():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, size=(8, 5, 3)).astype(np.float32)
    logits = rng.normal(size=y.shape).astype(np.float32)
    base = float(masked_bce_from_logits(jnp.asarray(logits), jnp.asarray(y)))
    w1 = float(
        weighted_masked_bce_from_logits(
            jnp.asarray(logits), jnp.asarray(y), jnp.ones(3)
        )
    )
    np.testing.assert_allclose(base, w1, rtol=1e-6)
    wup = float(
        weighted_masked_bce_from_logits(
            jnp.asarray(logits), jnp.asarray(y), jnp.asarray([5.0, 1.0, 1.0])
        )
    )
    assert wup != base


def test_masked_auc_sane():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, size=(64, 8, 2)).astype(np.float32)
    # perfectly informative predictions -> AUC ~ 1
    p = y * 0.9 + 0.05
    auc = float(masked_auc_roc(jnp.asarray(p), jnp.asarray(y)))
    assert auc > 0.99
    # random predictions -> AUC ~ 0.5
    p = rng.uniform(size=y.shape).astype(np.float32)
    auc = float(masked_auc_roc(jnp.asarray(p), jnp.asarray(y)))
    assert 0.45 < auc < 0.55
