"""ResNetTCN — the TPU-native third architecture (extension, no upstream
equivalent): conv-ResNet trunk + dilated temporal-conv head instead of the
sequential BiLSTM scan. Covers the registry contract, forward shape,
trainability, checkpoint round-trip, and the window predictor."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orcai_tpu.models import ResNetTCN, build_model, init_variables

PARAM = {
    "name": "tcn-test",
    "architecture": "ResNetTCN",
    "model": {
        "filters": [4, 6, 8, 10],
        "kernel_size": 3,
        "dropout_rate": 0.0,
        "lstm_units": 16,
        "learning_rate": 1e-3,
        "batch_size": 4,
    },
    "calls": ["A", "B", "C"],
}


def test_registry_and_forward_shapes():
    model = build_model(PARAM)
    assert isinstance(model, ResNetTCN)
    variables = init_variables(model, (64, 21, 1), seed=0)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 21, 1)), jnp.float32
    )
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    # trunk downsamples time by 2**len(filters) = 16
    assert out.shape == (2, 4, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # the full-size production contract
    variables_full = init_variables(model, (736, 171, 1), seed=0)
    out_full = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False),
        variables_full,
        jax.ShapeDtypeStruct((1, 736, 171, 1), jnp.float32),
    )
    assert out_full.shape == (1, 46, 3)


def test_training_reduces_loss():
    from orcai_tpu.parallel.mesh import make_mesh
    from orcai_tpu.train.trainer import Trainer, make_optimizer

    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(5e-3), mesh=make_mesh(n_data=1))
    state = trainer.init_state((64, 21, 1), seed=0)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(8, 64, 21, 1)), jnp.float32)
    # learnable target: constant labels
    y = jnp.asarray(
        np.tile([1.0, 0.0, 1.0], (8, 4, 1)), jnp.float32
    )
    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, x, y)
        losses.append(float(np.asarray(metrics)[0]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_checkpoint_roundtrip_and_predictor(tmp_path):
    from orcai_tpu.io.model_store import load_orcai_model, save_orcai_model
    from orcai_tpu.ops.overlap import WindowPredictor

    model = build_model(PARAM)
    variables = init_variables(model, (64, 21, 1), seed=3)
    d = tmp_path / "tcn-test"
    save_orcai_model(d, PARAM, variables, input_shape=(64, 21, 1))
    model2, variables2, param2, shape2 = load_orcai_model(d)
    assert param2["architecture"] == "ResNetTCN"

    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 64, 21, 1)), jnp.float32
    )
    a = model.apply(variables, x, train=False)
    b = model2.apply(variables2, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    wp = WindowPredictor(
        model2, variables2, snippet_len=64, n_filters=4, batch_size=4
    )
    spec = np.random.default_rng(4).uniform(size=(64 * 5, 21)).astype(
        np.float32
    )
    agg, count = wp.aggregate(spec)
    assert np.isfinite(agg).all() and count.max() >= 1


def test_keras_export_rejects_tcn():
    """ResNetTCN has no upstream Keras counterpart; the exporter must raise
    instead of silently emitting one of the reference heads' graphs."""
    from orcai_tpu.io.keras_convert import build_keras_model

    with pytest.raises(ValueError, match="no reference Keras equivalent"):
        build_keras_model(PARAM, (64, 21, 1))
