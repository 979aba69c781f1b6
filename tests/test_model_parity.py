"""Model forward-pass parity: flax CRNN vs an equivalent Keras graph.

Builds a randomly initialized Keras model of the reference architecture,
converts the weights into our flax parameter tree, and checks that inference
outputs match — the strongest available check that layer semantics (SAME
padding, separable convs, BN epsilon, LSTM gate math, reshape ordering) are
faithful, given the reference's trained blob is unavailable.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
keras = pytest.importorskip("keras")

import jax.numpy as jnp  # noqa: E402

from orcai_tpu.io.keras_convert import (  # noqa: E402
    build_keras_model,
    flax_to_keras_model,
    keras_to_flax_variables,
)
from orcai_tpu.models import build_model  # noqa: E402

SMALL_PARAM = {
    "name": "tiny",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [4, 6, 8, 10],
        "kernel_size": 3,
        "dropout_rate": 0.5,
        "lstm_units": 16,
    },
    "calls": ["A", "B", "C"],
}

INPUT_SHAPE = (64, 21, 1)  # small: 64 time steps -> 4 output steps


def _rand_batch(batch=2, shape=INPUT_SHAPE, seed=0):
    return np.random.default_rng(seed).normal(size=(batch, *shape)).astype(np.float32)


@pytest.fixture(scope="module")
def keras_lstm_model():
    keras.utils.set_random_seed(1234)
    return build_keras_model(SMALL_PARAM, input_shape=INPUT_SHAPE)


def test_resnet_lstm_forward_parity(keras_lstm_model):
    x = _rand_batch()
    y_keras = keras_lstm_model.predict(x, verbose=0)

    variables = keras_to_flax_variables(keras_lstm_model, SMALL_PARAM)
    model = build_model(SMALL_PARAM)
    y_flax = model.apply(variables, jnp.asarray(x), train=False)

    assert y_keras.shape == y_flax.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(y_flax), y_keras, atol=2e-5)


def test_resnet_lstm_roundtrip_export(keras_lstm_model):
    x = _rand_batch(seed=3)
    variables = keras_to_flax_variables(keras_lstm_model, SMALL_PARAM)
    exported = flax_to_keras_model(variables, SMALL_PARAM, INPUT_SHAPE)
    y0 = keras_lstm_model.predict(x, verbose=0)
    y1 = exported.predict(x, verbose=0)
    np.testing.assert_allclose(y0, y1, atol=1e-6)


def test_resnet_1dconv_forward_parity():
    param = dict(SMALL_PARAM, architecture="ResNet1DConv")
    keras.utils.set_random_seed(99)
    kmodel = build_keras_model(param, input_shape=INPUT_SHAPE)
    x = _rand_batch(seed=7)
    y_keras = kmodel.predict(x, verbose=0)

    variables = keras_to_flax_variables(kmodel, param)
    model = build_model(param)
    y_flax = model.apply(variables, jnp.asarray(x), train=False)

    assert y_keras.shape == y_flax.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(y_flax), y_keras, atol=2e-5)


def test_legacy_h5_weights_load(keras_lstm_model, tmp_path):
    """A legacy model dir (model_weights.h5, no .keras/.msgpack) is drop-in
    loadable (reference io.py:393-404)."""
    import json

    from orcai_tpu.io.model_store import load_orcai_model

    model_dir = tmp_path / "legacy_model"
    model_dir.mkdir()
    keras_lstm_model.save_weights(str(model_dir / "w.weights.h5"))
    (model_dir / "w.weights.h5").rename(model_dir / "model_weights.h5")
    (model_dir / "orcai_parameter.json").write_text(json.dumps(SMALL_PARAM))
    (model_dir / "model_shape.json").write_text(
        json.dumps({"input_shape": list(INPUT_SHAPE),
                    "num_labels": len(SMALL_PARAM["calls"])})
    )

    model, variables, param, shape = load_orcai_model(model_dir)
    x = _rand_batch(seed=11)
    y_keras = keras_lstm_model.predict(x, verbose=0)
    y_flax = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y_flax), y_keras, atol=2e-5)


def test_flax_init_shapes():
    model = build_model(SMALL_PARAM)
    variables = model.init(jax.random.key(0), jnp.zeros((1, *INPUT_SHAPE)))
    out = model.apply(variables, jnp.zeros((2, *INPUT_SHAPE)), train=False)
    assert out.shape == (2, 4, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_full_size_contract():
    """The production contract: (736, 171, 1) -> (46, 7)."""
    param = {
        "name": "orcai-v1",
        "architecture": "ResNetLSTM",
        "model": {
            "filters": [30, 40, 50, 60],
            "kernel_size": 3,
            "dropout_rate": 0.5,
            "lstm_units": 128,
        },
        "calls": ["BR", "BUZZ", "HERDING", "PHS", "SS", "TAILSLAP", "WHISTLE"],
    }
    model = build_model(param)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 736, 171, 1)))
    out = model.apply(variables, jnp.zeros((1, 736, 171, 1)), train=False)
    assert out.shape == (1, 46, 7)


def test_frozen_trunk_biases_have_zero_gradient():
    """Trunk conv biases feed straight into train-mode BatchNorm, where any
    constant shift cancels exactly — the frozen-bias optimization
    (models/layers.py) relies on this gradient being identically zero. Check
    it against an UNFROZEN replica of the graph."""
    import jax.numpy as jnp

    keras.utils.set_random_seed(5)
    kmodel = build_keras_model(SMALL_PARAM, input_shape=INPUT_SHAPE)
    variables = keras_to_flax_variables(kmodel, SMALL_PARAM)
    model = build_model(SMALL_PARAM)
    x = jnp.asarray(_rand_batch(batch=4, seed=21))

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    trunk = grads["trunk"]
    # biases stopped by the optimization
    frozen = [trunk["entry_conv"]["bias"]]
    for name, g in trunk.items():
        if "sep" in name:
            frozen.append(g["pointwise"]["bias"])
    for g in frozen:
        assert float(jnp.abs(g).max()) == 0.0
    # a bias NOT followed by BN (shortcut convs) must still get gradient
    assert float(jnp.abs(trunk["block0_shortcut"]["bias"]).max()) > 0.0
