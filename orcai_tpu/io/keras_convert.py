"""Keras <-> flax weight conversion for reference-format checkpoints.

The reference ships trained models as Keras archives (io.py:357-410 loads
`<name>.keras`). This module converts those weights into the parameter tree
of our flax CRNNs (and can build an equivalent Keras graph for export /
golden testing). TensorFlow/Keras are imported lazily — conversion is an
offline interop path, never part of the TPU compute path.

Pitfall map (SURVEY §7 "hard parts"):
- SeparableConv2D depthwise kernels: Keras (kh, kw, in, 1) vs flax grouped
  conv (kh, kw, 1, in) — transpose of the trailing axes.
- LSTM fused kernels: Keras (D, 4U)/(U, 4U) with gate order [i, f, c, o] —
  identical layout to our LSTM layer, no permutation needed.
- BatchNorm: gamma/beta -> scale/bias params; moving mean/var -> batch_stats.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def build_keras_model(orcai_parameter: dict, input_shape=(736, 171, 1)):
    """Build a Keras graph equivalent to the reference architecture.

    Mirrors the layer composition of architectures.py:120-241 (ResNetLSTM)
    / :18-117 (ResNet1DConv); used for checkpoint export and parity tests.
    """
    import keras

    mp = orcai_parameter["model"]
    num_labels = len(orcai_parameter["calls"])
    arch = orcai_parameter["architecture"]
    if arch not in ("ResNetLSTM", "ResNet1DConv"):
        # the export/parity path exists for the reference's two graphs
        # only; an unknown arch (e.g. the ResNetTCN extension, which has no
        # upstream Keras counterpart) must not silently fall into one of
        # their head branches and emit a wrong graph
        raise ValueError(
            f"no reference Keras equivalent for architecture {arch!r}; "
            "only ResNetLSTM / ResNet1DConv models can be exported to or "
            "loaded from .keras"
        )
    filters = mp["filters"]
    ks = mp["kernel_size"]

    inputs = keras.Input(shape=input_shape)
    x = keras.layers.Conv2D(16, ks, padding="same")(inputs)
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.Activation("relu")(x)
    previous = x
    for size in filters:
        x = keras.layers.Activation("relu")(x)
        x = keras.layers.SeparableConv2D(size, ks, padding="same")(x)
        x = keras.layers.BatchNormalization()(x)
        x = keras.layers.Activation("relu")(x)
        x = keras.layers.SeparableConv2D(size, ks, padding="same")(x)
        x = keras.layers.BatchNormalization()(x)
        x = keras.layers.MaxPooling2D((3, 2), strides=(2, 2), padding="same")(x)
        residual = keras.layers.Conv2D(size, 1, strides=(2, 2), padding="same")(
            previous
        )
        x = keras.layers.add([x, residual])
        previous = x
        if arch == "ResNet1DConv":
            x = keras.layers.Dropout(mp["dropout_rate"])(x)

    x = keras.layers.SeparableConv2D(36, ks, padding="same")(x)
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.Activation("relu")(x)

    if arch == "ResNetLSTM":
        x = keras.layers.Reshape(target_shape=(-1, x.shape[-2] * x.shape[-1]))(x)
        for _ in range(2):
            x = keras.layers.Bidirectional(
                keras.layers.LSTM(
                    mp["lstm_units"],
                    recurrent_initializer="orthogonal",
                    kernel_regularizer=keras.regularizers.l2(0.001),
                    return_sequences=True,
                )
            )(x)
            x = keras.layers.Dropout(mp["dropout_rate"])(x)
        x = keras.layers.Dense(
            128, activation="relu", kernel_regularizer=keras.regularizers.l2(0.001)
        )(x)
        x = keras.layers.BatchNormalization()(x)
        x = keras.layers.Dropout(mp["dropout_rate"])(x)
        outputs = keras.layers.Dense(num_labels, activation="sigmoid")(x)
    else:
        x = keras.layers.Dropout(mp["dropout_rate"])(x)

        class _ReduceFrequencyMean(keras.layers.Layer):
            def call(self, inputs):
                import tensorflow as tf

                return tf.reduce_mean(inputs, axis=2)

        x = _ReduceFrequencyMean()(x)
        outputs = keras.layers.Conv1D(
            num_labels, kernel_size=x.shape[2], padding="same", activation="sigmoid"
        )(x)

    return keras.Model(inputs, outputs)


def _collect_layers(keras_model):
    """Group weighted layers by class, preserving graph order."""
    groups: dict[str, list] = {
        "Conv2D": [],
        "SeparableConv2D": [],
        "BatchNormalization": [],
        "Bidirectional": [],
        "Dense": [],
        "Conv1D": [],
    }
    for layer in keras_model.layers:
        name = type(layer).__name__
        if name in groups:
            groups[name].append(layer)
    return groups


def keras_to_flax_variables(keras_model, orcai_parameter: dict) -> dict:
    """Convert a Keras reference-architecture model into flax variables.

    Returns {"params": ..., "batch_stats": ...} matching the parameter tree
    of orcai_tpu.models.crnn.ResNetLSTM / ResNet1DConv.
    """
    arch = orcai_parameter["architecture"]
    n_blocks = len(orcai_parameter["model"]["filters"])
    g = _collect_layers(keras_model)

    params: dict = {"trunk": {}}
    stats: dict = {"trunk": {}}

    def conv(layer):
        k, b = layer.get_weights()
        return {"kernel": np.asarray(k), "bias": np.asarray(b)}

    def sepconv(layer):
        dw, pw, b = layer.get_weights()
        return {
            "depthwise": {"kernel": np.transpose(dw, (0, 1, 3, 2))},
            "pointwise": {"kernel": np.asarray(pw), "bias": np.asarray(b)},
        }

    def bn(layer):
        gamma, beta, mean, var = layer.get_weights()
        return (
            {"scale": np.asarray(gamma), "bias": np.asarray(beta)},
            {"mean": np.asarray(mean), "var": np.asarray(var)},
        )

    def lstm_dir(sub):
        k, r, b = sub.get_weights()
        return {
            "kernel": np.asarray(k),
            "recurrent_kernel": np.asarray(r),
            "bias": np.asarray(b),
        }

    # trunk: conv2d order is [entry, shortcut0..shortcutN-1]
    convs = g["Conv2D"]
    params["trunk"]["entry_conv"] = conv(convs[0])
    bns = g["BatchNormalization"]
    p, s = bn(bns[0])
    params["trunk"]["entry_bn"], stats["trunk"]["entry_bn"] = p, s

    seps = g["SeparableConv2D"]
    for bi in range(n_blocks):
        params["trunk"][f"block{bi}_sep1"] = sepconv(seps[2 * bi])
        params["trunk"][f"block{bi}_sep2"] = sepconv(seps[2 * bi + 1])
        p, s = bn(bns[1 + 2 * bi])
        params["trunk"][f"block{bi}_bn1"], stats["trunk"][f"block{bi}_bn1"] = p, s
        p, s = bn(bns[2 + 2 * bi])
        params["trunk"][f"block{bi}_bn2"], stats["trunk"][f"block{bi}_bn2"] = p, s
        params["trunk"][f"block{bi}_shortcut"] = conv(convs[1 + bi])

    params["trunk"]["head_sep"] = sepconv(seps[2 * n_blocks])
    p, s = bn(bns[1 + 2 * n_blocks])
    params["trunk"]["head_bn"], stats["trunk"]["head_bn"] = p, s

    if arch == "ResNetLSTM":
        for i, bilayer in enumerate(g["Bidirectional"][:2], start=1):
            params[f"bilstm{i}"] = {
                "forward": lstm_dir(bilayer.forward_layer),
                "backward": lstm_dir(bilayer.backward_layer),
            }
        dense, out = g["Dense"][:2]
        params["dense"] = conv(dense)
        p, s = bn(bns[2 + 2 * n_blocks])
        params["dense_bn"], stats["dense_bn"] = p, s
        params["out"] = conv(out)
    else:
        (c1d,) = g["Conv1D"][:1]
        params["out_conv1d"] = conv(c1d)

    import jax.numpy as jnp
    import jax

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    stats = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), stats)
    return {"params": params, "batch_stats": stats}


def load_keras_checkpoint(path: Path | str, orcai_parameter: dict) -> dict:
    """Load a reference `.keras` archive and convert to flax variables."""
    import keras

    model = keras.saving.load_model(str(path), compile=False, safe_mode=True)
    return keras_to_flax_variables(model, orcai_parameter)


def load_keras_weights_h5(
    path: Path | str, orcai_parameter: dict, input_shape=(736, 171, 1)
) -> dict:
    """Load legacy `model_weights.h5` weights and convert to flax variables.

    Reference io.py:393-404 rebuilds the architecture and calls
    model.load_weights on the h5 file; same here, through the equivalent
    Keras graph. Handles both Keras-3 weight files and Keras-2 legacy h5
    layouts (layer_names attribute).
    """
    import h5py
    import keras

    model = build_keras_model(orcai_parameter, input_shape)
    with h5py.File(path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f
        is_legacy_layout = "layer_names" in group.attrs

    if is_legacy_layout:
        # true keras-2 era file: per-layer groups keyed by layer_names attr
        from keras.src.legacy.saving import legacy_h5_format

        with h5py.File(path, "r") as f:
            group = f["model_weights"] if "model_weights" in f else f
            legacy_h5_format.load_weights_from_hdf5_group(group, model)
    else:
        # keras-3 weights layout under a bare .h5 name: keras 3 dispatches
        # loaders on the filename, so present it with the expected suffix
        import shutil
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            renamed = Path(tmp) / "model.weights.h5"
            shutil.copyfile(path, renamed)
            model.load_weights(str(renamed))
    return keras_to_flax_variables(model, orcai_parameter)


def flax_to_keras_model(variables: dict, orcai_parameter: dict, input_shape):
    """Export flax variables into an equivalent Keras model (reverse path)."""
    model = build_keras_model(orcai_parameter, input_shape)
    arch = orcai_parameter["architecture"]
    n_blocks = len(orcai_parameter["model"]["filters"])
    params = variables["params"]
    stats = variables["batch_stats"]
    g = _collect_layers(model)

    def np_(x):
        return np.asarray(x)

    g["Conv2D"][0].set_weights(
        [np_(params["trunk"]["entry_conv"]["kernel"]),
         np_(params["trunk"]["entry_conv"]["bias"])]
    )

    def set_bn(layer, p, s):
        layer.set_weights([np_(p["scale"]), np_(p["bias"]), np_(s["mean"]), np_(s["var"])])

    set_bn(g["BatchNormalization"][0], params["trunk"]["entry_bn"],
           stats["trunk"]["entry_bn"])

    def set_sep(layer, p):
        layer.set_weights(
            [np.transpose(np_(p["depthwise"]["kernel"]), (0, 1, 3, 2)),
             np_(p["pointwise"]["kernel"]),
             np_(p["pointwise"]["bias"])]
        )

    for bi in range(n_blocks):
        set_sep(g["SeparableConv2D"][2 * bi], params["trunk"][f"block{bi}_sep1"])
        set_sep(g["SeparableConv2D"][2 * bi + 1], params["trunk"][f"block{bi}_sep2"])
        set_bn(g["BatchNormalization"][1 + 2 * bi], params["trunk"][f"block{bi}_bn1"],
               stats["trunk"][f"block{bi}_bn1"])
        set_bn(g["BatchNormalization"][2 + 2 * bi], params["trunk"][f"block{bi}_bn2"],
               stats["trunk"][f"block{bi}_bn2"])
        g["Conv2D"][1 + bi].set_weights(
            [np_(params["trunk"][f"block{bi}_shortcut"]["kernel"]),
             np_(params["trunk"][f"block{bi}_shortcut"]["bias"])]
        )

    set_sep(g["SeparableConv2D"][2 * n_blocks], params["trunk"]["head_sep"])
    set_bn(g["BatchNormalization"][1 + 2 * n_blocks], params["trunk"]["head_bn"],
           stats["trunk"]["head_bn"])

    if arch == "ResNetLSTM":
        for i, bilayer in enumerate(g["Bidirectional"][:2], start=1):
            fw = params[f"bilstm{i}"]["forward"]
            bw = params[f"bilstm{i}"]["backward"]
            bilayer.forward_layer.set_weights(
                [np_(fw["kernel"]), np_(fw["recurrent_kernel"]), np_(fw["bias"])]
            )
            bilayer.backward_layer.set_weights(
                [np_(bw["kernel"]), np_(bw["recurrent_kernel"]), np_(bw["bias"])]
            )
        g["Dense"][0].set_weights(
            [np_(params["dense"]["kernel"]), np_(params["dense"]["bias"])]
        )
        set_bn(g["BatchNormalization"][2 + 2 * n_blocks], params["dense_bn"],
               stats["dense_bn"])
        g["Dense"][1].set_weights(
            [np_(params["out"]["kernel"]), np_(params["out"]["bias"])]
        )
    else:
        g["Conv1D"][0].set_weights(
            [np_(params["out_conv1d"]["kernel"]), np_(params["out_conv1d"]["bias"])]
        )
    return model
