"""Model directory save/load.

Directory layout mirrors the reference's model dirs (train.py:221-239):

    <model_dir>/
      orcai_parameter.json
      model_shape.json
      <name>.msgpack            flax variables (our native format)
      <name>.opt.msgpack        optimizer state (optional, for resume)
      train_state.json          epoch / lr / best-metric (optional)
      training_history.json     per-epoch metrics

Loading falls back to a reference-format `<name>.keras` archive, converted
on the fly (io.py:357-410 analogue), so reference model dirs are drop-in
usable.
"""

from __future__ import annotations

from pathlib import Path

import flax.serialization
import jax
import jax.numpy as jnp

from orcai_tpu.io.jsonio import read_json, write_json
from orcai_tpu.models import build_model


def save_variables(variables: dict, path: Path | str) -> None:
    data = flax.serialization.to_bytes(jax.device_get(variables))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(data)


def load_variables(path: Path | str, template: dict | None = None) -> dict:
    raw = Path(path).read_bytes()
    if template is not None:
        return flax.serialization.from_bytes(template, raw)
    # untyped load: msgpack dict of numpy arrays
    state = flax.serialization.msgpack_restore(raw)
    return jax.tree.map(jnp.asarray, state)


def save_orcai_model(
    model_dir: Path | str,
    orcai_parameter: dict,
    variables: dict,
    input_shape=(736, 171, 1),
    opt_state_bytes: bytes | None = None,
    train_state: dict | None = None,
) -> None:
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    name = orcai_parameter["name"]
    save_variables(variables, model_dir / f"{name}.msgpack")
    write_json(orcai_parameter, model_dir / "orcai_parameter.json")
    write_json(
        {"input_shape": list(input_shape), "num_labels": len(orcai_parameter["calls"])},
        model_dir / "model_shape.json",
    )
    if opt_state_bytes is not None:
        (model_dir / f"{name}.opt.msgpack").write_bytes(opt_state_bytes)
    if train_state is not None:
        write_json(train_state, model_dir / "train_state.json")


def load_orcai_model(model_dir: Path | str, dtype=jnp.float32):
    """Load (model, variables, orcai_parameter, shape) from a model dir.

    Accepts our native msgpack checkpoints or reference-format `.keras`
    archives (converted via keras_convert).
    """
    model_dir = Path(model_dir)
    orcai_parameter = read_json(model_dir / "orcai_parameter.json")
    shape = read_json(model_dir / "model_shape.json")
    name = orcai_parameter["name"]
    model = build_model(orcai_parameter, dtype=dtype)

    msgpack_path = model_dir / f"{name}.msgpack"
    keras_path = model_dir / f"{name}.keras"
    legacy_h5_path = model_dir / "model_weights.h5"
    if msgpack_path.exists():
        # untyped restore: no on-device init needed just to load weights
        variables = load_variables(msgpack_path)
    elif keras_path.exists():
        from orcai_tpu.io.keras_convert import load_keras_checkpoint

        variables = load_keras_checkpoint(keras_path, orcai_parameter)
    elif legacy_h5_path.exists():
        # legacy reference model dir (io.py:393-404): rebuild the arch and
        # load bare h5 weights
        from orcai_tpu.io.keras_convert import load_keras_weights_h5

        variables = load_keras_weights_h5(
            legacy_h5_path, orcai_parameter, tuple(shape["input_shape"])
        )
    else:
        raise ValueError(
            f"Couldn't find model weights ({name}.msgpack, {name}.keras or "
            f"model_weights.h5) in {model_dir}"
        )
    return model, variables, orcai_parameter, shape
