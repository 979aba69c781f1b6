"""Training subsystem: jit'd sharded train step, callback semantics, full
train() on a synthetic materialized dataset, resume."""

import numpy as np
import pytest

import jax

from orcai_tpu.io import read_json
from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.models import build_model
from orcai_tpu.parallel.mesh import make_mesh, mesh_for_batch
from orcai_tpu.train.trainer import (
    Trainer,
    fit,
    streaming_runners,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
    train,
)
from orcai_tpu.utils import Messenger

PARAM = {
    "name": "train-test",
    "architecture": "ResNetLSTM",
    "model": {
        "epochs": 3,
        "batch_size": 8,
        "filters": [2, 3, 4, 5],
        "kernel_size": 3,
        "dropout_rate": 0.1,
        "lstm_units": 4,
        "n_batch_train": 2,
        "n_batch_val": 1,
        "n_batch_test": 1,
        "shuffle": True,
        "learning_rate": 1e-2,
        "EarlyStopping_patience": 10,
        "ReduceLROnPlateau_patience": 3,
        "ReduceLROnPlateau_factor": 0.5,
        "ReduceLROnPlateau_min_learning_rate": 1e-7,
        "call_weights": None,
        "monitor": "val_MBA",
    },
    "calls": ["A", "B"],
    "seed": 42,
}

INPUT_SHAPE = (32, 21, 1)
OUT_STEPS = 2  # 32 / 2**4


def _synthetic_arrays(n=32, seed=0):
    """Learnable toy data: label 1 iff mean energy of the window is high."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, *INPUT_SHAPE)).astype(np.float32)
    strong = rng.integers(0, 2, size=(n, OUT_STEPS, 2)).astype(np.float32)
    for i in range(n):
        for t in range(OUT_STEPS):
            if strong[i, t, 0] > 0.5:
                x[i, t * 16 : (t + 1) * 16, :5] += 2.0
            if strong[i, t, 1] > 0.5:
                x[i, t * 16 : (t + 1) * 16, 10:15] += 2.0
    return x, strong


def test_mesh_for_batch():
    mesh = mesh_for_batch(8)
    assert mesh.shape["data"] == 8  # 8 virtual CPU devices
    mesh = mesh_for_batch(6)
    assert mesh.shape["data"] in (6, 3, 2, 1)
    assert 6 % mesh.shape["data"] == 0


def test_train_step_runs_and_learns():
    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(1e-2), mesh=mesh_for_batch(8))
    state = trainer.init_state(INPUT_SHAPE, seed=0)

    x, y = _synthetic_arrays(n=64)

    def batches(epoch):
        for b in range(8):
            yield x[b * 8 : (b + 1) * 8], y[b * 8 : (b + 1) * 8]

    state, m0 = trainer.run_train_epoch(state, batches(0))
    for _ in range(6):
        state, m = trainer.run_train_epoch(state, batches(0))
    assert m["loss"] < m0["loss"]
    assert m["MBA"] > 0.6


def test_lr_set_get():
    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(1e-2), mesh=make_mesh(n_data=1))
    state = trainer.init_state(INPUT_SHAPE, seed=0)
    assert get_learning_rate(state[2]) == pytest.approx(1e-2)
    new_opt = set_learning_rate(state[2], 5e-3)
    assert get_learning_rate(new_opt) == pytest.approx(5e-3)


def test_fit_early_stopping_and_reduce_lr():
    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(1e-3), mesh=make_mesh(n_data=1))
    state = trainer.init_state(INPUT_SHAPE, seed=0)
    x, y = _synthetic_arrays(n=8)

    def train_batches(epoch):
        yield x, y

    run_train, run_val = streaming_runners(trainer, train_batches, train_batches)
    # constant val metric -> no improvement after epoch 1 -> early stop
    state, history = fit(
        trainer,
        state,
        run_train,
        run_val,
        epochs=20,
        early_stopping_patience=4,
        reduce_lr_patience=2,
        initial_lr=1e-3,
    )
    n_epochs = len(history["loss"])
    assert n_epochs < 20  # early-stopped
    assert "val_MBA" in history and "learning_rate" in history


def test_fit_counters_exact_resume():
    """Checkpointed EarlyStopping/ReduceLR counters make a resumed run
    reduce LR at exactly the same epoch as an uninterrupted one."""
    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(1e-3), mesh=make_mesh(n_data=1))

    vals = [0.5, 0.6, 0.6, 0.59, 0.58, 0.57, 0.56, 0.55]

    def fake_train(state, epoch):
        return state, {"loss": 1.0, "MBA": 0.5}

    def fake_val(state, epoch):
        return {"val_loss": 1.0, "val_MBA": vals[epoch]}

    def run(initial_epoch=0, initial_history=None, initial_counters=None,
            epochs=len(vals), state=None, captured=None):
        if state is None:
            state = trainer.init_state(INPUT_SHAPE, seed=0)
        return fit(
            trainer, state, fake_train, fake_val,
            epochs=epochs,
            early_stopping_patience=10,
            reduce_lr_patience=3,
            initial_lr=1e-3,
            initial_epoch=initial_epoch,
            initial_history=initial_history,
            initial_counters=initial_counters,
            on_epoch_end=captured,
        )

    _, full_history = run()

    # interrupted after epoch 3 (zero-based epoch index 2)
    snapshots = []
    _, part_history = run(
        epochs=3,
        captured=lambda s, h, e, lr, c: snapshots.append((e, lr, dict(c), dict(h))),
    )
    e, lr, counters, hist = snapshots[-1]
    assert counters == {"stale_early": 1, "stale_lr": 1}  # best was epoch 2

    state = trainer.init_state(INPUT_SHAPE, seed=0)
    _, resumed_history = run(
        initial_epoch=e + 1,
        initial_history={k: list(v) for k, v in hist.items()},
        initial_counters=counters,
        state=state,
    )
    assert resumed_history["learning_rate"] == full_history["learning_rate"]


def test_fit_promotion_semantics():
    """The hpsearch promotion contract (run_trial's fit wiring): fresh
    callback counters give a promoted trial its full patience budget in
    the new rung, and seeding best-restore with the carried weights makes
    fit return weights consistent with score = max(carried history) when
    the rung never improves. Regression: promoted trials used to inherit
    an approximated staleness >= patience from the carried history (one
    epoch, then stop) and returned final-epoch weights under a
    carried-best score."""
    import flax.serialization

    from orcai_tpu.train.trainer import variables_from_bytes

    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(1e-3), mesh=make_mesh(n_data=1))
    state0 = trainer.init_state(INPUT_SHAPE, seed=0)
    carried_bytes = flax.serialization.to_bytes(
        {"params": jax.device_get(state0[0]),
         "batch_stats": jax.device_get(state0[1])}
    )
    # carried rung: best at its first epoch, then four stale epochs
    carried = {"val_MBA": [0.9, 0.5, 0.5, 0.5, 0.5],
               "MBA": [0.5] * 5, "loss": [1.0] * 5, "val_loss": [1.0] * 5,
               "learning_rate": [1e-3] * 5}

    def fake_train(state, epoch):
        # drift the params so the final state is distinguishable from the
        # carried one
        drifted = jax.tree.map(lambda p: p + 1.0, state[0])
        return (drifted, state[1], state[2], state[3]), {
            "loss": 1.0, "MBA": 0.5,
        }

    def fake_val(state, epoch):
        return {"val_loss": 1.0, "val_MBA": 0.4}  # never beats 0.9

    state, history = fit(
        trainer, state0, fake_train, fake_val,
        epochs=len(carried["val_MBA"]) + 6,
        early_stopping_patience=3,
        reduce_lr_patience=10,
        initial_lr=1e-3,
        initial_epoch=len(carried["val_MBA"]),
        initial_history=carried,
        initial_best_state_bytes=carried_bytes,
        initial_counters={"stale_early": 0, "stale_lr": 0},
    )
    # the full patience budget ran in the new rung
    assert len(history["val_MBA"]) - 5 == 3
    # returned weights are the carried best, not the drifted final state
    best = variables_from_bytes(state0, carried_bytes)
    jax.tree.map(np.testing.assert_array_equal, state[0], best["params"])

    # contrast: without explicit counters fit approximates staleness from
    # the carried history (the train-resume path) — already >= patience
    # here, so the run stops after a single epoch
    _, approx_history = fit(
        trainer, trainer.init_state(INPUT_SHAPE, seed=0),
        fake_train, fake_val,
        epochs=len(carried["val_MBA"]) + 6,
        early_stopping_patience=3,
        reduce_lr_patience=10,
        initial_lr=1e-3,
        initial_epoch=len(carried["val_MBA"]),
        initial_history={k: list(v) for k, v in carried.items()},
    )
    assert len(approx_history["val_MBA"]) - 5 == 1


def test_train_e2e_and_resume(tmp_path):
    x, y = _synthetic_arrays(n=32)

    class ListLoader:
        def __len__(self):
            return len(x)

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["train", "val"]:
        ArrayDataset.save_from_loader(
            ListLoader(), tmp_path / f"{split}_dataset", compression=None
        )
    import json

    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [OUT_STEPS, 2]})
    )

    out = tmp_path / "out"
    out.mkdir()
    train(
        tmp_path,
        out,
        orcai_parameter=PARAM,
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    model_dir = out / "train-test"
    assert (model_dir / "train-test.msgpack").exists()
    assert (model_dir / "orcai_parameter.json").exists()
    shape = read_json(model_dir / "model_shape.json")
    assert shape == {"input_shape": list(INPUT_SHAPE), "num_labels": 2}
    history = read_json(model_dir / "training_history.json")
    assert len(history["loss"]) == 3

    # resume from saved model
    train(
        tmp_path,
        out,
        orcai_parameter=PARAM,
        load_model=True,
        max_epochs=1,
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    history2 = read_json(model_dir / "training_history.json")
    assert len(history2["loss"]) == 1


def test_train_with_null_seed(tmp_path):
    """The shipped default parameter has "seed": null — training must run
    with unseeded shuffles instead of crashing in SeedSequence."""
    import json

    x, y = _synthetic_arrays(n=16)

    class ListLoader:
        def __len__(self):
            return len(x)

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["train", "val"]:
        ArrayDataset.save_from_loader(
            ListLoader(), tmp_path / f"{split}_dataset", compression=None
        )
    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [OUT_STEPS, 2]})
    )
    out = tmp_path / "out"
    out.mkdir()
    param = {**PARAM, "name": "null-seed", "seed": None,
             "model": {**PARAM["model"], "epochs": 1}}
    train(tmp_path, out, orcai_parameter=param,
          msgr=Messenger(verbosity=0), verbosity=0,
          preemption_checkpointing=False)
    assert (out / "null-seed" / "null-seed.msgpack").exists()


def test_load_model_resume_keeps_reduced_lr(tmp_path):
    """--load_model resume must continue at the optimizer's restored
    learning rate; ReduceLROnPlateau may never RAISE the effective LR."""
    import json

    import flax.serialization

    from orcai_tpu.train.trainer import get_learning_rate, set_learning_rate

    x, y = _synthetic_arrays(n=16)

    class ListLoader:
        def __len__(self):
            return len(x)

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["train", "val"]:
        ArrayDataset.save_from_loader(
            ListLoader(), tmp_path / f"{split}_dataset", compression=None
        )
    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [OUT_STEPS, 2]})
    )
    out = tmp_path / "out"
    out.mkdir()
    param = {**PARAM, "name": "lr-resume",
             "model": {**PARAM["model"], "epochs": 1}}
    train(tmp_path, out, orcai_parameter=param,
          msgr=Messenger(verbosity=0), verbosity=0,
          preemption_checkpointing=False)
    model_dir = out / "lr-resume"

    # simulate a prior ReduceLROnPlateau by rewriting the saved opt state LR
    opt_path = model_dir / "lr-resume.opt.msgpack"
    model = build_model(param)
    trainer = Trainer(model, make_optimizer(param["model"]["learning_rate"]))
    state = trainer.init_state(INPUT_SHAPE, seed=0)
    template = jax.device_get(state[2])
    restored_opt = flax.serialization.from_bytes(template, opt_path.read_bytes())
    reduced = set_learning_rate(restored_opt, 1e-5)
    opt_path.write_bytes(
        flax.serialization.to_bytes(jax.device_get(reduced))
    )

    train(tmp_path, out, orcai_parameter=param, load_model=True,
          msgr=Messenger(verbosity=0), verbosity=0,
          preemption_checkpointing=False)
    history = read_json(model_dir / "training_history.json")
    assert history["learning_rate"][-1] == pytest.approx(1e-5)
