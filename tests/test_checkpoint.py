"""Preemption-safe orbax checkpointing: save, restore, resumed training."""

import numpy as np

from orcai_tpu.models import build_model
from orcai_tpu.parallel.mesh import make_mesh
from orcai_tpu.train.checkpoint import TrainCheckpointer
from orcai_tpu.train.trainer import Trainer, get_learning_rate, make_optimizer

PARAM = {
    "name": "ckpt-test",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [2, 3],
        "kernel_size": 3,
        "dropout_rate": 0.1,
        "lstm_units": 4,
    },
    "calls": ["A", "B"],
}
INPUT_SHAPE = (16, 9, 1)  # 16 / 2**2 = 4 output steps


def _trainer_state():
    model = build_model(PARAM)
    trainer = Trainer(model, make_optimizer(1e-2), mesh=make_mesh(n_data=1))
    state = trainer.init_state(INPUT_SHAPE, seed=0)
    return trainer, state


def test_save_restore_roundtrip(tmp_path):
    import jax

    trainer, state = _trainer_state()
    # advance the state one step so the optimizer state is non-trivial
    x = np.random.default_rng(0).uniform(size=(4, *INPUT_SHAPE)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 2, size=(4, 4, 2)).astype(np.float32)
    state, _ = trainer.train_step(state, x, y)

    history = {"loss": [0.5, 0.4], "val_MBA": [0.6, 0.7]}
    ckpt = TrainCheckpointer(tmp_path / "resume")
    ckpt.save(1, state, history, lr=5e-3,
              counters={"stale_early": 2, "stale_lr": 1})

    trainer2, template = _trainer_state()
    ckpt2 = TrainCheckpointer(tmp_path / "resume")
    restored = ckpt2.restore(template)
    assert restored is not None
    r_state, r_history, r_lr, r_epoch, r_counters = restored
    assert r_epoch == 1
    assert r_lr == 5e-3
    assert r_history == history
    assert r_counters == {"stale_early": 2, "stale_lr": 1}

    for a, b in zip(jax.tree.leaves(state[0]), jax.tree.leaves(r_state[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert get_learning_rate(r_state[2]) == get_learning_rate(state[2])

    # the restored state must be usable for further training steps
    r_state, metrics = trainer2.train_step(r_state, x, y)
    assert np.isfinite(np.asarray(metrics)[0])

    ckpt2.cleanup()
    assert not (tmp_path / "resume").exists()


def test_restore_empty_returns_none(tmp_path):
    _, state = _trainer_state()
    ckpt = TrainCheckpointer(tmp_path / "resume")
    assert ckpt.restore(state) is None
    ckpt.close()
