import json

import numpy as np
import pandas as pd

from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.train.hpsearch import (
    hyperband_schedule,
    hyperparameter_search,
    sample_configs,
)
from orcai_tpu.utils import Messenger

INPUT_SHAPE = (32, 21, 1)

PARAM = {
    "name": "hps-test",
    "architecture": "ResNetLSTM",
    "model": {
        "epochs": 2,
        "batch_size": 8,
        "filters": [2, 3, 4, 5],
        "kernel_size": 3,
        "dropout_rate": 0.1,
        "lstm_units": 4,
        "learning_rate": 1e-2,
        "ReduceLROnPlateau_patience": 3,
        "ReduceLROnPlateau_factor": 0.5,
        "ReduceLROnPlateau_min_learning_rate": 1e-7,
        "monitor": "val_MBA",
    },
    "calls": ["A", "B"],
    "seed": 7,
}

HPS = {
    "filters": {"tiny": [2, 3, 4, 5], "small": [3, 4, 5, 6]},
    "lstm_units": [4],
    "dropout_rate": [0.1],
    "kernel_size": [3],
    "batch_size": [8],
}


def test_hyperband_schedule():
    brackets = hyperband_schedule(10, 3)
    assert len(brackets) == 3
    # last bracket trains full budget directly
    assert brackets[-1][0][1] == 10
    # rungs shrink configs and grow epochs
    for rungs in brackets:
        ns = [n for n, _ in rungs]
        rs = [r for _, r in rungs]
        assert ns == sorted(ns, reverse=True)
        assert rs == sorted(rs)


def test_sample_configs_unique():
    rng = np.random.default_rng(0)
    configs = sample_configs(HPS, 10, rng)
    assert len(configs) == 2  # grid only has 2 combos
    assert configs[0] != configs[1]


def test_hpsearch_e2e(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(16, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, 2, size=(16, 2, 2)).astype(np.float32)

    class L:
        def __len__(self):
            return len(x)

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["train", "val"]:
        ArrayDataset.save_from_loader(L(), tmp_path / f"{split}_dataset",
                                      compression=None)
    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [2, 2]})
    )
    out = tmp_path / "out"
    out.mkdir()
    hyperparameter_search(
        tmp_path,
        out,
        orcai_parameter=PARAM,
        hps_parameter=HPS,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        max_epochs=2,
        factor=2,
    )
    logs = out / "hps_logs"
    best = json.loads((logs / "best_hyperparameters.json").read_text())
    assert best["filters"] in ("tiny", "small")
    trials = pd.read_csv(logs / "all_trials.csv")
    assert len(trials) >= 3
    assert {"filters", "score", "status"}.issubset(trials.columns)
    assert (trials["status"] == "COMPLETED").all()
    # best model checkpointed for direct loading
    from orcai_tpu.io.model_store import load_orcai_model

    model, variables, param, shape = load_orcai_model(
        out / PARAM["name"] / "hps"
    )
    assert "params" in variables

    # a re-run resumes from the trial store: no trial retrained, same best
    hyperparameter_search(
        tmp_path,
        out,
        orcai_parameter=PARAM,
        hps_parameter=HPS,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        max_epochs=2,
        factor=2,
    )
    trials2 = pd.read_csv(logs / "all_trials.csv")
    assert (trials2["status"] == "CACHED").all()
    assert trials2["score"].tolist() == trials["score"].tolist()
    best2 = json.loads((logs / "best_hyperparameters.json").read_text())
    assert best2 == best


def test_hpsearch_parallel(tmp_path):
    """--parallel fans rung trials out across the virtual 8-device mesh."""
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(16, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, 2, size=(16, 2, 2)).astype(np.float32)

    class L:
        def __len__(self):
            return len(x)

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["train", "val"]:
        ArrayDataset.save_from_loader(L(), tmp_path / f"{split}_dataset",
                                      compression=None)
    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [2, 2]})
    )
    out = tmp_path / "out"
    out.mkdir()
    hyperparameter_search(
        tmp_path,
        out,
        orcai_parameter=PARAM,
        hps_parameter=HPS,
        parallel=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        max_epochs=2,
        factor=2,
    )
    trials = pd.read_csv(out / "hps_logs" / "all_trials.csv")
    assert (trials["status"] == "COMPLETED").all()
    assert (out / "hps_logs" / "best_hyperparameters.json").exists()


def test_hpsearch_seedless_resume(tmp_path):
    """With a falsy project seed the search draws and persists its own
    sampling seed, so a re-run still resumes deterministically (every trial
    CACHED with identical configs)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(16, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, 2, size=(16, 2, 2)).astype(np.float32)

    class L:
        def __len__(self):
            return len(x)

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["train", "val"]:
        ArrayDataset.save_from_loader(L(), tmp_path / f"{split}_dataset",
                                      compression=None)
    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [2, 2]})
    )
    out = tmp_path / "out"
    out.mkdir()
    param = {**PARAM, "name": "hps-seedless", "seed": None}
    kwargs = dict(
        orcai_parameter=param, hps_parameter=HPS,
        msgr=Messenger(verbosity=0), verbosity=0, max_epochs=2, factor=2,
    )
    hyperparameter_search(tmp_path, out, **kwargs)
    logs = out / "hps_logs"
    assert (logs / "hps-seedless" / "search_seed.json").exists()
    trials = pd.read_csv(logs / "all_trials.csv")
    assert (trials["status"] == "COMPLETED").all()

    hyperparameter_search(tmp_path, out, **kwargs)
    trials2 = pd.read_csv(logs / "all_trials.csv")
    assert (trials2["status"] == "CACHED").all()
    assert trials2["filters"].tolist() == trials["filters"].tolist()
    assert trials2["score"].tolist() == trials["score"].tolist()
