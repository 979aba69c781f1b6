"""Hyperparameter search: Hyperband implemented as a host-side scheduler.

L4 equivalent of reference hpsearch.py:21-257, which delegates to
keras-tuner's Hyperband (max_epochs=10, objective max val_MBA). Here the
Hyperband bracket/successive-halving logic is explicit: each trial is one
jit-compiled training run on the device mesh (every trial is already
data-parallel across the mesh; the reference's --parallel flag wrapped
trials in a MirroredStrategy, hpsearch.py:186-205). Outputs preserved:
hps_logs/best_hyperparameters.json + all_trials.csv with per-trial
hyperparameters, score and status.

Search space schema matches default_hps_parameter.json: named filter sets,
kernel_size / dropout_rate / lstm_units / batch_size choices.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pandas as pd

from orcai_tpu.io import read_json, write_json
from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.models import build_model
from orcai_tpu.parallel.mesh import mesh_for_batch
from orcai_tpu.resources import (
    DEFAULT_HPS_PARAMETER,
    DEFAULT_ORCAI_PARAMETER as DEFAULT_PARAMETER,
)
from orcai_tpu.train.trainer import (
    DeviceData,
    Trainer,
    device_runners,
    fit,
    make_optimizer,
    streaming_runners,
)
from orcai_tpu.utils import (
    Messenger,
    SEED_ID_LOAD_TEST_DATA,
    SEED_ID_LOAD_VAL_DATA,
)


def sample_configs(hps_parameter: dict, n: int, rng: np.random.Generator):
    """n distinct hyperparameter combinations from the choice grid."""
    keys_sets = {
        "filters": list(hps_parameter["filters"].keys()),
        "kernel_size": hps_parameter["kernel_size"],
        "dropout_rate": hps_parameter["dropout_rate"],
        "batch_size": hps_parameter["batch_size"],
    }
    if "lstm_units" in hps_parameter:
        keys_sets["lstm_units"] = hps_parameter["lstm_units"]

    total = math.prod(len(v) for v in keys_sets.values())
    n = min(n, total)
    seen = set()
    configs = []
    while len(configs) < n:
        cfg = {k: v[rng.integers(len(v))] for k, v in keys_sets.items()}
        key = tuple(cfg.items())
        if key not in seen:
            seen.add(key)
            configs.append(cfg)
    return configs


def hyperband_schedule(max_epochs: int, factor: int = 3):
    """Bracket schedule [(n_configs, [epochs per rung])] for Hyperband."""
    s_max = int(math.log(max_epochs) / math.log(factor))
    brackets = []
    for s in range(s_max, -1, -1):
        n = math.ceil((s_max + 1) / (s + 1) * factor**s)
        rungs = []
        for i in range(s + 1):
            n_i = max(1, math.floor(n * factor**-i))
            r_i = max(1, round(max_epochs * factor ** (i - s)))
            rungs.append((n_i, r_i))
        brackets.append(rungs)
    return brackets


def _apply_config(orcai_parameter: dict, hps_parameter: dict, cfg: dict) -> dict:
    param = {
        **orcai_parameter,
        "model": {**orcai_parameter["model"]},
    }
    param["model"]["filters"] = hps_parameter["filters"][cfg["filters"]]
    param["model"]["kernel_size"] = cfg["kernel_size"]
    param["model"]["dropout_rate"] = cfg["dropout_rate"]
    param["model"]["batch_size"] = cfg["batch_size"]
    if "lstm_units" in cfg:
        if "lstm_units" not in orcai_parameter["model"]:
            raise ValueError(
                "LSTM units not in model parameter. Is the right model specified?"
            )
        param["model"]["lstm_units"] = cfg["lstm_units"]
    elif "lstm_units" in orcai_parameter["model"]:
        raise ValueError(
            "LSTM units not in hyperparameter search parameter. "
            "Is the right model specified?"
        )
    return param


def hyperparameter_search(
    data_dir: Path | str,
    output_dir: Path | str,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    hps_parameter: dict | Path | str = DEFAULT_HPS_PARAMETER,
    parallel: bool = False,
    data_compression: str | None = "GZIP",
    verbosity: int = 2,
    msgr: Messenger | None = None,
    max_epochs: int = 10,
    factor: int = 3,
) -> None:
    """Hyperband search over the configured space.

    Writes hps_logs/best_hyperparameters.json and hps_logs/all_trials.csv
    under output_dir (reference hpsearch.py:243-253).
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Hyperparameter search")

    msgr.part("Loading Hyperparameter search parameter")
    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)
    if isinstance(hps_parameter, (Path, str)):
        hps_parameter = read_json(hps_parameter)
    msgr.debug(hps_parameter)
    model_name = orcai_parameter["name"]
    monitor = orcai_parameter["model"]["monitor"]

    msgr.part(f"Loading training and validation datasets from {data_dir}")
    data_dir = Path(data_dir)
    dataset_shape = read_json(data_dir / "dataset_shapes.json")
    train_ds = ArrayDataset.load(data_dir / "train_dataset")
    val_ds = ArrayDataset.load(data_dir / "val_dataset")
    train_seed = [SEED_ID_LOAD_TEST_DATA, orcai_parameter["seed"]]
    val_seed = [SEED_ID_LOAD_VAL_DATA, orcai_parameter["seed"]]

    hps_logs_dir = Path(output_dir) / "hps_logs"
    hps_logs_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import os

    # one HBM-resident copy of the datasets shared by every trial
    limit = int(os.environ.get("ORCAI_TPU_DEVICE_DATASET_BYTES", 6_000_000_000))
    device_data = None
    if train_ds.x.nbytes + val_ds.x.nbytes <= limit:
        msgr.info("Datasets HBM-resident: shared across trials")
        device_data = (DeviceData(train_ds), DeviceData(val_ds))

    if parallel:
        msgr.info(
            f"Parallel - every trial data-parallel over {len(jax.devices())} devices"
        )
    rng = np.random.default_rng(
        [13, orcai_parameter["seed"]] if orcai_parameter["seed"] else None
    )

    def run_trial(cfg: dict, epochs: int, trial_id: str) -> dict:
        param = _apply_config(orcai_parameter, hps_parameter, cfg)
        mp = param["model"]
        model = build_model(param)
        trainer = Trainer(
            model,
            make_optimizer(mp["learning_rate"]),
            mesh=mesh_for_batch(mp["batch_size"]),
        )
        seed_int = (
            int(orcai_parameter["seed"]) % (2**31)
            if orcai_parameter["seed"]
            else 0
        )
        state = trainer.init_state(tuple(dataset_shape["spectrogram"]), seed=seed_int)
        if device_data is not None:
            run_train, run_val = device_runners(
                trainer, device_data[0], device_data[1],
                mp["batch_size"], train_seed, val_seed,
            )
        else:
            run_train, run_val = streaming_runners(
                trainer,
                lambda e: train_ds.batches(mp["batch_size"], seed=train_seed, epoch=e),
                lambda e: val_ds.batches(mp["batch_size"], seed=val_seed, epoch=e),
            )
        state, history = fit(
            trainer,
            state,
            run_train,
            run_val,
            epochs=epochs,
            monitor=monitor,
            early_stopping_patience=5,
            reduce_lr_patience=mp["ReduceLROnPlateau_patience"],
            reduce_lr_factor=mp["ReduceLROnPlateau_factor"],
            reduce_lr_min=mp["ReduceLROnPlateau_min_learning_rate"],
            msgr=Messenger(verbosity=0),
            initial_lr=mp["learning_rate"],
        )
        score = max(history[monitor])
        record = {
            **cfg,
            "trial_id": trial_id,
            "epochs": epochs,
            "score": score,
            monitor: score,
            "val_loss": min(history["val_loss"]),
            "status": "COMPLETED",
        }
        return record

    brackets = hyperband_schedule(max_epochs, factor)
    msgr.part(
        f"Searching hyperparameters: Hyperband max_epochs={max_epochs} "
        f"factor={factor}, {len(brackets)} brackets"
    )

    all_trials: list[dict] = []
    trial_counter = 0
    best = {"score": -np.inf, "config": None}

    for b, rungs in enumerate(brackets):
        n0, _ = rungs[0]
        configs = sample_configs(hps_parameter, n0, rng)
        msgr.info(f"Bracket {b}: rungs {rungs}, {len(configs)} configs")
        for rung_idx, (n_i, r_i) in enumerate(rungs):
            configs = configs[:n_i]
            scored = []
            for cfg in configs:
                trial_id = f"b{b}r{rung_idx}t{trial_counter:03d}"
                trial_counter += 1
                record = run_trial(cfg, r_i, trial_id)
                all_trials.append(record)
                scored.append((record["score"], cfg))
                msgr.info(
                    f"  trial {trial_id}: {cfg} -> {monitor}={record['score']:.4f}"
                )
                if record["score"] > best["score"]:
                    best = {"score": record["score"], "config": cfg}
            # promote the top 1/factor to the next rung
            scored.sort(key=lambda t: t[0], reverse=True)
            configs = [cfg for _, cfg in scored]

    msgr.part("Best Hyperparameters")
    msgr.info(best["config"])
    write_json(best["config"], hps_logs_dir / "best_hyperparameters.json")
    pd.DataFrame(all_trials).to_csv(hps_logs_dir / "all_trials.csv", index=False)
    msgr.info(f"Saved trial data to {hps_logs_dir / 'all_trials.csv'}")
    msgr.success("Hyperparameter search completed")
