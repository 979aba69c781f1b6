"""Hyperparameter search: Hyperband implemented as a host-side scheduler.

L4 equivalent of reference hpsearch.py:21-257, which delegates to
keras-tuner's Hyperband (max_epochs=10, objective max val_MBA). Here the
Hyperband bracket/successive-halving logic is explicit and TPU-shaped:

- every trial is one jit-compiled training run on a device mesh;
- trial state persists under hps_logs/<name>/ and an interrupted search
  resumes without repeating completed trials (keras-tuner persists trials
  under its project directory the same way, hpsearch.py:184-235);
- weights carry across Hyperband rungs: a promoted config continues
  training from its previous rung's best weights instead of restarting
  (keras-tuner semantics: each rung reloads the trial checkpoint);
- --parallel fans the independent trials of a rung out across devices,
  one single-device mesh per trial, overlapping via async dispatch (the
  reference wrapped keras-tuner in a MirroredStrategy, hpsearch.py:186-205).
  The fan-out is thread-based, so per-trial HOST work (epoch permutation
  generation, metric device_get) serializes on the GIL — ample for this
  model family's trial sizes; very large per-trial host work would need a
  process pool or device-side permutation generation;
- multi-host pod slices partition every rung's trials round-robin by
  process index, with the shared TrialStore as the rendezvous and process
  0 as the single publisher (process_trial_partition).

Outputs preserved: hps_logs/best_hyperparameters.json + all_trials.csv with
per-trial hyperparameters, score and status; the running best model is
checkpointed to <output_dir>/<name>/hps/ (reference hpsearch.py:231-236).

Search space schema matches default_hps_parameter.json: named filter sets,
kernel_size / dropout_rate / lstm_units / batch_size choices.
"""

from __future__ import annotations

import json
import math
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd

from orcai_tpu.io import read_json, write_json
from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.models import build_model
from orcai_tpu.parallel.mesh import make_mesh, mesh_for_batch
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
    resolve_compute_dtype,
    streaming_runners,
    variables_from_bytes,
)
from orcai_tpu.utils import (
    Messenger,
    SEED_ID_LOAD_TRAIN_DATA,
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


def process_trial_partition(
    n_submissions: int, process_id: int, process_count: int
) -> list[int]:
    """Round-robin split of a rung's trials across pod-slice processes.

    Deterministic in (process_id, process_count) so every host computes the
    same assignment from the same Hyperband schedule without communicating
    (SURVEY §2: hpsearch fans independent trials across pod-slice hosts).
    """
    from orcai_tpu.parallel.distributed import process_partition

    return process_partition(n_submissions, process_id, process_count)


def local_device_ranks(indices) -> dict[int, int]:
    """Global submission index -> dense 0-based rank within one process's
    share. Trial->device assignment must use this rank, not the global
    index: round-robin partitions make every global index congruent to
    process_id modulo process_count, so `devices[i % n_workers]` would pin
    all of a process's trials onto a single local device."""
    return {i: r for r, i in enumerate(sorted(indices))}


def _wait_for_trial(store: "TrialStore", trial_id: str,
                    timeout_s: float, poll_s: float = 2.0) -> dict:
    """Block until another process's trial record lands in the shared store."""
    import time

    t0 = time.time()
    while True:
        record = store.load(trial_id)
        if record is not None:
            return {**record, "status": "CACHED"}
        if time.time() - t0 > timeout_s:
            raise TimeoutError(
                f"trial {trial_id} (assigned to another process) did not "
                f"appear in the trial store within {timeout_s:.0f}s"
            )
        time.sleep(poll_s)


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


class TrialStore:
    """Completed-trial records + carried weights under hps_logs/<name>/.

    One JSON per trial keyed by a deterministic trial id. The Hyperband
    schedule is a pure function of the seed and the recorded scores, so
    replaying the schedule against the store resumes an interrupted search
    exactly, skipping every trial that already completed.
    """

    def __init__(self, directory: Path):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)

    def record_path(self, trial_id: str) -> Path:
        return self.directory / f"trial_{trial_id}.json"

    def weights_path(self, trial_id: str) -> Path:
        return self.directory / f"trial_{trial_id}.msgpack"

    def load(self, trial_id: str) -> dict | None:
        path = self.record_path(trial_id)
        if not path.exists():
            return None
        with open(path) as f:
            return json.load(f)

    def save(self, trial_id: str, record: dict, state_bytes: bytes) -> None:
        self.weights_path(trial_id).write_bytes(state_bytes)
        tmp = self.record_path(trial_id).with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        tmp.replace(self.record_path(trial_id))  # atomic: record implies weights

    def load_weights(self, trial_id: str) -> bytes | None:
        path = self.weights_path(trial_id)
        return path.read_bytes() if path.exists() else None


def hyperparameter_search(
    data_dir: Path | str,
    output_dir: Path | str,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    hps_parameter: dict | Path | str = DEFAULT_HPS_PARAMETER,
    parallel: bool = False,
    data_compression: str | None = None,
    verbosity: int = 2,
    msgr: Messenger | None = None,
    max_epochs: int = 10,
    factor: int = 3,
    early_stopping_patience: int = 5,
) -> None:
    """Hyperband search over the configured space.

    Writes hps_logs/best_hyperparameters.json and hps_logs/all_trials.csv
    under output_dir (reference hpsearch.py:243-253); per-trial state under
    hps_logs/<name>/ makes the search resumable. early_stopping_patience
    matches the reference's in-trial EarlyStopping (hpsearch.py:222-228).
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

    hps_logs_dir = Path(output_dir) / "hps_logs"
    hps_logs_dir.mkdir(parents=True, exist_ok=True)
    store = TrialStore(hps_logs_dir / model_name)

    # resumability requires deterministic sampling AND data order: without a
    # project seed, draw one on the first run and persist it with the store
    search_seed = orcai_parameter["seed"]
    if search_seed is None:  # seed 0 is a real seed; only null draws one
        import jax as _jax

        seed_file = store.directory / "search_seed.json"
        if seed_file.exists():
            search_seed = json.loads(seed_file.read_text())["seed"]
        elif _jax.process_count() > 1 and _jax.process_index() != 0:
            # every process must search the SAME schedule: only process 0
            # draws; the persisted seed file is the rendezvous
            import time as _time

            deadline = _time.time() + 300
            while not seed_file.exists():
                if _time.time() > deadline:
                    raise TimeoutError(
                        "waiting for process 0 to persist search_seed.json"
                    )
                _time.sleep(0.5)
            search_seed = json.loads(seed_file.read_text())["seed"]
        else:
            search_seed = int(np.random.SeedSequence().entropy % (2**63))
            tmp = seed_file.with_suffix(".tmp")
            tmp.write_text(json.dumps({"seed": search_seed}))
            tmp.replace(seed_file)  # atomic publish
    # the reference's hpsearch shuffles its TRAINING data with the
    # test-data seed ID (reference hpsearch.py:174, an upstream copy-paste
    # slip that collides with evaluate's test stream and diverges from its
    # own train.py); not replicated, like the DATA_TYPES mutation bug
    train_seed = [SEED_ID_LOAD_TRAIN_DATA, search_seed]
    val_seed = [SEED_ID_LOAD_VAL_DATA, search_seed]

    import flax.serialization
    import jax
    import os

    devices = jax.local_devices()
    n_workers = len(devices) if parallel else 1
    if parallel and len(devices) == 1:
        msgr.warning(
            "--parallel requested but only one device is visible; "
            "trials run sequentially"
        )
    # pod-slice fan-out: with multiple controller processes, each runs its
    # round-robin share of every rung and reads the rest from the store
    process_id = jax.process_index()
    process_count = jax.process_count()
    rendezvous_timeout = float(
        os.environ.get("ORCAI_TPU_HPS_RENDEZVOUS_TIMEOUT_S", 3600)
    )
    if process_count > 1:
        msgr.info(
            f"Multi-host search: process {process_id}/{process_count}, "
            "trials partitioned round-robin with the trial store as "
            "rendezvous"
        )

    # HBM-resident datasets shared by every trial on the same device
    limit = int(os.environ.get("ORCAI_TPU_DEVICE_DATASET_BYTES", 6_000_000_000))
    hbm_resident = (train_ds.x.nbytes + val_ds.x.nbytes) * n_workers <= limit
    device_data_cache: dict[int, tuple] = {}
    # check-then-insert must be atomic: with more submissions than workers, a
    # thread freed early (e.g. by a cached trial) can race another onto the
    # same device and duplicate the dataset upload + its HBM footprint
    import threading

    device_data_lock = threading.Lock()

    def device_data_for(device) -> tuple | None:
        """HBM-resident copy pinned to `device`, or the shared uncommitted
        copy when device is None (sequential mode: the trial mesh may span
        all devices, and committed inputs would fight its shardings)."""
        if not hbm_resident:
            return None
        key = id(device) if device is not None else None
        with device_data_lock:
            if key not in device_data_cache:
                device_data_cache[key] = (
                    DeviceData(train_ds, device=device),
                    DeviceData(val_ds, device=device),
                )
            return device_data_cache[key]

    if hbm_resident:
        msgr.info("Datasets HBM-resident: shared across trials")
    rng = np.random.default_rng([13, search_seed])
    seed_int = int(search_seed) % (2**31)

    def run_trial(
        cfg: dict,
        epochs: int,
        trial_id: str,
        device,
        initial_epoch: int = 0,
        carry_from: str | None = None,
    ) -> dict:
        cached = store.load(trial_id)
        if cached is not None:
            return {**cached, "status": "CACHED"}

        param = _apply_config(orcai_parameter, hps_parameter, cfg)
        mp = param["model"]
        model = build_model(param, dtype=resolve_compute_dtype(mp))
        mesh = (
            make_mesh(n_data=1, devices=[device])
            if device is not None
            # each process trains DIFFERENT trials: the trial mesh must stay
            # on local devices or multi-host trials would deadlock waiting
            # for collectives the other processes never join
            else mesh_for_batch(
                mp["batch_size"],
                devices=devices if process_count > 1 else None,
            )
        )
        trainer = Trainer(model, make_optimizer(mp["learning_rate"]), mesh=mesh)
        state = trainer.init_state(tuple(dataset_shape["spectrogram"]), seed=seed_int)
        initial_history = None
        initial_best_state_bytes = None
        if carry_from is not None:
            carried = store.load_weights(carry_from)
            prev_record = store.load(carry_from)
            if carried is not None and prev_record is not None:
                best = variables_from_bytes(state, carried)
                state = (
                    best["params"], best["batch_stats"], state[2], state[3]
                )
                initial_history = prev_record.get("history")
                # the carried weights are the best state seen so far: seed
                # fit's best-restore with them so a rung that never beats
                # the carried score still returns (and persists) weights
                # consistent with the recorded score = max(history)
                initial_best_state_bytes = carried

        dd = device_data_for(device)
        if dd is not None:
            run_train, run_val = device_runners(
                trainer, dd[0], dd[1], mp["batch_size"], train_seed, val_seed
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
            early_stopping_patience=early_stopping_patience,
            reduce_lr_patience=mp["ReduceLROnPlateau_patience"],
            reduce_lr_factor=mp["ReduceLROnPlateau_factor"],
            reduce_lr_min=mp["ReduceLROnPlateau_min_learning_rate"],
            msgr=Messenger(verbosity=0),
            initial_lr=mp["learning_rate"],
            initial_epoch=initial_epoch,
            initial_history=initial_history,
            initial_best_state_bytes=initial_best_state_bytes,
            # Hyperband promotions start the new rung with fresh callbacks
            # (keras-tuner restarts them per fit): without this, fit would
            # approximate the staleness from the carried history and could
            # early-stop a promoted trial after a single epoch, starving
            # exactly the most promising configs of their earned budget
            initial_counters={"stale_early": 0, "stale_lr": 0},
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
            "history": history,
        }
        state_bytes = flax.serialization.to_bytes(
            {"params": jax.device_get(state[0]),
             "batch_stats": jax.device_get(state[1])}
        )
        store.save(trial_id, record, state_bytes)
        return record

    brackets = hyperband_schedule(max_epochs, factor)
    msgr.part(
        f"Searching hyperparameters: Hyperband max_epochs={max_epochs} "
        f"factor={factor}, {len(brackets)} brackets"
        + (f", {n_workers} trial workers" if n_workers > 1 else "")
    )

    all_trials: list[dict] = []
    trial_counter = 0
    best = {"score": -np.inf, "config": None, "trial_id": None}
    hps_model_dir = Path(output_dir) / model_name / "hps"

    for b, rungs in enumerate(brackets):
        n0, _ = rungs[0]
        configs = sample_configs(hps_parameter, n0, rng)
        msgr.info(f"Bracket {b}: rungs {rungs}, {len(configs)} configs")
        # per-config trial id of the previous rung (for weight carrying)
        prev_trial_id: dict[tuple, str] = {}
        prev_epochs = 0
        for rung_idx, (n_i, r_i) in enumerate(rungs):
            configs = configs[:n_i]
            submissions = []
            for cfg in configs:
                trial_id = f"b{b}r{rung_idx}t{trial_counter:03d}"
                trial_counter += 1
                key = tuple(sorted(cfg.items()))
                submissions.append(
                    (cfg, trial_id, prev_trial_id.get(key))
                )
            # multi-host pod slices: every process computes the same
            # deterministic schedule; each runs its round-robin share and
            # reads the rest from the shared TrialStore (records are written
            # atomically, so the store is the rendezvous)
            mine = set(process_trial_partition(
                len(submissions), process_id, process_count
            ))
            local_rank = local_device_ranks(mine)
            records: list[dict | None] = [None] * len(submissions)
            if n_workers > 1:
                with ThreadPoolExecutor(max_workers=n_workers) as pool:
                    futures = {
                        i: pool.submit(
                            run_trial, cfg, r_i, tid,
                            devices[local_rank[i] % n_workers],
                            initial_epoch=prev_epochs if carry else 0,
                            carry_from=carry,
                        )
                        for i, (cfg, tid, carry) in enumerate(submissions)
                        if i in mine
                    }
                    for i, f in futures.items():
                        records[i] = f.result()
            else:
                for i, (cfg, tid, carry) in enumerate(submissions):
                    if i in mine:
                        records[i] = run_trial(
                            cfg, r_i, tid, None,
                            initial_epoch=prev_epochs if carry else 0,
                            carry_from=carry,
                        )
            for i, (cfg, tid, carry) in enumerate(submissions):
                if records[i] is None:
                    records[i] = _wait_for_trial(store, tid, rendezvous_timeout)

            scored = []
            for (cfg, trial_id, _), record in zip(submissions, records):
                # trust the RECORDED config over the freshly sampled one: a
                # cached record from an interrupted run is authoritative for
                # what was actually trained under this trial id
                cfg = {k: record.get(k, v) for k, v in cfg.items()}
                all_trials.append({k: v for k, v in record.items() if k != "history"})
                scored.append((record["score"], cfg))
                msgr.info(
                    f"  trial {trial_id}: {cfg} -> {monitor}={record['score']:.4f}"
                    + (" (cached)" if record["status"] == "CACHED" else "")
                )
                if record["score"] > best["score"]:
                    best = {"score": record["score"], "config": cfg,
                            "trial_id": trial_id}
                key = tuple(sorted(cfg.items()))
                prev_trial_id[key] = trial_id
            prev_epochs = r_i
            # promote the top 1/factor to the next rung
            scored.sort(key=lambda t: t[0], reverse=True)
            configs = [cfg for _, cfg in scored]

    if process_id != 0:
        # the shared store holds every record; only process 0 publishes the
        # search outputs (best json / csv / checkpointed model)
        msgr.success("Hyperparameter search completed (worker process)")
        return

    msgr.part("Best Hyperparameters")
    msgr.info(best["config"])
    write_json(best["config"], hps_logs_dir / "best_hyperparameters.json")
    pd.DataFrame(all_trials).to_csv(hps_logs_dir / "all_trials.csv", index=False)
    msgr.info(f"Saved trial data to {hps_logs_dir / 'all_trials.csv'}")

    # persist the overall best model (reference ModelCheckpoint to
    # <output_dir>/<name>/hps/, hpsearch.py:231-236)
    best_bytes = store.load_weights(best["trial_id"]) if best["trial_id"] else None
    if best_bytes is not None:
        from orcai_tpu.io.model_store import save_orcai_model

        param = _apply_config(orcai_parameter, hps_parameter, best["config"])
        model = build_model(param)
        trainer = Trainer(model, make_optimizer(param["model"]["learning_rate"]))
        state = trainer.init_state(tuple(dataset_shape["spectrogram"]), seed=seed_int)
        variables = variables_from_bytes(state, best_bytes)
        save_orcai_model(
            hps_model_dir, param, variables,
            input_shape=tuple(dataset_shape["spectrogram"]),
        )
        msgr.info(f"Saved best model to {hps_model_dir}")
    msgr.success("Hyperparameter search completed")
