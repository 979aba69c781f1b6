"""End-to-end pipeline: synthetic wavs -> spectrograms -> labels -> snippets
-> TVT datasets, and model-dir save -> predict -> Audacity TSV."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from orcai_tpu.io import open_zarr, read_json
from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.io.model_store import save_orcai_model
from orcai_tpu.io.wav import write_wav
from orcai_tpu.models import build_model
from orcai_tpu.pipeline.helpers import create_recording_table, init_project
from orcai_tpu.pipeline.labels import create_label_arrays
from orcai_tpu.pipeline.predict import predict
from orcai_tpu.pipeline.snippets import (
    create_snippet_table,
    create_tvt_data,
    create_tvt_snippet_tables,
)
from orcai_tpu.pipeline.spectrogram import create_spectrograms
from orcai_tpu.utils import Messenger

SR = 48000
CALLS = ["CALL_A", "CALL_B"]

PARAM = {
    "name": "e2e-test",
    "architecture": "ResNetLSTM",
    "model": {
        "epochs": 1,
        "batch_size": 4,
        "filters": [4, 6, 8, 10],
        "conv_initializer": "he_normal",
        "kernel_size": 3,
        "dropout_rate": 0.2,
        "lstm_units": 8,
        "lstm_initializer": "glorot_uniform",
        "n_batch_train": 4,
        "n_batch_val": 2,
        "n_batch_test": 2,
        "shuffle": True,
        "learning_rate": 1e-4,
        "EarlyStopping_patience": 10,
        "ReduceLROnPlateau_patience": 3,
        "ReduceLROnPlateau_factor": 0.5,
        "ReduceLROnPlateau_min_learning_rate": 1e-7,
        "call_weights": None,
        "monitor": "val_MBA",
    },
    "spectrogram": {
        "sampling_rate": SR,
        "nfft": 512,
        "n_overlap": 256,
        "freq_range": [0, 16000],
        "quantiles": [0.01, 0.999],
        "duration": 4,
    },
    "calls": CALLS,
    "snippets": {
        "segment_duration": 60,
        "snippets_per_sec": 1,
        "snippet_duration": 4,
        "fraction_removal": 0.2,
        "train": 0.8,
        "val": 0.1,
        "test": 0.1,
    },
    "seed": 123456789,
}


def _synth_wav(path: Path, duration_s: float, tone_intervals, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.005 * rng.normal(size=n)
    for start, stop, freq in tone_intervals:
        seg = (t >= start) & (t < stop)
        x[seg] += 0.4 * np.sin(2 * np.pi * freq * t[seg])
    write_wav(path, SR, x.astype(np.float32))


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    wav_dir = root / "recordings"
    wav_dir.mkdir()
    data_dir = root / "data"
    data_dir.mkdir()

    intervals = {
        "rec1": [(2.0, 3.0, 1500.0), (22.0, 23.5, 1500.0), (40.0, 41.0, 6000.0)],
        "rec2": [(5.0, 6.0, 1500.0), (30.0, 31.0, 6000.0), (55.0, 56.5, 6000.0)],
    }
    for i, (name, ivs) in enumerate(intervals.items()):
        _synth_wav(wav_dir / f"{name}.wav", 70.0, ivs, seed=i)
        rows = []
        for start, stop, freq in ivs:
            label = "CALL_A" if freq < 3000 else "CALL_B"
            rows.append(f"{start:.4f}\t{stop:.4f}\t{label}")
        (wav_dir / f"{name}.txt").write_text("\n".join(rows) + "\n")

    param_path = root / "param.json"
    param_path.write_text(json.dumps(PARAM))

    table = create_recording_table(
        wav_dir,
        output_path=root / "recording_table.csv",
        orcai_parameter=param_path,
        msgr=Messenger(verbosity=0),
    )
    # mark all calls possible
    table = pd.read_csv(root / "recording_table.csv")
    for call in CALLS:
        table[call] = True
    table.to_csv(root / "recording_table.csv", index=False)

    return {
        "root": root,
        "wav_dir": wav_dir,
        "data_dir": data_dir,
        "param_path": param_path,
        "table_path": root / "recording_table.csv",
    }


def test_init_project(tmp_path):
    init_project(tmp_path / "proj", "myproj", msgr=Messenger(verbosity=0))
    param = read_json(tmp_path / "proj" / "myproj_orcai_parameter.json")
    assert param["name"] == "myproj"
    assert param["seed"] is not None
    assert (tmp_path / "proj" / "myproj_hps_parameter.json").exists()
    assert (tmp_path / "proj" / "myproj_call_duration_limits.json").exists()


def test_recording_table(project):
    table = pd.read_csv(project["table_path"])
    assert len(table) == 2
    assert set(["channel", "base_dir_recording", "rel_recording_path",
                "base_dir_annotation", "rel_annotation_path"]).issubset(table.columns)
    assert table["rel_annotation_path"].notna().all()


def test_create_spectrograms(project):
    create_spectrograms(
        project["table_path"],
        project["data_dir"],
        orcai_parameter=project["param_path"],
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    z = open_zarr(project["data_dir"] / "rec1" / "spectrogram" / "spectrogram.zarr")
    n_expected = 1 + (70 * SR) // 256
    assert z.shape == (n_expected, 171)
    spec = z[:]
    assert spec.min() >= 0.0 and spec.max() <= 1.0
    times = read_json(project["data_dir"] / "rec1" / "spectrogram" / "times.json")
    assert times["length"] == n_expected


def test_create_spectrograms_host_engine_matches_device(project, tmp_path,
                                                        monkeypatch):
    """The host engine (compute_spectrogram_host) writes stores float-band
    equal to the device engine's, through the same pipelined driver; the
    report dict records the engine; the env override resolves."""
    from orcai_tpu.pipeline.spectrogram import resolve_spectrogram_engine

    monkeypatch.delenv("ORCAI_TPU_SPEC_ENGINE", raising=False)
    assert resolve_spectrogram_engine(None) == "auto"
    monkeypatch.setenv("ORCAI_TPU_SPEC_ENGINE", "host")
    assert resolve_spectrogram_engine(None) == "host"
    monkeypatch.delenv("ORCAI_TPU_SPEC_ENGINE", raising=False)
    with pytest.raises(ValueError):
        resolve_spectrogram_engine("gpu-magic")

    report = create_spectrograms(
        project["table_path"],
        tmp_path,
        orcai_parameter=project["param_path"],
        msgr=Messenger(verbosity=0),
        verbosity=0,
        engine="host",
    )
    assert report["engine"] == "host" and report["n_recordings"] == 2
    for rec in ("rec1", "rec2"):
        dev = open_zarr(
            project["data_dir"] / rec / "spectrogram" / "spectrogram.zarr"
        )[:]
        host = open_zarr(tmp_path / rec / "spectrogram" / "spectrogram.zarr")[:]
        assert host.shape == dev.shape
        np.testing.assert_allclose(host, dev, atol=2e-3)
        assert np.mean(np.abs(host - dev) < 5e-4) > 0.99
        for f in ("frequencies.json", "times.json"):
            assert (
                (tmp_path / rec / "spectrogram" / f).read_text()
                == (project["data_dir"] / rec / "spectrogram" / f).read_text()
            )


def test_create_label_arrays(project):
    create_label_arrays(
        project["table_path"],
        project["data_dir"],
        orcai_parameter=project["param_path"],
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    z = open_zarr(project["data_dir"] / "rec1" / "labels" / "labels.zarr")
    labels = z[:]
    spec_len = 1 + (70 * SR) // 256
    assert labels.shape == (spec_len, 2)
    label_list = read_json(project["data_dir"] / "rec1" / "labels" / "label_list.json")
    assert label_list == {"CALL_A": "present", "CALL_B": "present"}
    # CALL_A active around t=2.0-3.0 -> frames ~375-562
    dt = 256 / SR
    active = np.flatnonzero(labels[:, 0] == 1)
    assert active.size > 0
    assert abs(active[0] * dt - 2.0) < 0.02


def test_snippet_tables(project):
    create_snippet_table(
        project["table_path"],
        project["data_dir"],
        output_dir=project["root"] / "tvt",
        orcai_parameter=project["param_path"],
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    all_snippets = pd.read_csv(project["root"] / "tvt" / "all_snippets.csv.gz")
    # 2 recordings x 1 segment x (48 + 6 + 6) draws = 120 (minus duplicates)
    assert 100 < len(all_snippets) <= 120
    assert set(all_snippets["data_type"]) == {"train", "val", "test"}
    # snippet length divisible by 2**4
    lengths = all_snippets["row_stop"] - all_snippets["row_start"]
    assert (lengths == 736).all()

    create_tvt_snippet_tables(
        project["root"] / "tvt",
        orcai_parameter=project["param_path"],
        create_unfiltered_test_snippets=True,
        n_unfiltered_test_snippets=4,
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    train = pd.read_csv(project["root"] / "tvt" / "train.csv.gz")
    assert len(train) == 16  # 4 batches x 4
    assert (project["root"] / "tvt" / "test_unfiltered.csv.gz").exists()


def test_snippet_table_determinism(project, tmp_path):
    """Same master seed -> bit-identical snippet tables."""
    create_snippet_table(
        project["table_path"],
        project["data_dir"],
        output_dir=tmp_path / "tvt2",
        orcai_parameter=project["param_path"],
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    a = pd.read_csv(project["root"] / "tvt" / "all_snippets.csv.gz")
    b = pd.read_csv(tmp_path / "tvt2" / "all_snippets.csv.gz")
    pd.testing.assert_frame_equal(a, b)


def test_create_tvt_data(project):
    create_tvt_data(
        project["root"] / "tvt",
        orcai_parameter=project["param_path"],
        data_compression=None,
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )
    shapes = read_json(project["root"] / "tvt" / "dataset_shapes.json")
    assert shapes["spectrogram"] == [736, 171, 1]
    assert shapes["labels"] == [46, 2]
    ds = ArrayDataset.load(project["root"] / "tvt" / "train_dataset")
    assert len(ds) == 16
    x, y = next(ds.batches(4, seed=[7, 123]))
    assert x.shape == (4, 736, 171, 1)
    assert y.shape == (4, 46, 2)
    assert set(np.unique(y)).issubset({-1.0, 0.0, 1.0})


def test_predict_e2e(project):
    model = build_model(PARAM)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 736, 171, 1)))
    model_dir = project["root"] / "models" / "e2e-test"
    save_orcai_model(model_dir, PARAM, variables)

    wav = project["wav_dir"] / "rec1.wav"
    predict(
        wav,
        channel=1,
        model_dir=model_dir,
        output_path="default",
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    out = project["wav_dir"] / "rec1_c1_e2e-test_predicted.txt"
    assert out.exists()
    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["start", "stop", "label"]
    if len(df) > 0:
        assert (df["stop"] >= df["start"]).all()
        assert df["label"].str.endswith("*").all()

    # overwrite protection
    with pytest.raises(FileExistsError):
        predict(
            wav, channel=1, model_dir=model_dir,
            msgr=Messenger(verbosity=0), verbosity=0,
        )
