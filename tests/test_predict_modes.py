"""Predict entry-point modes: recording-table batch, probabilities output,
duration filtering, multichannel wavs, keras-format model dirs."""

import json

import numpy as np
import pandas as pd
import pytest

import jax

from orcai_tpu.io.model_store import load_orcai_model, save_orcai_model
from orcai_tpu.io.wav import load_wav, write_wav
from orcai_tpu.models import build_model, init_variables
from orcai_tpu.pipeline.predict import predict
from orcai_tpu.utils import Messenger

SR = 48000
PARAM = {
    "name": "pm-test",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [4, 6, 8, 10],
        "kernel_size": 3,
        "dropout_rate": 0.2,
        "lstm_units": 8,
        "learning_rate": 1e-4,
    },
    "spectrogram": {
        "sampling_rate": SR,
        "nfft": 512,
        "n_overlap": 256,
        "freq_range": [0, 16000],
        "quantiles": [0.01, 0.999],
        "duration": 4,
    },
    "calls": ["A", "B"],
    "snippets": {"segment_duration": 60, "snippets_per_sec": 1,
                 "snippet_duration": 4, "fraction_removal": 0.2,
                 "train": 0.8, "val": 0.1, "test": 0.1},
    "seed": 7,
}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model") / "pm-test"
    model = build_model(PARAM)
    variables = init_variables(model, (736, 171, 1), seed=3)
    save_orcai_model(d, PARAM, variables)
    return d


def _write_recording(path, seconds=8.0, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    x = 0.01 * rng.standard_normal((channels, n)).astype(np.float32)
    x[0, n // 4 : n // 2] += 0.3 * np.sin(
        2 * np.pi * 2000 * np.arange(n // 4) / SR
    ).astype(np.float32)
    write_wav(path, SR, x if channels > 1 else x[0])


def test_predict_recording_table_batch(model_dir, tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(2):
        _write_recording(wav_dir / f"r{i}.wav", seed=i)
    # one broken row: missing wav -> must not abort the batch
    table = pd.DataFrame(
        {
            "recording": ["r0", "r1", "missing"],
            "channel": [1, 1, 1],
            "base_dir_recording": str(wav_dir),
            "rel_recording_path": ["r0.wav", "r1.wav", "missing.wav"],
        }
    )
    table_path = tmp_path / "table.csv"
    table.to_csv(table_path, index=False)
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    predict(
        table_path,
        model_dir=model_dir,
        output_path=out_dir,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    assert (out_dir / "r0_pm-test_predicted.txt").exists()
    assert (out_dir / "r1_pm-test_predicted.txt").exists()
    assert not (out_dir / "missing_pm-test_predicted.txt").exists()


def test_batch_duplicate_output_path_does_not_clobber(model_dir, tmp_path):
    """Two table rows resolving to the same output file: files are written
    at wave-flush time, so the on-disk existence check alone cannot see the
    duplicate — without the pending-path guard the second row would
    silently overwrite the first row's TSV (with overwrite=False the old
    per-file path raised FileExistsError and kept the batch going)."""
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(2):
        _write_recording(wav_dir / f"r{i}.wav", seed=i)
    # same 'recording' name (=> same derived output path), different wavs
    table = pd.DataFrame(
        {
            "recording": ["dup", "dup"],
            "channel": [1, 1],
            "base_dir_recording": str(wav_dir),
            "rel_recording_path": ["r0.wav", "r1.wav"],
        }
    )
    table_path = tmp_path / "table.csv"
    table.to_csv(table_path, index=False)
    out_dir = tmp_path / "out"

    predict(
        table_path,
        model_dir=model_dir,
        output_path=out_dir,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    out_file = out_dir / "dup_pm-test_predicted.txt"
    assert out_file.exists()

    # the surviving TSV is the FIRST row's prediction (r0.wav solo)
    solo = tmp_path / "solo.txt"
    predict(
        wav_dir / "r0.wav",
        model_dir=model_dir,
        output_path=solo,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    assert out_file.read_text() == solo.read_text()


def test_predict_save_probabilities_and_filtering(model_dir, tmp_path):
    wav = tmp_path / "x.wav"
    _write_recording(wav, seed=5)
    limits = tmp_path / "limits.json"
    limits.write_text(json.dumps({"default": [0.05, 10.0]}))
    predict(
        wav,
        model_dir=model_dir,
        output_path=tmp_path / "x_pred.txt",
        save_probabilities=True,
        call_duration_limits=limits,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    assert (tmp_path / "x_pred.txt").exists()
    probs = pd.read_csv(tmp_path / "x_pred_probabilities.csv.gz")
    assert list(probs.columns) == ["time", "A", "B"]
    # probabilities on the output grid: T//16 rows
    n_frames = 1 + int(8.0 * SR) // 256
    assert len(probs) == n_frames // 16


def test_predict_multichannel(model_dir, tmp_path):
    wav = tmp_path / "stereo.wav"
    _write_recording(wav, channels=2, seed=9)
    predict(
        wav,
        channel=2,
        model_dir=model_dir,
        output_path=tmp_path / "stereo_pred.txt",
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    assert (tmp_path / "stereo_pred.txt").exists()


def test_load_keras_format_model_dir(tmp_path):
    """A reference-style model dir with only a .keras archive loads."""
    keras = pytest.importorskip("keras")

    from orcai_tpu.io.jsonio import write_json
    from orcai_tpu.io.keras_convert import build_keras_model

    d = tmp_path / "keras-model"
    d.mkdir()
    small = dict(PARAM, name="keras-model")
    small["model"] = dict(PARAM["model"])
    kmodel = build_keras_model(small, input_shape=(64, 21, 1))
    kmodel.save(d / "keras-model.keras")
    write_json(small, d / "orcai_parameter.json")
    write_json({"input_shape": [64, 21, 1], "num_labels": 2},
               d / "model_shape.json")

    model, variables, param, shape = load_orcai_model(d)
    import jax.numpy as jnp

    x = np.random.default_rng(0).normal(size=(1, 64, 21, 1)).astype(np.float32)
    y_flax = model.apply(variables, jnp.asarray(x), train=False)
    y_keras = kmodel.predict(x, verbose=0)
    np.testing.assert_allclose(np.asarray(y_flax), y_keras, atol=2e-5)


def test_wav_resample_path(tmp_path):
    """Non-48k wavs decode + resample through the general path."""
    rng = np.random.default_rng(0)
    x = 0.1 * rng.standard_normal(44100 * 2).astype(np.float32)
    write_wav(tmp_path / "cd.wav", 44100, x)
    audio, sr = load_wav(tmp_path / "cd.wav", sr=48000)
    assert sr == 48000
    assert abs(len(audio) - 96000) <= 2


def test_batch_mode_creates_output_folder(tmp_path, monkeypatch):
    """Table-mode predict with -o pointing at a nonexistent folder creates
    it instead of failing every per-file write."""
    import shutil

    import pandas as pd

    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.resources import MODELS_DATA_DIR
    from orcai_tpu.utils import Messenger

    from pathlib import Path

    fixtures = Path(__file__).parent / "fixtures"
    recs = tmp_path / "recs"
    recs.mkdir()
    shutil.copy(fixtures / "golden.wav", recs / "r1.wav")
    table = pd.DataFrame(
        {
            "recording": ["r1"],
            "channel": [1],
            "base_dir_recording": [str(recs)],
            "rel_recording_path": ["r1.wav"],
        }
    )
    table_path = recs / "recording_table.csv"
    table.to_csv(table_path, index=False)

    out = tmp_path / "does" / "not" / "exist"
    predict(
        table_path,
        model_dir=MODELS_DATA_DIR / "orcai-v1",
        output_path=out,
        overwrite=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=16,
    )
    assert (out / "r1_orcai-v1_predicted.txt").exists()


@pytest.mark.parametrize(
    "budget",
    [
        "1",  # post-append flush after every file
        "4000000",  # ~1-2x one recording: pre-dispatch flush path
    ],
)
def test_batch_waves_match_single_file_predicts(
    model_dir, tmp_path, monkeypatch, budget
):
    """Wave-based batch dispatch (flushes forced via a small HBM wave
    budget, both the post-append flush and the peak-bounding pre-dispatch
    flush) produces byte-identical TSVs to one-at-a-time predicts."""
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    n_rec = 3
    for i in range(n_rec):
        _write_recording(wav_dir / f"w{i}.wav", seconds=6.0 + i, seed=10 + i)
    table = pd.DataFrame(
        {
            "recording": [f"w{i}" for i in range(n_rec)],
            "channel": [1] * n_rec,
            "base_dir_recording": str(wav_dir),
            "rel_recording_path": [f"w{i}.wav" for i in range(n_rec)],
        }
    )
    table_path = tmp_path / "table.csv"
    table.to_csv(table_path, index=False)

    batch_out = tmp_path / "batch"
    batch_out.mkdir()
    monkeypatch.setenv("ORCAI_TPU_WAVE_HBM_BYTES", budget)
    predict(
        table_path,
        model_dir=model_dir,
        output_path=batch_out,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    monkeypatch.delenv("ORCAI_TPU_WAVE_HBM_BYTES")

    for i in range(n_rec):
        single_out = tmp_path / f"single{i}.txt"
        predict(
            wav_dir / f"w{i}.wav",
            model_dir=model_dir,
            output_path=single_out,
            msgr=Messenger(verbosity=0),
            verbosity=0,
            predict_batch_size=8,
        )
        batch_tsv = (batch_out / f"w{i}_pm-test_predicted.txt").read_text()
        assert batch_tsv == single_out.read_text()


def test_streaming_branch_flushes_wave_first(model_dir, tmp_path, monkeypatch):
    """A streaming-path recording must fire on_estimate BEFORE any streaming
    device work so the batch wave flushes first — otherwise the pending
    wave's spectrogram buffers stay HBM-resident UNDER the streaming
    predictor's own multi-GB audio budget and peak memory is their sum
    (regression: the streaming branch returned est_bytes=0 and never called
    on_estimate at all)."""
    import orcai_tpu.ops.streaming as streaming_mod
    from orcai_tpu.io.model_store import load_orcai_model
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.pipeline.predict import _dispatch_wav

    wav = tmp_path / "s.wav"
    _write_recording(wav, seconds=6.0, seed=42)

    model, variables, param, shape = load_orcai_model(model_dir)
    predictor = WindowPredictor(
        model, variables, snippet_len=shape["input_shape"][0],
        n_filters=len(param["model"]["filters"]), batch_size=8,
    )

    events = []

    class StubStreaming:
        def __init__(self, predictor, sp, wire=None):
            events.append("streaming_init")
            n_bins = shape["input_shape"][1]
            self.lo_idx, self.hi_idx = 0, n_bins

        def aggregate(self, audio):
            events.append("streaming_aggregate")
            return np.zeros((4, 2), np.float32), np.ones(4, np.float32)

    monkeypatch.setattr(streaming_mod, "StreamingPredictor", StubStreaming)
    monkeypatch.setattr(
        "orcai_tpu.pipeline.predict._is_streaming_recording",
        lambda n_samples, sp, shape: True,
    )

    disp = _dispatch_wav(
        wav, 1, predictor, param, shape,
        msgr=Messenger(verbosity=0),
        on_estimate=lambda est: events.append(("estimate", est)),
    )
    assert disp["mode"] == "host"
    assert events[0][0] == "estimate", events
    # the estimate is the int16 audio bound (capped at the streaming audio
    # budget), which upper-bounds the coded wire residency
    n_samples = int(6.0 * SR)
    assert events[0][1] == 2 * n_samples
    assert events.index(("estimate", 2 * n_samples)) < events.index(
        "streaming_init"
    )


def test_output_path_none_means_default(model_dir, tmp_path):
    """output_path=None saves next to the recording under the default name
    (regression: it used to run the full pipeline and silently discard the
    TSV — DataFrame.to_csv(None) returns a string)."""
    wav = tmp_path / "nonedest.wav"
    _write_recording(wav, seconds=5.0, seed=4)
    predict(
        wav,
        model_dir=model_dir,
        output_path=None,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=8,
    )
    out = tmp_path / "nonedest_c1_pm-test_predicted.txt"
    assert out.exists() and out.read_text().startswith("start")
