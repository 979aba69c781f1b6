"""Watch-folder serving mode (pipeline/serve.py + `orcai serve`).

The service holds one warmed predictor and picks up wav files as they
arrive (no reference equivalent — upstream predict is batch-only,
predict.py:635-757); per-file outputs must equal `orcai predict` on the
same recording.
"""

import numpy as np
import pytest

from orcai_tpu.io.model_store import save_orcai_model
from orcai_tpu.io.wav import write_wav
from orcai_tpu.models import build_model, init_variables
from orcai_tpu.pipeline.predict import predict
from orcai_tpu.pipeline.serve import scan_ready, serve
from orcai_tpu.utils import Messenger

SR = 48000
PARAM = {
    "name": "srv-test",
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
    d = tmp_path_factory.mktemp("model") / "srv-test"
    model = build_model(PARAM)
    variables = init_variables(model, (736, 171, 1), seed=3)
    save_orcai_model(d, PARAM, variables)
    return d


def _wav_bytes(seconds=6.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    x = 0.01 * rng.standard_normal(n).astype(np.float32)
    x[n // 4 : n // 2] += 0.3 * np.sin(
        2 * np.pi * 2000 * np.arange(n // 4) / SR
    ).astype(np.float32)
    return x


def test_serve_processes_existing_and_arriving(model_dir, tmp_path):
    watch = tmp_path / "incoming"
    watch.mkdir()
    out = tmp_path / "out"
    write_wav(watch / "a.wav", SR, _wav_bytes(seed=0))

    # drop b.wav while the service is already running (first idle sleep)
    dropped = []

    def fake_sleep(_):
        if not dropped:
            write_wav(watch / "b.wav", SR, _wav_bytes(seed=1))
            dropped.append(True)

    n = serve(
        watch,
        model_dir=model_dir,
        output_dir=out,
        poll_seconds=0,
        max_idle_polls=3,
        msgr=Messenger(verbosity=0),
        sleep=fake_sleep,
    )
    assert n == 2
    out_a = out / "a_c1_srv-test_predicted.txt"
    out_b = out / "b_c1_srv-test_predicted.txt"
    assert out_a.exists() and out_b.exists()
    assert not list(out.glob("*.failed"))

    # per-file output identical to a plain `orcai predict` on the same wav
    ref = tmp_path / "ref.txt"
    predict(
        watch / "a.wav",
        model_dir=model_dir,
        output_path=ref,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=128,
    )
    assert out_a.read_text() == ref.read_text()


def test_serve_skips_done_and_marks_failures(model_dir, tmp_path):
    watch = tmp_path / "incoming"
    watch.mkdir()
    out = tmp_path / "out"
    out.mkdir()
    write_wav(watch / "a.wav", SR, _wav_bytes(seed=0))
    # pre-existing output: must be skipped (not reprocessed, not counted)
    (out / "a_c1_srv-test_predicted.txt").write_text("start\tstop\tlabel\n")
    # corrupt wav: must fail, leave a marker, and not kill the service
    (watch / "bad.wav").write_bytes(b"RIFF" + b"\x00" * 100)

    n = serve(
        watch,
        model_dir=model_dir,
        output_dir=out,
        poll_seconds=0,
        max_idle_polls=2,
        msgr=Messenger(verbosity=0),
        sleep=lambda _: None,
    )
    assert n == 1  # only bad.wav was attempted
    marker = out / "bad_c1_srv-test_predicted.txt.failed"
    assert marker.exists() and marker.read_text().strip()
    # untouched pre-existing output
    assert (out / "a_c1_srv-test_predicted.txt").read_text() == (
        "start\tstop\tlabel\n"
    )

    # second service run: the .failed marker suppresses a retry loop
    n = serve(
        watch,
        model_dir=model_dir,
        output_dir=out,
        poll_seconds=0,
        max_idle_polls=2,
        msgr=Messenger(verbosity=0),
        sleep=lambda _: None,
    )
    assert n == 0


def test_serve_survives_backend_crash(model_dir, tmp_path, monkeypatch):
    """A backend/worker death mid-serve must not poison the service.

    The first predict raises the documented crash error (CLAUDE.md: "TPU
    worker process crashed or restarted"); serve must rebuild the
    predictor, retry the in-flight file once, and keep later arrivals on
    the fresh predictor — no .failed markers anywhere.
    """
    import orcai_tpu.pipeline.predict as predict_mod

    watch = tmp_path / "incoming"
    watch.mkdir()
    out = tmp_path / "out"
    write_wav(watch / "a.wav", SR, _wav_bytes(seed=0))
    write_wav(watch / "b.wav", SR, _wav_bytes(seed=1))

    real = predict_mod._predict_and_save
    crashes = []
    predictors_seen = []

    def flaky(**kw):
        predictors_seen.append(kw["predictor"])
        if not crashes:
            crashes.append(True)
            raise RuntimeError(
                "INTERNAL: TPU worker process crashed or restarted"
            )
        return real(**kw)

    monkeypatch.setattr(predict_mod, "_predict_and_save", flaky)
    n = serve(
        watch,
        model_dir=model_dir,
        output_dir=out,
        poll_seconds=0,
        max_idle_polls=2,
        msgr=Messenger(verbosity=0),
        sleep=lambda _: None,
    )
    assert n == 2
    assert (out / "a_c1_srv-test_predicted.txt").exists()
    assert (out / "b_c1_srv-test_predicted.txt").exists()
    assert not list(out.glob("*.failed"))
    # the retry and every later file ran on a REBUILT predictor object
    assert len(predictors_seen) == 3
    assert predictors_seen[1] is not predictors_seen[0]
    assert predictors_seen[2] is predictors_seen[1]


def test_serve_double_crash_marks_failed_but_continues(
    model_dir, tmp_path, monkeypatch
):
    """If the rebuilt predictor ALSO crashes on the retry, the file gets
    its .failed marker and the service moves on (bounded retries)."""
    import orcai_tpu.pipeline.predict as predict_mod

    watch = tmp_path / "incoming"
    watch.mkdir()
    out = tmp_path / "out"
    write_wav(watch / "a.wav", SR, _wav_bytes(seed=0))
    write_wav(watch / "b.wav", SR, _wav_bytes(seed=1))

    real = predict_mod._predict_and_save
    calls = []

    def flaky(**kw):
        calls.append(kw["recording_path"].name)
        if kw["recording_path"].name == "a.wav":
            raise RuntimeError("TPU worker process crashed or restarted")
        return real(**kw)

    monkeypatch.setattr(predict_mod, "_predict_and_save", flaky)
    n = serve(
        watch,
        model_dir=model_dir,
        output_dir=out,
        poll_seconds=0,
        max_idle_polls=2,
        msgr=Messenger(verbosity=0),
        sleep=lambda _: None,
    )
    assert n == 2
    assert calls.count("a.wav") == 2  # exactly one retry, not a loop
    marker = out / "a_c1_srv-test_predicted.txt.failed"
    assert marker.exists()
    assert (out / "b_c1_srv-test_predicted.txt").exists()


def test_serve_ordinary_error_not_retried(model_dir, tmp_path, monkeypatch):
    """Non-crash per-file errors must NOT trigger a rebuild+retry."""
    import orcai_tpu.pipeline.predict as predict_mod

    watch = tmp_path / "incoming"
    watch.mkdir()
    out = tmp_path / "out"
    write_wav(watch / "a.wav", SR, _wav_bytes(seed=0))

    calls = []

    def broken(**kw):
        calls.append(1)
        raise ValueError("recording shorter than one snippet")

    monkeypatch.setattr(predict_mod, "_predict_and_save", broken)
    n = serve(
        watch,
        model_dir=model_dir,
        output_dir=out,
        poll_seconds=0,
        max_idle_polls=2,
        msgr=Messenger(verbosity=0),
        sleep=lambda _: None,
    )
    assert n == 1
    assert len(calls) == 1  # no retry for an input-specific error
    assert (out / "a_c1_srv-test_predicted.txt.failed").exists()


def test_is_backend_crash_classifier():
    from orcai_tpu.utils.backend_health import is_backend_crash

    assert is_backend_crash(
        RuntimeError("TPU worker process crashed or restarted")
    )
    assert is_backend_crash(RuntimeError("Socket closed"))
    # chained cause is inspected
    try:
        try:
            raise RuntimeError("stream removed")
        except RuntimeError as inner:
            raise ValueError("predict failed") from inner
    except ValueError as outer:
        assert is_backend_crash(outer)
    assert not is_backend_crash(ValueError("recording too short"))
    assert not is_backend_crash(FileNotFoundError("x.wav"))
    # generic gRPC status texts are deliberately NOT classified as death:
    # they also ride the __context__ of transient, recovered hiccups, and
    # a false positive costs a minutes-long rebuild + a doomed retry
    assert not is_backend_crash(RuntimeError("UNAVAILABLE: ipv4:..."))
    assert not is_backend_crash(OSError("Connection reset by peer"))


def test_scan_ready_waits_for_stable_signature(tmp_path):
    watch = tmp_path / "incoming"
    watch.mkdir()
    p = watch / "grow.wav"
    p.write_bytes(b"\x00" * 100)

    ready, sigs = scan_ready(watch, {}, set())
    assert ready == []  # first sighting is never ready
    p.write_bytes(b"\x00" * 200)  # still being written
    ready, sigs = scan_ready(watch, sigs, set())
    assert ready == []  # signature changed
    ready, sigs = scan_ready(watch, sigs, set())
    assert ready == [p]  # stable across two polls
    ready, _ = scan_ready(watch, sigs, {p})
    assert ready == []  # done files are not re-offered


def test_cli_serve_smoke(model_dir, tmp_path):
    from click.testing import CliRunner

    from orcai_tpu.cli import cli

    watch = tmp_path / "incoming"
    watch.mkdir()
    write_wav(watch / "a.wav", SR, _wav_bytes(seed=0))

    runner = CliRunner()
    res = runner.invoke(cli, ["serve", "--help"])
    assert res.exit_code == 0 and "warmed model" in res.output.lower()

    res = runner.invoke(
        cli,
        [
            "serve", str(watch),
            "--model_dir", str(model_dir),
            "--output_dir", str(tmp_path / "out"),
            "--poll_seconds", "0",
            "--max_files", "1",
            "-v", "0",
        ],
    )
    assert res.exit_code == 0, res.output
    assert (tmp_path / "out" / "a_c1_srv-test_predicted.txt").exists()
