"""Resampler quality + non-48 kHz end-to-end coverage.

The reference resamples every field recording to the model rate via
librosa.load's soxr_hq path (spectrogram.py:23-27); this package uses a
polyphase Kaiser FIR (io/wav.py:55-70). librosa/soxr cannot run in this
environment, so instead of oracle comparison these tests QUANTIFY the
resampler against ground truth that is known analytically:

- tone reconstruction SNR for the two field-recording rates named in the
  round-1 verdict (44.1 kHz up-conversion, 96 kHz down-conversion),
- alias rejection for content above the target Nyquist,
- up/down round-trip reconstruction,
- and a full predict() run on a 44.1 kHz re-encode of the golden recording,
  asserting the detections match the native-48 kHz golden table.

soxr_hq's passband/stopband spec is ~0.008 dB ripple / >120 dB rejection;
the thresholds below (>55 dB tone SNR, >80 dB alias rejection) bound the
divergence any soxr-processed recording could show against this frontend.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from orcai_tpu.io.wav import load_wav, load_wav_for_frontend, resample_audio, write_wav

FIXTURES = Path(__file__).parent / "fixtures"


def _tone(sr: int, freq: float, seconds: float = 2.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2.0 * np.pi * freq * t).astype(np.float64)


def _snr_db(signal: np.ndarray, noise: np.ndarray) -> float:
    return 10.0 * np.log10(np.sum(signal**2) / max(np.sum(noise**2), 1e-30))


def _trim(x: np.ndarray, sr: int, edge_seconds: float = 0.1) -> np.ndarray:
    e = int(sr * edge_seconds)
    return x[e:-e]


@pytest.mark.parametrize("orig_sr", [44100, 96000])
@pytest.mark.parametrize("freq", [440.0, 5000.0, 15000.0])
def test_tone_reconstruction_snr(orig_sr, freq):
    """A pure tone resampled to 48 kHz matches the analytic 48 kHz tone."""
    target_sr = 48000
    out = resample_audio(_tone(orig_sr, freq), orig_sr, target_sr)
    expected = _tone(target_sr, freq)
    n = min(len(out), len(expected))
    err = _trim(out[:n] - expected[:n], target_sr)
    sig = _trim(expected[:n], target_sr)
    assert _snr_db(sig, err) > 100.0, f"{orig_sr}->{target_sr} @ {freq} Hz"


def test_alias_rejection_downsample():
    """96 kHz content above the 24 kHz target Nyquist must not alias down."""
    orig_sr, target_sr = 96000, 48000
    out = resample_audio(_tone(orig_sr, 30000.0), orig_sr, target_sr)
    inband = _trim(out, target_sr)
    full_scale = _tone(target_sr, 1000.0)
    rejection = _snr_db(_trim(full_scale, target_sr), inband)
    assert rejection > 100.0, f"alias rejection only {rejection:.1f} dB"


def test_round_trip_reconstruction():
    """48k -> 96k -> 48k and 48k -> 44.1k -> 48k reconstruct the signal."""
    sr = 48000
    rng = np.random.default_rng(0)
    # band-limited noise: keep energy below 18 kHz so both paths preserve it
    n = sr * 2
    spectrum = np.zeros(n // 2 + 1, dtype=np.complex128)
    keep = int(18000 / (sr / n))
    spectrum[1:keep] = rng.normal(size=keep - 1) + 1j * rng.normal(size=keep - 1)
    x = np.fft.irfft(spectrum, n)
    x = (x / np.max(np.abs(x)) * 0.9).astype(np.float64)

    for via in (96000, 44100):
        back = resample_audio(resample_audio(x, sr, via), via, sr)
        m = min(len(back), len(x))
        err = _trim(back[:m] - x[:m], sr)
        snr = _snr_db(_trim(x[:m], sr), err)
        assert snr > 100.0, f"round trip via {via}: SNR {snr:.1f} dB"


def test_load_wav_resamples_and_keeps_librosa_conventions(tmp_path):
    sr = 44100
    stereo = np.stack([_tone(sr, 440.0, 0.5), _tone(sr, 880.0, 0.5)]).astype(
        np.float32
    )
    path = tmp_path / "stereo44k.wav"
    write_wav(path, sr, stereo)

    audio, out_sr = load_wav(path, sr=48000)
    assert out_sr == 48000
    assert audio.ndim == 2 and audio.shape[0] == 2  # (channels, n) like librosa
    assert audio.dtype == np.float32
    assert abs(audio.shape[1] - int(0.5 * 48000)) <= 2

    frontend_audio, multichannel = load_wav_for_frontend(path, 48000, channel=2)
    assert multichannel
    expected = resample_audio(stereo[1], sr, 48000)
    np.testing.assert_allclose(frontend_audio, expected, atol=1e-3)


def test_predict_44k_matches_native_golden(tmp_path):
    """The flagship path on a 44.1 kHz re-encode of the golden recording
    produces the same detections as the committed native-48 kHz golden."""
    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.resources import MODELS_DATA_DIR
    from orcai_tpu.utils import Messenger

    audio48, sr = load_wav(FIXTURES / "golden.wav")
    assert sr == 48000
    wav44 = tmp_path / "golden44k.wav"
    write_wav(wav44, 44100, resample_audio(audio48, 48000, 44100))

    out = tmp_path / "pred44.txt"
    predict(
        wav44,
        model_dir=MODELS_DATA_DIR / "orcai-v1",
        output_path=out,
        overwrite=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=16,
    )
    got = pd.read_csv(out, sep="\t")
    expected = pd.read_csv(FIXTURES / "golden_expected.txt", sep="\t")

    # detection sets must agree: same labels, boundaries within one hop of
    # the model's output resolution (the 44.1 kHz file is one resample away
    # from the native recording, so bit-identity is not expected)
    assert list(got["label"]) == list(expected["label"])
    np.testing.assert_allclose(got["start"], expected["start"], atol=0.25)
    np.testing.assert_allclose(got["stop"], expected["stop"], atol=0.25)
