"""Frontend numerics vs a straightforward numpy implementation of the
reference's librosa chain (stft center/constant-pad + amplitude_to_db(ref=max,
top_db=80) + argwhere freq crop + nearest-percentile clip + minmax)."""

import numpy as np
import pytest

from orcai_tpu.ops.frontend import (
    compute_spectrogram,
    fft_frequencies,
    frames_to_time,
    freq_crop_indices,
    hann_window,
    nearest_quantile_index,
)

SR, NFFT, HOP = 48000, 512, 256
FREQ_RANGE = [0, 16000]
QUANTILES = [0.01, 0.999]


def numpy_reference_spectrogram(audio):
    n = len(audio)
    n_frames = 1 + n // HOP
    padded = np.zeros((n_frames - 1) * HOP + NFFT, dtype=np.float64)
    padded[NFFT // 2 : NFFT // 2 + n] = audio
    win = hann_window(NFFT)
    frames = np.stack(
        [padded[i * HOP : i * HOP + NFFT] * win for i in range(n_frames)]
    )
    S = np.abs(np.fft.rfft(frames, axis=1))  # (T, 257)

    # amplitude_to_db(ref=np.max), amin=1e-5, top_db=80
    ref = S.max()
    db = 20 * np.log10(np.maximum(S, 1e-5)) - 20 * np.log10(np.maximum(ref, 1e-5))
    db = np.maximum(db, db.max() - 80.0)

    freqs = np.linspace(0, SR / 2, NFFT // 2 + 1)
    lo_i = np.argwhere(freqs <= FREQ_RANGE[0])[0][0]
    hi_i = np.argwhere(freqs >= FREQ_RANGE[1])[0][0]
    dbc = db[:, lo_i:hi_i]

    lo = np.percentile(dbc, 100 * QUANTILES[0], method="nearest")
    hi = np.percentile(dbc, 100 * QUANTILES[1], method="nearest")
    clipped = np.clip(dbc, lo, hi)
    return (clipped - clipped.min()) / (clipped.max() - clipped.min())


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(42)
    t = np.arange(SR * 3) / SR  # 3 s
    x = (
        0.5 * np.sin(2 * np.pi * 1500 * t)
        + 0.2 * np.sin(2 * np.pi * 7000 * t) * (t > 1.0)
        + 0.01 * rng.normal(size=t.shape)
    )
    return x.astype(np.float32)


def test_crop_indices():
    freqs = fft_frequencies(SR, NFFT)
    lo, hi = freq_crop_indices(freqs, FREQ_RANGE)
    assert lo == 0 and hi == 171


def test_vectors():
    freqs = fft_frequencies(SR, NFFT)
    assert len(freqs) == 257
    assert freqs[1] == pytest.approx(93.75)
    times = frames_to_time(10, SR, HOP)
    assert times[1] == pytest.approx(256 / 48000)


def test_nearest_quantile_index_matches_numpy():
    rng = np.random.default_rng(0)
    for n in [11, 100, 4321, 1_000_001]:
        x = rng.normal(size=n)
        xs = np.sort(x)
        for q in [0.01, 0.5, 0.999]:
            expected = np.percentile(x, 100 * q, method="nearest")
            got = xs[nearest_quantile_index(q, n)]
            assert got == expected, (n, q)


def test_spectrogram_matches_numpy_reference(audio):
    expected = numpy_reference_spectrogram(audio)
    spec, freqs, times = compute_spectrogram(
        audio, SR, NFFT, HOP, FREQ_RANGE, QUANTILES
    )
    assert spec.shape == expected.shape
    assert spec.shape[1] == 171
    assert len(times) == spec.shape[0]
    # normalized output in [0, 1]
    assert spec.min() >= 0.0 and spec.max() <= 1.0
    np.testing.assert_allclose(spec, expected, atol=2e-3)
    # tight agreement on the bulk of entries
    assert np.mean(np.abs(spec - expected) < 5e-4) > 0.99


def test_spectrogram_shapes_various_lengths():
    rng = np.random.default_rng(1)
    for n in [48000, 48001, 12345, 300000]:
        x = rng.normal(size=n).astype(np.float32)
        spec, _, times = compute_spectrogram(x, SR, NFFT, HOP, FREQ_RANGE, QUANTILES)
        assert spec.shape == (1 + n // HOP, 171)
        assert len(times) == spec.shape[0]


def test_hop_equals_nfft_no_clamp():
    """hop == n_fft configs must still center the audio exactly (the device
    pad buffer grows to the next bucket instead of silently clamping)."""
    from orcai_tpu.ops.frontend import compute_spectrogram

    sr, n_fft = 48000, 512
    rng = np.random.default_rng(0)
    # length chosen so n_frames lands on a bucket boundary and
    # n mod hop > n_fft//2 (the clamping geometry from review)
    n = 2048 * n_fft + 300
    audio = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    spec, freqs, _ = compute_spectrogram(
        audio, sr, n_fft, n_fft, freq_range=[0, 10000], quantiles=[0.01, 0.999]
    )
    # independent host reference with the same semantics
    hop = n_fft
    n_frames = 1 + n // hop
    padded = np.zeros((n_frames - 1) * hop + n_fft + n_fft, np.float32)
    padded[n_fft // 2 : n_fft // 2 + n] = audio
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = padded[idx] * hann_window(n_fft)
    S = np.abs(np.fft.rfft(frames, axis=1))
    ref = S.max()
    db = 20 * np.log10(np.maximum(S, 1e-5)) - 20 * np.log10(max(ref, 1e-5))
    db = np.maximum(db, -80.0)
    lo_idx, hi_idx = freq_crop_indices(freqs, [0, 10000])
    dbc = db[:, lo_idx:hi_idx]
    lo = np.percentile(dbc, 1, method="nearest")
    hi = np.percentile(dbc, 99.9, method="nearest")
    expected = np.clip((np.clip(dbc, lo, hi) - lo) / (hi - lo), 0, 1)
    assert spec.shape == expected.shape
    np.testing.assert_allclose(spec, expected, atol=2e-4)


def test_host_engine_matches_numpy_reference_and_device(audio):
    """compute_spectrogram_host (the data-prep auto engine's host arm) must
    hold the same band against the float64 oracle as the device path does,
    and sit closer to the device path than either sits to the oracle."""
    from orcai_tpu.ops.frontend import compute_spectrogram_host

    expected = numpy_reference_spectrogram(audio)
    host, freqs, times = compute_spectrogram_host(
        audio, SR, NFFT, HOP, FREQ_RANGE, QUANTILES
    )
    assert host.shape == expected.shape
    assert len(freqs) == NFFT // 2 + 1 and len(times) == host.shape[0]
    assert host.min() >= 0.0 and host.max() <= 1.0
    np.testing.assert_allclose(host, expected, atol=2e-3)
    assert np.mean(np.abs(host - expected) < 5e-4) > 0.99

    dev, _, _ = compute_spectrogram(audio, SR, NFFT, HOP, FREQ_RANGE, QUANTILES)
    np.testing.assert_allclose(host, dev, atol=2e-3)

    # int16 input takes the same -1..1 scaling the device path applies
    pcm = np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
    host_i, _, _ = compute_spectrogram_host(
        pcm, SR, NFFT, HOP, FREQ_RANGE, QUANTILES
    )
    exact = numpy_reference_spectrogram(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(host_i, exact, atol=2e-3)
