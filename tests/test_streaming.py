"""Two-pass streaming predict == in-memory predict on short recordings.

Exercises ops/streaming.py with tiny tiles so every code path runs (tile
masking, radix percentile selection across tiles, chunk boundaries, HBM
audio buffer vs host-sliced tiles).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orcai_tpu.models import build_model
from orcai_tpu.ops.frontend import compute_spectrogram
from orcai_tpu.ops.overlap import WindowPredictor
from orcai_tpu.ops.streaming import StreamingPredictor

PARAM = {
    "name": "tiny",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [4, 6, 8, 10],
        "kernel_size": 3,
        "dropout_rate": 0.5,
        "lstm_units": 8,
    },
    "calls": ["A", "B", "C"],
}
SNIPPET, NFILT = 64, 4
SP = {
    "sampling_rate": 4800,
    "nfft": 48,
    "n_overlap": 24,  # reference schema: hop length
    "freq_range": [0, 2100],  # -> 21 cropped bins
    "quantiles": [0.01, 0.999],
}
NBINS = 21


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model(PARAM)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SNIPPET, NBINS, 1)))
    return model, variables


def _predictor(model, variables):
    return WindowPredictor(
        model, variables, snippet_len=SNIPPET, n_filters=NFILT,
        batch_size=4, max_windows_per_chunk=16,
    )


def _in_memory(model, variables, audio):
    spec, _, _ = compute_spectrogram(
        audio, SP["sampling_rate"], SP["nfft"], SP["n_overlap"],
        SP["freq_range"], SP["quantiles"],
    )
    assert spec.shape[1] == NBINS
    return _predictor(model, variables).aggregate(spec)


@pytest.mark.parametrize("hbm_audio_budget", [1 << 40, 0])
def test_streaming_matches_in_memory(model_and_vars, hbm_audio_budget):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    n = 24_000  # 1001 frames, 29 windows
    audio = (rng.uniform(-1, 1, size=n) * 0.5).astype(np.float32)

    agg0, cnt0 = _in_memory(model, variables, audio)

    streaming = StreamingPredictor(
        _predictor(model, variables), SP,
        windows_per_chunk=8,
        stats_tile_frames=128,  # forces many stats tiles + masked tail
        hbm_audio_budget=hbm_audio_budget,
    )
    agg1, cnt1 = streaming.aggregate(audio)

    assert agg1.shape == agg0.shape
    np.testing.assert_array_equal(cnt1, cnt0)
    np.testing.assert_allclose(agg1, agg0, atol=1e-5)


def test_streaming_matches_in_memory_alt_geometry():
    """Same streaming-vs-in-memory equality on a different trunk depth and
    snippet length (down = 8), guarding the tiling/grid math beyond the
    shipped geometry."""
    snippet, filters = 48, [4, 6, 8]
    nfilt = len(filters)
    param = {**PARAM, "model": {**PARAM["model"], "filters": filters}}
    model = build_model(param)
    variables = model.init(jax.random.key(2), jnp.zeros((1, snippet, NBINS, 1)))
    wp = lambda: WindowPredictor(  # noqa: E731 - tiny local factory
        model, variables, snippet_len=snippet, n_filters=nfilt,
        batch_size=4, max_windows_per_chunk=16,
    )
    rng = np.random.default_rng(3)
    audio = (rng.uniform(-1, 1, size=18_000) * 0.5).astype(np.float32)
    spec, _, _ = compute_spectrogram(
        audio, SP["sampling_rate"], SP["nfft"], SP["n_overlap"],
        SP["freq_range"], SP["quantiles"],
    )
    agg0, cnt0 = wp().aggregate(spec)
    streaming = StreamingPredictor(
        wp(), SP, windows_per_chunk=8, stats_tile_frames=128
    )
    agg1, cnt1 = streaming.aggregate(audio)
    np.testing.assert_array_equal(cnt1, cnt0)
    np.testing.assert_allclose(agg1, agg0, atol=1e-5)


def test_streaming_int16_audio(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    n = 24_000
    pcm = (rng.uniform(-0.5, 0.5, size=n) * 32767).astype(np.int16)

    agg0, cnt0 = _in_memory(model, variables, pcm.astype(np.float32) / 32768.0)

    streaming = StreamingPredictor(
        _predictor(model, variables), SP,
        windows_per_chunk=8, stats_tile_frames=256,
    )
    agg1, cnt1 = streaming.aggregate(pcm)
    np.testing.assert_array_equal(cnt1, cnt0)
    np.testing.assert_allclose(agg1, agg0, atol=1e-5)


def test_streaming_too_short_raises(model_and_vars):
    model, variables = model_and_vars
    streaming = StreamingPredictor(_predictor(model, variables), SP)
    with pytest.raises(ValueError, match="too short"):
        streaming.aggregate(np.zeros(SNIPPET, np.float32))


# a regriddable tiny geometry for the spectral streaming wire: 100 Hz bins,
# retained band [0, 1200] (top bin 1100) leaves a 1300 Hz transition under
# the 1800 Hz output Nyquist -> spectral_geometry = (3600, 36, 18), 12 bins
SP_REGRID = {
    "sampling_rate": 4800,
    "nfft": 48,
    "n_overlap": 24,
    "freq_range": [0, 1200],
    "quantiles": [0.01, 0.999],
}
NBINS_REGRID = 12


@pytest.fixture(scope="module")
def regrid_model_and_vars():
    model = build_model(PARAM)
    variables = model.init(
        jax.random.key(5), jnp.zeros((1, SNIPPET, NBINS_REGRID, 1))
    )
    return model, variables


@pytest.mark.parametrize("hbm_audio_budget", [1 << 40, 0])
def test_streaming_sp_wire_equals_base_on_preresampled(
    regrid_model_and_vars, hbm_audio_budget
):
    """Machinery exactness of the regridded spectral streaming wire: the
    sp-bfp5 streaming run must EQUAL a bfp5 streaming run over the
    globally pre-resampled audio at the scaled geometry — same decoded
    samples (ResampledStream is slice-bit-exact, the block grid is
    recording-origin-anchored in both), same programs, same outputs. Both
    the HBM-resident and host-sliced tile paths."""
    from orcai_tpu.ops.spectral import resample_poly, spectral_geometry

    model, variables = regrid_model_and_vars
    rng = np.random.default_rng(11)
    audio = (rng.uniform(-0.7, 0.7, 24_000) * 32767).astype(np.int16)

    geo = spectral_geometry(
        SP_REGRID["sampling_rate"], SP_REGRID["nfft"],
        SP_REGRID["n_overlap"], SP_REGRID["freq_range"],
    )
    assert geo == (3600, 36, 18, 1100.0)

    def wp():
        return WindowPredictor(
            model, variables, snippet_len=SNIPPET, n_filters=NFILT,
            batch_size=4, max_windows_per_chunk=16,
        )

    s_sp = StreamingPredictor(
        wp(), SP_REGRID, windows_per_chunk=8, stats_tile_frames=128,
        hbm_audio_budget=hbm_audio_budget, wire="sp-bfp5",
    )
    assert s_sp.wire_label == "sp-bfp5" and s_sp.wire == "bfp5"
    a1, c1 = s_sp.aggregate(audio)

    pre = resample_poly(audio, SP_REGRID["sampling_rate"], 1100.0, 3, 4)
    sp_scaled = dict(SP_REGRID, sampling_rate=3600, nfft=36, n_overlap=18)
    s_base = StreamingPredictor(
        wp(), sp_scaled, windows_per_chunk=8, stats_tile_frames=128,
        hbm_audio_budget=hbm_audio_budget, wire="bfp5",
    )
    a2, c2 = s_base.aggregate(pre)

    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_streaming_sp_wire_close_to_in_memory_sp_wire(regrid_model_and_vars):
    """Semantic equivalence: streaming sp-bfp5 vs the in-memory sp-bfp5
    path on the same audio. Not bit-equal (the in-memory staging anchors
    bfp blocks per upload chunk, streaming on the recording origin — both
    valid encodings of the same wire), but the same grid and near-equal
    probabilities."""
    from orcai_tpu.ops.frontend import compute_spectrogram

    model, variables = regrid_model_and_vars
    rng = np.random.default_rng(12)
    audio = (rng.uniform(-0.7, 0.7, 24_000) * 32767).astype(np.int16)

    spec, _, _ = compute_spectrogram(
        audio, SP_REGRID["sampling_rate"], SP_REGRID["nfft"],
        SP_REGRID["n_overlap"], SP_REGRID["freq_range"],
        SP_REGRID["quantiles"], wire="sp-bfp5",
    )
    assert spec.shape[1] == NBINS_REGRID
    wp = WindowPredictor(
        model, variables, snippet_len=SNIPPET, n_filters=NFILT,
        batch_size=4, max_windows_per_chunk=16,
    )
    agg0, cnt0 = wp.aggregate(spec)

    streaming = StreamingPredictor(
        WindowPredictor(
            model, variables, snippet_len=SNIPPET, n_filters=NFILT,
            batch_size=4, max_windows_per_chunk=16,
        ),
        SP_REGRID, windows_per_chunk=8, stats_tile_frames=128,
        wire="sp-bfp5",
    )
    agg1, cnt1 = streaming.aggregate(audio)

    assert agg1.shape == agg0.shape
    np.testing.assert_array_equal(cnt1, cnt0)
    np.testing.assert_allclose(agg1, agg0, atol=0.05)
    assert float(np.abs(agg1 - agg0).mean()) < 0.01
