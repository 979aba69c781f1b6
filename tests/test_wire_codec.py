"""mu-law wire codec: exhaustive exactness + device decode + frontend parity.

The codec's contract (ops/wire_codec.py): encode is the exhaustive
nearest-reconstruction inverse of decode (ties toward smaller magnitude),
code 0 decodes to +0 (zero padding survives), and the device decode matches
the host table bit-for-bit. Frontend integration parity lives here too:
exact-vs-mulaw8 spectrograms agree to the codec's noise floor and e2e
annotations on the synthetic test wav are identical.
"""

import numpy as np
import pytest

from orcai_tpu.ops.wire_codec import (
    decode_table_int16,
    encode_table,
    mulaw_decode_f32,
    mulaw_decode_host,
    mulaw_encode,
    resolve_wire,
)


def test_decode_table_shape_and_zero():
    dec = decode_table_int16()
    assert dec.shape == (256,) and dec.dtype == np.int16
    assert dec[0] == 0  # code 0 -> +0: zero padding stays zero
    assert dec[0x80] == 0  # -0
    # positive codes strictly increasing, negatives mirror
    assert np.all(np.diff(dec[:128].astype(np.int32)) > 0)
    np.testing.assert_array_equal(
        dec[128:].astype(np.int32), -dec[:128].astype(np.int32)
    )
    assert dec[127] == 32124  # G.711 max level (8031 << 2)


def test_encode_is_nearest_reconstruction_exhaustive():
    """All 65536 int16 inputs: |x - decode(encode(x))| is minimal over all
    256 codes, with ties broken toward the smaller magnitude."""
    xs = np.arange(-32768, 32768, dtype=np.int32)
    codes = mulaw_encode(xs.astype(np.int16))
    rec = mulaw_decode_host(codes).astype(np.int32)
    err = np.abs(xs - rec)
    # brute-force nearest over the 256 levels
    levels = decode_table_int16().astype(np.int32)
    best = np.min(np.abs(xs[:, None] - levels[None, :]), axis=1)
    np.testing.assert_array_equal(err, best)
    # exact ties (x equidistant from two levels) resolve to the smaller
    # magnitude: check every positive midpoint of an even-sum level pair
    pos = levels[:128]
    sums = pos[:-1] + pos[1:]
    for i in np.flatnonzero(sums % 2 == 0):
        mid = sums[i] // 2
        assert mulaw_decode_host(mulaw_encode(np.int16(mid)))[()] == pos[i]


def test_round_trip_idempotent():
    """encode(decode(c)) == c for every code (both zeros map to +0 family)."""
    codes = np.arange(256, dtype=np.uint8)
    rec = mulaw_decode_host(codes)
    codes2 = mulaw_encode(rec)
    # -0 (0x80) reconstructs to 0 which re-encodes as +0; all others exact
    expect = codes.copy()
    expect[0x80] = 0
    np.testing.assert_array_equal(codes2, expect)


def test_error_bound_signal_proportional():
    """Per-segment error bound: within segment e the cell width is 2^(e+3)
    16-bit LSB, so |err| <= 2^(e+2); global SNR on full-scale content > 30 dB."""
    xs = np.arange(-32768, 32768, dtype=np.int32)
    rec = mulaw_decode_host(mulaw_encode(xs.astype(np.int16))).astype(np.int32)
    err = np.abs(xs - rec)
    # overall bound: half the largest cell (1024) plus the clip tail at the top
    assert err[np.abs(xs) <= 32124].max() <= 512
    # small signals get small error: |x| < 1024 -> err <= 32
    assert err[np.abs(xs) < 1024].max() <= 32
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.5, 0.5, 1 << 16) * 32768).astype(np.int16)
    r = mulaw_decode_host(mulaw_encode(x)).astype(np.float64)
    snr = 10 * np.log10(
        np.mean(x.astype(np.float64) ** 2) / np.mean((x - r) ** 2)
    )
    assert snr > 30.0


def test_device_decode_matches_host_table():
    codes = np.arange(256, dtype=np.uint8)
    dev = np.asarray(mulaw_decode_f32(codes))
    host = decode_table_int16().astype(np.float32) / 32768.0
    np.testing.assert_array_equal(dev, host)


def test_float_input_encode_matches_int16():
    rng = np.random.default_rng(1)
    x = (rng.uniform(-1, 1, 4096) * 32767).astype(np.int16)
    f = x.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(mulaw_encode(f), mulaw_encode(x))


def test_resolve_wire():
    assert resolve_wire("exact") == "exact"
    assert resolve_wire("mulaw8") == "mulaw8"
    assert resolve_wire(None, backend="cpu") == "exact"
    assert resolve_wire("auto", backend="tpu") == "mulaw8"
    with pytest.raises(ValueError):
        resolve_wire("gzip")


def test_env_override(monkeypatch):
    monkeypatch.setenv("ORCAI_TPU_WIRE", "mulaw8")
    assert resolve_wire(None, backend="cpu") == "mulaw8"
    monkeypatch.setenv("ORCAI_TPU_WIRE", "exact")
    assert resolve_wire("auto", backend="tpu") == "exact"
    # explicit request beats the env var
    assert resolve_wire("mulaw8", backend="cpu") == "mulaw8"


def test_frontend_mulaw8_is_decode_then_exact():
    """The mulaw8 frontend is EXACTLY the exact frontend run on the host-
    decoded audio — the wire moves the decode across the link, nothing else."""
    import jax

    from orcai_tpu.ops.frontend import compute_spectrogram

    rng = np.random.default_rng(2)
    sr = 48000
    x = (rng.uniform(-0.8, 0.8, sr * 3) * 32767).astype(np.int16)
    kw = dict(sampling_rate=sr, n_fft=512, hop_length=256,
              freq_range=[0, 20000], quantiles=[0.02, 0.98])
    s_wire, _, _ = compute_spectrogram(x, **kw, wire="mulaw8")
    dec = mulaw_decode_host(mulaw_encode(x))
    s_ref, _, _ = compute_spectrogram(dec, **kw, wire="exact")
    np.testing.assert_array_equal(s_wire, s_ref)


def test_pallas_dft_uint8_wire_input():
    """Pallas kernel's uint8 branch (interpret mode) decodes mu-law codes
    identically to the XLA dtype branch."""
    import jax.numpy as jnp

    from orcai_tpu.ops.frontend import _dft_mats, framed_dft_magnitude
    from orcai_tpu.ops.pallas_dft import dft_magnitude

    NFFT, HOP = 512, 256
    rng = np.random.default_rng(3)
    tile, tpad = 64, 128
    n = (tpad - 1) * HOP + NFFT
    pcm = (rng.uniform(-0.9, 0.9, size=n) * 32768).astype(np.int16)
    codes = mulaw_encode(pcm)

    C, S = _dft_mats(NFFT)
    got = dft_magnitude(
        jnp.asarray(codes), jnp.asarray(C), jnp.asarray(S),
        n_fft=NFFT, hop=HOP, tile_frames=tile, interpret=True,
    )
    want = framed_dft_magnitude(
        jnp.asarray(codes), jnp.asarray(C), jnp.asarray(S),
        n_fft=NFFT, hop=HOP, tpad=tpad,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_audio_source_mulaw8_tiles():
    """_AudioSource(wire=mulaw8): host-path and HBM-path tiles are the
    mu-law codes of the exact-path tiles (zero padding -> code 0)."""
    from orcai_tpu.ops.streaming import _AudioSource

    rng = np.random.default_rng(4)
    n_fft, hop = 512, 256
    audio = (rng.uniform(-1, 1, 50_000) * 32767).astype(np.int16)
    kw = dict(n_fft=n_fft, hop=hop, max_tile_frames=64)
    exact_host = _AudioSource(audio, hbm_budget_bytes=0, **kw)
    coded_host = _AudioSource(audio, hbm_budget_bytes=0, wire="mulaw8", **kw)
    coded_hbm = _AudioSource(audio, hbm_budget_bytes=1 << 30, wire="mulaw8", **kw)
    for t0 in (0, 37, 150):  # includes the zero-padded head
        e = np.asarray(exact_host.tile(t0, 64))
        ch = np.asarray(coded_host.tile(t0, 64))
        cd = np.asarray(coded_hbm.tile(t0, 64))
        np.testing.assert_array_equal(ch, mulaw_encode(e))
        np.testing.assert_array_equal(cd, ch)


def test_golden_predict_mulaw8_annotation_parity(tmp_path):
    """e2e: mulaw8 predictions on the golden wav match the exact-wire golden
    TSV up to degenerate zero-length detections (the only divergence the
    codec's quantization produces on this fixture)."""
    from pathlib import Path

    import pandas as pd

    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.resources import MODELS_DATA_DIR
    from orcai_tpu.utils import Messenger

    fixtures = Path(__file__).parent / "fixtures"
    out = tmp_path / "pred_mulaw8.txt"
    predict(
        fixtures / "golden.wav",
        model_dir=MODELS_DATA_DIR / "orcai-v1",
        output_path=out,
        overwrite=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=16,
        wire="mulaw8",
    )
    got = pd.read_csv(out, sep="\t")
    expected = pd.read_csv(fixtures / "golden_expected.txt", sep="\t")
    got = got[got["stop"] > got["start"]].reset_index(drop=True)
    expected = expected[expected["stop"] > expected["start"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected)


def test_golden_probability_grid_delta_bounded():
    """The codec's effect on the aggregated probability grid is bounded:
    on the golden wav the exact-vs-mulaw8 delta measures median ~1e-4,
    p99 ~0.01, max ~0.07 (CPU) — far below the 0.5 decision threshold for
    any non-marginal detection. Guards against a codec/decode regression
    that annotation-level tests could miss (annotations only flip near
    threshold)."""
    from pathlib import Path

    import numpy as np

    from orcai_tpu.io.model_store import load_orcai_model
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.pipeline.predict import predict_wav
    from orcai_tpu.resources import MODELS_DATA_DIR
    from orcai_tpu.utils import Messenger

    model, variables, param, shape = load_orcai_model(
        MODELS_DATA_DIR / "orcai-v1"
    )
    predictor = WindowPredictor(
        model,
        variables,
        snippet_len=shape["input_shape"][0],
        n_filters=len(param["model"]["filters"]),
        batch_size=16,
    )
    wav = Path(__file__).parent / "fixtures" / "golden.wav"
    probs = {}
    for wire in ("exact", "mulaw8"):
        _, p, _ = predict_wav(
            wav, 1, predictor, param, shape,
            msgr=Messenger(verbosity=0), wire=wire,
        )
        probs[wire] = np.asarray(p)
    delta = np.abs(probs["exact"] - probs["mulaw8"])
    assert float(np.median(delta)) < 1e-3
    assert float(np.percentile(delta, 99)) < 0.05
    assert float(delta.max()) < 0.2
