"""Wire codecs: exhaustive exactness + device decode + frontend parity.

mu-law contract (ops/wire_codec.py): encode is the exhaustive
nearest-reconstruction inverse of decode (ties toward smaller magnitude),
code 0 decodes to +0 (zero padding survives), and the device decode matches
the host table bit-for-bit. bfp contract: device decode is bit-exact with
the host round trip (so wire_lab's parity evidence transfers verbatim),
zero bytes decode to exact silence, and per-block error is bounded by half
the quantization step. Frontend integration parity lives here too: coded
frontends are EXACTLY the exact frontend on host-round-tripped audio and
e2e annotations on the synthetic test wav are identical.
"""

import numpy as np
import pytest

from orcai_tpu.ops.wire_codec import (
    BFP_BLOCK,
    bfp_block_bytes,
    bfp_bytes_per_sample,
    bfp_decode_host,
    bfp_decode_i16,
    bfp_encode,
    bfp_streaming_aligned,
    decode_table_int16,
    encode_table,
    mulaw_decode_f32,
    mulaw_decode_host,
    mulaw_encode,
    resolve_wire,
    wire_bytes_per_sample,
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
    assert resolve_wire("bfp6") == "bfp6"
    assert resolve_wire("bfp5") == "bfp5"
    assert resolve_wire(None, backend="cpu") == "exact"
    assert resolve_wire("auto", backend="tpu") == "sp-bfp5"
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


# ----------------------------------------------------------- bfp6 / bfp5


def _bfp_test_signal(n=200_000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = (
        9000 * np.sin(2 * np.pi * 0.06 * t)
        + 1500 * rng.standard_normal(n)
        + 20000 * np.sin(2 * np.pi * 0.2 * t) * (t > n // 2)  # loud half
    )
    return np.clip(x, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("bits", [6, 5])
def test_bfp_device_decode_matches_host_bit_exact(bits):
    """The device decode IS the host round trip — the property that makes
    wire_lab's host-round-trip parity evidence transfer to the device."""
    x = _bfp_test_signal()
    packed, shifts = bfp_encode(x, bits)
    host = bfp_decode_host(packed, shifts, bits)
    dev = np.asarray(bfp_decode_i16(packed, shifts, bits))
    np.testing.assert_array_equal(dev, host)
    assert dev.dtype == np.int16
    # layout arithmetic
    nblk = -(-len(x) // BFP_BLOCK)
    assert packed.shape == (nblk * bfp_block_bytes(bits),)
    assert shifts.shape == (nblk,)


@pytest.mark.parametrize("bits", [6, 5])
def test_bfp_zero_bytes_decode_to_silence(bits):
    """Two's-complement mantissa storage: silence encodes to all-zero bytes
    and zero-initialized buffers decode to exact silence — the property the
    streaming HBM buffer's zero padding relies on."""
    pk, sh = bfp_encode(np.zeros(3 * BFP_BLOCK, np.int16), bits)
    assert not pk.any() and not sh.any()
    dec = bfp_decode_host(np.zeros_like(pk), np.zeros_like(sh), bits)
    assert not dec.any()


@pytest.mark.parametrize("bits", [6, 5])
def test_bfp_error_bound_per_block(bits):
    """|x - roundtrip(x)| <= 2^(shift-1) per block (round-half-up), except
    the clipped top code which adds at most one extra step."""
    x = _bfp_test_signal(seed=6)
    packed, shifts = bfp_encode(x, bits)
    rec = bfp_decode_host(packed, shifts, bits)[: len(x)].astype(np.int64)
    err = np.abs(rec - x.astype(np.int64))
    sh = shifts.astype(np.int64)
    half_step = np.where(sh > 0, 1 << np.maximum(sh - 1, 0), 0)
    bound = np.repeat(half_step + (1 << sh), BFP_BLOCK)[: len(x)]
    assert np.all(err <= bound)
    # SNR on this mixed-level signal comfortably above the lab floor
    snr = 10 * np.log10(
        np.mean(x.astype(np.float64) ** 2)
        / max(np.mean((rec - x.astype(np.float64)) ** 2), 1e-30)
    )
    assert snr > (30.0 if bits == 6 else 24.0)


@pytest.mark.parametrize("bits", [6, 5])
def test_bfp_float_input_matches_int16(bits):
    x = _bfp_test_signal(seed=7)[: 4 * BFP_BLOCK]
    f = x.astype(np.float32) / 32768.0
    pk_i, sh_i = bfp_encode(x, bits)
    pk_f, sh_f = bfp_encode(f, bits)
    np.testing.assert_array_equal(pk_f, pk_i)
    np.testing.assert_array_equal(sh_f, sh_i)


def test_bfp_bytes_per_sample():
    assert abs(bfp_bytes_per_sample(6) - (0.75 + 1 / 128)) < 1e-12
    assert abs(bfp_bytes_per_sample(5) - (0.625 + 1 / 128)) < 1e-12
    assert wire_bytes_per_sample("exact") == 2.0
    assert wire_bytes_per_sample("mulaw8") == 1.0
    assert wire_bytes_per_sample("bfp6") == bfp_bytes_per_sample(6)


def test_bfp_streaming_alignment_gate():
    assert bfp_streaming_aligned(512, 256)  # reference defaults
    assert not bfp_streaming_aligned(512, 100)
    assert not bfp_streaming_aligned(400, 256)  # offset 200 misaligned


@pytest.mark.parametrize("bits", [6, 5])
def test_frontend_bfp_is_roundtrip_then_exact(bits):
    """With block-aligned tile geometry the bfp frontend is EXACTLY the
    exact frontend run on the host-round-tripped audio."""
    from orcai_tpu.ops.frontend import compute_spectrogram

    rng = np.random.default_rng(8)
    sr = 48000
    x = (rng.uniform(-0.8, 0.8, sr * 3 + 11) * 32767).astype(np.int16)
    kw = dict(sampling_rate=sr, n_fft=512, hop_length=256,
              freq_range=[0, 20000], quantiles=[0.02, 0.98])
    s_wire, _, _ = compute_spectrogram(x, **kw, wire=f"bfp{bits}")
    packed, shifts = bfp_encode(x, bits)
    dec = bfp_decode_host(packed, shifts, bits)[: len(x)]
    s_ref, _, _ = compute_spectrogram(dec, **kw, wire="exact")
    np.testing.assert_array_equal(s_wire, s_ref)


def test_audio_source_bfp_tiles():
    """_AudioSource(wire=bfp6): host-path and HBM-path tiles both decode to
    the recording-origin-anchored round trip of the exact-path tiles —
    every sample decodes identically in every tile of either pass."""
    from orcai_tpu.ops.streaming import _AudioSource

    rng = np.random.default_rng(9)
    n_fft, hop = 512, 256
    audio = (rng.uniform(-1, 1, 50_000) * 32767).astype(np.int16)
    # recording-origin-anchored global round trip
    packed, shifts = bfp_encode(audio, 6)
    audio_rt = bfp_decode_host(packed, shifts, 6)[: len(audio)]
    kw = dict(n_fft=n_fft, hop=hop, max_tile_frames=64)
    exact_host = _AudioSource(audio_rt, hbm_budget_bytes=0, **kw)
    coded_host = _AudioSource(audio, hbm_budget_bytes=0, wire="bfp6", **kw)
    coded_hbm = _AudioSource(audio, hbm_budget_bytes=1 << 30, wire="bfp6", **kw)
    for t0 in (0, 37, 150):  # includes the zero-padded head
        e = np.asarray(exact_host.tile(t0, 64))
        ch = np.asarray(coded_host.tile(t0, 64))
        cd = np.asarray(coded_hbm.tile(t0, 64))
        np.testing.assert_array_equal(ch, e)
        np.testing.assert_array_equal(cd, e)


def test_streaming_predictor_keeps_bfp_on_misaligned_geometry():
    """Round 5: block-misaligned tile geometries no longer downgrade to
    mulaw8 — tile slices decode from the containing block boundary and
    drop the intra-block offset on device, so the packed grid works for
    ANY n_fft/hop (including the spectral wire's regridded hop)."""
    from orcai_tpu.ops.streaming import StreamingPredictor

    class _WP:  # geometry-only stand-in
        batch_size = 8
        snippet_len = 16
        shift = 4
        down = 16

    sp = dict(sampling_rate=48000, nfft=400, n_overlap=100,
              freq_range=[0, 20000], quantiles=[0.02, 0.98])
    s = StreamingPredictor(_WP(), sp, wire="bfp6")
    assert s.wire == "bfp6"
    sp_ok = dict(sp, nfft=512, n_overlap=256)
    s2 = StreamingPredictor(_WP(), sp_ok, wire="bfp6")
    assert s2.wire == "bfp6"


def test_audio_source_bfp_tiles_misaligned_geometry():
    """The recording-origin block grid holds for geometries whose hop and
    centered-STFT offset are NOT block multiples: host-path and HBM-path
    tiles still decode to the recording-origin-anchored round trip of the
    exact-path tiles, for tile starts at arbitrary intra-block offsets."""
    from orcai_tpu.ops.streaming import _AudioSource

    rng = np.random.default_rng(10)
    audio = (rng.uniform(-1, 1, 50_000) * 32767).astype(np.int16)
    packed, shifts = bfp_encode(audio, 5)
    audio_rt = bfp_decode_host(packed, shifts, 5)[: len(audio)]
    for n_fft, hop in [(384, 192), (400, 100), (48, 24)]:
        kw = dict(n_fft=n_fft, hop=hop, max_tile_frames=64)
        exact_host = _AudioSource(audio_rt, hbm_budget_bytes=0, **kw)
        coded_host = _AudioSource(
            audio, hbm_budget_bytes=0, wire="bfp5", **kw
        )
        coded_hbm = _AudioSource(
            audio, hbm_budget_bytes=1 << 30, wire="bfp5", **kw
        )
        for t0 in (0, 1, 37, 150):  # includes the zero-padded head
            e = np.asarray(exact_host.tile(t0, 64))
            ch = np.asarray(coded_host.tile(t0, 64))
            cd = np.asarray(coded_hbm.tile(t0, 64))
            np.testing.assert_array_equal(ch, e, err_msg=f"{n_fft},{hop},{t0}")
            np.testing.assert_array_equal(cd, e, err_msg=f"{n_fft},{hop},{t0}")


def test_golden_predict_bfp6_annotation_parity(tmp_path):
    """e2e: bfp6 predictions on the golden wav match the exact-wire golden
    TSV annotation-for-annotation — same labels, every boundary within two
    aggregation rows (~0.17 s, the tolerance bench.py's wire.parity uses;
    on this fixture the codec shifts exactly one boundary by one row) —
    after dropping degenerate zero-length detections."""
    from pathlib import Path

    import pandas as pd

    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.resources import MODELS_DATA_DIR
    from orcai_tpu.utils import Messenger

    fixtures = Path(__file__).parent / "fixtures"
    out = tmp_path / "pred_bfp6.txt"
    predict(
        fixtures / "golden.wav",
        model_dir=MODELS_DATA_DIR / "orcai-v1",
        output_path=out,
        overwrite=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=16,
        wire="bfp6",
    )
    got = pd.read_csv(out, sep="\t")
    expected = pd.read_csv(fixtures / "golden_expected.txt", sep="\t")
    got = got[got["stop"] > got["start"]].reset_index(drop=True)
    expected = expected[expected["stop"] > expected["start"]].reset_index(drop=True)
    assert list(got["label"]) == list(expected["label"])
    tol = 2 * 16 * 256 / 48000  # two aggregation rows
    for col in ("start", "stop"):
        np.testing.assert_allclose(got[col], expected[col], atol=tol)


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
    for wire in ("exact", "mulaw8", "bfp6"):
        _, p, _ = predict_wav(
            wav, 1, predictor, param, shape,
            msgr=Messenger(verbosity=0), wire=wire,
        )
        probs[wire] = np.asarray(p)
    for wire in ("mulaw8", "bfp6"):
        delta = np.abs(probs["exact"] - probs[wire])
        assert float(np.median(delta)) < 1e-3, wire
        assert float(np.percentile(delta, 99)) < 0.05, wire
        assert float(delta.max()) < 0.2, wire
