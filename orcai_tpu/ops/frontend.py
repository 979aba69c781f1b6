"""Fused audio frontend: wav samples -> normalized spectrogram, on device.

TPU-native replacement for the reference's host-side librosa chain
(spectrogram.py:15-87): framing -> Hann -> rFFT -> |S| -> dB(ref=max,
top_db=80) -> frequency crop -> global nearest-percentile clip -> min-max
normalize -> transpose. Everything after WAV decode runs as one jit'd XLA
graph; the DFT is expressed as two (T, n_fft) @ (n_fft, n_bins) matmuls so
the FLOPs land on the MXU (GEMM-native DFT) instead of a host FFT.

Semantics matched to the reference numerics:
- librosa.stft defaults: center=True, pad_mode="constant" (zero padding),
  periodic Hann window, frame count 1 + N // hop.
- librosa.amplitude_to_db(ref=np.max): 20*log10(max(|S|, 1e-5)) relative to
  the global max, clamped at top_db=80 below the peak (== max(db, -80) since
  the global max maps to 0 dB exactly).
- Frequency crop replicates the reference's argwhere bounds
  (spectrogram.py:62-68): [first index with f <= lo, first index with f >= hi).
- Percentiles use numpy's method="nearest" (virtual index q*(n-1), round
  half to even) over the cropped dB values of the *valid* frames only
  (spectrogram.py:70-78); padded frames are masked out of every statistic.

Recordings of arbitrary length are padded to power-of-two frame buckets so
XLA compiles a handful of shapes, with validity masks keeping the statistics
exact.

The frontend is TILED: audio is uploaded in fixed-size overlapping chunks
(one per 32768-frame tile) and each tile's DFT magnitudes are computed as
the later chunks are still in flight, so on remote-dispatch backends the
host->device transfer overlaps compute instead of serializing before one
monolithic program. Tiling also keeps executables small (the per-tile DFT
program is compiled once for every recording longer than the tile) and the
global statistics stay exact: dB is a monotone non-decreasing function of
|S|, so the nearest-method percentiles of the cropped dB values are the
transformed order statistics of the cropped magnitudes, picked from one
masked sort — or, on TPU, three MXU histogram sweeps (ops/pallas_hist.py)
— over the resident magnitude tiles (same monotonicity trick as the
streaming predictor, ops/streaming.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from orcai_tpu.ops.wire_codec import (
    bfp_decode_wire_i16,
    bfp_encode_wire,
    mulaw_decode_f32,
    mulaw_encode,
    resolve_wire,
    round_to_int16,
    spectral_wire_base,
    wire_bfp_bits,
)
from orcai_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

_AMIN = 1e-5  # librosa amplitude_to_db amin
_TOP_DB = 80.0
_MIN_BUCKET = 2048  # minimum padded frame count (bounds recompilation)
_TILE_FRAMES = 32768  # frames per upload/DFT tile (~16.8 MB of int16 audio)


def fft_frequencies(sr: int, n_fft: int) -> np.ndarray:
    """Center frequencies of rFFT bins: i * sr / n_fft, i = 0..n_fft//2."""
    return np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)


def frames_to_time(n_frames: int, sr: int, hop_length: int) -> np.ndarray:
    """Frame-center times for a centered STFT: i * hop / sr."""
    return np.arange(n_frames) * (hop_length / sr)


def freq_crop_indices(frequencies: np.ndarray, freq_range) -> tuple[int, int]:
    """Crop bounds [lo_idx, hi_idx) as the reference computes them.

    lo_idx = first index with f <= freq_range[0] (always 0 for ranges
    starting at 0), hi_idx = first index with f >= freq_range[1].
    """
    lo_candidates = np.flatnonzero(frequencies <= freq_range[0])
    hi_candidates = np.flatnonzero(frequencies >= freq_range[1])
    if len(lo_candidates) == 0 or len(hi_candidates) == 0:
        raise ValueError(
            f"freq_range {freq_range} outside spectrogram frequencies "
            f"[{frequencies[0]}, {frequencies[-1]}]"
        )
    return int(lo_candidates[0]), int(hi_candidates[0])


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, as used by librosa.stft."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)


@lru_cache(maxsize=None)
def _dft_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rDFT matrices with the Hann window folded in.

    Returns (C, S) of shape (n_fft, n_fft//2 + 1) such that for a raw frame
    x: re = x @ C, im = x @ S give the windowed rFFT. Cached (read-only):
    the O(n_fft^2) trig tables are rebuilt by every frontend/streaming
    builder on a single-core host otherwise.
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft)[:, None]
    C = (np.cos(ang) * w).astype(np.float32)
    S = (-np.sin(ang) * w).astype(np.float32)
    C.setflags(write=False)
    S.setflags(write=False)
    return C, S


def nearest_quantile_index(q: float, n: int) -> int:
    """Index of the q-quantile with numpy's method='nearest' over n values.

    Virtual index q*(n-1), rounded half-to-even (np.around semantics).
    Computed host-side in float64 — n can exceed float32's exact-int range.
    """
    return int(np.round(q * (n - 1)))


def framed_dft_magnitude(
    audio_tile: jnp.ndarray,
    C: jnp.ndarray,
    S: jnp.ndarray,
    *,
    n_fft: int,
    hop: int,
    tpad: int,
    precision=jax.lax.Precision.HIGHEST,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Framing + windowed rDFT magnitudes for a padded audio tile.

    Shared by the in-memory frontend and the streaming two-pass predictor.
    `audio_tile` holds (tpad - 1) * hop + n_fft samples (int16 PCM is scaled
    on device; uint8 is mu-law wire codes, decoded on device — see
    ops/wire_codec.py); returns (tpad, n_bins). With use_pallas the fused
    Pallas kernel computes it without materializing the frames matrix
    (requires tpad divisible by its frame tile).
    """
    if use_pallas:
        from orcai_tpu.ops.pallas_dft import DEFAULT_TILE, dft_magnitude

        return dft_magnitude(
            audio_tile, C, S, n_fft=n_fft, hop=hop, tile_frames=DEFAULT_TILE
        )
    if audio_tile.dtype == jnp.uint8:
        audio_tile = mulaw_decode_f32(audio_tile)
    elif audio_tile.dtype == jnp.int16:
        audio_tile = audio_tile.astype(jnp.float32) * (1.0 / 32768.0)
    # frame extraction via the strided-reshape trick: rows of x2 are
    # hop-sized blocks and frame t is the concatenation of blocks
    # t .. t + n_fft/hop - 1
    k = n_fft // hop
    x2 = audio_tile.reshape(-1, hop)
    frames = jnp.concatenate([x2[i : i + tpad] for i in range(k)], axis=1)
    re = jnp.dot(frames, C, precision=precision)
    im = jnp.dot(frames, S, precision=precision)
    return jnp.sqrt(re * re + im * im)  # (tpad, n_bins)


def pallas_frontend_enabled(tpad: int) -> bool:
    """Whether the fused Pallas DFT kernel applies for a tpad-frame tile."""
    import os

    from orcai_tpu.ops.pallas_dft import DEFAULT_TILE

    return (
        jax.default_backend() == "tpu"
        and os.environ.get("ORCAI_TPU_DISABLE_PALLAS") != "1"
        and tpad % DEFAULT_TILE == 0
    )


@lru_cache(maxsize=None)
def _build_tile_mag_fn(
    n_fft: int,
    hop: int,
    lo_idx: int,
    hi_idx: int,
    tile: int,
    precision: str,
    use_pallas: bool = False,
    bfp_bits: int = 0,
):
    """jit'd (audio_tile, n_valid) -> (cropped |S| (tile, bins), tile_max).

    One executable per tile size covers recordings of every length; the
    tile max is taken over the FULL spectrum of valid frames (the dB
    reference of librosa.amplitude_to_db(ref=np.max)). The DFT matrices are
    passed as arguments, not closure constants: large embedded constants
    stall compilation on remote-dispatch TPU backends and defeat the
    persistent compilation cache.
    """
    C_dev, S_dev = map(jnp.asarray, _dft_mats(n_fft))
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    assert n_fft % hop == 0, "frontend requires hop dividing n_fft"

    tlen = (tile - 1) * hop + n_fft

    @jax.jit
    def tile_fn(audio_tile, n_valid, C, S):
        if bfp_bits:
            # bfp wire (ops/wire_codec.py): ONE uint8 buffer holding
            # [packed mantissas || shift bytes] (a single upload per chunk)
            # -> int16 PCM, bit-exact with the host round-trip, so every
            # downstream path (XLA DFT, Pallas kernel) runs its ordinary
            # int16 branch
            audio_tile = bfp_decode_wire_i16(audio_tile, bfp_bits)[:tlen]
        mag = framed_dft_magnitude(
            audio_tile, C, S, n_fft=n_fft, hop=hop, tpad=tile,
            precision=prec, use_pallas=use_pallas,
        )
        valid = (jnp.arange(tile) < n_valid)[:, None]
        tile_max = jnp.max(jnp.where(valid, mag, -jnp.inf))
        return mag[:, lo_idx:hi_idx], tile_max

    def wrapper(audio_tile, n_valid):
        return tile_fn(audio_tile, n_valid, C_dev, S_dev)

    # the fused floor pass (tools/compute_floor_probe.py) inlines the tile
    # body into ONE program — it needs the explicit-matrix jitted fn (inner)
    # and the resident DFT matrices to pass as arguments (embedding them as
    # trace constants would stall compiles and defeat the persistent cache)
    wrapper.inner = tile_fn
    wrapper.dft_mats = (C_dev, S_dev)
    return wrapper


def mxu_select_enabled() -> bool:
    """Whether the MXU radix-select kernel replaces the percentile sort."""
    import os

    return (
        jax.default_backend() == "tpu"
        and os.environ.get("ORCAI_TPU_DISABLE_PALLAS") != "1"
    )


@lru_cache(maxsize=None)
def _build_finalize_fn(n_tiles: int, tile: int, use_mxu_select: bool = False):
    """jit'd (mag tiles, tile maxes, n_valid, idx_lo, idx_hi) -> (Tpad, bins).

    Global statistics + normalization over the resident magnitude tiles:
    dB reference = max of tile maxes; percentiles as order statistics of
    the cropped magnitudes (dB is monotone non-decreasing in |S|, so the
    k-th smallest cropped dB is the dB transform of the k-th smallest
    cropped magnitude — including through the amin and top_db plateaus).
    The order statistics come from one masked sort, or — on TPU — from
    three MXU histogram sweeps (ops/pallas_hist.py, exact and ~2x cheaper
    than sorting ~40M floats). Valid rows are a contiguous prefix of the
    row-major magnitude buffer, so the radix path bounds validity by
    element count alone.
    """

    @jax.jit
    def finalize_fn(tiles, maxes, n_valid, idx_lo, idx_hi):
        mag = jnp.concatenate(tiles, axis=0)  # (n_tiles * tile, bins)
        bucket, n_bins = mag.shape
        ref = jnp.max(maxes)
        valid = (jnp.arange(bucket) < n_valid)[:, None]
        ref20 = 20.0 * jnp.log10(jnp.maximum(ref, _AMIN))

        def db_of(m):
            return jnp.maximum(
                20.0 * jnp.log10(jnp.maximum(m, _AMIN)) - ref20, -_TOP_DB
            )

        if use_mxu_select:
            from orcai_tpu.ops.pallas_hist import (
                pad_unit,
                select_order_statistics,
            )

            flat = mag.ravel()
            unit = pad_unit()
            padded_len = -(-flat.shape[0] // unit) * unit
            flat = jnp.pad(flat, (0, padded_len - flat.shape[0]))
            lo_mag, hi_mag = select_order_statistics(
                flat, n_valid * n_bins, idx_lo, idx_hi
            )
            lo = db_of(lo_mag)
            hi = db_of(hi_mag)
        else:
            flat = jnp.where(valid, mag, jnp.inf).ravel()
            flat = jnp.sort(flat)
            lo = db_of(flat[idx_lo])
            hi = db_of(flat[idx_hi])

        db = db_of(mag)
        # clip + min-max normalize; with nearest percentiles the clipped
        # minimum/maximum are exactly lo/hi. The final clip keeps f32
        # rounding from overshooting the [0, 1] contract.
        out = (jnp.clip(db, lo, hi) - lo) / (hi - lo)
        return jnp.clip(out, 0.0, 1.0).astype(jnp.float32)

    return finalize_fn


@lru_cache(maxsize=None)
def _zero_mag_tile_fn(tile: int, n_bins: int):
    """jit'd () -> (zeros (tile, bins), -inf max) for all-padding tiles."""

    @jax.jit
    def zero_fn():
        return (
            jnp.zeros((tile, n_bins), jnp.float32),
            jnp.asarray(-jnp.inf, jnp.float32),
        )

    return zero_fn


def _bucket_frames(n_frames: int) -> int:
    b = _MIN_BUCKET
    while b < n_frames:
        b *= 2
    return b


def _tile_plan(n_frames: int) -> tuple[int, int, int]:
    """(tile, n_tiles, n_real_tiles) for a recording of n_frames frames."""
    bucket = _bucket_frames(n_frames)
    tile = min(_TILE_FRAMES, bucket)
    return tile, bucket // tile, -(-n_frames // tile)


def _audio_tile_chunk(audio: np.ndarray, t: int, tile: int, n_fft: int, hop: int):
    """Host chunk of (tile - 1) * hop + n_fft samples for frames
    [t*tile, (t+1)*tile), including the centered-STFT zero padding.

    Interior chunks are raw views of the (possibly memory-mapped) audio —
    zero host copies; only the first and last chunks materialize a small
    padded buffer.
    """
    n = audio.shape[0]
    tlen = (tile - 1) * hop + n_fft
    s0 = t * tile * hop - n_fft // 2
    s1 = s0 + tlen
    if s0 >= 0 and s1 <= n:
        return audio[s0:s1]
    chunk = np.zeros((tlen,), audio.dtype)
    lo, hi = max(0, s0), min(n, s1)
    if hi > lo:
        chunk[lo - s0 : hi - s0] = audio[lo:hi]
    return chunk


def prepare_wire_audio(
    audio: np.ndarray,
    sampling_rate: int,
    n_fft: int,
    hop_length: int,
    freq_range,
    wire: str | None,
) -> tuple[np.ndarray, int, int, int, str, int]:
    """Host-side wire prelude shared by the production frontend and probes.

    Resolves the wire, applies the spectral 3/4 resample when the geometry
    allows, and puts the audio in the exact byte form the per-chunk staging
    expects. ONE definition: tools/compute_floor_probe stages the identical
    bytes this produces, so its "same pipeline" claim cannot drift from
    compute_spectrogram_device. Returns
    (audio, sampling_rate, n_fft, hop_length, effective_wire, bfp_bits).
    """
    audio = np.asarray(audio)
    if audio.dtype not in (np.float32, np.int16):
        audio = audio.astype(np.float32)
    if audio.ndim != 1:
        raise ValueError("compute_spectrogram expects mono audio (n,)")
    wire = resolve_wire(wire)
    spectral_base = spectral_wire_base(wire)
    if spectral_base is not None:
        # spectral wire (ops/spectral.py): resample L/M on host (sp-* 3/4,
        # sp11-* 11/16) and run the identical frontend at the scaled
        # geometry — same bin spacing, same frame times, same frame count,
        # same crop indices; the constant amplitude scale cancels through
        # the normalize chain. 25% (resp. 31%) fewer samples then cross
        # the link through the base codec. Geometries that cannot hold the
        # grid run the base codec at the native rate.
        from orcai_tpu.ops.spectral import spectral_downsample
        from orcai_tpu.ops.wire_codec import spectral_wire_ratio

        ds = spectral_downsample(
            audio, sampling_rate, n_fft, hop_length, freq_range,
            ratio=spectral_wire_ratio(wire),
        )
        wire = spectral_base
        if ds is not None:
            audio, sampling_rate, n_fft, hop_length = ds
    bfp_bits = wire_bfp_bits(wire)
    if wire == "mulaw8":
        # one LUT pass on host (~600 MB/s); downstream the uint8 dtype IS
        # the wire marker — raw uint8 PCM never reaches the device paths
        # (it is widened to float32 above / in io.wav before this point)
        audio = mulaw_encode(audio)
    elif bfp_bits:
        # bfp encodes per chunk at staging time; round float input to int16
        # once so chunk encodes are cheap slices of an integer buffer
        audio = round_to_int16(audio)
    return audio, sampling_rate, n_fft, hop_length, wire, bfp_bits


def compute_spectrogram_device(
    audio: np.ndarray,
    sampling_rate: int,
    n_fft: int,
    hop_length: int,
    freq_range,
    quantiles,
    precision: str = "highest",
    wire: str | None = None,
) -> tuple[jnp.ndarray, int, np.ndarray, np.ndarray]:
    """Device-resident frontend for one recording.

    Returns (padded device spectrogram (Tpad, bins), n_valid_frames,
    frequencies, times). Rows >= n_valid_frames are padding artifacts; every
    statistic (dB reference, percentiles) is computed over valid frames only.
    Accepts float32 audio in [-1, 1] or raw int16 PCM (scaled on device).

    `wire` picks the host->device byte format (ops/wire_codec.py): "exact"
    uploads the PCM as-is; "mulaw8" companded 8-bit codes decoded on device
    (half the bytes on transfer-bound links, ~38 dB quantization SNR);
    "bfp6"/"bfp5" block-floating-point packed mantissas (0.76 / 0.63 bytes
    per sample, ~33 / 27 dB), encoded per upload chunk and decoded to int16
    on device; None/"auto" resolves via ORCAI_TPU_WIRE, defaulting to sp-bfp5
    on TPU.
    """
    # the returned frequency vector is a CONTRACT: the uncropped spectrum of
    # the caller's native geometry (what the reference passes around and
    # pipeline/spectrogram.py persists as frequencies.json), independent of
    # any internal geometry a spectral wire runs the DFT at
    native_sr, native_n_fft = sampling_rate, n_fft
    audio, sampling_rate, n_fft, hop_length, wire, bfp_bits = (
        prepare_wire_audio(
            audio, sampling_rate, n_fft, hop_length, freq_range, wire
        )
    )
    n = audio.shape[0]
    n_frames = 1 + n // hop_length

    frequencies = fft_frequencies(native_sr, native_n_fft)
    times = frames_to_time(n_frames, sampling_rate, hop_length)
    # crop indices on the native vector: identical integers on the spectral
    # wire's internal 3/4 grid (same bin spacing, retained band below both
    # Nyquists — ops/spectral.spectral_geometry guarantees it)
    lo_idx, hi_idx = freq_crop_indices(frequencies, freq_range)
    n_bins = hi_idx - lo_idx

    tile, n_tiles, n_real = _tile_plan(n_frames)
    tile_fn = _build_tile_mag_fn(
        n_fft, hop_length, lo_idx, hi_idx, tile, precision,
        use_pallas=pallas_frontend_enabled(tile), bfp_bits=bfp_bits,
    )

    # issue one chunk upload + one tile DFT per tile without blocking: on
    # remote-dispatch backends chunk t+1's transfer is in flight while tile
    # t's DFT runs, so the dominant upload cost overlaps compute instead of
    # serializing ahead of one monolithic program. Interior chunks are raw
    # (possibly memory-mapped int16) views — the only host copy is the
    # first/last chunk's zero padding.
    mags, maxes = [], []
    for t in range(n_real):
        chunk = _audio_tile_chunk(audio, t, tile, n_fft, hop_length)
        if bfp_bits:
            dev_chunk = jnp.asarray(bfp_encode_wire(chunk, bfp_bits))
        else:
            dev_chunk = jnp.asarray(chunk)
        n_valid = min(tile, n_frames - t * tile)
        m, mx = tile_fn(dev_chunk, jnp.asarray(n_valid, jnp.int32))
        mags.append(m)
        maxes.append(mx)
    if n_real < n_tiles:
        zm, zx = _zero_mag_tile_fn(tile, n_bins)()
        mags.extend([zm] * (n_tiles - n_real))
        maxes.extend([zx] * (n_tiles - n_real))

    n_elem = n_frames * n_bins
    out = _build_finalize_fn(n_tiles, tile, mxu_select_enabled())(
        tuple(mags),
        jnp.stack(maxes),
        jnp.asarray(n_frames, dtype=jnp.int32),
        jnp.asarray(nearest_quantile_index(float(quantiles[0]), n_elem), jnp.int32),
        jnp.asarray(nearest_quantile_index(float(quantiles[1]), n_elem), jnp.int32),
    )
    return out, n_frames, frequencies, times


def compute_spectrogram(
    audio: np.ndarray,
    sampling_rate: int,
    n_fft: int,
    hop_length: int,
    freq_range,
    quantiles,
    precision: str = "highest",
    wire: str | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full frontend for one recording, returned to host.

    Returns (spectrogram (T, bins) float32 in [0, 1], frequencies of the
    *uncropped* spectrum, frame times) — the same triple shape the reference
    pipeline passes around (make_spectrogram, spectrogram.py:90-147, returns
    the preprocessed spectrogram with the raw frequency vector).
    """
    out, n_frames, frequencies, times = compute_spectrogram_device(
        audio, sampling_rate, n_fft, hop_length, freq_range, quantiles,
        precision, wire=wire,
    )
    spec = np.asarray(out[:n_frames])
    return spec, frequencies, times


def compute_spectrogram_host(
    audio: np.ndarray,
    sampling_rate: int,
    n_fft: int,
    hop_length: int,
    freq_range,
    quantiles,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host (numpy rFFT) frontend with the device path's exact semantics.

    The data-prep auto engine's host arm (pipeline/spectrogram.py): on a
    degraded tunnel — or a fast host VM — shipping ~270 MB per 20-minute
    recording through the link loses to computing on the host, so the
    driver needs a host path that is not a toy. Same chain as the device
    frontend / the reference's librosa semantics (stft center pad + hann,
    amplitude_to_db(ref=global max over the FULL spectrum, amin 1e-5,
    top_db 80), crop, nearest-percentile clip, min-max normalize;
    reference spectrogram.py:15-87), engineered for one core: strided
    window views (no (T, n_fft) frames copy), per-chunk rFFT sized to
    cache, and the dB/log computed on the CROPPED bins only (the
    reference pays log10 on the full spectrum then crops — the full-band
    max is all the dB reference needs). Agrees with the device path
    within the same float band the device holds against the float64
    oracle (tests/test_frontend.py).

    Returns the same (spectrogram (T, bins) f32 in [0, 1], uncropped
    frequencies, frame times) triple as compute_spectrogram.
    """
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    elif audio.dtype != np.float32:
        audio = audio.astype(np.float32)
    if audio.ndim != 1:
        raise ValueError("compute_spectrogram_host expects mono audio (n,)")
    n = audio.shape[0]
    n_frames = 1 + n // hop_length

    frequencies = fft_frequencies(sampling_rate, n_fft)
    times = frames_to_time(n_frames, sampling_rate, hop_length)
    lo_idx, hi_idx = freq_crop_indices(frequencies, freq_range)
    n_bins = hi_idx - lo_idx

    padded = np.zeros((n_frames - 1) * hop_length + n_fft, np.float32)
    padded[n_fft // 2 : n_fft // 2 + n] = audio
    win = hann_window(n_fft).astype(np.float32)

    out = np.empty((n_frames, n_bins), np.float32)
    ref = np.float32(0.0)
    chunk = max(1, (1 << 22) // (n_fft * 4))  # ~16 MB of framed f32
    for t0 in range(0, n_frames, chunk):
        t1 = min(t0 + chunk, n_frames)
        view = np.lib.stride_tricks.sliding_window_view(
            padded[t0 * hop_length : (t1 - 1) * hop_length + n_fft], n_fft
        )[::hop_length]
        S = np.abs(np.fft.rfft(view * win, axis=1))
        ref = max(ref, S.max())  # dB reference: FULL uncropped spectrum
        out[t0:t1] = S[:, lo_idx:hi_idx]

    # amplitude_to_db on the cropped bins; ref is the full-spectrum max so
    # the top_db floor is exactly -80 dB (db.max() over the full band = 0)
    np.maximum(out, np.float32(_AMIN), out=out)
    np.log10(out, out=out)
    out *= np.float32(20.0)
    out -= np.float32(20.0) * np.log10(np.maximum(ref, np.float32(_AMIN)))
    np.maximum(out, np.float32(-_TOP_DB), out=out)

    q_lo, q_hi = quantiles
    lo, hi = np.percentile(
        out, [100.0 * q_lo, 100.0 * q_hi], method="nearest"
    )
    np.clip(out, lo, hi, out=out)
    mn, mx = out.min(), out.max()
    out -= mn
    if mx > mn:
        out /= mx - mn
    return out, frequencies, times


def preprocess_db_spectrogram_numpy(
    spec_db: np.ndarray, frequencies: np.ndarray, spectrogram_parameter: dict
) -> np.ndarray:
    """Host-side frequency crop + percentile clip + min-max normalize.

    Numpy mirror of the device chain's post-dB stage, with the same numerics
    as the reference's preprocess_spectrogram (spectrogram.py:58-87): crop
    rows to freq_range via the argwhere bounds, clip to global nearest-method
    percentiles, normalize to [0, 1], transpose to (time, bins). Used for
    cross-checks against dB spectrograms produced elsewhere.
    """
    lo_idx, hi_idx = freq_crop_indices(
        frequencies, spectrogram_parameter["freq_range"]
    )
    s = np.asarray(spec_db)[lo_idx:hi_idx, :]
    q_lo, q_hi = spectrogram_parameter["quantiles"]
    lo = np.percentile(s, 100.0 * q_lo, method="nearest")
    hi = np.percentile(s, 100.0 * q_hi, method="nearest")
    s = np.clip(s, lo, hi)
    mn, mx = np.min(s), np.max(s)
    return ((s - mn) / (mx - mn)).T


def make_spectrogram_from_params(
    audio: np.ndarray, spectrogram_parameter: dict, precision: str = "highest",
    wire: str | None = None,
):
    """Frontend keyed by the orcai parameter schema.

    Note the reference's "n_overlap" key actually holds the hop length
    (spectrogram.py:37); the schema is kept for config compatibility.
    """
    return compute_spectrogram(
        audio,
        sampling_rate=spectrogram_parameter["sampling_rate"],
        n_fft=spectrogram_parameter["nfft"],
        hop_length=spectrogram_parameter["n_overlap"],
        freq_range=spectrogram_parameter["freq_range"],
        quantiles=spectrogram_parameter["quantiles"],
        precision=precision,
        wire=wire,
    )


def make_spectrogram_from_params_device(
    audio: np.ndarray, spectrogram_parameter: dict, precision: str = "highest",
    wire: str | None = None,
):
    """Device-resident variant of make_spectrogram_from_params."""
    return compute_spectrogram_device(
        audio,
        sampling_rate=spectrogram_parameter["sampling_rate"],
        n_fft=spectrogram_parameter["nfft"],
        hop_length=spectrogram_parameter["n_overlap"],
        freq_range=spectrogram_parameter["freq_range"],
        quantiles=spectrogram_parameter["quantiles"],
        precision=precision,
        wire=wire,
    )
