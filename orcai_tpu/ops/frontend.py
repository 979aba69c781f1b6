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
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from orcai_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

_AMIN = 1e-5  # librosa amplitude_to_db amin
_TOP_DB = 80.0
_MIN_BUCKET = 2048  # minimum padded frame count (bounds recompilation)


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


def _dft_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rDFT matrices with the Hann window folded in.

    Returns (C, S) of shape (n_fft, n_fft//2 + 1) such that for a raw frame
    x: re = x @ C, im = x @ S give the windowed rFFT.
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft)[:, None]
    return (np.cos(ang) * w).astype(np.float32), (-np.sin(ang) * w).astype(np.float32)


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
    on device); returns (tpad, n_bins). With use_pallas the fused Pallas
    kernel computes it without materializing the frames matrix (requires
    tpad divisible by its frame tile).
    """
    if use_pallas:
        from orcai_tpu.ops.pallas_dft import DEFAULT_TILE, dft_magnitude

        return dft_magnitude(
            audio_tile, C, S, n_fft=n_fft, hop=hop, tile_frames=DEFAULT_TILE
        )
    if audio_tile.dtype == jnp.int16:
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
def _build_spectrogram_fn(
    n_fft: int,
    hop: int,
    lo_idx: int,
    hi_idx: int,
    precision: str,
    use_pallas: bool = False,
):
    """jit'd (padded_frames_audio, n_valid_frames) -> normalized (Tpad, bins).

    The DFT matrices are passed as arguments, not closure constants: large
    embedded constants stall compilation on remote-dispatch TPU backends and
    defeat the persistent compilation cache.
    """
    C_dev = jnp.asarray(_dft_mats(n_fft)[0])
    S_dev = jnp.asarray(_dft_mats(n_fft)[1])
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    assert n_fft % hop == 0, "frontend requires hop dividing n_fft"

    @jax.jit
    def spec_fn_impl(
        padded: jnp.ndarray,
        n_valid: jnp.ndarray,
        idx_lo: jnp.ndarray,
        idx_hi: jnp.ndarray,
        C: jnp.ndarray,
        S: jnp.ndarray,
    ) -> jnp.ndarray:
        tpad = (padded.shape[0] - n_fft) // hop + 1
        mag = framed_dft_magnitude(
            padded, C, S, n_fft=n_fft, hop=hop, tpad=tpad,
            precision=prec, use_pallas=use_pallas,
        )

        valid = (jnp.arange(tpad) < n_valid)[:, None]  # (Tpad, 1)

        # dB relative to the global max over the *full* spectrum of valid frames
        ref = jnp.max(jnp.where(valid, mag, -jnp.inf))
        db = 20.0 * jnp.log10(jnp.maximum(mag, _AMIN)) - 20.0 * jnp.log10(
            jnp.maximum(ref, _AMIN)
        )
        db = jnp.maximum(db, -_TOP_DB)  # top_db clamp; global max is 0 dB

        dbc = db[:, lo_idx:hi_idx]  # frequency crop

        # global nearest-percentiles over valid entries: masked sort, then
        # pick the host-computed nearest-method indices
        flat = jnp.where(valid, dbc, jnp.inf).ravel()
        flat = jnp.sort(flat)
        lo = flat[idx_lo]
        hi = flat[idx_hi]

        # clip + min-max normalize; with nearest percentiles the clipped
        # minimum/maximum are exactly lo/hi. The final clip keeps f32
        # rounding from overshooting the [0, 1] contract.
        out = (jnp.clip(dbc, lo, hi) - lo) / (hi - lo)
        return jnp.clip(out, 0.0, 1.0).astype(jnp.float32)

    def spec_fn(padded, n_valid, idx_lo, idx_hi):
        return spec_fn_impl(padded, n_valid, idx_lo, idx_hi, C_dev, S_dev)

    return spec_fn


@partial(jax.jit, static_argnums=(1, 2))
def _pad_on_device(audio: jnp.ndarray, total: int, n_fft: int) -> jnp.ndarray:
    """Center audio in a zeros buffer of `total` samples (device-side)."""
    buf = jnp.zeros((total,), dtype=audio.dtype)
    return jax.lax.dynamic_update_slice(buf, audio, (n_fft // 2,))


def _bucket_frames(n_frames: int) -> int:
    b = _MIN_BUCKET
    while b < n_frames:
        b *= 2
    return b


def compute_spectrogram_device(
    audio: np.ndarray,
    sampling_rate: int,
    n_fft: int,
    hop_length: int,
    freq_range,
    quantiles,
    precision: str = "highest",
) -> tuple[jnp.ndarray, int, np.ndarray, np.ndarray]:
    """Device-resident frontend for one recording.

    Returns (padded device spectrogram (Tpad, bins), n_valid_frames,
    frequencies, times). Rows >= n_valid_frames are padding artifacts; every
    statistic (dB reference, percentiles) is computed over valid frames only.
    Accepts float32 audio in [-1, 1] or raw int16 PCM (scaled on device).
    """
    audio = np.asarray(audio)
    if audio.dtype not in (np.float32, np.int16):
        audio = audio.astype(np.float32)
    if audio.ndim != 1:
        raise ValueError("compute_spectrogram expects mono audio (n,)")
    n = audio.shape[0]
    n_frames = 1 + n // hop_length

    frequencies = fft_frequencies(sampling_rate, n_fft)
    times = frames_to_time(n_frames, sampling_rate, hop_length)
    lo_idx, hi_idx = freq_crop_indices(frequencies, freq_range)

    tpad = _bucket_frames(n_frames)
    total = (tpad - 1) * hop_length + n_fft
    # with hop == n_fft the bucket buffer can fall short of centering the
    # last samples (dynamic_update_slice would silently clamp and misalign
    # every frame); grow to the next bucket until the audio fits
    while total < n_fft // 2 + n:
        tpad *= 2
        total = (tpad - 1) * hop_length + n_fft

    use_pallas = pallas_frontend_enabled(tpad)
    fn = _build_spectrogram_fn(
        n_fft, hop_length, lo_idx, hi_idx, precision, use_pallas
    )
    n_elem = n_frames * (hi_idx - lo_idx)
    # upload the RAW samples (possibly an int16 mmap streaming straight from
    # the page cache) and pad to the frame bucket ON DEVICE: the bucket can
    # add up to 2x frames, so host-side padding would inflate the
    # host->device transfer - the dominant cost on tunneled backends - and
    # force an extra host copy of the whole recording
    padded = _pad_on_device(jnp.asarray(audio), total, n_fft)
    out = fn(
        padded,
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
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full frontend for one recording, returned to host.

    Returns (spectrogram (T, bins) float32 in [0, 1], frequencies of the
    *uncropped* spectrum, frame times) — the same triple shape the reference
    pipeline passes around (make_spectrogram, spectrogram.py:90-147, returns
    the preprocessed spectrogram with the raw frequency vector).
    """
    out, n_frames, frequencies, times = compute_spectrogram_device(
        audio, sampling_rate, n_fft, hop_length, freq_range, quantiles, precision
    )
    spec = np.asarray(out[:n_frames])
    return spec, frequencies, times


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
    audio: np.ndarray, spectrogram_parameter: dict, precision: str = "highest"
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
    )


def make_spectrogram_from_params_device(
    audio: np.ndarray, spectrogram_parameter: dict, precision: str = "highest"
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
    )
