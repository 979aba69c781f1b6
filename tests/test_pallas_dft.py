"""Pallas fused DFT-magnitude kernel vs the numpy reference (interpret mode
on the CPU test backend)."""

import numpy as np
import jax.numpy as jnp

from orcai_tpu.ops.frontend import _dft_mats, hann_window
from orcai_tpu.ops.pallas_dft import dft_magnitude

NFFT, HOP = 512, 256


def _numpy_mag(padded):
    tpad = (len(padded) - NFFT) // HOP + 1
    win = hann_window(NFFT)
    frames = np.stack(
        [padded[i * HOP : i * HOP + NFFT] * win for i in range(tpad)]
    )
    return np.abs(np.fft.rfft(frames, axis=1)).astype(np.float32)


def test_pallas_dft_matches_numpy_f32():
    rng = np.random.default_rng(0)
    tile = 64
    tpad = 256
    n = (tpad - 1) * HOP + NFFT
    padded = rng.standard_normal(n).astype(np.float32)

    C, S = _dft_mats(NFFT)
    got = dft_magnitude(
        jnp.asarray(padded), jnp.asarray(C), jnp.asarray(S),
        n_fft=NFFT, hop=HOP, tile_frames=tile, interpret=True,
    )
    expected = _numpy_mag(padded)
    assert got.shape == expected.shape == (tpad, 257)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


def test_pallas_dft_int16_input():
    rng = np.random.default_rng(1)
    tile = 64
    tpad = 128
    n = (tpad - 1) * HOP + NFFT
    pcm = (rng.uniform(-0.5, 0.5, size=n) * 32768).astype(np.int16)

    C, S = _dft_mats(NFFT)
    got = dft_magnitude(
        jnp.asarray(pcm), jnp.asarray(C), jnp.asarray(S),
        n_fft=NFFT, hop=HOP, tile_frames=tile, interpret=True,
    )
    expected = _numpy_mag(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)
