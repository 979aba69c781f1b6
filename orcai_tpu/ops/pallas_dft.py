"""Pallas TPU kernel: fused framing + windowed DFT magnitude.

The XLA frontend path materializes the (T, n_fft) frames matrix and the
complex parts in HBM (orcai_tpu.ops.frontend). This kernel streams the raw
audio tile-by-tile from HBM into VMEM, builds the overlapped frames
in-register, runs the two windowed-DFT GEMMs on the MXU and writes only the
(T, n_bins) magnitudes back — cutting HBM traffic roughly 3x and keeping
int16 PCM packed until it reaches VMEM.

Grid: one program per tile of `tile_frames` frames. Each program DMAs its
(tile_frames + 1) * hop audio samples (windows overlap by hop when
n_fft == 2 * hop), so audio is read ~once overall.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256


def _kernel(audio_hbm, c_ref, s_ref, out_ref, a_scratch, sem, *, hop, n_fft, tile):
    i = pl.program_id(0)
    slice_len = tile * hop + (n_fft - hop)
    dma = pltpu.make_async_copy(
        audio_hbm.at[pl.ds(i * tile * hop, slice_len)], a_scratch, sem
    )
    dma.start()
    dma.wait()

    x = a_scratch[:]
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) * (1.0 / 32768.0)
    else:
        x = x.astype(jnp.float32)

    k = n_fft // hop
    x2 = x.reshape(tile + k - 1, hop)
    frames = jnp.concatenate([x2[j : j + tile] for j in range(k)], axis=1)

    re = jnp.dot(frames, c_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sqrt(re * re + im * im)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "tile_frames", "interpret"),
)
def dft_magnitude(
    padded: jnp.ndarray,
    C: jnp.ndarray,
    S: jnp.ndarray,
    n_fft: int,
    hop: int,
    tile_frames: int = DEFAULT_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Npad,) padded audio -> (Tpad, n_bins) windowed |DFT|.

    `padded` must hold (Tpad - 1) * hop + n_fft samples with Tpad divisible
    by tile_frames; C/S are the (n_fft, n_bins) cos/sin matrices with the
    analysis window folded in (frontend._dft_mats). int16 input is scaled to
    [-1, 1] inside the kernel.
    """
    assert n_fft % hop == 0
    k = n_fft // hop
    tpad = (padded.shape[0] - n_fft) // hop + 1
    assert tpad % tile_frames == 0, (tpad, tile_frames)
    n_bins = C.shape[1]
    slice_len = tile_frames * hop + (n_fft - hop)

    grid = (tpad // tile_frames,)
    return pl.pallas_call(
        partial(_kernel, hop=hop, n_fft=n_fft, tile=tile_frames),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_frames, n_bins), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tpad, n_bins), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slice_len,), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded, C, S)
