"""Pallas TPU kernel: fused framing + windowed DFT magnitude.

The XLA frontend path materializes the (T, n_fft) float32 frames matrix in
HBM (orcai_tpu.ops.frontend). This kernel computes the windowed DFT as a sum
of k = n_fft/hop partial GEMMs over hop-blocked views of the audio — the
frames matrix never exists. The k shifted views stay in the PCM dtype
(int16 when the wav is 16-bit), so HBM traffic is roughly a quarter of the
XLA path's, and Pallas' block pipeline double-buffers the audio tiles into
VMEM while the MXU runs the previous tile's GEMMs.

Mosaic constraints shaped the design: vectors with mismatched sublane
offsets cannot be concatenated and DMA slices must be tile-aligned, so
instead of building frames = concat(x[j], x[j+1]) in-register, each shift j
becomes its own aligned input stream and its own (tile, hop) @ (hop, n_bins)
partial product against the j-th row block of the DFT matrices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orcai_tpu.ops.wire_codec import mulaw_decode_f32

DEFAULT_TILE = 256


def _kernel(*refs, hop, n_fft, tile):
    k = n_fft // hop
    audio_refs = refs[:k]
    c_ref, s_ref, out_ref = refs[k], refs[k + 1], refs[k + 2]

    re = jnp.zeros(out_ref.shape, jnp.float32)
    im = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(k):
        x = audio_refs[j][:]
        if x.dtype == jnp.uint8:
            # mu-law wire codes (ops/wire_codec.py): decode is pure integer
            # vector ops, so the coded bytes stream into VMEM at 1/4 the
            # float bandwidth and expand in-register
            x = mulaw_decode_f32(x)
        elif x.dtype == jnp.int16:
            x = x.astype(jnp.float32) * (1.0 / 32768.0)
        else:
            x = x.astype(jnp.float32)
        re = re + jnp.dot(
            x, c_ref[pl.ds(j * hop, hop)],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        im = im + jnp.dot(
            x, s_ref[pl.ds(j * hop, hop)],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
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

    # k frame-aligned shifted views: shift_j[t] = padded[(t + j) * hop : +hop]
    shifted = [
        jax.lax.dynamic_slice_in_dim(padded, j * hop, tpad * hop).reshape(
            tpad, hop
        )
        for j in range(k)
    ]

    grid = (tpad // tile_frames,)
    audio_specs = [
        pl.BlockSpec((tile_frames, hop), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(k)
    ]
    return pl.pallas_call(
        partial(_kernel, hop=hop, n_fft=n_fft, tile=tile_frames),
        grid=grid,
        in_specs=audio_specs
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_frames, n_bins), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tpad, n_bins), jnp.float32),
        interpret=interpret,
    )(*shifted, C, S)
