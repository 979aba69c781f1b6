"""Pallas TPU kernel: masked conditional digit histograms on the MXU.

Exact-percentile selection over a recording's magnitude spectrogram needs
order statistics of ~40M float32 values. A full `jnp.sort` costs ~185 ms of
device time at that size; radix selection needs only three histogram
sweeps, but TPU has no vector scatter — a naive `.at[bins].add` lowers to
a serializing scatter (~9x slower than the sort). This kernel computes the
histogram as a ONE-HOT MATMUL instead: for each element, split the radix
digit d into d_hi (4 bits) and d_lo (7 bits), build one-hot matrices
A[t * 16 + d_hi, e] and B[e, d_lo] in VMEM, and accumulate A @ B on the
MXU — hist[t, d_hi, d_lo] counts elements matching target t's prefix
condition. One sweep over 45M elements runs in ~25 ms of device time; the
three sweeps of a full selection beat the sort ~2.4x.

The `t` axis stacks the two percentile targets (their level-1/2 prefix
conditions differ), which also doubles MXU row utilization. Weights fold
in the element-validity bound and, for refine levels, the per-target
prefix match — all elementwise 2D ops, Mosaic-friendly (no reshape of the
data layout, no transpose, no scatter).

Bit trick shared with ops/streaming.py: non-negative float32 bit patterns
are monotone as uint32, so the k-th smallest magnitude is found by digit-
wise selection on 11/11/10-bit digits of the bit pattern, exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 2048  # rows of 128 lanes per grid step (1 MB f32 in VMEM)
_SUB_ROWS = 128     # rows per inner one-hot matmul (bf16 one-hots)


def pad_unit() -> int:
    """Flat inputs must be padded to a multiple of this element count."""
    return _BLOCK_ROWS * _LANES


def _hist_kernel(x_ref, nvalid_ref, prefixes_ref, out_ref, *,
                 digit_shift, digit_bits, prefix_shift):
    """One grid step: (2, 16, 128) partial histogram of its row block."""
    i = pl.program_id(0)
    nv = nvalid_ref[0]
    p_lo = prefixes_ref[0]
    p_hi = prefixes_ref[1]
    mask = (1 << digit_bits) - 1

    def body(s, accs):  # fori_loop: bounds the kernel's VMEM stack to one step
        acc_lo, acc_hi = accs
        x = x_ref[pl.ds(s * _SUB_ROWS, _SUB_ROWS), :]  # (SUB, 128) f32
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        digit = ((bits >> digit_shift) & mask).astype(jnp.int32)
        dh = digit >> 7          # 0..15 (0..7 for 10-bit digits)
        dl = digit & 127         # 0..127

        row0 = (i * _BLOCK_ROWS + s * _SUB_ROWS) * _LANES
        elem = (
            row0
            + jax.lax.broadcasted_iota(jnp.int32, (_SUB_ROWS, _LANES), 0)
            * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (_SUB_ROWS, _LANES), 1)
        )
        w = (elem < nv).astype(jnp.float32)
        if prefix_shift is not None:
            prefix = bits >> prefix_shift
            w_lo = w * (prefix == p_lo).astype(jnp.float32)
            w_hi = w * (prefix == p_hi).astype(jnp.float32)
        else:
            w_lo, w_hi = w, None  # level 0: one unconditional histogram

        # one-hot values are 0/1 — exact in bf16; bf16 operands double MXU
        # throughput and halve VMEM, with exact f32 accumulation
        dh_onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (16, _SUB_ROWS, _LANES), 0)
            == dh[None, :, :]
        ).astype(jnp.bfloat16)
        B = (
            jax.lax.broadcasted_iota(
                jnp.int32, (_SUB_ROWS, _LANES, _LANES), 2
            )
            == dl[:, :, None]
        ).astype(jnp.bfloat16).reshape(_SUB_ROWS * _LANES, _LANES)

        def hist_for(wt):
            A = (dh_onehot * wt[None, :, :].astype(jnp.bfloat16)).reshape(
                16, _SUB_ROWS * _LANES
            )
            return jnp.dot(A, B, preferred_element_type=jnp.float32)

        acc_lo = acc_lo + hist_for(w_lo)
        if w_hi is not None:
            acc_hi = acc_hi + hist_for(w_hi)
        return acc_lo, acc_hi

    acc_lo, acc_hi = jax.lax.fori_loop(
        0, _BLOCK_ROWS // _SUB_ROWS, body,
        (
            jnp.zeros((16, _LANES), jnp.float32),
            jnp.zeros((16, _LANES), jnp.float32),
        ),
    )
    out_ref[...] = jnp.concatenate([acc_lo, acc_hi], axis=0).reshape(
        1, 2 * 16, _LANES
    )[...]


@partial(
    jax.jit,
    static_argnames=("digit_shift", "digit_bits", "prefix_shift", "interpret"),
)
def digit_histograms(
    flat: jnp.ndarray,
    n_valid_elems: jnp.ndarray,
    prefixes: jnp.ndarray,
    digit_shift: int,
    digit_bits: int,
    prefix_shift: int | None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(padded flat f32, n_valid, (2,) prefixes) -> (2, 1 << digit_bits).

    Counts, for each of two targets t, the valid elements (index <
    n_valid_elems) whose float32 bit pattern satisfies
    `(bits >> prefix_shift) == prefixes[t]` (unconditional when
    prefix_shift is None), binned by `(bits >> digit_shift) & mask`.
    `flat` length must be a multiple of _BLOCK_ROWS * 128 (pad with
    anything; validity is bounded by n_valid_elems).
    """
    assert digit_bits in (10, 11)
    n_valid_elems = jnp.asarray(n_valid_elems, jnp.int32).reshape(1)
    prefixes = jnp.asarray(prefixes, jnp.uint32).reshape(2)
    m = flat.shape[0] // _LANES
    assert flat.shape[0] == m * _LANES and m % _BLOCK_ROWS == 0, flat.shape
    x = flat.reshape(m, _LANES)
    grid = (m // _BLOCK_ROWS,)
    out = pl.pallas_call(
        partial(
            _hist_kernel,
            digit_shift=digit_shift,
            digit_bits=digit_bits,
            prefix_shift=prefix_shift,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * 16, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], 2 * 16, _LANES), jnp.float32),
        interpret=interpret,
    )(x, n_valid_elems, prefixes)
    # per-block f32 partial counts are exact (<= BLOCK_ROWS*128 < 2^24);
    # sum across blocks in int32 so whole-recording counts stay exact
    hists = out.astype(jnp.int32).sum(axis=0).reshape(2, 16 * _LANES)
    return hists[:, : 1 << digit_bits]


def _pick(hist: jnp.ndarray, k: jnp.ndarray):
    """k-th order statistic's digit within one histogram (device-side)."""
    cum = jnp.cumsum(hist)  # int32; n_valid_elems < 2^31
    b = jnp.sum((cum < k + 1).astype(jnp.int32))
    prev = jnp.where(b > 0, cum[jnp.maximum(b - 1, 0)], 0)
    return b.astype(jnp.uint32), (k - prev).astype(jnp.int32)


def select_order_statistics(
    flat: jnp.ndarray,
    n_valid_elems: jnp.ndarray,
    k_lo: jnp.ndarray,
    k_hi: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (k_lo-th, k_hi-th) smallest of the first n_valid_elems floats.

    Three MXU histogram sweeps narrowing 11/11/10-bit digits of the IEEE
    bit patterns (values must be non-negative finite f32). Traceable —
    runs entirely on device inside an enclosing jit.
    """
    zeros2 = jnp.zeros((2,), jnp.uint32)
    h0 = digit_histograms(
        flat, n_valid_elems, zeros2, 21, 11, None, interpret=interpret
    )
    b_lo, k_lo = _pick(h0[0], k_lo)
    b_hi, k_hi = _pick(h0[0], k_hi)

    h1 = digit_histograms(
        flat, n_valid_elems, jnp.stack([b_lo, b_hi]), 10, 11, 21,
        interpret=interpret,
    )
    b1_lo, k_lo = _pick(h1[0], k_lo)
    b1_hi, k_hi = _pick(h1[1], k_hi)
    p_lo = (b_lo << 11) | b1_lo
    p_hi = (b_hi << 11) | b1_hi

    h2 = digit_histograms(
        flat, n_valid_elems, jnp.stack([p_lo, p_hi]), 0, 10, 10,
        interpret=interpret,
    )
    b2_lo, _ = _pick(h2[0], k_lo)
    b2_hi, _ = _pick(h2[1], k_hi)

    bits_lo = (p_lo << 10) | b2_lo
    bits_hi = (p_hi << 10) | b2_hi
    to_f32 = lambda b: jax.lax.bitcast_convert_type(
        b.astype(jnp.uint32), jnp.float32
    )
    return to_f32(bits_lo), to_f32(bits_hi)
