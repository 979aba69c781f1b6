"""Measure the predict pipeline's COMPUTE floor: device work per recording
with the coded audio already HBM-resident.

The flagship bench runs at the dev tunnel's transfer floor (~0.96 link
utilization, bench_runs/r3_run13-14), so it measures the LINK, not the
chip. This probe answers the complementary question — what the same
pipeline costs where the upload is not the bottleneck (a PCIe-attached
TPU-VM host): it prepares one bench recording exactly as the production
path does (ops/frontend.compute_spectrogram_device: spectral 3/4 resample
+ bfp wire encode, per-tile chunks), uploads every coded chunk ONCE and
forces them resident, then times N passes of

    per-tile DFT -> global-stats finalize -> windowed CRNN ->
    overlap-add -> aggregated fetch

over the resident chunks. No host->device audio bytes move inside the
timed region (int32 scalars and the ~50 KB aggregated output do). On the
remote-dispatch backend each pass still pays the per-program-call RPC
floor (~29 ms/call, PERFORMANCE.md), so the median here is an UPPER bound
on the PCIe-attached compute cost.

Usage: python -m orcai_tpu.tools.compute_floor_probe [n_passes [dtype]]
where dtype is f32 (default) or bf16 (the ORCAI_TPU_PREDICT_DTYPE=bf16
inference path). Requires the bench wavs (run `python bench.py` once to
create them).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def measure(n_passes: int = 7, dtype_name: str = "f32",
            on_pass=None) -> dict:
    """Run the probe and return the summary dict (see module docstring).

    `on_pass(i, wall_s)` fires after each timed pass (the CLI prints a
    JSON line; bench.py passes None and embeds the summary in the official
    artifact's `compute_floor` field).
    """
    repo = Path(__file__).resolve().parents[2]
    bench_dir = repo / ".bench"

    import jax.numpy as jnp

    from orcai_tpu.io.wav import load_wav_for_frontend
    from orcai_tpu.ops import frontend as fe
    from orcai_tpu.ops.wire_codec import bfp_encode_wire, resolve_wire
    from orcai_tpu.tools.bench_common import bench_wavs, load_bench_predictor

    wav = bench_wavs(bench_dir, 1)[0]
    model_dir, orcai_parameter, shape, predictor = load_bench_predictor(
        dtype={"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    )
    sp = orcai_parameter["spectrogram"]

    audio, _ = load_wav_for_frontend(wav, sr=sp["sampling_rate"], channel=1)
    seconds = audio.shape[-1] / sp["sampling_rate"]

    # host prep IS the production prelude (fe.prepare_wire_audio — one
    # definition, so the probe's byte form can never drift from
    # compute_spectrogram_device); the only difference is that every coded
    # chunk is staged on device UP FRONT instead of interleaved with the
    # tile DFTs (the production path interleaves on purpose — here the
    # point is to take the upload out of the timed region entirely)
    wire_name = resolve_wire(None)
    audio, sampling_rate, n_fft, hop, wire, bfp_bits = fe.prepare_wire_audio(
        audio, sp["sampling_rate"], sp["nfft"], sp["n_overlap"],
        sp["freq_range"], None,
    )

    n = audio.shape[-1]
    n_frames = 1 + n // hop
    frequencies = fe.fft_frequencies(sp["sampling_rate"], sp["nfft"])
    lo_idx, hi_idx = fe.freq_crop_indices(frequencies, sp["freq_range"])
    n_bins = hi_idx - lo_idx
    tile, n_tiles, n_real = fe._tile_plan(n_frames)
    tile_fn = fe._build_tile_mag_fn(
        n_fft, hop, lo_idx, hi_idx, tile, "highest",
        use_pallas=fe.pallas_frontend_enabled(tile), bfp_bits=bfp_bits,
    )

    chunks, n_valids = [], []
    for t in range(n_real):
        chunk = fe._audio_tile_chunk(audio, t, tile, n_fft, hop)
        if bfp_bits:
            chunk = bfp_encode_wire(chunk, bfp_bits)
        chunks.append(jnp.asarray(chunk))
        n_valids.append(
            jnp.asarray(min(tile, n_frames - t * tile), jnp.int32)
        )
    resident_mb = sum(c.nbytes for c in chunks) / 1e6

    n_elem = n_frames * n_bins
    finalize = fe._build_finalize_fn(n_tiles, tile, fe.mxu_select_enabled())
    idx_lo = jnp.asarray(
        fe.nearest_quantile_index(float(sp["quantiles"][0]), n_elem), jnp.int32
    )
    idx_hi = jnp.asarray(
        fe.nearest_quantile_index(float(sp["quantiles"][1]), n_elem), jnp.int32
    )
    nf_dev = jnp.asarray(n_frames, jnp.int32)
    zero_fn = fe._zero_mag_tile_fn(tile, n_bins)

    def device_pass():
        mags, maxes = [], []
        for c, nv in zip(chunks, n_valids):
            m, mx = tile_fn(c, nv)
            mags.append(m)
            maxes.append(mx)
        if n_real < n_tiles:
            zm, zx = zero_fn()
            mags.extend([zm] * (n_tiles - n_real))
            maxes.extend([zx] * (n_tiles - n_real))
        spec_dev = finalize(
            tuple(mags), jnp.stack(maxes), nf_dev, idx_lo, idx_hi
        )
        agg_dev, count_dev, n_out = predictor.aggregate_device(
            spec_dev, n_frames=n_frames
        )
        # the aggregated fetch is the pass's sync point — the same ~50 KB
        # device->host transfer every production recording pays
        return predictor.fetch_aggregated(agg_dev, count_dev, n_out)

    # warm pass: forces chunk residency and loads every program (on this
    # backend the first fetch pays the whole lazy-load backlog)
    device_pass()

    walls = []
    for i in range(n_passes):
        t0 = time.time()
        device_pass()
        walls.append(time.time() - t0)
        if on_pass is not None:
            on_pass(i, walls[-1])

    med = float(np.median(walls))
    return {
        "recording_s": round(seconds, 1),
        "wire": wire_name,
        "predict_dtype": dtype_name,
        "tile_plan": {"tile": tile, "n_real": n_real, "n_tiles": n_tiles},
        "resident_coded_mb": round(resident_mb, 1),
        "compute_wall_s_median": round(med, 3),
        "compute_wall_s_runs": [round(w, 3) for w in walls],
        "rec_hr_per_min_compute_only": round(
            (seconds / 3600) / (med / 60), 2
        ),
        "note": "upper bound on PCIe-attached compute cost: each pass "
        "still pays the remote backend's per-program-call RPC floor",
    }


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) >= 2 else 7
    dtype_name = sys.argv[2] if len(sys.argv) >= 3 else "f32"
    summary = measure(
        n_passes, dtype_name,
        on_pass=lambda i, w: print(
            json.dumps({"pass": i, "wall_s": round(w, 3)}), flush=True
        ),
    )
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
