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
timed region (int32 scalars and the ~50 KB aggregated output do).

Two pass structures:

- **staged** (the production program structure): one program per tile DFT
  plus finalize, zero-grid, and chunk programs — ~12 dispatches per pass.
- **fused**: the identical computation inlined into ONE jitted program
  (the inner tile fn, the finalize fn and the chunk fns are traced into a
  single graph — same numerics by construction, equality asserted against
  the staged pass on warmup). One dispatch + the aggregated fetch per
  pass, so any per-dispatch overhead is bounded out.

MEASURED (PERFORMANCE.md "The compute floor is compute"): staged 0.250 s
vs fused 0.252 s medians in interleaved pairs, outputs BIT-identical —
chained dispatches pipeline perfectly on this backend (only the fetch
syncs), so the staged floor is genuine device execution, not RPC
overhead, and transfers directly to a PCIe-attached host. Production
keeps the staged structure on purpose (per-tile programs overlap the
audio upload with compute, and small executables keep cold compiles
fast); the fused structure is only right when the data is already
resident — exactly this probe.

A third mode, **stages**, times prefix passes (tile DFTs alone, then
+finalize) and reports the per-stage deltas — the fetch RTT cancels in
the deltas since every pass carries exactly one forcing fetch.

Usage: python -m orcai_tpu.tools.compute_floor_probe [n_passes [dtype [mode]]]
where dtype is f32 (default) or bf16 (the ORCAI_TPU_PREDICT_DTYPE=bf16
inference path) and mode is staged (default), fused, or both (interleaved
staged/fused pairs — the A/B that prices the dispatch overhead). Requires
the bench wavs (run `python bench.py` once to create them).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np


def prepare_state(audio, orcai_parameter, predictor, wire=None):
    """Stage one recording's coded chunks HBM-resident; build every piece
    of the device pipeline (shared by the staged and fused passes and by
    the CPU equality test — ONE definition of "the same pipeline").
    """
    import jax.numpy as jnp

    from orcai_tpu.ops import frontend as fe
    from orcai_tpu.ops.wire_codec import bfp_encode_wire, resolve_wire

    sp = orcai_parameter["spectrogram"]
    seconds = audio.shape[-1] / sp["sampling_rate"]

    # host prep IS the production prelude (fe.prepare_wire_audio — one
    # definition, so the probe's byte form can never drift from
    # compute_spectrogram_device); the only difference is that every coded
    # chunk is staged on device UP FRONT instead of interleaved with the
    # tile DFTs (the production path interleaves on purpose — here the
    # point is to take the upload out of the timed region entirely)
    wire_name = resolve_wire(wire)
    audio, sampling_rate, n_fft, hop, eff_wire, bfp_bits = (
        fe.prepare_wire_audio(
            audio, sp["sampling_rate"], sp["nfft"], sp["n_overlap"],
            sp["freq_range"], wire,
        )
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

    n_elem = n_frames * n_bins
    return SimpleNamespace(
        predictor=predictor,
        wire_name=wire_name,
        seconds=seconds,
        n_frames=n_frames,
        n_bins=n_bins,
        tile=tile,
        n_tiles=n_tiles,
        n_real=n_real,
        chunks=chunks,
        n_valids=n_valids,
        resident_mb=sum(c.nbytes for c in chunks) / 1e6,
        tile_fn=tile_fn,
        finalize=fe._build_finalize_fn(
            n_tiles, tile, fe.mxu_select_enabled()
        ),
        zero_fn=fe._zero_mag_tile_fn(tile, n_bins),
        nf_dev=jnp.asarray(n_frames, jnp.int32),
        idx_lo=jnp.asarray(
            fe.nearest_quantile_index(float(sp["quantiles"][0]), n_elem),
            jnp.int32,
        ),
        idx_hi=jnp.asarray(
            fe.nearest_quantile_index(float(sp["quantiles"][1]), n_elem),
            jnp.int32,
        ),
    )


def staged_pass(st):
    """One production-structure pass over the resident chunks (~12 program
    dispatches); returns the fetched (aggregated probs, overlap count)."""
    import jax.numpy as jnp

    mags, maxes = [], []
    for c, nv in zip(st.chunks, st.n_valids):
        m, mx = st.tile_fn(c, nv)
        mags.append(m)
        maxes.append(mx)
    if st.n_real < st.n_tiles:
        zm, zx = st.zero_fn()
        mags.extend([zm] * (st.n_tiles - st.n_real))
        maxes.extend([zx] * (st.n_tiles - st.n_real))
    spec_dev = st.finalize(
        tuple(mags), jnp.stack(maxes), st.nf_dev, st.idx_lo, st.idx_hi
    )
    agg_dev, count_dev, n_out = st.predictor.aggregate_device(
        spec_dev, n_frames=st.n_frames
    )
    # the aggregated fetch is the pass's sync point — the same ~50 KB
    # device->host transfer every production recording pays
    return st.predictor.fetch_aggregated(agg_dev, count_dev, n_out)


def build_fused_pass(st):
    """ONE jitted program for the whole pass: inlines the tile DFT bodies,
    the finalize fn and the window-chunk fns (the exact jitted callables
    the staged pass dispatches — jit-of-jit traces through, so the fused
    graph is the same computation by construction). Returns a zero-arg
    callable performing one dispatch + the aggregated fetch.

    The DFT matrices and model variables stay ARGUMENTS of the fused jit
    (closing over device arrays would embed them as program constants —
    the compile-stall/cache-defeat pathology documented in CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    from orcai_tpu.ops.overlap import _next_pow2

    pred = st.predictor
    if pred.mesh is not None:  # pragma: no cover - probe is single-device
        raise ValueError("fused floor pass supports single-device predictors")

    tile_inner = st.tile_fn.inner
    C_dev, S_dev = st.tile_fn.dft_mats
    n_win, chunks_plan, required, n_out_pad = pred.plan(st.n_frames)
    n_out_total = st.n_frames // pred.down
    bucket = st.n_tiles * st.tile
    spec_len = max(bucket, _next_pow2(required))
    n_labels = pred.n_labels(st.n_bins)
    shift = pred.shift

    chunk_fns = {}
    for wpc, _ in chunks_plan:
        key = (spec_len, st.n_bins, wpc, False)  # windowed body (not dense)
        if key not in pred._chunk_fns:
            pred._chunk_fns[key] = pred._build_chunk_fn(
                spec_len, st.n_bins, wpc
            )
        chunk_fns[wpc] = pred._chunk_fns[key]

    chunk_stack = jnp.stack(st.chunks)
    nv_stack = jnp.stack(st.n_valids)

    @jax.jit
    def fused(chunk_stack, nv_stack, C, S, variables, nf, idx_lo, idx_hi):
        mags, maxes = [], []
        for t in range(st.n_real):
            m, mx = tile_inner(chunk_stack[t], nv_stack[t], C, S)
            mags.append(m)
            maxes.append(mx)
        for _ in range(st.n_tiles - st.n_real):
            mags.append(jnp.zeros((st.tile, st.n_bins), jnp.float32))
            maxes.append(jnp.asarray(-jnp.inf, jnp.float32))
        spec = st.finalize(
            tuple(mags), jnp.stack(maxes), nf, idx_lo, idx_hi
        )
        if spec_len > bucket:
            spec = (
                jnp.zeros((spec_len, st.n_bins), jnp.float32)
                .at[:bucket]
                .set(spec)
            )
        agg = jnp.zeros((n_out_pad + 1, n_labels), jnp.float32)
        count = jnp.zeros((n_out_pad + 1,), jnp.float32)
        w0 = 0
        for wpc, n_repeat in chunks_plan:
            for _ in range(n_repeat):
                agg, count = chunk_fns[wpc](
                    agg, count, variables, spec,
                    jnp.asarray(w0 * shift, jnp.int32),
                    jnp.asarray(w0, jnp.int32),
                    jnp.asarray(min(wpc, n_win - w0), jnp.int32),
                )
                w0 += wpc
        return agg, count

    def run():
        agg_dev, count_dev = fused(
            chunk_stack, nv_stack, C_dev, S_dev, pred.variables,
            st.nf_dev, st.idx_lo, st.idx_hi,
        )
        return pred.fetch_aggregated(agg_dev, count_dev, n_out_total)

    return run


def build_stage_passes(st):
    """(tiles_only, through_finalize) prefix passes for the stage
    breakdown: each dispatches a PREFIX of the staged pass and issues one
    small forcing fetch (the sync every timed pass needs on this backend).
    Stage costs are DELTAS of pass medians — the single fetch round trip
    cancels (fetch sizes differ by < 50 KB, ~1 ms at link rate)."""
    import jax.numpy as jnp

    def run_tiles():
        maxes = []
        for c, nv in zip(st.chunks, st.n_valids):
            _, mx = st.tile_fn(c, nv)
            maxes.append(mx)
        np.asarray(maxes[-1])  # forcing fetch

    def run_through_finalize():
        mags, maxes = [], []
        for c, nv in zip(st.chunks, st.n_valids):
            m, mx = st.tile_fn(c, nv)
            mags.append(m)
            maxes.append(mx)
        if st.n_real < st.n_tiles:
            zm, zx = st.zero_fn()
            mags.extend([zm] * (st.n_tiles - st.n_real))
            maxes.extend([zx] * (st.n_tiles - st.n_real))
        spec = st.finalize(
            tuple(mags), jnp.stack(maxes), st.nf_dev, st.idx_lo, st.idx_hi
        )
        np.asarray(spec[0, 0])  # forcing fetch

    return run_tiles, run_through_finalize


def _timed(fn, n_passes, on_pass=None, tag=None):
    walls = []
    for i in range(n_passes):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
        if on_pass is not None:
            on_pass(i if tag is None else f"{tag}:{i}", walls[-1])
    return walls


def _summary(st, dtype_name, mode, walls, extra=None):
    med = float(np.median(walls))
    out = {
        "recording_s": round(st.seconds, 1),
        "wire": st.wire_name,
        "predict_dtype": dtype_name,
        "mode": mode,
        "tile_plan": {
            "tile": st.tile, "n_real": st.n_real, "n_tiles": st.n_tiles
        },
        "resident_coded_mb": round(st.resident_mb, 1),
        "compute_wall_s_median": round(med, 3),
        "compute_wall_s_runs": [round(w, 3) for w in walls],
        "rec_hr_per_min_compute_only": round(
            (st.seconds / 3600) / (med / 60), 2
        ),
    }
    if mode == "staged":
        out["note"] = (
            "genuine device execution, not dispatch overhead: the fused "
            "single-program A/B measured staged == fused within noise "
            "with bit-identical outputs (PERFORMANCE.md)"
        )
    if extra:
        out.update(extra)
    return out


def measure(n_passes: int = 7, dtype_name: str = "f32",
            on_pass=None, mode: str = "staged") -> dict:
    """Run the probe and return the summary dict (see module docstring).

    `on_pass(i, wall_s)` fires after each timed pass (the CLI prints a
    JSON line; bench.py passes None and embeds the summary in the official
    artifact's `compute_floor` field). mode: "staged" (production program
    structure), "fused" (one program per pass), or "both" (interleaved
    staged/fused pairs; summary reports both plus the paired delta).
    """
    repo = Path(__file__).resolve().parents[2]
    bench_dir = repo / ".bench"

    import jax.numpy as jnp

    from orcai_tpu.io.wav import load_wav_for_frontend
    from orcai_tpu.tools.bench_common import bench_wavs, load_bench_predictor

    wav = bench_wavs(bench_dir, 1)[0]
    model_dir, orcai_parameter, shape, predictor = load_bench_predictor(
        dtype={"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    )
    sp = orcai_parameter["spectrogram"]
    audio, _ = load_wav_for_frontend(wav, sr=sp["sampling_rate"], channel=1)
    st = prepare_state(audio, orcai_parameter, predictor)

    # warm pass(es): force chunk residency and load every program (on this
    # backend the first fetch pays the whole lazy-load backlog); in fused
    # modes also assert the two structures compute the same answer
    ref_agg, ref_count = staged_pass(st)
    extra = None
    if mode in ("fused", "both"):
        fused = build_fused_pass(st)
        agg_f, count_f = fused()
        extra = {
            "fused_vs_staged_max_abs_diff": float(
                np.max(np.abs(agg_f - ref_agg))
            ),
            "fused_vs_staged_count_equal": bool(
                np.array_equal(count_f, ref_count)
            ),
        }

    if mode == "staged":
        walls = _timed(staged_pass_bound(st), n_passes, on_pass)
        return _summary(st, dtype_name, mode, walls)
    if mode == "fused":
        walls = _timed(fused, n_passes, on_pass)
        return _summary(st, dtype_name, mode, walls, extra)
    if mode == "stages":
        run_tiles, run_fin = build_stage_passes(st)
        run_tiles()  # warm the prefix programs' lazy loads
        run_fin()
        tiles_w, fin_w, full_w = [], [], []
        for _ in range(n_passes):
            tiles_w += _timed(run_tiles, 1, on_pass, tag="tiles")
            fin_w += _timed(run_fin, 1, on_pass, tag="finalize")
            full_w += _timed(staged_pass_bound(st), 1, on_pass, tag="full")
        med = lambda w: float(np.median(w))  # noqa: E731
        return {
            "mode": "stages",
            "recording_s": round(st.seconds, 1),
            "wire": st.wire_name,
            "predict_dtype": dtype_name,
            "tiles_s_median": round(med(tiles_w), 3),
            "through_finalize_s_median": round(med(fin_w), 3),
            "full_s_median": round(med(full_w), 3),
            "stage_deltas_s": {
                "tile_dfts": round(med(tiles_w), 3),
                "finalize_stats_normalize": round(med(fin_w) - med(tiles_w), 3),
                "crnn_overlap_fetch": round(med(full_w) - med(fin_w), 3),
            },
            "runs": {
                "tiles": [round(w, 3) for w in tiles_w],
                "finalize": [round(w, 3) for w in fin_w],
                "full": [round(w, 3) for w in full_w],
            },
        }
    if mode != "both":
        raise ValueError(f"unknown mode {mode!r}")

    staged_walls, fused_walls = [], []
    run_staged = staged_pass_bound(st)
    for i in range(n_passes):
        staged_walls += _timed(run_staged, 1, on_pass, tag="staged")
        fused_walls += _timed(fused, 1, on_pass, tag="fused")
    staged_sum = _summary(st, dtype_name, "staged", staged_walls)
    fused_sum = _summary(st, dtype_name, "fused", fused_walls, extra)
    deltas = [s - f for s, f in zip(staged_walls, fused_walls)]
    return {
        "mode": "both",
        "staged": staged_sum,
        "fused": fused_sum,
        "paired_delta_s_median": round(float(np.median(deltas)), 3),
        "fused_wins_pairs": sum(d > 0 for d in deltas),
        "n_pairs": n_passes,
    }


def staged_pass_bound(st):
    """Zero-arg staged pass (what _timed expects)."""
    return lambda: staged_pass(st)


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) >= 2 else 7
    dtype_name = sys.argv[2] if len(sys.argv) >= 3 else "f32"
    mode = sys.argv[3] if len(sys.argv) >= 4 else "staged"
    summary = measure(
        n_passes, dtype_name, mode=mode,
        on_pass=lambda i, w: print(
            json.dumps({"pass": i, "wall_s": round(w, 3)}), flush=True
        ),
    )
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
