"""Pre-compile the predict-path executables into the persistent XLA cache.

Remote-compiler backends pay minutes of cold compilation the first time a
new executable shape is seen: the frontend pads recordings to power-of-two
frame buckets (ops/frontend.py) and the window predictor keys further
programs off its chunk plan (WindowPredictor.plan — wpc ladder rungs,
chunk-count output grids, the tail-widened grid). Running this tool once
per machine compiles the spectrogram + windowed-inference executables for
every reachable (bucket, chunk-plan) signature up to --minutes through the
SAME code path `orcai predict` uses, so production invocations start hot
regardless of recording length.

Usage:  python -m orcai_tpu.tools.warmup [--minutes 90] [--model orcai-v1]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from orcai_tpu.ops.wire_names import WIRE_CODECS  # jax-free registry module


def bucket_sample_counts(max_minutes: float, sr: int, hop: int) -> list[int]:
    """One representative sample count per frame bucket up to max_minutes."""
    from orcai_tpu.ops.frontend import _bucket_frames

    counts: list[int] = []
    max_n = int(max_minutes * 60 * sr)
    n = sr  # start at 1 s
    seen = set()
    while n <= max_n:
        b = _bucket_frames(1 + n // hop)
        if b not in seen:
            seen.add(b)
            counts.append(min((b - 1) * hop, max_n))
        n = b * hop + hop  # first length overflowing this bucket
    b_max = _bucket_frames(1 + max_n // hop)
    if b_max not in seen:
        counts.append(max_n)
    return counts


def bucket_warm_counts(
    max_minutes: float, sr: int, hop: int, predictor
) -> list[int]:
    """Representative sample counts covering every predict-path executable
    reachable up to max_minutes.

    bucket_sample_counts warms each frame bucket once, at its top — but the
    chunk plan (WindowPredictor.plan) keys FURTHER executables off the
    window count: smaller wpc ladder rungs in the lower part of a bucket,
    per-n_chunks output grids beyond max_windows_per_chunk, and the
    tail-widened grid when n_win lands exactly on a chunk boundary. Each
    distinct (frame bucket, spec buffer length, wpc, output grid) signature
    is its own compiled executable plus, on remote backends, its own
    per-process lazy program load — one cold signature is a first-recording
    stall in production (CLAUDE.md: lazy program loads measured 12-56 s).

    The signature is piecewise-constant in the valid frame count t: wpc,
    n_chunks and the buffer span change only when n_win increments (every
    `shift` frames), the bucket changes only at power-of-two boundaries,
    and the grid widens only at one threshold inside each window segment.
    Scanning exactly those breakpoints therefore enumerates every reachable
    signature — proven against a dense all-t scan and an executed
    no-new-executables predict sweep in tests/test_misc_coverage.py.
    """
    from orcai_tpu.ops.frontend import _bucket_frames

    snippet, shift, down = predictor.snippet_len, predictor.shift, predictor.down
    t_max = 1 + int(max_minutes * 60 * sr) // hop
    if t_max < snippet:
        return []
    seen: set[tuple] = set()
    counts: list[int] = []
    n_win_max = (t_max - snippet) // shift + 1
    for n_win in range(1, n_win_max + 1):
        t_lo = snippet + (n_win - 1) * shift
        t_hi = min(snippet + n_win * shift - 1, t_max)
        cands = {t_lo}
        # grid-widening threshold: smallest t with t // down > the
        # unwidened n_out_pad (t_lo is never widened: its n_out_total
        # equals the window span exactly)
        base = predictor.plan(t_lo)[3]
        t_widen = (base + 1) * down
        if t_lo < t_widen <= t_hi:
            cands.add(t_widen)
        # frame-bucket boundaries falling inside this window segment
        t_b = _bucket_frames(t_lo) + 1
        while t_b <= t_hi:
            cands.add(t_b)
            t_b = _bucket_frames(t_b) + 1
        for t in sorted(cands):
            bucket = _bucket_frames(t)
            sig = (bucket, *predictor.plan_signature(t, bucket))
            if sig not in seen:
                seen.add(sig)
                counts.append((t - 1) * hop)
    return sorted(counts)


def warmup(
    max_minutes: float = 90.0,
    model_dir=None,
    predict_batch_size: int = 128,
    verbose: bool = True,
    wire: str | None = None,
) -> int:
    """Compile every reachable predict executable up to max_minutes;
    returns the number of warmed lengths (one per executable signature —
    frame bucket x chunk plan — typically several per frame bucket).

    `wire` must match the codec production predicts will use
    (ops/wire_codec.py): the packed-bfp, uint8 (mulaw8) and int16 (exact)
    frontends are DIFFERENT executables, so warming one leaves the other's
    first run cold. The default (None/"auto") resolves exactly as
    `orcai predict` does; pass "exact" when warming for
    `--wire_codec exact` runs.
    """
    from orcai_tpu.io.model_store import load_orcai_model
    from orcai_tpu.ops.frontend import make_spectrogram_from_params_device
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.pipeline.helpers import bundled_model_dir

    if model_dir is None:
        model_dir = bundled_model_dir("orcai-v1")
    model, variables, orcai_parameter, shape = load_orcai_model(model_dir)
    sp = orcai_parameter["spectrogram"]
    # mirror pipeline/predict.py's predictor construction exactly (mesh on
    # multi-device hosts): warming different executables would leave the
    # first real predict cold
    import jax

    from orcai_tpu.parallel.mesh import make_mesh

    n_devices = len(jax.devices())
    predictor = WindowPredictor(
        model,
        variables,
        snippet_len=shape["input_shape"][0],
        n_filters=len(orcai_parameter["model"]["filters"]),
        batch_size=predict_batch_size,
        mesh=make_mesh(n_data=n_devices) if n_devices > 1 else None,
    )

    counts = bucket_warm_counts(
        max_minutes, sp["sampling_rate"], sp["n_overlap"], predictor
    )
    for i, n in enumerate(counts):
        t0 = time.time()
        audio = np.zeros(n, dtype=np.int16)
        spec_dev, n_frames, _, _ = make_spectrogram_from_params_device(
            audio, sp, wire=wire
        )
        aggregated, overlap_count = predictor.aggregate(spec_dev, n_frames=n_frames)
        predictor.binary_predictions(aggregated, overlap_count, threshold=0.5)
        if verbose:
            print(
                f"[{i + 1}/{len(counts)}] {n / sp['sampling_rate'] / 60:6.1f} min "
                f"shape ready in {time.time() - t0:.1f} s",
                flush=True,
            )
    return len(counts)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="pre-compile every reachable predict executable "
        "(frame bucket x chunk plan) up to --minutes"
    )
    ap.add_argument("--minutes", type=float, default=90.0)
    ap.add_argument("--model_dir", default=None,
                    help="model directory (default: bundled orcai-v1)")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--wire_codec", default="auto",
                    choices=["auto", *WIRE_CODECS],
                    help="wire codec to warm (must match production "
                    "predicts; auto resolves as `orcai predict` does)")
    args = ap.parse_args()
    n = warmup(args.minutes, args.model_dir, args.batch_size,
               wire=args.wire_codec)
    print(f"warmed {n} recording-length executables")


if __name__ == "__main__":
    main()
