"""A/B probe: batch-predict wall time per wire codec, interleaved.

Diagnoses whether a throughput regression tracks the wire codec or the
host/tunnel phase: runs the bench five-recording batch alternately with
two codecs (default bfp6 vs mulaw8) plus a fixed host-speed microprobe
between passes, in ONE process with a shared warmed predictor. If codec A
is consistently slower than its neighbours in time, the codec path is the
problem; if slow passes cluster in time regardless of codec — and the
host probe slows with them — it is phase weather.

Usage: python -m orcai_tpu.tools.wire_ab_probe [codecA codecB [n_rounds]]
Requires the bench wavs (run `python bench.py` once to create them).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def host_probe_ms() -> float:
    """Fixed host workload (~100 MB of numpy traffic) -> milliseconds."""
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 12_000_000).astype(np.int16)
    for _ in range(3):
        y = x.astype(np.int32)
        z = np.abs(y).reshape(-1, 128).max(axis=1)
        _ = z.sum()
    return (time.perf_counter() - t0) * 1000.0


def main() -> None:
    if len(sys.argv) == 2:
        raise SystemExit(
            "usage: wire_ab_probe [codecA codecB [n_rounds]] — both codecs "
            "are required for an A/B (a single codec would silently probe "
            "the defaults)"
        )
    codecs = (sys.argv[1], sys.argv[2]) if len(sys.argv) >= 3 else ("bfp6", "mulaw8")
    n_rounds = int(sys.argv[3]) if len(sys.argv) >= 4 else 3

    repo = Path(__file__).resolve().parents[2]
    bench_dir = repo / ".bench"

    from orcai_tpu.pipeline.predict import _dispatch_wav, predict
    from orcai_tpu.tools.bench_common import (
        bench_wavs,
        load_bench_predictor,
        write_recording_table,
    )
    from orcai_tpu.utils import Messenger

    wavs = bench_wavs(bench_dir)
    table_path = write_recording_table(wavs, bench_dir / "ab_table.csv")
    out_dir = bench_dir / "ab_out"
    out_dir.mkdir(exist_ok=True)

    model_dir, orcai_parameter, shape, predictor = load_bench_predictor()
    msgr = Messenger(verbosity=0)

    # warm + force (readiness APIs lie until the first fetch), once per
    # codec: a codec with its own frontend geometry (the sp- wires) compiles
    # and lazily loads separate executables, which must not land inside a
    # timed pass
    for codec in dict.fromkeys((None, *codecs)):
        disp = _dispatch_wav(
            wavs[0], 1, predictor, orcai_parameter, shape, msgr=msgr,
            wire=codec,
        )
        _ = np.asarray(disp["count_dev"][:1])
        del disp

    results = []
    for rnd in range(n_rounds):
        for codec in codecs:
            hp0 = host_probe_ms()
            t0 = time.time()
            predict(
                table_path, model_dir=model_dir, output_path=out_dir,
                overwrite=True, msgr=msgr, verbosity=0,
                predict_batch_size=128, predictor=predictor, wire=codec,
            )
            wall = time.time() - t0
            hp1 = host_probe_ms()
            rec = {
                "round": rnd, "codec": codec, "wall_s": round(wall, 2),
                "host_probe_ms_before": round(hp0, 1),
                "host_probe_ms_after": round(hp1, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    by_codec = {
        c: sorted(r["wall_s"] for r in results if r["codec"] == c)
        for c in codecs
    }
    print(json.dumps({"summary": by_codec}))


if __name__ == "__main__":
    main()
