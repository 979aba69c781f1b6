"""A/B probe: batch-predict wall time with ORCAI_TPU_FUSED_FETCH off vs on.

Same interleaved design as wire_ab_probe: runs the bench five-recording
batch alternately with the two-fetch default and the fused single-fetch
[agg || count] variant (ops/overlap.py: fetch_aggregated), plus a fixed
host-speed microprobe between passes, in ONE process with a shared warmed
predictor on the default wire. The expected delta is small (~one link RTT
per recording, ~4% of the batch at the link floor), so the summary reports
PAIRED per-round deltas — adjacent passes share the link phase — not just
the per-arm medians.

Usage: python -m orcai_tpu.tools.fused_fetch_ab [n_rounds]
Requires the bench wavs (run `python bench.py` once to create them).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

from orcai_tpu.tools.wire_ab_probe import host_probe_ms


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) >= 2 else 6

    repo = Path(__file__).resolve().parents[2]
    bench_dir = repo / ".bench"

    from orcai_tpu.ops.overlap import WindowPredictor
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

    # warm + force both fetch paths (readiness APIs lie until the first
    # fetch; _fused_pack is its own jit closure with its own lazy program
    # load, which must not land inside a timed pass)
    disp = _dispatch_wav(
        wavs[0], 1, predictor, orcai_parameter, shape, msgr=msgr,
    )
    for flag in ("0", "1"):
        os.environ["ORCAI_TPU_FUSED_FETCH"] = flag
        _ = WindowPredictor.fetch_aggregated(
            disp["agg_dev"], disp["count_dev"], disp["n_out"]
        )
    del disp

    arms = ("0", "1")
    results = []
    for rnd in range(n_rounds):
        # alternate which arm goes first so a monotone link drift cannot
        # masquerade as an arm effect
        order = arms if rnd % 2 == 0 else arms[::-1]
        for flag in order:
            os.environ["ORCAI_TPU_FUSED_FETCH"] = flag
            hp0 = host_probe_ms()
            t0 = time.time()
            predict(
                table_path, model_dir=model_dir, output_path=out_dir,
                overwrite=True, msgr=msgr, verbosity=0,
                predict_batch_size=128, predictor=predictor,
            )
            wall = time.time() - t0
            rec = {
                "round": rnd, "fused": flag == "1",
                "wall_s": round(wall, 2),
                "host_probe_ms": round(hp0, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    by_arm = {
        f: sorted(r["wall_s"] for r in results if r["fused"] is f)
        for f in (False, True)
    }
    deltas = []
    for rnd in range(n_rounds):
        pair = {r["fused"]: r["wall_s"] for r in results if r["round"] == rnd}
        deltas.append(round(pair[False] - pair[True], 2))
    print(json.dumps({
        "summary": {
            "default_wall_s": by_arm[False],
            "fused_wall_s": by_arm[True],
            "paired_delta_s_default_minus_fused": deltas,
            "median_paired_delta_s": round(float(np.median(deltas)), 3),
        }
    }))


if __name__ == "__main__":
    main()
