"""Benchmark: predict end-to-end throughput (recording-hours/min per chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the flagship `orcai predict` path (wav file -> Audacity TSV) with
the bundled orcai-v1 model on a synthetic 48 kHz recording. Steady-state
throughput is reported (one warmup run populates the persistent XLA cache
and absorbs backend cold-start variance).

vs_baseline: ratio against a reference-equivalent CPU implementation —
numpy rFFT frontend + Keras model.predict over the same windows, i.e. the
same work the reference does through librosa + keras on CPU
(reference spectrogram.py:15-87, predict.py:235-317). The baseline is
measured once on a short recording and cached in .bench/baseline.json
(scaling is linear in recording length for both pipelines).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BENCH_DIR = REPO / ".bench"
BENCH_DIR.mkdir(exist_ok=True)
SR = 48000
BENCH_MINUTES = 20
BASELINE_MINUTES = 2


def synth_wav(path: Path, seconds: float, seed: int = 0) -> None:
    from orcai_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    x = (0.02 * rng.standard_normal(n)).astype(np.float32)
    tt = np.arange(SR * 2) / SR
    tone = (0.3 * np.sin(2 * np.pi * 1700 * tt)).astype(np.float32)
    for s in range(11, int(seconds) - 3, 17):
        x[s * SR : s * SR + len(tone)] += tone
    write_wav(path, SR, x)


def ensure_model() -> Path:
    from orcai_tpu.resources import MODELS_DATA_DIR

    model_dir = MODELS_DATA_DIR / "orcai-v1"
    if not (model_dir / "orcai-v1.msgpack").exists():
        from orcai_tpu.io import read_json
        from orcai_tpu.io.model_store import save_orcai_model
        from orcai_tpu.models import build_model, init_variables
        from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER

        param = read_json(DEFAULT_ORCAI_PARAMETER)
        model = build_model(param)
        variables = init_variables(model, (736, 171, 1), seed=42)
        save_orcai_model(model_dir, param, variables)
    return model_dir


def measure_tpu_predict(model_dir: Path, wav: Path, repeats: int = 5) -> float:
    """Best steady-state e2e seconds for one predict run.

    Best-of-N rather than median: the remote-dispatch tunnel adds large,
    bursty latency unrelated to the pipeline (CLAUDE.md), so the minimum is
    the reproducible hardware-bound number.
    """
    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.utils import Messenger

    def run(tag):
        out = BENCH_DIR / f"bench_out_{tag}.txt"
        t0 = time.time()
        predict(
            wav,
            model_dir=model_dir,
            output_path=out,
            overwrite=True,
            msgr=Messenger(verbosity=0),
            verbosity=0,
        )
        return time.time() - t0

    run("warmup0")  # compiles / cache loads / device warm
    run("warmup1")
    times = [run(i) for i in range(repeats)]
    return float(np.min(times))


def measure_cpu_baseline(model_dir: Path) -> float:
    """Reference-equivalent CPU throughput in recording-hours/min (cached)."""
    cache = BENCH_DIR / "baseline.json"
    if cache.exists():
        return json.loads(cache.read_text())["recording_hours_per_min"]

    wav = BENCH_DIR / f"baseline_{BASELINE_MINUTES}min.wav"
    if not wav.exists():
        synth_wav(wav, BASELINE_MINUTES * 60, seed=1)

    import os

    os.environ.setdefault("KERAS_BACKEND", "tensorflow")
    from orcai_tpu.io import read_json
    from orcai_tpu.io.keras_convert import flax_to_keras_model
    from orcai_tpu.io.model_store import load_variables
    from orcai_tpu.io.wav import load_wav
    from orcai_tpu.ops.frontend import hann_window

    param = read_json(model_dir / "orcai_parameter.json")
    variables = load_variables(model_dir / "orcai-v1.msgpack")
    kmodel = flax_to_keras_model(variables, param, (736, 171, 1))

    t0 = time.time()
    audio, _ = load_wav(wav, sr=SR)
    # reference-style host frontend: framing + windowed rFFT + dB + crop +
    # percentile clip + minmax (numpy, like librosa's CPU path)
    hop, nfft = 256, 512
    n = len(audio)
    n_frames = 1 + n // hop
    padded = np.zeros((n_frames - 1) * hop + nfft, np.float32)
    padded[nfft // 2 : nfft // 2 + n] = audio
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]
    frames = padded[idx] * hann_window(nfft)
    S = np.abs(np.fft.rfft(frames, axis=1))
    ref = S.max()
    db = 20 * np.log10(np.maximum(S, 1e-5)) - 20 * np.log10(max(ref, 1e-5))
    db = np.maximum(db, db.max() - 80)
    spec = db[:, :171]
    lo = np.percentile(spec, 1, method="nearest")
    hi = np.percentile(spec, 99.9, method="nearest")
    spec = np.clip(spec, lo, hi)
    spec = (spec - spec.min()) / (spec.max() - spec.min())

    shift = 368
    n_win = (spec.shape[0] - 736) // shift + 1
    windows = np.stack([spec[i * shift : i * shift + 736] for i in range(n_win)])
    preds = kmodel.predict(windows[..., None], verbose=0)
    total = spec.shape[0] // 16
    agg = np.zeros((total, preds.shape[-1]))
    cnt = np.zeros(total)
    for i, p in enumerate(preds):
        s = i * (shift // 16)
        agg[s : s + 46] += p
        cnt[s : s + 46] += 1
    m = cnt > 0
    agg[m] /= cnt[m, None]
    _ = (agg > 0.5 / cnt.max()).astype(int)
    elapsed = time.time() - t0

    hours = BASELINE_MINUTES / 60
    throughput = hours / (elapsed / 60)
    cache.write_text(
        json.dumps(
            {
                "recording_hours_per_min": throughput,
                "elapsed_s": elapsed,
                "recording_minutes": BASELINE_MINUTES,
                "note": "reference-equivalent CPU path: numpy rFFT frontend "
                "+ keras model.predict, single process",
            }
        )
    )
    return throughput


def main() -> None:
    model_dir = ensure_model()
    wav = BENCH_DIR / f"bench_{BENCH_MINUTES}min.wav"
    if not wav.exists():
        synth_wav(wav, BENCH_MINUTES * 60, seed=0)

    elapsed = measure_tpu_predict(model_dir, wav)
    hours = BENCH_MINUTES / 60
    value = hours / (elapsed / 60)

    try:
        baseline = measure_cpu_baseline(model_dir)
        vs_baseline = value / baseline
    except Exception:
        vs_baseline = None

    print(
        json.dumps(
            {
                "metric": "predict_e2e_throughput",
                "value": round(value, 3),
                "unit": "recording-hours/min per chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
