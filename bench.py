"""Benchmark: predict e2e throughput (flagship) + training throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Flagship workload: the `orcai predict` path (wav file -> Audacity TSV) with
the bundled orcai-v1 model on a synthetic 48 kHz recording. The headline
value is the MEDIAN of the steady-state runs (the remote-dispatch tunnel is
bursty, so the minimum is also reported as "best" — it is the
hardware-bound number, the median the honest expectation).

vs_baseline: ratio against a reference-equivalent CPU implementation —
numpy rFFT frontend + Keras model.predict over the same windows, i.e. the
same work the reference does through librosa + keras on CPU (reference
spectrogram.py:15-87, predict.py:235-317). The baseline is RE-MEASURED
fresh on every invocation (no cached denominator).

The "train" extra reports training throughput (snippets/s at the
default batch 64, bfloat16 compute) against a Keras-CPU train-step
baseline, covering BASELINE.md's second flagship metric.
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
        raise RuntimeError(
            "bundled orcai-v1 model missing; run "
            "tools/train_bundled_model.py first (bench refuses to plant "
            "random weights into the package data)"
        )
    return model_dir


# ----------------------------------------------------------------- predict


def measure_tpu_predict(model_dir: Path, wav: Path, repeats: int = 5) -> list[float]:
    """Steady-state e2e seconds per predict run (after 2 warmups)."""
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
    return [run(i) for i in range(repeats)]


def measure_cpu_predict_baseline(model_dir: Path) -> float:
    """Reference-equivalent CPU throughput in recording-hours/min.

    Measured fresh on every invocation; the result is also written to
    .bench/baseline.json for inspection (never read back as a cache).
    """
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
    # warm keras' tf.function tracing so the shorter baseline recording is
    # not charged fixed first-call costs the 20-min TPU runs amortize away
    kmodel.predict(np.zeros((1, 736, 171, 1), np.float32), verbose=0)

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
    (BENCH_DIR / "baseline.json").write_text(
        json.dumps(
            {
                "recording_hours_per_min": throughput,
                "elapsed_s": elapsed,
                "recording_minutes": BASELINE_MINUTES,
                "measured_at": time.time(),
                "note": "reference-equivalent CPU path: numpy rFFT frontend "
                "+ keras model.predict, single process; re-measured every "
                "bench run",
            }
        )
    )
    return throughput


# ------------------------------------------------------------------- train


def measure_tpu_train(n_batches: int = 8, epochs: int = 3) -> dict:
    """Steady-state training throughput on the production arch.

    One-dispatch scanned epochs over an HBM-resident synthetic dataset
    (the same path `orcai train` takes), bfloat16 compute, batch 64.
    """
    import jax
    import jax.numpy as jnp

    from orcai_tpu.io import read_json
    from orcai_tpu.models import build_model
    from orcai_tpu.parallel.mesh import make_mesh
    from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER
    from orcai_tpu.train.trainer import Trainer, make_optimizer

    param = read_json(DEFAULT_ORCAI_PARAMETER)
    bsz = param["model"]["batch_size"]
    model = build_model(param, dtype=jnp.bfloat16)
    trainer = Trainer(model, make_optimizer(1e-4), mesh=make_mesh(n_data=1))
    state = trainer.init_state((736, 171, 1), seed=0)

    rng = np.random.default_rng(0)
    n = n_batches * bsz
    X = jnp.asarray(rng.uniform(size=(n, 736, 171, 1)).astype(np.float32))
    Y = jnp.asarray(rng.integers(0, 2, (n, 46, 7)).astype(np.float32))
    perm = jnp.asarray(np.arange(n).reshape(n_batches, bsz))

    train_fn, _ = trainer.build_device_epoch_fns()
    state, m = train_fn(state, X, Y, perm)  # compile + warm
    np.asarray(m)

    t0 = time.time()
    for _ in range(epochs):
        state, m = train_fn(state, X, Y, perm)
    np.asarray(m)  # chained dependencies force all epochs
    elapsed = time.time() - t0

    steps = n_batches * epochs
    return {
        "steps_per_s": round(steps / elapsed, 3),
        "snippets_per_s": round(steps * bsz / elapsed, 1),
        "batch_size": bsz,
        "compute_dtype": "bfloat16",
    }


def measure_cpu_train_baseline(model_dir: Path, max_steps: int = 3) -> float:
    """Keras-CPU train steps/s on the same arch/batch (reference-equivalent).

    Adaptive: if a single step exceeds ~30 s, that one timing is used.
    """
    import os

    os.environ.setdefault("KERAS_BACKEND", "tensorflow")
    import keras

    from orcai_tpu.io import read_json
    from orcai_tpu.io.keras_convert import build_keras_model

    param = read_json(model_dir / "orcai_parameter.json")
    bsz = param["model"]["batch_size"]
    kmodel = build_keras_model(param, (736, 171, 1))
    kmodel.compile(
        optimizer=keras.optimizers.Adam(param["model"]["learning_rate"]),
        loss="binary_crossentropy",
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(bsz, 736, 171, 1)).astype(np.float32)
    y = rng.integers(0, 2, (bsz, 46, 7)).astype(np.float32)

    kmodel.train_on_batch(x, y)  # compile + warm
    t0 = time.time()
    kmodel.train_on_batch(x, y)
    first = time.time() - t0
    if first < 30 and max_steps > 1:
        t0 = time.time()
        for _ in range(max_steps - 1):
            kmodel.train_on_batch(x, y)
        mean_step = (first + time.time() - t0) / max_steps
    else:
        mean_step = first
    return bsz / mean_step  # snippets/s


def main() -> None:
    model_dir = ensure_model()
    wav = BENCH_DIR / f"bench_{BENCH_MINUTES}min.wav"
    if not wav.exists():
        synth_wav(wav, BENCH_MINUTES * 60, seed=0)

    times = measure_tpu_predict(model_dir, wav)
    hours = BENCH_MINUTES / 60
    t_median = float(np.median(times))
    t_best = float(np.min(times))
    value = hours / (t_median / 60)
    best = hours / (t_best / 60)

    try:
        baseline = measure_cpu_predict_baseline(model_dir)
    except Exception:
        baseline = None

    try:
        train = measure_tpu_train()
        try:
            cpu_snippets = measure_cpu_train_baseline(model_dir)
            train["vs_cpu_baseline"] = round(train["snippets_per_s"] / cpu_snippets, 2)
            train["cpu_snippets_per_s"] = round(cpu_snippets, 1)
        except Exception:
            pass
    except Exception:
        train = None

    print(
        json.dumps(
            {
                "metric": "predict_e2e_throughput",
                "value": round(value, 3),
                "unit": "recording-hours/min per chip",
                "vs_baseline": round(value / baseline, 2) if baseline else None,
                "best": round(best, 3),
                "best_vs_baseline": round(best / baseline, 2) if baseline else None,
                "predict_run_seconds": [round(t, 2) for t in times],
                "train": train,
            }
        )
    )


if __name__ == "__main__":
    main()
