"""Shared scaffolding for the official bench and its A/B probe tools.

ONE definition of the five-recording bench batch: the recording-table
schema that predict's table mode consumes and the warmed-predictor
construction must stay identical between `bench.py` (the official
artifact) and the interleaved A/B probes (wire_ab_probe, fused_fetch_ab)
— drift between them would silently invalidate any comparison of probe
numbers against the artifact.
"""

from __future__ import annotations

from pathlib import Path

# the flagship workload: N_RECORDINGS distinct BENCH_MINUTES-minute
# recordings. Defined HERE (not in bench.py) so the probes' glob and the
# bench's synth filenames can never drift apart.
BENCH_MINUTES = 20
N_RECORDINGS = 5


def bench_wav_name(i: int | str) -> str:
    """Filename of the i-th flagship bench recording."""
    return f"bench_{BENCH_MINUTES}min_{i}.wav"


def bench_wavs(bench_dir: Path | str, n: int = N_RECORDINGS) -> list[Path]:
    """The n canonical bench recordings (created by `python bench.py`)."""
    wavs = sorted(Path(bench_dir).glob(bench_wav_name("[0-9]")))
    if len(wavs) < n:
        raise SystemExit("bench wavs missing; run `python bench.py` first")
    return wavs[:n]


def write_recording_table(wavs: list[Path], path: Path | str) -> Path:
    """Write the batch recording table exactly as `orcai predict` expects it."""
    import pandas as pd

    pd.DataFrame({
        "recording": [w.stem for w in wavs],
        "base_dir_recording": [str(w.parent) for w in wavs],
        "rel_recording_path": [w.name for w in wavs],
        "channel": [1] * len(wavs),
    }).to_csv(path, index=False)
    return Path(path)


def load_bench_predictor(
    model_dir: Path | None = None, batch_size: int = 128, dtype=None
):
    """(model_dir, orcai_parameter, shape, predictor) as bench.py times them.

    The WindowPredictor is constructed but NOT warmed: which programs a tool
    must force-load before timing differs per tool (bench forces the default
    wire's graph; wire_ab_probe forces one graph per codec; fused_fetch_ab
    forces both fetch paths), so warmup stays with the caller. `dtype`
    overrides the CRNN compute dtype (None = float32, the predict default).
    """
    import jax.numpy as jnp

    from orcai_tpu.io.model_store import load_orcai_model
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.resources import MODELS_DATA_DIR

    if model_dir is None:
        model_dir = MODELS_DATA_DIR / "orcai-v1"
    model, variables, orcai_parameter, shape = load_orcai_model(
        model_dir, dtype=jnp.float32 if dtype is None else dtype
    )
    predictor = WindowPredictor(
        model, variables,
        snippet_len=shape["input_shape"][0],
        n_filters=len(orcai_parameter["model"]["filters"]),
        batch_size=batch_size,
    )
    return model_dir, orcai_parameter, shape, predictor
