"""Spectrogram production pipeline: wav recordings -> normalized spectrogram
zarr stores + time/frequency vectors.

Pipeline-level equivalent of reference spectrogram.py:90-321, with the
compute moved from host librosa onto the TPU (orcai_tpu.ops.frontend).
On-disk outputs are identical: <recording>/spectrogram/spectrogram.zarr
(float32 (T, bins), chunks (2000, bins), gzip) + frequencies.json +
times.json in {min, max, length} form.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from orcai_tpu.io import (
    read_json,
    save_as_zarr,
    write_vector_to_json,
)
from orcai_tpu.io.wav import load_wav
from orcai_tpu.ops.frontend import make_spectrogram_from_params
from orcai_tpu.utils import Messenger

from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER as DEFAULT_PARAMETER


def make_spectrogram(
    wav_file_path: Path | str,
    channel: int = 1,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    verbosity: int = 2,
    msgr: Messenger | None = None,
    wire: str = "exact",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """wav file -> (normalized spectrogram (T, bins), frequencies, times).

    Unlike predict (transient outputs, transfer-bound, auto-defaults to a
    coded wire on TPU), data prep MATERIALIZES spectrograms that feed
    training and evaluation, so `wire` defaults to "exact" here — the
    stored arrays stay bit-faithful to the reference numerics on every
    backend. Pass "mulaw8"/"bfp6"/"bfp5"/"auto" to opt in
    (ops/wire_codec.py).
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Making spectrogram")
    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)
    sp = orcai_parameter["spectrogram"]

    wav_file_path = Path(wav_file_path)
    msgr.part("Computing spectrogram on device")
    msgr.info(
        f"Loading & resampling (to {sp['sampling_rate'] / 1000:.2f} kHz) "
        f"wav file: {wav_file_path.stem}"
    )
    audio, _ = load_wav(wav_file_path, sr=sp["sampling_rate"], mono=False)
    if audio.ndim > 1:
        msgr.warning(f"Multiple channels found, using channel {channel}")
        audio = audio[channel - 1]

    spectrogram, frequencies, times = make_spectrogram_from_params(
        audio, sp, wire=wire
    )
    if len(times) > 1:
        msgr.info(f"Duration of wav file: {times[-1]:.2f} seconds")
    return spectrogram, frequencies, times


def save_spectrogram(
    spectrogram: np.ndarray,
    frequencies: np.ndarray,
    times: np.ndarray,
    output_dir: Path | str,
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> None:
    """Write spectrogram.zarr + frequencies.json + times.json to output_dir."""
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Saving spectrogram")
    msgr.part("Saving spectrogram")
    output_dir = Path(output_dir)
    # "auto" codec: blosc-lz4 frames via the native C encoder when
    # available (the gzip chunk writes dominated create-spectrograms wall
    # time on the 1-core host — io/zarrlite.resolve_zarr_codec), gzip
    # otherwise; both in the reference ecosystem's codec families
    save_as_zarr(spectrogram, output_dir / "spectrogram.zarr", compress="auto")
    write_vector_to_json(frequencies, output_dir / "frequencies.json")
    write_vector_to_json(times, output_dir / "times.json")


def _make_and_save_spectrogram(
    recording_info, orcai_parameter, output_dir, wire: str = "exact"
) -> str:
    silent = Messenger(verbosity=0)
    spectrogram, frequencies, times = make_spectrogram(
        Path(recording_info.base_dir_recording).joinpath(
            recording_info.rel_recording_path
        ),
        recording_info.channel,
        orcai_parameter,
        msgr=silent,
        wire=wire,
    )
    out = Path(output_dir).joinpath(recording_info.recording, "spectrogram")
    save_spectrogram(spectrogram, frequencies, times, out, msgr=silent)
    return recording_info.recording


def create_spectrograms(
    recording_table_path: Path | str,
    output_dir: Path | str,
    base_dir_recording: Path | str | None = None,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    include_not_annotated: bool = False,
    include_no_possible_annotations: bool = False,
    overwrite: bool = False,
    verbosity: int = 2,
    msgr: Messenger | None = None,
    wire: str = "exact",
) -> None:
    """Batch spectrogram production over a recording table.

    Filtering semantics follow the reference driver (spectrogram.py:226-321):
    skip non-annotated recordings, recordings with no possible calls, and
    recordings whose spectrogram already exists (crash-resume) unless
    overridden by the corresponding flags. `wire` opts the upload into a
    coded format ("auto"/"mulaw8"/"bfp6"/"bfp5"); it defaults to "exact"
    because these spectrograms are MATERIALIZED for training — see
    make_spectrogram.
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Creating spectrograms")

    msgr.part("Reading recordings table")
    recording_table = pd.read_csv(recording_table_path)
    output_dir = Path(output_dir)

    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)

    if not include_not_annotated:
        not_annotated = recording_table["base_dir_annotation"].isna()
        if not_annotated.sum() > 0:
            msgr.info(
                f"Excluded {not_annotated.sum()} recordings because they are "
                "not annotated."
            )
        recording_table = recording_table[~not_annotated]

    if not include_no_possible_annotations:
        label_calls = orcai_parameter["calls"]
        is_included = recording_table[label_calls].apply(lambda x: x.any(), axis=1)
        if (~is_included).sum() > 0:
            msgr.info(
                "Excluded recordings because they lack any possible annotations:",
                indent=1,
            )
            msgr.info(
                str(recording_table[~is_included]["recording"].values), indent=-1
            )
            recording_table = recording_table[is_included]

    # multi-host pods: each process takes a round-robin share of the
    # independent per-recording outputs (parallel/distributed.py);
    # single-process runs pass through unchanged. Sharding happens BEFORE
    # the on-disk skip-existing filter: content-based filters above are
    # deterministic on every host, disk state is not — ownership must not
    # shift with what other processes have already written
    from orcai_tpu.parallel.distributed import shard_table_for_process

    recording_table = shard_table_for_process(recording_table, msgr)

    if not overwrite:
        existing = recording_table["recording"].apply(
            lambda x: output_dir.joinpath(x, "spectrogram").exists()
        )
        if existing.sum() > 0:
            msgr.info(
                f"Skipping {existing.sum()} recordings because they already "
                "have spectrograms."
            )
            recording_table = recording_table[~existing]

    if base_dir_recording is not None:
        recording_table["base_dir_recording"] = base_dir_recording

    msgr.part(f"Creating {len(recording_table)} spectrograms")
    for recording in tqdm(
        recording_table.itertuples(index=False),
        desc="Making spectrograms",
        total=len(recording_table),
        disable=verbosity < 2,
    ):
        _make_and_save_spectrogram(
            recording, orcai_parameter, output_dir, wire=wire
        )

    msgr.success("Spectrograms created.")
