"""Label-array production: annotation TSVs -> frame-aligned label zarr stores.

Pipeline-level equivalent of reference labels.py:18-229. Per recording, each
call intended for training becomes a column of a float32 (T, n_calls) array
on the spectrogram's time grid: 1 inside any annotated interval (inclusive
bounds), 0 elsewhere, MASK_VALUE for calls marked not-possible in the
recording table. The interval test is vectorized with searchsorted over the
regular time grid instead of the reference's per-interval boolean OR loop.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from orcai_tpu.io import (
    generate_times_from_spectrogram,
    read_annotation_file,
    read_json,
    save_as_zarr,
    write_json,
)
from orcai_tpu.utils import MASK_VALUE, Messenger

from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER as DEFAULT_PARAMETER


def intervals_to_mask(t_vec: np.ndarray, starts, stops) -> np.ndarray:
    """Boolean mask of t in any [start, stop] interval (inclusive bounds).

    Vectorized via difference counting on the sorted regular grid: for each
    interval, +1 at the first index with t >= start, -1 after the last index
    with t <= stop. Equivalent to OR-ing (t >= start) & (t <= stop) per
    interval (reference labels.py:97-98) but O((T + K) log T).
    """
    diff = np.zeros(len(t_vec) + 1, dtype=np.int32)
    lo = np.searchsorted(t_vec, np.asarray(starts), side="left")
    hi = np.searchsorted(t_vec, np.asarray(stops), side="right")
    np.add.at(diff, lo, 1)
    np.add.at(diff, hi, -1)
    return np.cumsum(diff[:-1]) > 0


def convert_annotation(
    annotation_file_path: Path,
    recording_data_dir: Path,
    label_calls: list[str],
    labels_present: list[str],
    labels_masked: list[str],
    call_equivalences: dict | Path | str | None = None,
    msgr: Messenger | None = None,
) -> tuple[pd.DataFrame, dict]:
    """One annotation file -> (label array DataFrame, {call: present|masked})."""
    if msgr is None:
        msgr = Messenger(verbosity=0)
    msgr.part("Rasterizing annotation intervals onto the frame grid")
    recording = annotation_file_path.stem
    annotations = read_annotation_file(annotation_file_path)

    if call_equivalences is not None:
        msgr.info("Applying call equivalences")
        if isinstance(call_equivalences, (Path, str)):
            call_equivalences = read_json(call_equivalences)
        annotations["label"] = annotations["origlabel"].map(call_equivalences)
        unmapped = set(annotations["origlabel"].unique()) - set(
            call_equivalences.keys()
        )
        if unmapped:
            msgr.info(f"Annotation labels missing from the equivalence map: {unmapped}")
    else:
        annotations["label"] = annotations["origlabel"]

    spectrogram_dir = recording_data_dir.joinpath(recording, "spectrogram")
    try:
        t_vec = generate_times_from_spectrogram(spectrogram_dir / "times.json")
    except FileNotFoundError:
        msgr.error(f"File not found: {spectrogram_dir / 'times.json'}")
        msgr.error("Did you create the spectrogram?")
        raise

    columns = {}
    for label in labels_present:
        rows = annotations[annotations["label"] == label]
        mask = intervals_to_mask(t_vec, rows["start"].values, rows["stop"].values)
        columns[label] = mask.astype(int)
    for label in labels_masked:
        columns[label] = np.full(len(t_vec), MASK_VALUE)

    annotations_array = pd.DataFrame(columns).reindex(label_calls, axis=1)
    label_dict = {
        call: ("present" if call in labels_present else "masked")
        for call in label_calls
    }
    return annotations_array, label_dict


def create_label_arrays(
    recording_table_path: Path | str,
    output_dir: Path | str,
    base_dir_annotation: Path | str | None = None,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    call_equivalences: dict | Path | str | None = None,
    overwrite: bool = False,
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> None:
    """Batch label-array production over a recording table.

    Writes <recording>/labels/labels.zarr + label_list.json; skips
    recordings that already have labels unless overwrite (crash-resume,
    reference labels.py:179-186).
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Making label arrays")

    msgr.part("Loading the recording table")
    output_dir = Path(output_dir)
    recording_table = pd.read_csv(recording_table_path)

    if base_dir_annotation is not None:
        recording_table["base_dir_annotation"] = base_dir_annotation

    not_annotated = recording_table["base_dir_annotation"].isna()
    if not_annotated.any():
        msgr.info(
            f"{not_annotated.sum()} recordings have no annotation file; skipping them."
        )
        recording_table = recording_table[~not_annotated]

    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)
    label_calls = orcai_parameter["calls"]

    # multi-host pods: round-robin share of the independent per-recording
    # label arrays (parallel/distributed.py); single-process unchanged.
    # Sharded BEFORE the on-disk skip-existing filter so ownership is a
    # pure function of the table, not of what other hosts already wrote
    from orcai_tpu.parallel.distributed import shard_table_for_process

    recording_table = shard_table_for_process(recording_table, msgr)

    if not overwrite:
        existing = recording_table["recording"].apply(
            lambda x: output_dir.joinpath(x, "labels").exists()
        )
        if existing.sum() > 0:
            msgr.info(
                f"Skipping {existing.sum()} recordings because they already "
                "have labels."
            )
        recording_table = recording_table[~existing]

    recordings_no_labels = []
    msgr.part("Building label arrays")
    for i in tqdm(
        recording_table.index,
        desc="Making label arrays",
        total=len(recording_table),
        unit="recording",
        disable=verbosity < 2,
    ):
        recording_labels = recording_table.loc[i, label_calls]
        if recording_labels.isna().any():
            # the reference casts NaN to True silently (create_label_arrays
            # astype(bool)); keep upstream tables drop-in but warn loudly so
            # accidentally blank cells aren't silently treated as 'possible'
            blank = list(recording_labels[recording_labels.isna()].index)
            msgr.warning(
                f"Recording {recording_table.loc[i, 'recording']!r} has blank "
                f"call-possibility cells for {blank}; treating blank as "
                "'possible' (the reference's NaN->True cast). Fill every "
                "call column with 0/False or 1/True to silence this."
            )
            recording_labels = recording_labels.fillna(1.0)
        labels_present = list(recording_labels[recording_labels.astype(bool)].index)
        if not labels_present:
            recordings_no_labels.append(recording_table.loc[i, "recording"])
            continue

        labels_masked = [c for c in label_calls if c not in labels_present]
        annotations_array, label_dict = convert_annotation(
            annotation_file_path=Path(
                recording_table.loc[i, "base_dir_annotation"]
            ).joinpath(recording_table.loc[i, "rel_annotation_path"]),
            recording_data_dir=output_dir,
            label_calls=label_calls,
            labels_present=labels_present,
            labels_masked=labels_masked,
            call_equivalences=call_equivalences,
            msgr=Messenger(verbosity=0),
        )
        labels_dir = output_dir.joinpath(recording_table.loc[i, "recording"], "labels")
        save_as_zarr(
            annotations_array.to_numpy(),
            labels_dir / "labels.zarr",
            compress="auto",  # blosc-lz4 when the C encoder exists
        )
        write_json(label_dict, labels_dir / "label_list.json")

    if recordings_no_labels:
        msgr.warning(f"Recordings without any valid label: {recordings_no_labels}")
    msgr.success("Label arrays written")
