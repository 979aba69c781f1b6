"""Snippet sampling, TVT split tables, and dataset materialization.

Pipeline-level equivalent of reference snippets.py:26-744. The random draw
order inside `make_snippet_table` / `filter_snippet_table` /
`create_tvt_snippet_tables` reproduces the reference exactly (same rng
composition, same per-segment/per-type/per-snippet uniform draws, same
pandas sampling calls), so given the same master seed the emitted CSVs are
bit-identical. The per-snippet label sums read the recording's label array
once instead of one zarr window per snippet (reference snippets.py:133).

The reference mutates the module-global DATA_TYPES list when an unfiltered
test set exists (snippets.py:648-653) — a latent bug we do not replicate;
data_types is always derived locally.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from orcai_tpu.io import read_json, write_json
from orcai_tpu.io.dataset import ArrayDataset, SnippetDataLoader
from orcai_tpu.io.zarrlite import open_zarr
from orcai_tpu.utils import (
    Messenger,
    SEED_ID_CREATE_DATALOADER,
    SEED_ID_FILTER_SNIPPET_TABLE,
    SEED_ID_MAKE_SNIPPET_TABLE,
    SEED_ID_UNFILTERED_TEST_DATA,
)
from orcai_tpu.utils.rle import seconds_to_hms
from orcai_tpu.utils.seeds import rng_for

from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER as DEFAULT_PARAMETER

DATA_TYPES = ["train", "val", "test"]


def resolve_recording_data_dir(recording: str, recording_data_dir) -> Path | None:
    path = Path(recording_data_dir, recording)
    return path if path.exists() else None


def make_snippet_table(
    recording_dir: Path,
    orcai_parameter: dict,
    rng: np.random.Generator | None = None,
    msgr: Messenger | None = None,
) -> tuple[pd.DataFrame | None, float, int, str, str]:
    """Sample random snippet windows for one recording.

    Each 200 s segment is carved into contiguous train/val/test sub-ranges
    by the configured fractions, and snippets_per_sec * duration * fraction
    4 s windows are drawn uniformly per sub-range; snippet length is forced
    divisible by 2**n_filters (reference snippets.py:26-162). Returns
    (table | None, duration, n_segments, recording, status).
    """
    if rng is None:
        rng = np.random.default_rng()
    if msgr is None:
        msgr = Messenger(verbosity=0)
    recording = recording_dir.stem
    label_zarr_path = recording_dir / "labels" / "labels.zarr"
    label_list_path = recording_dir / "labels" / "label_list.json"
    times_path = recording_dir / "spectrogram" / "times.json"

    try:
        spectrogram_times = read_json(times_path)
    except FileNotFoundError:
        msgr.error(f"File not found: {times_path}")
        msgr.error("Did you create the spectrogram?")
        raise

    model_parameter = orcai_parameter["model"]
    snippet_parameter = orcai_parameter["snippets"]

    recording_duration = spectrogram_times["max"]
    n_segments = int(recording_duration // snippet_parameter["segment_duration"])
    if n_segments <= 0:
        msgr.warning(
            f"Duration of recording ({recording_duration}) is shorter than "
            f"segment length ({snippet_parameter['segment_duration']}). "
            "Skipping recording."
        )
        return (None, recording_duration, n_segments, recording,
                "shorter than segment_duration")

    try:
        label_store = open_zarr(label_zarr_path)
    except (FileNotFoundError, ValueError):
        msgr.warning(f"Label file not found: {label_zarr_path}")
        return (None, recording_duration, n_segments, recording,
                "missing label files")
    try:
        label_list = read_json(label_list_path)
    except FileNotFoundError:
        msgr.warning(f"Label file not found: {label_list_path}")
        return (None, recording_duration, n_segments, recording,
                "missing label files")

    label_names = list(label_list.keys())
    times = np.linspace(
        spectrogram_times["min"],
        spectrogram_times["max"],
        spectrogram_times["length"],
    )
    delta_t = times[1] - times[0]
    n_filters = len(model_parameter["filters"])
    down = 2**n_filters
    n_snippet_steps = int(
        down * ((snippet_parameter["snippet_duration"] / delta_t) // down)
    )
    msgr.info(f"Number of spectrogram snippet timesteps: {n_snippet_steps}")

    # one bulk read instead of a per-snippet zarr window
    labels = label_store[:].astype(np.float64)
    label_cumsum = np.concatenate(
        [np.zeros((1, labels.shape[1])), np.cumsum(labels, axis=0)], axis=0
    )

    rows = []
    for i_segment in range(n_segments):
        span = (0.0, 0.0)
        for dtype in DATA_TYPES:
            span = (span[1], span[1] + snippet_parameter[dtype])
            t_min = (i_segment + span[0]) * snippet_parameter["segment_duration"]
            t_max = (i_segment + span[1]) * snippet_parameter[
                "segment_duration"
            ] - snippet_parameter["snippet_duration"]
            n_draws = int(
                snippet_parameter[dtype]
                * snippet_parameter["segment_duration"]
                * snippet_parameter["snippets_per_sec"]
            )
            for _ in range(n_draws):
                t_start = rng.uniform(low=t_min, high=t_max, size=1)[0]
                i_start = np.searchsorted(times, t_start, side="left") - 1
                i_stop = i_start + n_snippet_steps
                seg_sum = (label_cumsum[i_stop] - label_cumsum[i_start]) * delta_t
                label_duration = np.where(seg_sum < 0, np.nan, seg_sum)
                rows.append(
                    [recording, str(recording_dir), dtype, i_start, i_stop]
                    + list(label_duration)
                )

    table = pd.DataFrame(
        rows,
        columns=["recording", "recording_data_dir", "data_type",
                 "row_start", "row_stop"] + label_names,
    ).drop_duplicates()
    return (table, recording_duration, n_segments, recording, "success")


def compute_snippet_stats(snippet_table: pd.DataFrame, for_calls: list) -> pd.DataFrame:
    """Per-split call-duration totals and equalizing factors."""
    stats = snippet_table.groupby("data_type")[for_calls].sum().T
    stats = stats.reindex(columns=DATA_TYPES)
    stats["total"] = stats.sum(axis=1)
    ef = stats.apply(lambda x: 1 / x * x.max(), axis=0)
    ef.columns = ef.columns + "_ef"
    return pd.merge(stats, ef, left_index=True, right_index=True)


def create_snippet_table(
    recording_table_path: Path | str,
    recording_data_dir: Path | str,
    output_dir: Path | str | None = None,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> None:
    """Sample snippets for every recording; write all_snippets.csv.gz +
    failed_snippets.csv (reference snippets.py:195-320)."""
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Making snippet table")

    msgr.part("Loading the recording table")
    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)

    if output_dir is None:
        output_dir = Path(recording_table_path).parent / "tvt_data"
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    recording_data_dir = Path(recording_data_dir)
    recording_table = pd.read_csv(recording_table_path)
    recording_table = recording_table[~recording_table["base_dir_annotation"].isna()]

    recording_table["recording_data_dir"] = recording_table.apply(
        lambda row: resolve_recording_data_dir(row["recording"], recording_data_dir),
        axis=1,
    )
    missing = pd.isna(recording_table["recording_data_dir"])
    if missing.any():
        msgr.warning(
            f"Missing recording data directories for {missing.sum()} recordings. "
            "Skipping these recordings."
        )
        msgr.warning("Did you create the spectrograms & labels?")
        recording_table = recording_table[~missing]

    lengths, segments, tables, failed, failed_reason = [], [], [], [], []
    msgr.part("Sampling snippet tables")
    rng = rng_for(SEED_ID_MAKE_SNIPPET_TABLE, orcai_parameter["seed"])
    for i in tqdm(
        recording_table.index,
        desc="Making snippet tables",
        total=len(recording_table),
        unit="recording",
        disable=verbosity < 2,
    ):
        table, duration, n_seg, recording, status = make_snippet_table(
            recording_dir=Path(recording_table.loc[i, "recording_data_dir"]),
            orcai_parameter=orcai_parameter,
            rng=rng,
            msgr=Messenger(verbosity=0),
        )
        if status == "success":
            tables.append(table)
            lengths.append(duration)
            segments.append(n_seg)
        else:
            failed.append(recording)
            failed_reason.append(status)

    snippet_table = pd.concat(tables).reset_index(drop=True)
    failed_table = pd.DataFrame({"recording": failed, "reason": failed_reason})

    msgr.info(
        f"Created snippet table for {snippet_table['recording'].nunique()} recordings."
    )
    msgr.info(f"Total recording duration: {seconds_to_hms(np.sum(lengths))}.")
    msgr.info(f"Total number of snippets: {len(snippet_table)}.")
    msgr.info(f"Total number of segments: {np.sum(segments)}")
    msgr.info(f"Creating snippet table failed for {len(failed)} recordings.")

    msgr.part("Writing the combined snippet table")
    failed_table.to_csv(output_dir / "failed_snippets.csv", index=False)
    snippet_table.to_csv(
        output_dir / "all_snippets.csv.gz", compression="gzip", index=False
    )
    msgr.success(f"Snippet table saved to {output_dir / 'all_snippets.csv.gz'}")


def filter_snippet_table(
    snippet_table: pd.DataFrame,
    orcai_parameter: dict,
    rng: np.random.Generator | None = None,
    msgr: Messenger | None = None,
) -> pd.DataFrame:
    """Drop fraction_removal of the snippets containing no label
    (reference snippets.py:323-386)."""
    if rng is None:
        rng = np.random.default_rng()
    if msgr is None:
        msgr = Messenger(verbosity=0)
    msgr.part("Thinning label-free snippets")

    calls = orcai_parameter["calls"]
    no_label = snippet_table[snippet_table[calls].sum(axis=1) <= 0.0000001]
    p_before = np.around(100 * len(no_label) / len(snippet_table), 2)
    msgr.info(f"Label-free snippets before thinning: {p_before} %")
    frac = orcai_parameter["snippets"]["fraction_removal"]
    msgr.info(f"Thinning out {np.around(frac * 100, 2)}% of the label-free snippets")

    drop = rng.choice(
        no_label.index, size=int(frac * len(no_label)), replace=False
    )
    snippet_table = snippet_table.drop(drop, axis=0)

    no_label_after = snippet_table[snippet_table[calls].sum(axis=1) <= 0.0000001]
    p_after = np.around(100 * len(no_label_after) / len(snippet_table), 2)
    msgr.info(f"Label-free snippets after thinning: {p_after} %")
    snippet_table = snippet_table.reset_index(drop=True)
    msgr.info("Number of train, val, test snippets:", indent=1)
    msgr.info(snippet_table.groupby("data_type").size(), indent=-1)
    return snippet_table


def create_tvt_snippet_tables(
    output_dir: Path | str,
    snippet_table: pd.DataFrame | Path | str | None = None,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    create_unfiltered_test_snippets: bool = False,
    n_unfiltered_test_snippets: int | None = None,
    overwrite: bool = False,
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> None:
    """Sample exactly n_batch_<split> * batch_size snippets per split and
    write {train,val,test}.csv.gz (+ optional test_unfiltered.csv.gz) and
    duration-stat CSVs (reference snippets.py:389-554)."""
    if msgr is None:
        msgr = Messenger(
            verbosity=verbosity,
            title="Creating train, validation and test snippet tables",
        )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    msgr.part("Loading the snippet table")
    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)
    if snippet_table is None:
        snippet_table = output_dir / "all_snippets.csv.gz"
    if isinstance(snippet_table, (Path, str)):
        snippet_table = pd.read_csv(snippet_table)

    all_stats = compute_snippet_stats(snippet_table, orcai_parameter["calls"])
    all_stats_duration = all_stats.filter(regex=".*(?<!_ef)$", axis=1).map(
        seconds_to_hms
    )
    msgr.info("Snippet stats [HMS]:", indent=1)
    msgr.info(all_stats_duration, indent=-1)
    all_stats_duration.to_csv(
        output_dir / "all_snippet_stats_duration.csv", index=True
    )

    rng = rng_for(SEED_ID_FILTER_SNIPPET_TABLE, orcai_parameter["seed"])
    filtered = filter_snippet_table(snippet_table, orcai_parameter, rng, msgr)

    selected = []
    for itype in DATA_TYPES:
        n_snippets = (
            orcai_parameter["model"][f"n_batch_{itype}"]
            * orcai_parameter["model"]["batch_size"]
        )
        msgr.info(
            f"Extracting {orcai_parameter['model'][f'n_batch_{itype}']} batches "
            f"of {orcai_parameter['model']['batch_size']} random {itype} "
            f"snippets ({n_snippets} snippets)"
        )
        pool = filtered[filtered["data_type"] == itype]
        if len(pool) < n_snippets:
            raise ValueError(
                f"Number of {itype} snippets ({n_snippets}) larger than "
                f"available snippets ({len(pool)})."
            )
        sample = pool.sample(n=n_snippets, replace=False, random_state=rng)
        selected.append(sample)

        out_path = output_dir / f"{itype}.csv.gz"
        if out_path.exists() and not overwrite:
            msgr.warning(
                f"File {out_path} already exists. Skipping. "
                "Set overwrite=True to overwrite."
            )
            continue
        sample[["recording_data_dir", "row_start", "row_stop"]].to_csv(
            out_path, compression="gzip", index=False
        )
        msgr.info(f"{itype} snippet table written")

    selected_stats = compute_snippet_stats(
        pd.concat(selected, ignore_index=True), orcai_parameter["calls"]
    )
    selected_stats_duration = selected_stats.filter(
        regex=".*(?<!_ef)$", axis=1
    ).map(seconds_to_hms)
    msgr.info("Snippet stats for train, val and test datasets [HMS]:", indent=1)
    msgr.info(selected_stats_duration, indent=-1)
    selected_stats_duration.to_csv(
        output_dir / "selected_snippet_stats_duration.csv", index=True
    )

    if create_unfiltered_test_snippets:
        if n_unfiltered_test_snippets is None:
            n_unfiltered_test_snippets = (
                orcai_parameter["model"]["n_batch_train"]
                * orcai_parameter["model"]["batch_size"]
            )
        msgr.info(
            f"Extracting {n_unfiltered_test_snippets} unfiltered test snippets"
        )
        pool = snippet_table[snippet_table["data_type"] == "test"]
        if len(pool) < n_unfiltered_test_snippets:
            msgr.warning(
                f"Number of unfiltered test snippets ({n_unfiltered_test_snippets}) "
                f"larger than available snippets ({len(pool)})."
            )
            msgr.warning("Using all test snippets.")
            n_unfiltered_test_snippets = len(pool)

        rng = rng_for(SEED_ID_UNFILTERED_TEST_DATA, orcai_parameter["seed"])
        sample = pool.sample(
            n=n_unfiltered_test_snippets, replace=False, random_state=rng
        )
        out_path = output_dir / "test_unfiltered.csv.gz"
        if out_path.exists() and not overwrite:
            msgr.warning(
                f"File {out_path} already exists. Skipping. "
                "Set overwrite=True to overwrite."
            )
        else:
            sample.to_csv(out_path, compression="gzip", index=False)
            msgr.info("Unfiltered test snippet table written")

    msgr.success("All snippet tables created and saved to disk")


def get_call_weights(
    loader: SnippetDataLoader,
    call_names: list[str],
    method: str = "balanced",
) -> dict:
    """Per-call weights from label frequencies (reference snippets.py:557-605)."""
    n_calls = len(call_names)
    if method not in ("balanced", "max", "uniform"):
        raise ValueError(
            f"Method {method} not supported. Use 'balanced', 'max' or 'uniform'."
        )
    if method == "uniform":
        return dict(zip(call_names, np.ones(n_calls)))

    counts = np.zeros(n_calls)
    for _, y in tqdm(
        loader, desc="Calculating call weights", unit="sample", total=len(loader)
    ):
        counts += np.sum(y, axis=0, where=y > 0)

    if method == "balanced":
        weights = counts.sum() / (n_calls * counts)
    else:  # "max"
        weights = 1 / counts * counts.max()
    return dict(zip(call_names, weights))


def create_tvt_data(
    tvt_dir: Path | str,
    orcai_parameter: dict | Path | str = DEFAULT_PARAMETER,
    overwrite: bool = False,
    data_compression: str | None = None,
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> None:
    """Materialize {train,val,test[,test_unfiltered]}_dataset dirs from the
    split snippet tables + dataset_shapes.json + optional call_weights.json
    (reference snippets.py:608-744)."""
    if msgr is None:
        msgr = Messenger(
            verbosity=verbosity,
            title="Creating train, validation and test datasets",
        )
    tvt_dir = Path(tvt_dir)
    data_types = list(DATA_TYPES)
    if (tvt_dir / "test_unfiltered.csv.gz").exists():
        data_types.append("test_unfiltered")

    msgr.part("Reading in snippet tables and generating loaders")
    if isinstance(orcai_parameter, (Path, str)):
        orcai_parameter = read_json(orcai_parameter)

    n_filters = len(orcai_parameter["model"]["filters"])
    loaders = {
        itype: SnippetDataLoader.from_csv(
            tvt_dir / f"{itype}.csv.gz",
            n_filters=n_filters,
            shuffle=True,
            rng=rng_for(
                SEED_ID_CREATE_DATALOADER.get(itype, 0), orcai_parameter["seed"]
            ),
        )
        for itype in data_types
    }

    spec_sample, label_sample = loaders[data_types[0]][0]
    msgr.info("Data shape:", indent=1)
    msgr.info(f"Input spectrogram batch shape: {spec_sample.shape}")
    msgr.info(f"Input label batch shape: {label_sample.shape}", indent=-1)

    if orcai_parameter["model"].get("call_weights") is not None:
        msgr.part("Calculating training call weights")
        call_weights = get_call_weights(
            loaders["train"],
            call_names=orcai_parameter["calls"],
            method=orcai_parameter["model"]["call_weights"],
        )
        write_json(call_weights, tvt_dir / "call_weights.json")
        msgr.info("Call weights:")
        msgr.info(call_weights)

    msgr.part("Saving datasets to disk")
    for itype in data_types:
        out = tvt_dir / f"{itype}_dataset"
        try:
            ArrayDataset.save_from_loader(
                loaders[itype],
                out,
                compression=data_compression,
                overwrite=overwrite,
                progress=lambda it: tqdm(
                    it, desc=f"Materializing {itype}", total=len(it),
                    disable=verbosity < 2,
                ),
            )
        except FileExistsError:
            msgr.warning(
                f"File {out} already exists. Skipping. "
                "Set overwrite=True to overwrite."
            )
        msgr.print_directory_size(out)

    write_json(
        {
            "spectrogram": list(spec_sample.shape),
            "labels": list(label_sample.shape),
        },
        tvt_dir / "dataset_shapes.json",
    )
    msgr.success("Train, validation and test datasets created and saved to disk")
