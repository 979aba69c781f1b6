"""Project scaffolding and recording-catalog construction.

Covers the reference's project helpers (helpers.py:13-267) with the same
on-disk contracts — `<project>_*.json` config copies with a fresh 128-bit
master seed, and a recording_table.csv whose columns/values downstream
pipeline steps consume — but organized as small pure helpers around two
thin drivers.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pandas as pd
from numpy.random import SeedSequence

from orcai_tpu.io import read_json, write_json
from orcai_tpu.resources import DEFAULTS_DIR, MODELS_DATA_DIR
from orcai_tpu.utils import Messenger

# columns every recording table carries, in output order (per-call
# possibility columns and carried-over columns are appended)
_TABLE_COLUMNS = [
    "channel",
    "duplicate",
    "base_dir_recording",
    "rel_recording_path",
    "base_dir_annotation",
    "rel_annotation_path",
]
_PATH_COLUMNS = _TABLE_COLUMNS[2:]


def bundled_model_dir(name: str) -> Path:
    """Directory of a model shipped with the package."""
    return MODELS_DATA_DIR / name


def list_bundled_models() -> list[str]:
    root = MODELS_DATA_DIR
    if not root.exists():
        return []
    return sorted(
        p.name for p in root.iterdir() if p.is_dir() and not p.name.startswith(".")
    )


def _stage_default_configs(project_dir: Path, project_name: str, msgr) -> Path:
    """Copy each packaged default JSON as <project>_<file>.json; returns the
    path of the staged orcai parameter file."""
    param_path = None
    for source in sorted(DEFAULTS_DIR.glob("*.json")):
        target = project_dir / source.name.replace("default", project_name)
        msgr.info(f"Creating {target.name}")
        shutil.copy(source, target)
        if "orcai_parameter" in source.name:
            param_path = target
    return param_path


def _merge_overrides(base: dict, overrides: dict, msgr) -> dict:
    """Section-wise deep merge of user overrides into the default parameter
    schema; sections unknown to the schema are dropped with a warning."""
    merged = dict(base)
    for section, value in overrides.items():
        if section not in merged:
            msgr.warning(
                f"{section} not found in default orcAI parameter. Ignoring."
            )
            continue
        if isinstance(merged[section], dict):
            merged[section] = {**merged[section], **value}
        else:
            merged[section] = value
        msgr.info(f'Updating "{section}" in default orcAI parameter with', indent=1)
        msgr.info(value, indent=-1)
    return merged


def init_project(
    project_dir: Path | str,
    project_name: str,
    verbosity: int = 2,
    msgr: Messenger | None = None,
    parameter: Path | str | dict | None = None,
) -> None:
    """Scaffold a project: staged default configs + merged parameter file.

    Contract (reference helpers.py:13-90): every default JSON lands as
    `<project>_*.json`, user overrides merge section-wise, and the master
    seed is fresh 128-bit SeedSequence entropy unless the overrides pin one.
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Initializing project")
    msgr.part(f"Creating project directory: {project_dir}")
    project_dir = Path(project_dir)
    project_dir.mkdir(parents=True, exist_ok=True)

    param_path = _stage_default_configs(project_dir, project_name, msgr)
    orcai_parameter = read_json(param_path)

    overrides = parameter
    if isinstance(overrides, (Path, str)):
        overrides = read_json(overrides)
    if overrides:
        orcai_parameter = _merge_overrides(orcai_parameter, overrides, msgr)
    if not overrides or "seed" not in overrides:
        msgr.info("Drawing a fresh 128-bit master seed")
        orcai_parameter["seed"] = SeedSequence().entropy

    orcai_parameter["name"] = project_name
    write_json(orcai_parameter, param_path)
    msgr.success("Project ready.")


def _scan_files(root: Path, pattern: str, exclude: list[str] | None, msgr):
    """Recursive scan, sorted for determinism, with substring exclusion
    (delegates to the reference-parity filter in utils.rle)."""
    from orcai_tpu.utils.rle import filter_filepaths

    return filter_filepaths(sorted(root.glob(pattern)), exclude or [], msgr)


def _files_frame(files, columns: dict) -> pd.DataFrame:
    """DataFrame indexed by file stem with the given columns, in order."""
    frame = pd.DataFrame({"recording": [p.stem for p in files], **columns})
    return frame.set_index("recording")


def create_recording_table(
    base_dir_recording: Path | str,
    output_path: Path | str | None = None,
    base_dir_annotation: Path | str | None = None,
    default_channel: int = 1,
    orcai_parameter: Path | str | None = None,
    update_table: Path | str | None = None,
    update_paths: bool = True,
    exclude_patterns: Path | str | list[str] | None = None,
    remove_duplicate_filenames: bool = False,
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> pd.DataFrame:
    """Catalog wav recordings and their annotation files into one table.

    Output contract (reference helpers.py:93-267): CSV indexed by recording
    stem with channel / duplicate / base+relative path columns, optional
    per-call possibility columns (blank, filled in by the user), and —
    in update mode — any extra columns carried over from the previous table.
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Creating recording table")

    msgr.part("Resolving file paths")
    base_dir_recording = Path(base_dir_recording)
    output_path = (
        Path(output_path)
        if output_path is not None
        else base_dir_recording / "recording_table.csv"
    )
    if output_path.exists():
        msgr.error(f"Output path {output_path} already exists!")
        sys.exit(1)

    base_dir_annotation = Path(base_dir_annotation or base_dir_recording)
    exclude = exclude_patterns
    if isinstance(exclude, (Path, str)):
        exclude = read_json(exclude)
    wavs = _scan_files(base_dir_recording, "**/*.wav", exclude, msgr)
    annotations = _scan_files(base_dir_annotation, "**/*.txt", exclude, msgr)

    calls = read_json(orcai_parameter)["calls"] if orcai_parameter else []

    table = _files_frame(
        wavs,
        {
            "recording_type": "unknown",
            "channel": default_channel,
            "base_dir_recording": str(base_dir_recording),
            "rel_recording_path": [
                str(p.relative_to(base_dir_recording)) for p in wavs
            ],
            **{call: pd.NA for call in calls},
        },
    )
    annotation_table = _files_frame(
        annotations,
        {
            "base_dir_annotation": str(base_dir_annotation),
            "rel_annotation_path": [
                str(p.relative_to(base_dir_annotation)) for p in annotations
            ],
        },
    )

    orphans = set(annotation_table.index) - set(table.index)
    if orphans:
        msgr.warning(
            f"{len(orphans)} annotations with missing recordings: {orphans}. "
            "These will be ignored."
        )

    table = table.join(annotation_table, how="left")
    table["duplicate"] = table.index.duplicated(keep=False)
    if table["duplicate"].any():
        if remove_duplicate_filenames:
            table = table[~table["duplicate"]]
        else:
            msgr.warning("Duplicate filenames found.")
            msgr.warning(
                "Rows sharing a file stem are marked in the 'duplicate' "
                "column; stems must be unique for downstream steps."
            )

    carried_columns = []
    if update_table is not None:
        previous = pd.read_csv(update_table, index_col="recording")
        carried_columns = previous.columns.difference(table.columns)
        if not update_paths:
            table[_PATH_COLUMNS] = None
        table = table.combine_first(previous)

    table = table[[*_TABLE_COLUMNS, *carried_columns, *calls]]

    msgr.part(f"Saving recording table to {output_path}")
    table.to_csv(output_path)
    msgr.info(f"Total recordings: {len(table)}", set_indent=1)
    msgr.info(
        f"Recordings with annotations: {table['rel_annotation_path'].count()}"
    )
    msgr.success("Recording table written.")
    return table
