"""Project management helpers: init, recording table construction.

Pipeline-level equivalent of reference helpers.py:13-267.
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


def init_project(
    project_dir: Path | str,
    project_name: str,
    verbosity: int = 2,
    msgr: Messenger | None = None,
    parameter: Path | str | dict | None = None,
) -> None:
    """Create a project directory with renamed default configs + fresh seed.

    Copies every default JSON as `<project>_*.json`, deep-merges user
    parameter overrides section-wise (warning on unknown sections), and
    generates a fresh 128-bit master seed unless one is supplied
    (reference helpers.py:13-90).
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Initializing project")
    msgr.part(f"Creating project directory: {project_dir}")
    project_dir = Path(project_dir)
    project_dir.mkdir(parents=True, exist_ok=True)

    defaults_dir = DEFAULTS_DIR
    for file in sorted(defaults_dir.glob("*.json")):
        new_path = project_dir / file.name.replace("default", project_name)
        msgr.info(f"Creating {new_path.name}")
        shutil.copy(file, new_path)

    param_path = project_dir / f"{project_name}_orcai_parameter.json"
    orcai_parameter = read_json(param_path)

    if parameter is not None:
        if isinstance(parameter, (Path, str)):
            parameter = read_json(parameter)
        for key in parameter:
            if key not in orcai_parameter:
                msgr.warning(f"{key} not found in default orcAI parameter. Ignoring.")
                continue
            if isinstance(orcai_parameter[key], dict):
                orcai_parameter[key].update(parameter[key])
            else:
                orcai_parameter[key] = parameter[key]
            msgr.info(f'Updating "{key}" in default orcAI parameter with', indent=1)
            msgr.info(parameter[key], indent=-1)
        if "seed" not in parameter:
            msgr.info("Generating random seed")
            orcai_parameter["seed"] = SeedSequence().entropy
    else:
        msgr.info("Generating random seed")
        orcai_parameter["seed"] = SeedSequence().entropy

    orcai_parameter["name"] = project_name
    write_json(orcai_parameter, param_path)
    msgr.success("Project initialized.")


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
    """Scan for wav + annotation files and join them into a recording table.

    Output columns match the reference (helpers.py:93-267): channel,
    duplicate, base_dir_recording, rel_recording_path, base_dir_annotation,
    rel_annotation_path, plus one per-call possibility column when an orcai
    parameter file is given.
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Creating recording table")

    msgr.part("Resolving file paths")
    if output_path is None:
        output_path = Path(base_dir_recording) / "recording_table.csv"
    else:
        output_path = Path(output_path)
    if output_path.exists():
        msgr.error(f"Output path {output_path} already exists!")
        sys.exit(1)

    wav_files = sorted(Path(base_dir_recording).glob("**/*.wav"))
    if base_dir_annotation is None:
        base_dir_annotation = base_dir_recording
    annotation_files = sorted(Path(base_dir_annotation).glob("**/*.txt"))

    if exclude_patterns is not None:
        if isinstance(exclude_patterns, (Path, str)):
            exclude_patterns = read_json(exclude_patterns)
        for pattern in exclude_patterns:
            wav_files = [f for f in wav_files if pattern not in str(f)]
            annotation_files = [
                f for f in annotation_files if pattern not in str(f)
            ]
            msgr.info(f"Remaining files after filtering {pattern!r}: "
                      f"{len(wav_files)} wav, {len(annotation_files)} annotations")

    if orcai_parameter is not None:
        label_calls = read_json(orcai_parameter)["calls"]
        call_possible = {call: pd.NA for call in label_calls}
    else:
        call_possible = {}

    recording_table = pd.DataFrame(
        {
            "recording": [p.stem for p in wav_files],
            "recording_type": "unknown",
            "channel": default_channel,
            "base_dir_recording": str(base_dir_recording),
            "rel_recording_path": [
                str(p.relative_to(base_dir_recording)) for p in wav_files
            ],
            **call_possible,
        }
    ).set_index("recording")

    annotations_table = pd.DataFrame(
        {
            "recording": [p.stem for p in annotation_files],
            "base_dir_annotation": str(base_dir_annotation),
            "rel_annotation_path": [
                str(p.relative_to(base_dir_annotation)) for p in annotation_files
            ],
        }
    ).set_index("recording")

    missing = set(annotations_table.index) - set(recording_table.index)
    if missing:
        msgr.warning(
            f"{len(missing)} annotations with missing recordings: {missing}. "
            "These will be ignored."
        )

    recording_table = recording_table.join(annotations_table, how="left")
    recording_table["duplicate"] = recording_table.index.duplicated(keep=False)
    n_duplicates = int(recording_table["duplicate"].sum())
    if n_duplicates > 0:
        if remove_duplicate_filenames:
            recording_table = recording_table[~recording_table["duplicate"]]
        else:
            msgr.warning("Duplicate filenames found.")
            msgr.warning(
                "Please check the duplicates marked in the output table and "
                "ensure file stems are unique within the specified directories."
            )

    additional_columns = []
    if update_table is not None:
        previous = pd.read_csv(update_table, index_col="recording")
        additional_columns = previous.columns.difference(recording_table.columns)
        if not update_paths:
            recording_table[
                [
                    "base_dir_recording",
                    "rel_recording_path",
                    "base_dir_annotation",
                    "rel_annotation_path",
                ]
            ] = None
        recording_table = recording_table.combine_first(previous)

    recording_table = recording_table[
        [
            "channel",
            "duplicate",
            "base_dir_recording",
            "rel_recording_path",
            "base_dir_annotation",
            "rel_annotation_path",
            *additional_columns,
            *call_possible.keys(),
        ]
    ]

    msgr.part(f"Saving recording table to {output_path}")
    recording_table.to_csv(output_path)
    msgr.info(f"Total recordings: {len(recording_table)}", set_indent=1)
    msgr.info(
        "Total recordings with annotations: "
        f"{recording_table['rel_annotation_path'].count()}"
    )
    msgr.success("Recordings table created.")
    return recording_table
