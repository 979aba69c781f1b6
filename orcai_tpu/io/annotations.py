"""Annotation TSV reading (Audacity label-track format).

Equivalent of reference io.py:334-354.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd


def read_annotation_file(annotation_file_path: Path | str) -> pd.DataFrame:
    """Read a start/stop/label TSV; adds the recording stem as a column."""
    df = pd.read_csv(
        annotation_file_path,
        sep="\t",
        encoding="utf-8",
        header=None,
        names=["start", "stop", "origlabel"],
    )
    df["recording"] = Path(annotation_file_path).stem
    return df[["recording", "start", "stop", "origlabel"]]
