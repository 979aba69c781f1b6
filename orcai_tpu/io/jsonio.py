"""JSON file helpers and compressed equally-spaced-vector encoding.

Equivalent of the JSON half of reference io.py (io.py:221-293).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from orcai_tpu.utils.jsonenc import JsonEncoderExt


def read_json(filename: Path | str) -> dict:
    with open(filename, "r") as f:
        return json.load(f)


def write_json(dictionary: dict, filename: Path | str) -> None:
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    with open(filename, "w") as f:
        f.write(json.dumps(dictionary, indent=4, cls=JsonEncoderExt))


def write_vector_to_json(vector, filename: Path | str) -> None:
    """Store an equally spaced vector as {min, max, length} (io.py:221-238)."""
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    payload = {"min": vector[0], "max": vector[-1], "length": len(vector)}
    with open(filename, "w") as f:
        json.dump(payload, f, indent=4, cls=JsonEncoderExt)


def generate_times_from_spectrogram(filename: Path | str) -> np.ndarray:
    """Rebuild the equally spaced vector from {min, max, length} (io.py:241-256)."""
    with open(filename, "r") as f:
        d = json.load(f)
    return np.linspace(d["min"], d["max"], d["length"])
