"""JSON encoder handling Path and numpy scalar/array types.

Equivalent of reference json_encoder.py:7-15, extended to cover numpy ints
and arrays (the reference only handles Path and np.float32).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class JsonEncoderExt(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, Path):
            return str(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)
