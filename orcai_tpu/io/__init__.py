from orcai_tpu.io.jsonio import (
    generate_times_from_spectrogram,
    read_json,
    write_json,
    write_vector_to_json,
)
from orcai_tpu.io.zarrlite import ZarrArray, open_zarr, save_as_zarr
from orcai_tpu.io.annotations import read_annotation_file

__all__ = [
    "read_json",
    "write_json",
    "write_vector_to_json",
    "generate_times_from_spectrogram",
    "ZarrArray",
    "open_zarr",
    "save_as_zarr",
    "read_annotation_file",
]
