"""One-shot converter: reference tf.data snapshots -> ArrayDataset shards.

The reference materializes TVT datasets with `tf.data.Dataset.save`
(GZIP-compressed snapshot dirs; reference io.py:187-218, invoked from
snippets.py:720-733) and reads them back in train/test (io.py:150-184).
This framework replaced that on-disk format with ArrayDataset shards
(io/dataset.py) — memmap-able .npy files that feed the device-resident
epoch path with pure index math. A user migrating a reference project
therefore holds `{train,val,test[,test_unfiltered]}_dataset/` snapshot
dirs that this package cannot read natively; `orcai convert-dataset`
closes that interop hole by reading them ONCE through the installed
tensorflow and writing ArrayDataset shards in place (or to a chosen
output dir), after which `orcai train` / `orcai test` run with no
TensorFlow in the loop and no re-run of the snippet pipeline.

TensorFlow is only imported inside the conversion call: the rest of the
package stays TF-free, and environments without TF get a clear error
only when they actually ask for a conversion.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.utils import Messenger

#: dataset directory names the reference's create_tvt_data may materialize
#: (reference snippets.py:657: ``f"{itype}_dataset"``; the unfiltered test
#: split is optional, test.py:396-397)
TVT_DATASET_NAMES = (
    "train_dataset",
    "val_dataset",
    "test_dataset",
    "test_unfiltered_dataset",
)


def is_tf_snapshot(path: Path | str) -> bool:
    """True when `path` looks like a `tf.data.Dataset.save` snapshot dir
    (the two metadata files tf.data always writes)."""
    path = Path(path)
    return (path / "dataset_spec.pb").exists() and (
        path / "snapshot.metadata"
    ).exists()


def _load_tf_snapshot(path: Path, compression: str | None):
    """tf.data.Dataset for a snapshot dir, autodetecting GZIP vs raw.

    The snapshot metadata does not record the compression flag, and a
    mismatch only surfaces lazily as DataLossError on the first element
    read — so "auto" probes one element under GZIP (the reference's
    default, io.py:153) and falls back to uncompressed.
    """
    import tensorflow as tf

    candidates = (
        [compression] if compression != "auto" else ["GZIP", None]
    )
    last_err: Exception | None = None
    for comp in candidates:
        ds = tf.data.Dataset.load(str(path), compression=comp)
        try:
            next(iter(ds.take(1)))  # forces a real shard read
            return ds
        except StopIteration:
            # a valid snapshot with zero elements: readable, just empty
            # (the downstream materialization refuses empty datasets with
            # its own clear error)
            return ds
        except tf.errors.DataLossError as err:
            # the one error a wrong compression flag produces — try the
            # next candidate. Anything else (missing shard, permission,
            # corrupt spec) is a real problem and must surface as itself,
            # not be misreported as a compression mismatch.
            last_err = err
    raise ValueError(
        f"Could not read tf.data snapshot at {path} with compression "
        f"in {candidates}: {last_err}"
    )


class _TFDatasetLoader:
    """Adapter giving a tf.data dataset the loader protocol
    ArrayDataset.save_from_loader expects (__len__ + (x, y) iteration)."""

    def __init__(self, ds):
        n = int(ds.cardinality().numpy())
        if n < 0:
            # UNKNOWN cardinality (snapshots restore a known count, so
            # this is a fallback for exotic inputs): counting requires a
            # full extra read of the dataset before the conversion pass
            import tensorflow as tf

            if n == int(tf.data.INFINITE_CARDINALITY):
                raise ValueError(
                    "refusing to materialize an infinite tf dataset"
                )
            n = sum(1 for _ in ds)
        self.n = n
        self.ds = ds

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        for spec, labels in self.ds.as_numpy_iterator():
            spec = np.asarray(spec, np.float32)
            labels = np.asarray(labels, np.float32)
            if spec.ndim == 2:  # reference stores (T, bins, 1); be lenient
                spec = spec[..., None]
            yield spec, labels


def convert_tf_dataset(
    src: Path | str,
    dst: Path | str | None = None,
    compression: str | None = "auto",
    shard_size: int = 2048,
    overwrite: bool = False,
    msgr: Messenger | None = None,
) -> int:
    """Convert ONE tf.data snapshot dir into ArrayDataset shards.

    `dst` defaults to `src` itself: the .npy shards + meta.json land
    alongside the snapshot files (no name collisions — tf.data writes
    dataset_spec.pb/snapshot.metadata/<fp>/... and ArrayDataset reads only
    meta.json + *.npy), so the directory afterwards serves both stacks.
    Returns the number of samples converted.
    """
    src = Path(src)
    dst = Path(dst) if dst is not None else src
    if msgr is None:
        msgr = Messenger(verbosity=0)
    if not is_tf_snapshot(src):
        raise FileNotFoundError(
            f"{src} is not a tf.data snapshot dir (no dataset_spec.pb / "
            "snapshot.metadata)"
        )
    if (dst / "meta.json").exists() and not overwrite:
        raise FileExistsError(
            f"{dst} already holds a converted ArrayDataset "
            "(use overwrite=True to redo)"
        )
    loader = _TFDatasetLoader(_load_tf_snapshot(src, compression))
    # in-place conversion writes into a dir that is non-empty by
    # definition (the snapshot files live there); save_from_loader's
    # overwrite flag only clears *.npy + meta.json, never snapshot files
    ArrayDataset.save_from_loader(
        loader, dst, compression=None, shard_size=shard_size, overwrite=True
    )
    msgr.info(f"{src.name}: {len(loader)} samples -> {dst}")
    return len(loader)


def convert_tvt_datasets(
    tvt_dir: Path | str,
    output_dir: Path | str | None = None,
    compression: str | None = "auto",
    shard_size: int = 2048,
    overwrite: bool = False,
    msgr: Messenger | None = None,
) -> dict[str, int]:
    """Convert every reference-materialized dataset under a TVT dir.

    Looks for `{train,val,test,test_unfiltered}_dataset/` snapshot dirs
    (reference snippets.py:657), converts each, and carries
    `dataset_shapes.json` / `call_weights.json` over to `output_dir` when
    one is given — after which `orcai train <tvt_dir>` runs directly.
    Returns {dataset_name: n_samples} for the converted dirs.
    """
    tvt_dir = Path(tvt_dir)
    out_base = Path(output_dir) if output_dir is not None else tvt_dir
    if msgr is None:
        msgr = Messenger(verbosity=0)
    if not tvt_dir.is_dir():
        raise NotADirectoryError(f"tvt_dir does not exist: {tvt_dir}")

    converted: dict[str, int] = {}
    found = 0
    for name in TVT_DATASET_NAMES:
        src = tvt_dir / name
        if not src.is_dir() or not is_tf_snapshot(src):
            continue
        found += 1
        dst = out_base / name
        dst.mkdir(parents=True, exist_ok=True)
        try:
            converted[name] = convert_tf_dataset(
                src, dst, compression=compression, shard_size=shard_size,
                overwrite=overwrite, msgr=msgr,
            )
        except FileExistsError:
            # crash-resume semantics, like every batch driver in this
            # package (pipeline/snippets.py): a split converted by an
            # earlier run is skipped with a warning, so a conversion
            # interrupted mid-TVT resumes from where it stopped instead
            # of aborting (or re-paying finished splits via overwrite)
            msgr.warning(
                f"{name} already converted at {dst}; skipping "
                "(use --overwrite to redo)"
            )
    if not found:
        raise FileNotFoundError(
            f"No tf.data snapshot dataset dirs found under {tvt_dir} "
            f"(looked for {', '.join(TVT_DATASET_NAMES)})"
        )
    if out_base != tvt_dir:
        for aux in ("dataset_shapes.json", "call_weights.json"):
            if (tvt_dir / aux).exists():
                shutil.copy2(tvt_dir / aux, out_base / aux)
    # a reference project may lack dataset_shapes.json only if created by
    # very old versions; synthesize it from the converted data so train's
    # shape checks work either way
    shapes_path = out_base / "dataset_shapes.json"
    if not shapes_path.exists():
        import json

        first = next(
            (
                n for n in TVT_DATASET_NAMES
                if (out_base / n / "meta.json").exists()
            ),
            None,
        )
        if first is not None:
            ds = ArrayDataset.load(out_base / first)
            shapes_path.write_text(
                json.dumps(
                    {
                        "spectrogram": list(ds.spectrogram_shape),
                        "labels": list(ds.labels_shape),
                    }
                )
            )
    return converted
