"""Train the bundled orcai-v1 model on synthetic bioacoustic data.

The reference ships a trained orcai-v1 checkpoint whose weights blob is not
redistributable; this script produces our bundled artifact by running the
FULL pipeline end to end on generated recordings: synth wavs + annotations
-> spectrograms -> label arrays -> snippet tables -> TVT datasets -> train
-> bundle into orcai_tpu/models_data/orcai-v1.

Usage: python tools/train_bundled_model.py [workdir] [--epochs N]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=str(REPO / ".bundled_train"))
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-recordings", type=int, default=20)
    ap.add_argument("--duration", type=float, default=600.0)
    ap.add_argument("--n-batch-train", type=int, default=60)
    ap.add_argument("--skip-data", action="store_true",
                    help="reuse existing prepared data in workdir")
    args = ap.parse_args()

    from orcai_tpu.io import read_json, write_json
    from orcai_tpu.pipeline.labels import create_label_arrays
    from orcai_tpu.pipeline.snippets import (
        create_snippet_table,
        create_tvt_data,
        create_tvt_snippet_tables,
    )
    from orcai_tpu.pipeline.spectrogram import create_spectrograms
    from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER, MODELS_DATA_DIR
    from orcai_tpu.tools.synthetic import make_synthetic_project
    from orcai_tpu.train.trainer import train
    from orcai_tpu.utils import Messenger

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    msgr = Messenger(verbosity=2, title="Training bundled orcai-v1")

    param = read_json(DEFAULT_ORCAI_PARAMETER)
    param["seed"] = 271828182845904523536028747135266249776
    param["model"]["epochs"] = args.epochs
    param["model"]["n_batch_train"] = args.n_batch_train
    param["model"]["n_batch_val"] = max(args.n_batch_train // 6, 2)
    param["model"]["n_batch_test"] = max(args.n_batch_train // 6, 2)
    param_path = work / "orcai_parameter.json"
    write_json(param, param_path)

    data_dir = work / "data"
    tvt_dir = work / "tvt"

    if not args.skip_data:
        msgr.part("Generating synthetic recordings")
        table_path = make_synthetic_project(
            work,
            n_recordings=args.n_recordings,
            duration_s=args.duration,
            seed=20260816,
        )
        data_dir.mkdir(exist_ok=True)
        create_spectrograms(table_path, data_dir, orcai_parameter=param, msgr=msgr)
        create_label_arrays(table_path, data_dir, orcai_parameter=param, msgr=msgr)
        create_snippet_table(
            table_path, data_dir, output_dir=tvt_dir, orcai_parameter=param,
            msgr=msgr,
        )
        create_tvt_snippet_tables(
            tvt_dir, orcai_parameter=param, overwrite=True, msgr=msgr
        )
        create_tvt_data(
            tvt_dir, orcai_parameter=param, overwrite=True,
            data_compression=None, msgr=msgr,
        )

    models_dir = work / "models"
    models_dir.mkdir(exist_ok=True)
    train(tvt_dir, models_dir, orcai_parameter=param, msgr=msgr)

    msgr.part("Bundling model into package data")
    bundle = MODELS_DATA_DIR / "orcai-v1"
    if bundle.exists():
        shutil.rmtree(bundle)
    shutil.copytree(
        models_dir / "orcai-v1",
        bundle,
        ignore=shutil.ignore_patterns("resume", "*.opt.msgpack"),
    )
    msgr.success(f"Bundled model written to {bundle}")


if __name__ == "__main__":
    main()
