"""Command line interface.

The reference's 12-subcommand surface (cli.py:15-789) rebuilt on plain
click, same command names, arguments and flags, grouped as Predicting calls
/ Training Models / Helpers, plus two extensions with no upstream
equivalent: `serve` (watch-folder prediction with one persistent warmed
model) and `warmup` (pre-compile the predict executables). Each command
lazy-imports its pipeline module so `orcai --help` stays fast.
"""

from __future__ import annotations

from pathlib import Path

import click

from orcai_tpu import __version__
from orcai_tpu.ops.wire_names import WIRE_CODECS
from orcai_tpu.resources import (
    DEFAULT_CALL_DURATION_LIMITS,
    DEFAULT_HPS_PARAMETER,
    DEFAULT_ORCAI_PARAMETER,
)
from orcai_tpu.utils import Messenger

DirPathR = click.Path(exists=True, file_okay=False, readable=True,
                      resolve_path=True, path_type=Path)
DirPathW = click.Path(exists=True, file_okay=False, writable=True,
                      resolve_path=True, path_type=Path)
DirPathWcreate = click.Path(exists=False, file_okay=False, writable=True,
                            resolve_path=True, path_type=Path)
FilePathR = click.Path(exists=True, dir_okay=False, readable=True,
                       resolve_path=True, path_type=Path)
FilePathW = click.Path(exists=False, dir_okay=False, writable=True,
                       resolve_path=True, path_type=Path)


def _included_models() -> list[str]:
    """Bundled model names discovered from package data (ref cli.py:58-60)."""
    from orcai_tpu.resources import MODELS_DATA_DIR

    try:
        return sorted(
            p.name for p in MODELS_DATA_DIR.iterdir()
            if p.is_dir() and not p.name.startswith(".")
        )
    except OSError:
        return []


INCLUDED_MODELS = _included_models()


def _verbosity_option(fn):
    return click.option(
        "--verbosity", "-v", type=click.IntRange(0, 3), default=2,
        show_default=True,
        help="Verbosity level. 0: Errors only, 1: Warnings, 2: Info, 3: Debug",
    )(fn)


@click.group(
    help=(
        "Command line interface for orcAI-TPU — a TPU-native tool for "
        "training, testing & applying AI models to detect acoustic signals "
        "in spectrograms generated from audio recordings.\n\n"
        f"Version: {__version__}"
    ),
    epilog="For further information see the help pages of the individual "
    "subcommands (e.g. orcai predict --help).",
)
@click.version_option(version=__version__)
def cli():
    pass


# ------------------------------------------------------------- Predicting


@cli.command(
    name="predict",
    help="Predicts call annotations from RECORDING_PATH. This can either be "
    "a path to a wav file or a recording table (created with "
    "create-recording-table) as .csv.",
    short_help="Predicts call annotations.",
    no_args_is_help=True,
)
@click.argument("recording_path", type=FilePathR)
@click.option("--channel", "-c", type=int, default=1, show_default=True,
              help="Channel to use for prediction for a single file.")
@click.option("--model", "-m", "model",
              # plain str when no bundled models are discoverable: Choice([])
              # would reject even the default and break --model_dir usage
              type=(click.Choice(INCLUDED_MODELS, case_sensitive=False)
                    if INCLUDED_MODELS else str),
              default="orcai-v1", show_default=True,
              help="Builtin model to use for prediction. Overridden if "
              "model_dir is given.")
@click.option("--model_dir", "-md", "model_dir", type=DirPathR, default=None,
              show_default="use builtin model", help="Path to a model directory.")
@click.option("--output_path", "-o", default="default", show_default=True,
              help="Path to the output file/folder or 'default' to save next "
              "to the wav file.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Overwrite existing predictions.")
@click.option("--save_probabilities", "-sp", is_flag=True,
              help="Save prediction probabilities to a file.")
@click.option("--base_dir_recording", "-bdr", type=DirPathW, default=None,
              show_default="None",
              help="Alternative base directory containing the recordings.")
@click.option("--call_duration_limits", "-cdl", type=FilePathR, default=None,
              show_default="None",
              help="JSON file with call duration limits. None for no filtering.")
@click.option("--label_suffix", "-ls", default="*", show_default=True,
              help="Suffix to add to the label names.")
@click.option("--predict_batch_size", "-bs", type=int, default=128,
              show_default=True,
              help="Window batch size for on-device inference.")
@click.option("--wire_codec", "-wc", "wire",
              type=click.Choice(["auto", *WIRE_CODECS]),
              default="auto", show_default=True,
              help="Host->device audio byte format: exact PCM; 8-bit "
                   "mu-law codes (1 byte/sample, 38 dB SNR); packed "
                   "block-floating-point (bfp6 0.76 bytes/sample ~33 dB, "
                   "bfp5 0.63 ~27 dB) decoded on device; or the spectral "
                   "wires (sp-bfp6 0.57, sp-bfp5 0.47, sp11-bfp5 0.44) — "
                   "a host 3/4 (sp11: 11/16) resample that drops only the "
                   "band the frontend crops, then the base codec. All "
                   "hold annotation-level parity. auto = sp-bfp5 on TPU.")
@_verbosity_option
def cli_predict(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Predicting calls")
    from orcai_tpu.pipeline.helpers import bundled_model_dir
    from orcai_tpu.pipeline.predict import predict

    if kwargs["model_dir"] is None:
        kwargs["model_dir"] = bundled_model_dir(kwargs["model"])
    del kwargs["model"]
    predict(**kwargs)


@cli.command(
    name="serve",
    help="Watches WATCH_DIR for new wav recordings and predicts each as it "
    "arrives, holding one warmed model for the process lifetime (the "
    "per-process device/compile warmup is paid once, not per file). "
    "Outputs are identical to `orcai predict` on the same file; failures "
    "leave a .failed marker and the service keeps running. Stop with ^C. "
    "No upstream-orcAI equivalent.",
    short_help="Serve predictions for a watched folder.",
    no_args_is_help=True,
)
@click.argument("watch_dir", type=DirPathR)
@click.option("--channel", "-c", type=int, default=1, show_default=True,
              help="Channel to use for prediction.")
@click.option("--model", "-m", "model",
              type=(click.Choice(INCLUDED_MODELS, case_sensitive=False)
                    if INCLUDED_MODELS else str),
              default="orcai-v1", show_default=True,
              help="Builtin model to use for prediction. Overridden if "
              "model_dir is given.")
@click.option("--model_dir", "-md", "model_dir", type=DirPathR, default=None,
              show_default="use builtin model", help="Path to a model directory.")
@click.option("--output_dir", "-o", type=DirPathWcreate, default=None,
              show_default="next to each wav",
              help="Directory for the prediction TSVs.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Re-predict files whose output already exists.")
@click.option("--save_probabilities", "-sp", is_flag=True,
              help="Save prediction probabilities next to each TSV.")
@click.option("--call_duration_limits", "-cdl", type=FilePathR, default=None,
              show_default="None",
              help="JSON file with call duration limits. None for no filtering.")
@click.option("--label_suffix", "-ls", default="*", show_default=True,
              help="Suffix to add to the label names.")
@click.option("--predict_batch_size", "-bs", type=int, default=128,
              show_default=True,
              help="Window batch size for on-device inference.")
@click.option("--wire_codec", "-wc", "wire",
              type=click.Choice(["auto", *WIRE_CODECS]),
              default="auto", show_default=True,
              help="Host->device audio byte format (see `orcai predict`).")
@click.option("--poll_seconds", "-ps", type=float, default=2.0,
              show_default=True, help="Directory poll interval.")
@click.option("--warm_minutes", "-wm", type=float, default=0.0,
              show_default=True,
              help="Pre-compile/pre-load predict executables for every "
              "recording-length bucket up to this duration before serving.")
@click.option("--max_files", "-mf", type=int, default=None,
              show_default="unbounded",
              help="Stop after processing this many recordings.")
@_verbosity_option
def cli_serve(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Serving predictions")
    from orcai_tpu.pipeline.helpers import bundled_model_dir
    from orcai_tpu.pipeline.serve import serve

    if kwargs["model_dir"] is None:
        kwargs["model_dir"] = bundled_model_dir(kwargs["model"])
    del kwargs["model"]
    serve(**kwargs)


@cli.command(
    name="warmup",
    help="Pre-compiles the predict-path executables for every recording "
    "length up to --minutes into the persistent compile cache (one "
    "representative length per reachable executable shape: frame bucket "
    "x chunk plan). Remote-compiler TPU backends otherwise pay the "
    "compilation on the first production recording of each new shape; "
    "run this once per machine (safe to re-run — cached shapes are "
    "near-instant) so `orcai predict` / `orcai serve` start hot. "
    "No upstream-orcAI equivalent.",
    short_help="Pre-compile predict executables.",
)
@click.option("--minutes", "-mi", type=float, default=90.0, show_default=True,
              help="Longest recording duration to cover.")
@click.option("--model", "-m", "model",
              type=(click.Choice(INCLUDED_MODELS, case_sensitive=False)
                    if INCLUDED_MODELS else str),
              default="orcai-v1", show_default=True,
              help="Builtin model to warm for. Overridden if model_dir "
              "is given.")
@click.option("--model_dir", "-md", "model_dir", type=DirPathR, default=None,
              show_default="use builtin model", help="Path to a model directory.")
@click.option("--predict_batch_size", "-bs", type=int, default=128,
              show_default=True,
              help="Window batch size (must match production predicts).")
@click.option("--wire_codec", "-wc", "wire",
              type=click.Choice(["auto", *WIRE_CODECS]),
              default="auto", show_default=True,
              help="Wire codec to warm (must match production predicts; "
              "the frontends differ per codec).")
@_verbosity_option
def cli_warmup(minutes, model, model_dir, predict_batch_size, wire,
               verbosity):
    msgr = Messenger(verbosity=verbosity, title="Warming predict executables")
    from orcai_tpu.pipeline.helpers import bundled_model_dir
    from orcai_tpu.tools.warmup import warmup

    if model_dir is None:
        model_dir = bundled_model_dir(model)
    n = warmup(minutes, model_dir, predict_batch_size,
               verbose=verbosity >= 1, wire=wire)
    msgr.part(f"Warmed {n} recording-length executables")


@cli.command(
    name="filter-predictions",
    help="Filters predictions in the predictions file at PREDICTED_LABELS.",
    short_help="Filters predictions.",
    no_args_is_help=True,
)
@click.argument("predicted_labels", type=FilePathR)
@click.option("--call_duration_limits", "-cdl", type=FilePathR,
              default=str(DEFAULT_CALL_DURATION_LIMITS),
              show_default="default_call_duration_limits.json",
              help="JSON file with call duration limits.")
@click.option("--output_file", "-o", default="default", show_default=True,
              help="Output file path, or 'default' to save next to the "
              "prediction file.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Overwrite existing predictions.")
@click.option("--label_suffix", "-ls", default="*", show_default=True,
              help="Suffix to add to the label names.")
@_verbosity_option
def cli_filter_predictions(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Filtering predictions")
    from orcai_tpu.pipeline.predict import filter_predictions_file

    filter_predictions_file(**kwargs)


# ------------------------------------------------------------- Helpers


@cli.command(
    name="init",
    help="Initializes a new orcAI project with PROJECT_NAME in PROJECT_DIR.",
    short_help="Initializes a new orcAI project.",
    no_args_is_help=True,
)
@click.argument("project_dir", type=DirPathWcreate)
@click.argument("project_name", type=str)
@click.option("--parameter", "-p", type=FilePathR, default=None,
              show_default=True,
              help="JSON file with orcAI parameter overrides.")
@_verbosity_option
def cli_init_project(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Initializing project")
    from orcai_tpu.pipeline.helpers import init_project

    init_project(**kwargs)


@cli.command(
    name="create-recording-table",
    help="Create a table of recordings in BASE_DIR_RECORDING for use with "
    "other orcAI functions.",
    short_help="Create a table of recordings.",
    no_args_is_help=True,
)
@click.argument("base_dir_recording", type=DirPathR)
@click.option("--output_path", "-o", type=FilePathW, default=None,
              show_default="BASE_DIR_RECORDING/recording_table.csv",
              help="Path to save the table of recordings.")
@click.option("--base_dir_annotation", "-bda", type=DirPathR, default=None,
              show_default="None",
              help="Base directory containing the annotations.")
@click.option("--default_channel", "-dc", type=int, default=1,
              show_default=True, help="Default channel number.")
@click.option("--orcai_parameter", "-p", type=FilePathR, default=None,
              show_default="None", help="Path to the orcAI parameter file.")
@click.option("--update_table", "-ut", type=FilePathR, default=None,
              show_default="None",
              help="Previous recording table to update.")
@click.option("--update_paths", "-up", is_flag=True,
              help="Update paths from the new scan when updating a table.")
@click.option("--exclude_patterns", "-ep", type=FilePathR, default=None,
              show_default="None",
              help="JSON file with filename patterns to exclude.")
@click.option("--remove_duplicate_filenames", "-rdf", is_flag=True,
              help="Remove duplicate filenames from the table.")
@_verbosity_option
def cli_create_recording_table(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Creating recording table")
    from orcai_tpu.pipeline.helpers import create_recording_table

    create_recording_table(**kwargs)


# ------------------------------------------------------------- Training


@cli.command(
    name="create-spectrograms",
    help="Creates spectrograms for all files in recording table at "
    "RECORDING_TABLE_PATH and writes them to OUTPUT_DIR.",
    short_help="Creates spectrograms.",
    no_args_is_help=True,
)
@click.argument("recording_table_path", type=FilePathR)
@click.argument("output_dir", type=DirPathWcreate)
@click.option("--base_dir_recording", "-bdr", type=DirPathR, default=None,
              show_default="None", help="Base directory for the wav files.")
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@click.option("--include_not_annotated", "-en", is_flag=True,
              help="Include recordings without annotations.")
@click.option("--include_no_possible_annotations", "-enp", is_flag=True,
              help="Include recordings without possible annotations.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Recreate existing spectrograms.")
@_verbosity_option
def cli_create_spectrograms(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Creating spectrograms")
    from orcai_tpu.pipeline.spectrogram import create_spectrograms

    create_spectrograms(**kwargs)


@cli.command(
    name="create-label-arrays",
    help="Creates label arrays for all files in recording table at "
    "RECORDING_TABLE_PATH and writes them to OUTPUT_DIR.",
    short_help="Creates label arrays.",
    no_args_is_help=True,
)
@click.argument("recording_table_path", type=FilePathR)
@click.argument("output_dir", type=DirPathW)
@click.option("--base_dir_annotation", "-bda", type=DirPathR, default=None,
              show_default="None",
              help="Base directory for the annotation files.")
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@click.option("--call_equivalences", "-ce", type=FilePathR, default=None,
              show_default="None",
              help="JSON mapping original call labels to new call labels.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Recreate existing label arrays.")
@_verbosity_option
def cli_create_label_arrays(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Creating label arrays")
    from orcai_tpu.pipeline.labels import create_label_arrays

    create_label_arrays(**kwargs)


@cli.command(
    name="create-snippet-table",
    help="Creates a table of snippets for all files in recording table at "
    "RECORDING_TABLE_PATH using data in RECORDING_DATA_DIR.",
    short_help="Creates snippet table.",
    no_args_is_help=True,
)
@click.argument("recording_table_path", type=FilePathR)
@click.argument("recording_data_dir", type=DirPathW)
@click.option("--output_dir", "-o", type=DirPathWcreate, default=None,
              show_default="None",
              help="Output directory. None to save next to the recording table.")
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@_verbosity_option
def cli_create_snippet_table(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Creating snippet table")
    from orcai_tpu.pipeline.snippets import create_snippet_table

    create_snippet_table(**kwargs)


@cli.command(
    name="create-tvt-snippet-tables",
    help="Creates snippet tables for training, validation and test datasets "
    "and saves them to OUTPUT_DIR.",
    short_help="Creates TVT snippet tables.",
    no_args_is_help=True,
)
@click.argument("output_dir", type=DirPathWcreate)
@click.option("--snippet_table", "-st", type=FilePathR, default=None,
              show_default="None",
              help="Snippet table csv. None to read "
              "OUTPUT_DIR/all_snippets.csv.gz.")
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@click.option("--create_unfiltered_test_snippets", "-uts", is_flag=True,
              help="Also create an unfiltered test snippet table.")
@click.option("--n_unfiltered_test_snippets", "-n_uts", type=int, default=None,
              show_default="None", help="Number of unfiltered test snippets.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Overwrite existing snippet tables.")
@_verbosity_option
def cli_create_tvt_snippet_tables(**kwargs):
    kwargs["msgr"] = Messenger(
        verbosity=kwargs["verbosity"],
        title="Creating train, validation and test snippet tables",
    )
    from orcai_tpu.pipeline.snippets import create_tvt_snippet_tables

    create_tvt_snippet_tables(**kwargs)


@cli.command(
    name="create-tvt-data",
    help="Creates training, validation and test datasets from snippet "
    "tables in TVT_DIR.",
    short_help="Creates TVT datasets.",
    no_args_is_help=True,
)
@click.argument("tvt_dir", type=DirPathR)
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@click.option("--overwrite", "-ow", is_flag=True, help="Recreate existing data.")
@click.option("--data_compression", "-dc",
              type=click.Choice(["GZIP", "None"], case_sensitive=False),
              default="None", show_default=True,
              help="Data compression for datasets. The default (None) keeps shards memory-mappable so training streams from disk; GZIP shrinks disk use ~3x but loads a full decompressed copy into host RAM.")
@_verbosity_option
def cli_create_tvt_data(**kwargs):
    kwargs["msgr"] = Messenger(
        verbosity=kwargs["verbosity"],
        title="Creating train, validation and test datasets",
    )
    if kwargs["data_compression"] == "None":
        kwargs["data_compression"] = None
    from orcai_tpu.pipeline.snippets import create_tvt_data

    create_tvt_data(**kwargs)


@cli.command(
    name="convert-dataset",
    help="Converts reference-materialized tf.data dataset snapshots "
    "({train,val,test[,test_unfiltered]}_dataset dirs under TVT_DIR, as "
    "written by upstream orcAI's create-tvt-data) into this package's "
    "ArrayDataset shards, in place by default — afterwards `orcai train` "
    "and `orcai test` run on TVT_DIR directly, with no TensorFlow in the "
    "loop and no re-run of the snippet pipeline. Requires the tensorflow "
    "package (read side only).",
    short_help="Converts reference tf.data datasets to ArrayDataset.",
    no_args_is_help=True,
)
@click.argument("tvt_dir", type=DirPathR)
@click.option("--output_dir", "-o", type=DirPathWcreate, default=None,
              show_default="in place (TVT_DIR)",
              help="Write converted datasets here instead of in place.")
@click.option("--data_compression", "-dc",
              type=click.Choice(["GZIP", "None", "auto"],
                                case_sensitive=False),
              default="auto", show_default=True,
              help="Compression the tf snapshots were saved with "
              "(reference default GZIP); auto probes.")
@click.option("--overwrite", "-ow", is_flag=True,
              help="Redo datasets that were already converted.")
@_verbosity_option
def cli_convert_dataset(tvt_dir, output_dir, data_compression, overwrite,
                        verbosity):
    msgr = Messenger(verbosity=verbosity,
                     title="Converting tf.data datasets")
    if data_compression == "None":
        data_compression = None
    from orcai_tpu.io.tfdata_convert import convert_tvt_datasets

    converted = convert_tvt_datasets(
        tvt_dir, output_dir=output_dir, compression=data_compression,
        overwrite=overwrite, msgr=msgr,
    )
    if converted:
        msgr.part(
            "Converted "
            + ", ".join(f"{k} ({v} samples)" for k, v in converted.items())
        )
    else:
        msgr.part("Nothing to convert (all splits already converted)")


@cli.command(
    name="train",
    help="Trains a model on the training dataset in DATA_DIR and saves it "
    "to OUTPUT_DIR.",
    short_help="Trains a model.",
    no_args_is_help=True,
)
@click.argument("data_dir", type=DirPathR)
@click.argument("output_dir", type=DirPathW)
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@click.option("--data_compression", "-dc",
              type=click.Choice(["GZIP", "None"], case_sensitive=False),
              default="None", show_default=True,
              help="Data compression for datasets. The default (None) keeps shards memory-mappable so training streams from disk; GZIP shrinks disk use ~3x but loads a full decompressed copy into host RAM.")
@click.option("--load_model", "-lm", is_flag=True,
              help="Load model from previous training.")
@_verbosity_option
def cli_train(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Training model")
    if kwargs["data_compression"] == "None":
        kwargs["data_compression"] = None
    from orcai_tpu.train.trainer import train

    train(**kwargs)


@cli.command(
    name="test",
    help="Tests a model at MODEL_DIR on the test dataset in DATA_DIR and "
    "saves the results to OUTPUT_DIR.",
    short_help="Tests a model.",
    no_args_is_help=True,
)
@click.argument("model_dir", type=DirPathR)
@click.argument("data_dir", type=DirPathR)
@click.option("--test_unfiltered", "-tu", is_flag=True,
              help="Also test on the unfiltered test dataset.")
@click.option("--output_dir", "-o", type=DirPathWcreate, default=None,
              show_default="None",
              help="Output directory. None to save next to the model.")
@click.option("--data_compression", "-dc",
              type=click.Choice(["GZIP", "None"], case_sensitive=False),
              default="None", show_default=True,
              help="Data compression for datasets. The default (None) keeps shards memory-mappable so training streams from disk; GZIP shrinks disk use ~3x but loads a full decompressed copy into host RAM.")
@_verbosity_option
def cli_test(**kwargs):
    kwargs["msgr"] = Messenger(
        verbosity=kwargs["verbosity"],
        title=f"Testing model {kwargs['model_dir'].name}",
    )
    if kwargs["data_compression"] == "None":
        kwargs["data_compression"] = None
    from orcai_tpu.train.evaluate import test_model

    test_model(**kwargs)


@cli.command(
    name="hpsearch",
    help="Performs hyperparameter search on the training dataset in "
    "DATA_DIR and saves the results to OUTPUT_DIR.",
    short_help="Performs hyperparameter search.",
    no_args_is_help=True,
)
@click.argument("data_dir", type=DirPathR)
@click.argument("output_dir", type=DirPathW)
@click.option("--orcai_parameter", "-p", type=FilePathR,
              default=str(DEFAULT_ORCAI_PARAMETER),
              show_default="default_orcai_parameter.json",
              help="Path to the orcAI parameter file.")
@click.option("--hps_parameter", "-hp", type=FilePathR,
              default=str(DEFAULT_HPS_PARAMETER),
              show_default="default_hps_parameter.json",
              help="Path to the hyperparameter search parameter file.")
@click.option("--parallel", "-pl", is_flag=True,
              help="Run trials data-parallel over all devices.")
@click.option("--data_compression", "-dc",
              type=click.Choice(["GZIP", "None"], case_sensitive=False),
              default="None", show_default=True,
              help="Data compression for datasets. The default (None) keeps shards memory-mappable so training streams from disk; GZIP shrinks disk use ~3x but loads a full decompressed copy into host RAM.")
@_verbosity_option
def cli_hpsearch(**kwargs):
    kwargs["msgr"] = Messenger(verbosity=kwargs["verbosity"],
                               title="Hyperparameter search")
    if kwargs["data_compression"] == "None":
        kwargs["data_compression"] = None
    from orcai_tpu.train.hpsearch import hyperparameter_search

    hyperparameter_search(**kwargs)


if __name__ == "__main__":
    cli()
