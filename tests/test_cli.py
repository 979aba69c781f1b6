"""CLI surface: all 12 reference subcommands exist (plus the serve
extension) with working --help, and a smoke run of init through the CLI
runner."""

from click.testing import CliRunner

from orcai_tpu.cli import cli

EXPECTED_COMMANDS = {
    "predict",
    "filter-predictions",
    "init",
    "create-recording-table",
    "create-spectrograms",
    "create-label-arrays",
    "create-snippet-table",
    "create-tvt-snippet-tables",
    "create-tvt-data",
    "train",
    "test",
    "hpsearch",
    # extensions beyond the reference surface: watch-folder serving mode,
    # executable pre-compilation for remote-compiler backends, and the
    # reference tf.data-snapshot interop converter
    "serve",
    "warmup",
    "convert-dataset",
}


def test_all_subcommands_present():
    assert set(cli.commands.keys()) == EXPECTED_COMMANDS


def test_help_all_commands():
    runner = CliRunner()
    result = runner.invoke(cli, ["--help"])
    assert result.exit_code == 0
    for cmd in EXPECTED_COMMANDS:
        result = runner.invoke(cli, [cmd, "--help"])
        assert result.exit_code == 0, cmd


def test_model_option_validated(tmp_path):
    """--model must name a bundled model (ref cli.py:58-60 click.Choice)."""
    from orcai_tpu.cli import INCLUDED_MODELS

    assert "orcai-v1" in INCLUDED_MODELS
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"RIFF0000WAVE")  # never read: validation fails first
    runner = CliRunner()
    result = runner.invoke(cli, ["predict", str(wav), "-m", "no-such-model"])
    assert result.exit_code != 0
    assert "no-such-model" in result.output


def test_version():
    runner = CliRunner()
    result = runner.invoke(cli, ["--version"])
    assert result.exit_code == 0


def test_cli_init(tmp_path):
    runner = CliRunner()
    result = runner.invoke(
        cli, ["init", str(tmp_path / "proj"), "cliproj", "-v", "0"]
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "proj" / "cliproj_orcai_parameter.json").exists()


def test_cli_filter_predictions(tmp_path):
    pred = tmp_path / "x_predicted.txt"
    pred.write_text("start\tstop\tlabel\n1.0\t2.0\tBR*\n3.0\t3.001\tBUZZ*\n")
    limits = tmp_path / "limits.json"
    limits.write_text('{"default": [0.01, null]}')
    runner = CliRunner()
    result = runner.invoke(
        cli,
        ["filter-predictions", str(pred), "-cdl", str(limits), "-v", "0"],
    )
    assert result.exit_code == 0, result.output
    out = tmp_path / "x_predicted_filtered.txt"
    assert out.exists()
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2  # header + 1 kept (the 1 ms one dropped)


def test_train_parameter_default():
    """`orcai train` without -p must fall back to the bundled default
    parameter file instead of passing None into train()."""
    from click.testing import CliRunner

    from orcai_tpu.cli import cli
    from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER

    result = CliRunner().invoke(cli, ["train", "--help"])
    assert result.exit_code == 0
    train_cmd = cli.commands["train"]
    opt = next(p for p in train_cmd.params if p.name == "orcai_parameter")
    assert opt.default == str(DEFAULT_ORCAI_PARAMETER)


def test_cli_warmup_smoke():
    """`orcai warmup` drives the executable enumeration through the CLI;
    --minutes below the snippet duration reaches no executable (count 0)
    but exercises model load, predictor construction, and the scanner."""
    runner = CliRunner()
    result = runner.invoke(cli, ["warmup", "--minutes", "0.05", "-v", "2"])
    assert result.exit_code == 0, result.output
    assert "Warmed 0 recording-length executables" in result.output
