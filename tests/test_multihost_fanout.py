"""Multi-host per-recording fan-out for the batch drivers.

SURVEY §2 names per-recording fan-out across hosts as the TPU-native
replacement for the reference's REMOVED predict multiprocessing
(reference CHANGELOG.md:402). The drivers (create-spectrograms,
create-label-arrays, batch predict) partition their recording tables
round-robin by jax.process_index(); outputs are independent per-recording
files, so the shared filesystem is the only rendezvous. Here two
"processes" are simulated sequentially by monkeypatching the process
rank: their output sets must be disjoint and their union complete.
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax

from orcai_tpu.parallel.distributed import (
    process_partition,
    shard_table_for_process,
)
from orcai_tpu.utils import Messenger


def test_process_partition_disjoint_and_complete():
    for n in (0, 1, 5, 8):
        for count in (1, 2, 3):
            shares = [process_partition(n, pid, count) for pid in range(count)]
            flat = sorted(i for s in shares for i in s)
            assert flat == list(range(n))
            # balanced to within one item
            sizes = [len(s) for s in shares]
            assert max(sizes) - min(sizes) <= 1


def test_shard_table_positional_split(monkeypatch):
    table = pd.DataFrame({"recording": [f"r{i}" for i in range(5)]})
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    part = shard_table_for_process(table, Messenger(verbosity=0))
    assert list(part["recording"]) == ["r1", "r3"]
    # single process: identity (no copy games)
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert shard_table_for_process(table) is table


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    from orcai_tpu.tools.synthetic import make_synthetic_project

    root = tmp_path_factory.mktemp("fanout")
    table_path = make_synthetic_project(
        root, n_recordings=4, duration_s=45.0, seed=5
    )
    return root, table_path


def _param():
    from orcai_tpu.io import read_json
    from orcai_tpu.resources import DEFAULT_ORCAI_PARAMETER
    from orcai_tpu.tools.synthetic import CALLS

    param = read_json(DEFAULT_ORCAI_PARAMETER)
    param["calls"] = list(CALLS)
    return param


def test_create_spectrograms_fans_out_per_process(project, monkeypatch):
    from orcai_tpu.pipeline.spectrogram import create_spectrograms

    root, table_path = project
    out = root / "prepared_sharded"
    table = pd.read_csv(table_path)

    produced = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        create_spectrograms(
            table_path, out, orcai_parameter=_param(),
            msgr=Messenger(verbosity=0), verbosity=0,
        )
        done = {p.parent.name for p in out.glob("*/spectrogram")}
        produced.append(done)

    # process 0 produced a strict subset; process 1 completed the set
    assert produced[0] < produced[1]
    assert produced[1] == set(table["recording"])
    # each share is non-trivial (round-robin over 4 recordings -> 2 + 2)
    assert len(produced[0]) == 2


def test_create_label_arrays_fans_out_per_process(project, monkeypatch):
    from orcai_tpu.pipeline.labels import create_label_arrays

    root, table_path = project
    out = root / "prepared_sharded"
    table = pd.read_csv(table_path)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        create_label_arrays(
            table_path, out, orcai_parameter=_param(),
            msgr=Messenger(verbosity=0), verbosity=0,
        )
        done = {p.parent.name for p in out.glob("*/labels")}
        if pid == 0:
            assert len(done) == 2
    assert {p.parent.name for p in out.glob("*/labels")} == set(
        table["recording"]
    )


def test_multiprocess_predict_uses_local_mesh(project, monkeypatch):
    """With process_count > 1 the predictor's window mesh must span only
    the process's LOCAL devices — on a real pod a global mesh would
    device_put the model variables onto non-addressable devices and desync
    the processes' (different-recording) programs. Simulated here: local
    devices are a 4-of-8 subset; output must equal a single-process run."""
    from orcai_tpu.pipeline.predict import predict

    root, table_path = project
    wav = root / "recordings" / "synth000.wav"
    assert wav.exists()

    out_single = root / "pred_single.txt"
    predict(
        wav, output_path=out_single, overwrite=True,
        msgr=Messenger(verbosity=0), verbosity=0, predict_batch_size=16,
    )

    subset = jax.devices()[:4]
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "local_devices", lambda: list(subset))
    out_local = root / "pred_local_mesh.txt"
    predict(
        wav, output_path=out_local, overwrite=True,
        msgr=Messenger(verbosity=0), verbosity=0, predict_batch_size=16,
    )
    assert out_local.read_text() == out_single.read_text()


def test_predict_table_fans_out_per_process(project, monkeypatch):
    from orcai_tpu.pipeline.predict import predict

    root, table_path = project
    out = root / "pred_sharded"
    out.mkdir()

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    predict(
        table_path,
        output_path=out,
        overwrite=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=16,
    )
    tsvs = sorted(p.name for p in out.glob("*_predicted.txt"))
    table = pd.read_csv(table_path)
    expected = sorted(
        f"{r}_orcai-v1_predicted.txt" for r in table["recording"][::2]
    )
    assert tsvs == expected
