"""test_model (the `orcai test` entry point) end to end on synthetic data."""

import json

import numpy as np

from orcai_tpu.io.dataset import ArrayDataset
from orcai_tpu.io.model_store import save_orcai_model
from orcai_tpu.models import build_model, init_variables
from orcai_tpu.train.evaluate import test_model as run_test_model
from orcai_tpu.utils import Messenger

PARAM = {
    "name": "eval-test",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [2, 3],
        "kernel_size": 3,
        "dropout_rate": 0.1,
        "lstm_units": 4,
        "batch_size": 4,
        "learning_rate": 1e-3,
    },
    "calls": ["A", "B"],
    "seed": 5,
}
INPUT_SHAPE = (16, 9, 1)
OUT = 4


def test_test_model_e2e(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(16, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, 2, size=(16, OUT, 2)).astype(np.float32)
    y[:, :, 1][rng.uniform(size=(16, OUT)) < 0.2] = -1.0  # some masking

    class L:
        def __len__(self):
            return 16

        def __iter__(self):
            return iter(zip(x, y))

    for split in ["test", "test_unfiltered"]:
        ArrayDataset.save_from_loader(L(), tmp_path / f"{split}_dataset",
                                      compression=None)
    (tmp_path / "dataset_shapes.json").write_text(
        json.dumps({"spectrogram": list(INPUT_SHAPE), "labels": [OUT, 2]})
    )

    model_dir = tmp_path / "eval-test"
    model = build_model(PARAM)
    variables = init_variables(model, INPUT_SHAPE, seed=1)
    save_orcai_model(model_dir, PARAM, variables, input_shape=INPUT_SHAPE)

    run_test_model(
        model_dir,
        tmp_path,
        test_unfiltered=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
    )

    out = model_dir / "test"
    metrics = json.loads((out / "test_data_metrics.json").read_text())
    assert 0.0 <= metrics["MBA"] <= 1.0 and np.isfinite(metrics["loss"])
    import pandas as pd

    ct = pd.read_csv(out / "test_data_confusion_table.csv", index_col=0)
    assert set(ct.index) == {"A", "B"}
    assert {"TP", "FN", "FP", "TN", "PR", "RE", "F1", "Total"}.issubset(ct.columns)
    # masked positions excluded from totals for call B
    assert ct.loc["B", "Total"] < ct.loc["A", "Total"]
    for key in ["true_pred", "pred_true"]:
        t = pd.read_csv(
            out / f"test_data_misclassification_table_{key}.csv", index_col=0
        )
        assert "fraction_time" in t.columns
    # unfiltered test results also written
    assert (out / "test_unfiltered_dataset_metrics.json").exists()
