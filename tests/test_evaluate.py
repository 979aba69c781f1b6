"""Evaluation tables vs a direct transcription of the reference's row-loop
algorithm (test.py:37-225)."""

import numpy as np
import pandas as pd
import pytest

from orcai_tpu.train.evaluate import (
    compute_confusion_table,
    compute_misclassification_tables,
)

MASK = -1.0


def _reference_misclassification(m1, m2, s1, s2, names):
    """Row-by-row transcription of the reference algorithm for testing."""
    num = len(names)
    mat = np.zeros((num + 1, num + 1))
    for r in range(m1.shape[0]):
        c1 = np.where(m1[r, :] == 1)[0]
        c2 = np.where(m2[r, :] == 1)[0]
        if len(c1) == 1:
            if m2[r, c1] != -1:
                if len(c2) > 0:
                    for c in c2:
                        mat[c1, c] += 1 / len(c2)
                else:
                    mat[c1, num] += 1
        if len(c1) == 0:
            if len(c2) > 0:
                for c in c2:
                    mat[num, c] += 1 / len(c2)
            else:
                mat[num, num] += 1
    row_sum = mat.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = np.around(mat / row_sum, 3)
    table = pd.DataFrame(
        norm,
        columns=[f"{s2}_{x}" for x in names] + [f"{s2}_NOLABEL"],
        index=[f"{s1}_{x}" for x in names] + [f"{s1}_NOLABEL"],
    )
    table["fraction_time"] = np.around(row_sum / row_sum.sum(), 5)
    return table


def _random_label_matrices(seed, n=500, labels=4):
    rng = np.random.default_rng(seed)
    m1 = rng.choice([0, 1], size=(n, labels), p=[0.8, 0.2])
    m2 = rng.choice([0, 1, -1], size=(n, labels), p=[0.7, 0.2, 0.1])
    # mask some m1 entries too
    m1 = np.where(rng.uniform(size=m1.shape) < 0.05, -1, m1)
    return m1, m2


def test_misclassification_matches_reference_loop():
    for seed in range(3):
        m1, m2 = _random_label_matrices(seed)
        names = ["A", "B", "C", "D"]

        mask1 = (m1 == 1).sum(axis=1) <= 1
        mask2 = (m2 == 1).sum(axis=1) <= 1
        expected_12 = _reference_misclassification(
            m1[mask1], m2[mask1], "true", "pred", names
        )
        expected_21 = _reference_misclassification(
            m2[mask2], m1[mask2], "pred", "true", names
        )

        got = compute_misclassification_tables(m1, m2, "true", "pred", names)
        pd.testing.assert_frame_equal(got["true_pred"], expected_12)
        pd.testing.assert_frame_equal(got["pred_true"], expected_21)


def test_confusion_table():
    y_true = np.array(
        [[[1, 0], [0, MASK]], [[0, 1], [1, MASK]]], dtype=np.float32
    )  # (2, 2, 2)
    y_pred = np.array(
        [[[0.9, 0.2], [0.3, 0.99]], [[0.6, 0.8], [0.2, 0.99]]], dtype=np.float32
    )
    table = compute_confusion_table(y_true, y_pred, ["A", "B"])
    # label A: true [1,0,0,1], pred [1,0,1,0] -> tp=1 fp=1 fn=1 tn=1
    row = table.loc["A"]
    assert row["Total"] == 4
    assert row["TP"] == 0.25 and row["FP"] == 0.25
    assert row["PR"] == 0.5 and row["RE"] == 0.5
    # label B: masked positions dropped -> true [0,1], pred [0,1]
    row = table.loc["B"]
    assert row["Total"] == 2
    assert row["F1"] == 1.0


def test_test_model_covers_remainder_and_small_splits(tmp_path):
    """Evaluation must cover EVERY test snippet (the reference's
    model.predict drops nothing): a split smaller than one batch and a
    split with a remainder both produce full tables."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from orcai_tpu.io.dataset import ArrayDataset
    from orcai_tpu.models import build_model, init_variables
    from orcai_tpu.train.evaluate import _test_model_on_dataset
    from orcai_tpu.train.trainer import Trainer, make_optimizer
    from orcai_tpu.utils import Messenger

    param = {
        "name": "ev", "architecture": "ResNetLSTM", "calls": ["A", "B"],
        "seed": 1,
        "model": {"batch_size": 8, "filters": [2, 2], "kernel_size": 3,
                  "dropout_rate": 0.1, "lstm_units": 4, "learning_rate": 1e-3},
    }
    input_shape = (8, 12, 1)
    model = build_model(param)
    variables = init_variables(model, input_shape, seed=0)
    trainer = Trainer(model, make_optimizer(1e-3))
    state = (variables["params"], variables.get("batch_stats", {}), None, None)

    rng = np.random.default_rng(0)
    for n in [5, 13]:  # smaller than batch; with remainder
        x = rng.uniform(size=(n, *input_shape)).astype(np.float32)
        y = rng.integers(0, 2, (n, 2, 2)).astype(np.float32)
        ds = ArrayDataset(x, y)
        result = _test_model_on_dataset(
            trainer, state, ds, batch_size=8, seed=None,
            label_names=param["calls"], dataset_name=f"n{n}",
            msgr=Messenger(verbosity=0),
        )
        conf = result["confusion_table"]
        # every snippet contributed: the per-call Total counts cover the
        # full split (n snippets x output_steps cells per call), and the
        # TP/FN/FP/TN rates are well-defined
        assert list(conf["Total"]) == [n * 2] * 2
        assert not conf[["TP", "FN", "FP", "TN"]].isna().any().any()
        assert np.isfinite(result["data_metrics"]["MBA"])

        # the reported loss weights each batch by its VALID snippet count,
        # so (with no masked labels) it equals the global per-snippet mean
        # — computed here via one batch_size=16 padded batch, which holds
        # the whole split — regardless of how batching chops the split. A
        # padded 5-snippet tail must not weigh like a full batch.
        single = _test_model_on_dataset(
            trainer, state, ds, batch_size=16, seed=None,
            label_names=param["calls"], dataset_name=f"n{n}_single",
            msgr=Messenger(verbosity=0),
        )
        assert result["data_metrics"]["loss"] == pytest.approx(
            single["data_metrics"]["loss"], rel=1e-5
        )


def _tiny_eval_setup(n=13, batch_size=8, seed=0):
    from orcai_tpu.io.dataset import ArrayDataset
    from orcai_tpu.models import build_model, init_variables
    from orcai_tpu.train.trainer import Trainer, make_optimizer

    param = {
        "name": "ev2", "architecture": "ResNetLSTM", "calls": ["A", "B"],
        "seed": 1,
        "model": {"batch_size": batch_size, "filters": [2, 2],
                  "kernel_size": 3, "dropout_rate": 0.1, "lstm_units": 4,
                  "learning_rate": 1e-3},
    }
    input_shape = (8, 12, 1)
    model = build_model(param)
    variables = init_variables(model, input_shape, seed=0)
    trainer = Trainer(model, make_optimizer(1e-3))
    state = (variables["params"], variables.get("batch_stats", {}), None, None)
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, *input_shape)).astype(np.float32)
    y = rng.integers(0, 2, (n, 2, 2)).astype(np.float32)
    return param, trainer, state, ArrayDataset(x, y)


def test_device_resident_eval_matches_per_batch_loop():
    """The staged one-scan path (f32 upload) must reproduce the plain
    per-batch jitted loop EXACTLY: same seeded batch order, identical
    metrics, and byte-identical confusion/misclassification tables —
    restructuring the transfers must not move a single number."""
    import jax.numpy as jnp

    from orcai_tpu.train.evaluate import _test_model_on_dataset
    from orcai_tpu.utils import MASK_VALUE, Messenger

    param, trainer, state, ds = _tiny_eval_setup()
    seed = [3, 7]
    got = _test_model_on_dataset(
        trainer, state, ds, batch_size=8, seed=seed,
        label_names=param["calls"], dataset_name="staged",
        msgr=Messenger(verbosity=0), upload="f32",
    )

    # reference: the pre-round-5 per-batch loop, transcribed
    params, batch_stats = state[0], state[1]
    y_true_parts, y_pred_parts = [], []
    losses, correct, total, n_snippets = 0.0, 0.0, 0.0, 0
    for x, y in ds.batches(8, seed=seed, drop_remainder=False):
        k = len(x)
        if k < 8:
            pad = 8 - k
            x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
            y = np.concatenate(
                [y, np.full((pad, *y.shape[1:]), MASK_VALUE, y.dtype)]
            )
        metrics, probs = trainer.eval_step_probs(
            params, batch_stats, jnp.asarray(x), jnp.asarray(y)
        )
        metrics = np.asarray(metrics)
        losses += metrics[0] * k
        correct += metrics[1]
        total += metrics[2]
        n_snippets += k
        y_pred_parts.append(np.asarray(probs)[:k])
        y_true_parts.append(y[:k])
    ref_loss = float(losses / n_snippets)
    ref_mba = float(correct / max(total, 1.0))
    y_pred = np.concatenate(y_pred_parts)
    y_true = np.concatenate(y_true_parts)
    ref_conf = compute_confusion_table(y_true, y_pred, param["calls"])
    ref_tables = compute_misclassification_tables(
        np.vstack(y_true).astype(int),
        np.vstack((y_pred >= 0.5).astype(int)),
        "true", "pred", param["calls"],
    )

    assert got["data_metrics"]["loss"] == pytest.approx(ref_loss, abs=0.0)
    assert got["data_metrics"]["MBA"] == pytest.approx(ref_mba, abs=0.0)
    pd.testing.assert_frame_equal(
        got["confusion_table"], ref_conf, check_exact=True
    )
    for key in ref_tables:
        pd.testing.assert_frame_equal(
            got["misclassification_tables"][key], ref_tables[key],
            check_exact=True,
        )


def test_eval_slab_boundaries_change_nothing(monkeypatch):
    """Forcing the staged evaluation into multiple HBM slabs (tiny
    ORCAI_TPU_EVAL_SLAB_BYTES) must reproduce the single-slab run exactly
    — metrics and tables — including a ragged final batch landing in the
    last slab."""
    from orcai_tpu.train.evaluate import _test_model_on_dataset
    from orcai_tpu.utils import Messenger

    param, trainer, state, ds = _tiny_eval_setup(n=21)  # 3 batches of 8 - 3
    kw = dict(
        batch_size=8, seed=[9, 4], label_names=param["calls"],
        msgr=Messenger(verbosity=0), upload="f32",
    )
    monkeypatch.delenv("ORCAI_TPU_EVAL_SLAB_BYTES", raising=False)
    single = _test_model_on_dataset(trainer, state, ds, dataset_name="s", **kw)
    # one batch of 8 f32 snippets = 8*8*12*4 bytes -> one batch per slab
    monkeypatch.setenv("ORCAI_TPU_EVAL_SLAB_BYTES", "1")
    slabbed = _test_model_on_dataset(trainer, state, ds, dataset_name="m", **kw)
    assert slabbed["data_metrics"] == single["data_metrics"]
    pd.testing.assert_frame_equal(
        slabbed["confusion_table"], single["confusion_table"],
        check_exact=True,
    )
    for key, tbl in single["misclassification_tables"].items():
        pd.testing.assert_frame_equal(
            slabbed["misclassification_tables"][key], tbl, check_exact=True
        )


def test_eval_upload_quantization_close_and_policy(monkeypatch):
    """u8/u16 staged uploads agree with the exact evaluation at table
    level on [0, 1] spectrogram data, and the auto policy resolves to u8
    only on TPU backends."""
    from orcai_tpu.train.evaluate import (
        _test_model_on_dataset,
        quantize_eval_upload,
        resolve_eval_upload,
    )
    from orcai_tpu.utils import Messenger

    monkeypatch.delenv("ORCAI_TPU_EVAL_UPLOAD", raising=False)
    assert resolve_eval_upload(None, backend="tpu") == "u8"
    assert resolve_eval_upload(None, backend="cpu") == "f32"
    assert resolve_eval_upload("u16") == "u16"
    monkeypatch.setenv("ORCAI_TPU_EVAL_UPLOAD", "u16")
    assert resolve_eval_upload(None, backend="tpu") == "u16"
    monkeypatch.delenv("ORCAI_TPU_EVAL_UPLOAD", raising=False)
    with pytest.raises(ValueError):
        resolve_eval_upload("bogus")

    # quantizer: exact on the grid, <= half-step error off it
    g = np.linspace(0, 1, 256).astype(np.float32)
    q = quantize_eval_upload(g, "u8")
    assert q.dtype == np.uint8
    np.testing.assert_allclose(q / 255.0, g, atol=0.5 / 255)

    param, trainer, state, ds = _tiny_eval_setup(n=16)
    results = {
        u: _test_model_on_dataset(
            trainer, state, ds, batch_size=8, seed=[1, 2],
            label_names=param["calls"], dataset_name=u,
            msgr=Messenger(verbosity=0), upload=u,
        )
        for u in ("f32", "u16", "u8")
    }
    exact = results["f32"]
    for u in ("u16", "u8"):
        got = results[u]
        assert got["data_metrics"]["loss"] == pytest.approx(
            exact["data_metrics"]["loss"], abs=2e-3
        )
        np.testing.assert_allclose(
            got["confusion_table"][["TP", "FN", "FP", "TN"]].values,
            exact["confusion_table"][["TP", "FN", "FP", "TN"]].values,
            atol=0.02,
        )
