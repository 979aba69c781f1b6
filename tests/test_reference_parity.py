"""Parity against the ACTUAL reference implementation (not transcriptions).

These tests import the upstream orcAI package from /root/reference/src and
use it strictly as a numerical oracle: the reference's own Keras graph
builders (architectures.py:18-241), masked loss/metrics
(architectures.py:244-304), and run-length decoder (auxiliary.py:420-440)
are executed and their outputs compared against this package's flax/jax
equivalents. Everything is skipped when the reference checkout or
keras/tensorflow are unavailable, so the suite stays self-contained
elsewhere.

The reference's librosa-based audio loading cannot run here (librosa is not
installed and the environment has no package egress); resampler parity is
covered separately in test_resample_parity.py against a scipy oracle.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
keras = pytest.importorskip("keras")
tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

REFERENCE_SRC = Path("/root/reference/src")

if not (REFERENCE_SRC / "orcAI").is_dir():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

if str(REFERENCE_SRC) not in sys.path:
    sys.path.insert(0, str(REFERENCE_SRC))

ref_arch = pytest.importorskip("orcAI.architectures")
ref_aux = pytest.importorskip("orcAI.auxiliary")

from orcai_tpu.io.keras_convert import keras_to_flax_variables  # noqa: E402
from orcai_tpu.models import build_model  # noqa: E402
from orcai_tpu.ops.losses import (  # noqa: E402
    masked_auc_roc,
    masked_bce_from_probs,
    masked_binary_accuracy,
)
from orcai_tpu.utils import rle, seeds  # noqa: E402

SMALL_PARAM = {
    "name": "tiny-ref",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [4, 6, 8, 10],
        "kernel_size": 3,
        "dropout_rate": 0.5,
        "lstm_units": 16,
    },
    "calls": ["A", "B", "C"],
}
INPUT_SHAPE = (64, 21, 1)


def _rand_batch(batch=2, shape=INPUT_SHAPE, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(batch, *shape)).astype(np.float32)


def _masked_labels(shape, seed=0, mask_frac=0.25):
    """Random 0/1 labels with a fraction of positions set to MASK_VALUE."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=shape).astype(np.float32)
    mask = rng.uniform(size=shape) < mask_frac
    y[mask] = ref_aux.MASK_VALUE
    return y


# -- model graphs -----------------------------------------------------------


def test_reference_lstm_forward_parity():
    """Weights from the reference's own res_net_LSTM_arch graph, loaded into
    our flax ResNetLSTM, produce the same inference output."""
    keras.utils.set_random_seed(42)
    ref_model = ref_arch.res_net_LSTM_arch(
        INPUT_SHAPE, len(SMALL_PARAM["calls"]), **SMALL_PARAM["model"]
    )
    x = _rand_batch(seed=1)
    y_ref = ref_model.predict(x, verbose=0)

    variables = keras_to_flax_variables(ref_model, SMALL_PARAM)
    y_ours = build_model(SMALL_PARAM).apply(variables, jnp.asarray(x), train=False)

    assert y_ref.shape == y_ours.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, atol=2e-5)


def test_reference_1dconv_forward_parity():
    param = dict(SMALL_PARAM, architecture="ResNet1DConv")
    keras.utils.set_random_seed(7)
    ref_model = ref_arch.res_net_1Dconv_arch(
        INPUT_SHAPE, len(param["calls"]), **param["model"]
    )
    x = _rand_batch(seed=2)
    y_ref = ref_model.predict(x, verbose=0)

    variables = keras_to_flax_variables(ref_model, param)
    y_ours = build_model(param).apply(variables, jnp.asarray(x), train=False)

    assert y_ref.shape == y_ours.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, atol=2e-5)


def test_reference_build_model_dispatch_and_param_count():
    """build_model dispatch matches: same architectures exposed, and the
    parameter counts of the built models agree exactly."""
    assert set(ref_arch.ORCAI_ARCHITECTURES_FN) == {"ResNetLSTM", "ResNet1DConv"}

    for arch in ref_arch.ORCAI_ARCHITECTURES_FN:
        param = dict(SMALL_PARAM, architecture=arch)
        keras.utils.set_random_seed(0)
        ref_model = ref_arch.build_model(
            INPUT_SHAPE, {**param, "model": dict(param["model"])}
        )
        n_ref = int(
            sum(np.prod(w.shape) for w in ref_model.weights if w.trainable)
        )
        ours = build_model(param)
        variables = ours.init(jax.random.key(0), jnp.zeros((1, *INPUT_SHAPE)))
        n_ours = int(
            sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        )
        assert n_ours == n_ref, f"{arch}: {n_ours} != {n_ref}"


# -- losses / metrics ---------------------------------------------------------


def test_masked_bce_parity():
    shape = (4, 8, 5)
    y_true = _masked_labels(shape, seed=3)
    probs = np.random.default_rng(4).uniform(0.01, 0.99, size=shape).astype(
        np.float32
    )

    ref_loss = float(
        ref_arch.MaskedBinaryCrossentropy()(
            tf.constant(y_true), tf.constant(probs)
        )
    )
    our_loss = float(masked_bce_from_probs(jnp.asarray(probs), jnp.asarray(y_true)))
    assert our_loss == pytest.approx(ref_loss, rel=1e-5)


def test_masked_binary_accuracy_parity():
    shape = (4, 8, 5)
    y_true = _masked_labels(shape, seed=5)
    probs = np.random.default_rng(6).uniform(0.0, 1.0, size=shape).astype(np.float32)

    metric = ref_arch.MaskedBinaryAccuracy()
    metric.update_state(tf.constant(y_true), tf.constant(probs))
    ref_acc = float(metric.result())
    our_acc = float(
        masked_binary_accuracy(jnp.asarray(probs), jnp.asarray(y_true))
    )
    assert our_acc == pytest.approx(ref_acc, rel=1e-6)


def test_masked_auc_parity():
    shape = (16, 8, 5)
    rng = np.random.default_rng(7)
    y_true = _masked_labels(shape, seed=8)
    # correlated probabilities so the AUC is informative, not ~0.5
    noise = rng.normal(scale=0.35, size=shape)
    probs = np.clip(np.where(y_true == 1.0, 0.7, 0.3) + noise, 0.0, 1.0).astype(
        np.float32
    )

    metric = ref_arch.MaskedAUC()
    metric.update_state(tf.constant(y_true), tf.constant(probs))
    ref_auc = float(metric.result())
    our_auc = float(masked_auc_roc(jnp.asarray(probs), jnp.asarray(y_true)))
    # both are threshold-bucketed approximations (200 thresholds); they use
    # different interpolation so exact equality is not expected
    assert our_auc == pytest.approx(ref_auc, abs=0.01)


# -- auxiliary ----------------------------------------------------------------


def test_find_consecutive_ones_parity():
    rng = np.random.default_rng(9)
    for n in (1, 2, 17, 500):
        for p in (0.1, 0.5, 0.9):
            v = (rng.uniform(size=n) < p).astype(np.int64)
            ref_starts, ref_stops = ref_aux.find_consecutive_ones(v)
            our_starts, our_stops = rle.find_consecutive_ones(v)
            np.testing.assert_array_equal(our_starts, ref_starts)
            np.testing.assert_array_equal(our_stops, ref_stops)
    for edge in ([0], [1], [1, 1, 1], [0, 0], [1, 0, 1]):
        v = np.asarray(edge)
        np.testing.assert_array_equal(
            np.stack(rle.find_consecutive_ones(v)),
            np.stack(ref_aux.find_consecutive_ones(v)),
        )


def test_seed_registry_parity():
    assert seeds.SEED_ID_MAKE_SNIPPET_TABLE == ref_aux.SEED_ID_MAKE_SNIPPET_TABLE
    assert seeds.SEED_ID_FILTER_SNIPPET_TABLE == ref_aux.SEED_ID_FILTER_SNIPPET_TABLE
    assert seeds.SEED_ID_CREATE_DATALOADER == ref_aux.SEED_ID_CREATE_DATALOADER
    assert seeds.SEED_ID_LOAD_TRAIN_DATA == ref_aux.SEED_ID_LOAD_TRAIN_DATA
    assert seeds.SEED_ID_LOAD_VAL_DATA == ref_aux.SEED_ID_LOAD_VAL_DATA
    assert seeds.SEED_ID_LOAD_TEST_DATA == ref_aux.SEED_ID_LOAD_TEST_DATA
    assert seeds.MASK_VALUE == ref_aux.MASK_VALUE


def test_filter_filepaths_parity():
    paths = [f"/rec/{tag}_{i}.wav" for i in range(4) for tag in ("keep", "drop")]
    ours = rle.filter_filepaths(list(paths), ["drop", "_3"])
    theirs = ref_aux.filter_filepaths(
        list(paths), ["drop", "_3"], msgr=ref_aux.Messenger(verbosity=0)
    )
    assert ours == theirs


# -- spectrogram post-processing ----------------------------------------------


def _import_reference_spectrogram():
    """Import orcAI.spectrogram with its unavailable deps stubbed.

    The module imports librosa and (via orcAI.io) zarr at module scope, but
    preprocess_spectrogram itself is pure numpy — stub the missing modules
    just enough for the import so the real function can serve as the oracle.
    """
    import types

    stubbed = []
    for name, attrs in {
        "librosa": ["amplitude_to_db", "fft_frequencies", "frames_to_time",
                    "load", "stft"],
        "zarr": ["open", "save_array"],
    }.items():
        if name not in sys.modules:
            try:
                __import__(name)
                continue
            except ImportError:
                pass
            stub = types.ModuleType(name)
            for attr in attrs:
                setattr(stub, attr, None)
            sys.modules[name] = stub
            stubbed.append(name)
    try:
        import orcAI.spectrogram as ref_spec
    finally:
        # the imported module keeps its own references; drop the stubs so
        # later importorskip("zarr") etc. in other test modules see reality
        for name in stubbed:
            sys.modules.pop(name, None)

    return ref_spec


def test_preprocess_spectrogram_parity():
    """Our frontend's freq-slice + percentile-clip + normalize chain matches
    the reference's preprocess_spectrogram (spectrogram.py:58-87) exactly."""
    ref_spec = _import_reference_spectrogram()

    from orcai_tpu.ops.frontend import preprocess_db_spectrogram_numpy

    rng = np.random.default_rng(11)
    sr, nfft = 48000, 512
    spec_db = rng.uniform(-80.0, 0.0, size=(nfft // 2 + 1, 300))
    frequencies = np.fft.rfftfreq(nfft, d=1.0 / sr)
    parameter = {
        "sampling_rate": sr,
        "nfft": nfft,
        "n_overlap": 256,
        "freq_range": [400, 10000],
        "quantiles": [0.02, 0.99],
    }

    expected = ref_spec.preprocess_spectrogram(
        spec_db.copy(), frequencies, parameter
    )
    got = preprocess_db_spectrogram_numpy(spec_db.copy(), frequencies, parameter)
    np.testing.assert_allclose(got, expected, atol=1e-12)


# -- evaluation tables --------------------------------------------------------


def _import_reference_module(name):
    """Import an orcAI module whose unavailable deps are stubbed (zarr,
    librosa); the functions under test are pure numpy/pandas."""
    import types

    stubbed = []
    for mod, attrs in {
        "zarr": ["open", "save_array"],
        "librosa": ["amplitude_to_db", "fft_frequencies", "frames_to_time",
                    "load", "stft"],
    }.items():
        if mod not in sys.modules:
            try:
                __import__(mod)
                continue
            except ImportError:
                pass
            stub = types.ModuleType(mod)
            for attr in attrs:
                setattr(stub, attr, None)
            sys.modules[mod] = stub
            stubbed.append(mod)
    try:
        return __import__(f"orcAI.{name}", fromlist=[name])
    finally:
        for mod in stubbed:
            sys.modules.pop(mod, None)


def test_confusion_table_parity():
    """Our vectorized confusion table equals the reference's per-call loop."""
    ref_test = _import_reference_module("test")
    from orcai_tpu.train.evaluate import compute_confusion_table

    rng = np.random.default_rng(13)
    names = ["A", "B", "C"]
    y_true = rng.integers(0, 2, size=(8, 6, 3)).astype(np.float32)
    # sprinkle masked positions
    y_true[rng.uniform(size=y_true.shape) < 0.2] = ref_aux.MASK_VALUE
    y_pred = rng.uniform(size=(8, 6, 3)).astype(np.float32)

    ours = compute_confusion_table(y_true, y_pred, names)
    theirs = ref_test.compute_confusion_table(y_true, y_pred, names)
    # align container details; the numbers must match exactly
    import pandas as pd

    pd.testing.assert_frame_equal(
        ours.reset_index(drop=True).astype(float),
        theirs.reset_index(drop=True)[ours.columns].astype(float),
        check_dtype=False,
    )


def test_misclassification_tables_parity():
    ref_test = _import_reference_module("test")
    from orcai_tpu.train.evaluate import compute_misclassification_tables

    rng = np.random.default_rng(14)
    names = ["A", "B", "C", "D"]
    m_true = rng.integers(0, 2, size=(200, 4)).astype(float)
    m_true[rng.uniform(size=m_true.shape) < 0.15] = ref_aux.MASK_VALUE
    m_pred = rng.integers(0, 2, size=(200, 4)).astype(float)

    ours = compute_misclassification_tables(m_pred, m_true, "pred", "true", names)
    theirs = ref_test.compute_misclassification_tables(
        m_pred, m_true, "pred", "true", names
    )
    import pandas as pd

    assert set(ours) == set(theirs)
    for key in ours:
        pd.testing.assert_frame_equal(
            ours[key].astype(float), theirs[key].astype(float),
            check_dtype=False, atol=1e-12,
        )


# -- prediction aggregation ---------------------------------------------------


def test_aggregated_predictions_parity():
    """Device overlap-add aggregation + thresholding + label table vs the
    reference's host implementation, through the SAME model weights."""
    from pathlib import Path as _P

    import jax.numpy as jnp
    import pandas as pd

    from orcai_tpu.io.keras_convert import keras_to_flax_variables
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.pipeline.predict import compute_labels
    from orcai_tpu.utils.rle import runs_from_binary_matrix

    ref_predict = _import_reference_module("predict")

    keras.utils.set_random_seed(77)
    kmodel = ref_arch.res_net_LSTM_arch(
        INPUT_SHAPE, len(SMALL_PARAM["calls"]), **SMALL_PARAM["model"]
    )
    variables = keras_to_flax_variables(kmodel, SMALL_PARAM)
    flax_model = build_model(SMALL_PARAM)

    rng = np.random.default_rng(15)
    spec = rng.uniform(size=(200, 21)).astype(np.float32)
    shape = {"input_shape": list(INPUT_SHAPE), "num_labels": 3}
    param = {"model": {"filters": SMALL_PARAM["model"]["filters"]},
             "calls": SMALL_PARAM["calls"]}

    agg_ref, cnt_ref = ref_predict.compute_aggregated_predictions(
        _P("synthetic.wav"), spec, kmodel, param, shape,
        msgr=ref_aux.Messenger(verbosity=0),
    )

    predictor = WindowPredictor(
        flax_model, variables,
        snippet_len=INPUT_SHAPE[0],
        n_filters=len(SMALL_PARAM["model"]["filters"]),
        batch_size=2,
    )
    agg_ours, cnt_ours = predictor.aggregate(jnp.asarray(spec))

    np.testing.assert_array_equal(cnt_ours, cnt_ref)
    np.testing.assert_allclose(agg_ours, agg_ref, atol=3e-5)

    starts_r, stops_r, names_r = ref_predict.compute_binary_predictions(
        agg_ref, cnt_ref, SMALL_PARAM["calls"]
    )
    binary = predictor.binary_predictions(agg_ours, cnt_ours, threshold=0.5)
    starts_o, stops_o, names_o = runs_from_binary_matrix(
        binary, SMALL_PARAM["calls"]
    )
    down = 2 ** len(SMALL_PARAM["model"]["filters"])
    table_r = ref_predict.compute_labels(starts_r, stops_r, names_r, down, "*")
    table_o = compute_labels(starts_o, stops_o, names_o, down, "*")
    pd.testing.assert_frame_equal(table_o, table_r, check_dtype=False)


def test_filter_snippet_table_parity():
    """Same seeded RNG -> bit-identical thinning of label-free snippets."""
    import pandas as pd

    from orcai_tpu.pipeline.snippets import filter_snippet_table
    from orcai_tpu.utils import Messenger

    ref_snip = _import_reference_module("snippets")

    rng = np.random.default_rng(21)
    calls = ["A", "B"]
    n = 300
    table = pd.DataFrame(
        {
            "recording": ["r"] * n,
            "data_type": rng.choice(["train", "val", "test"], n),
            "row_start": np.arange(n) * 10,
            "row_stop": np.arange(n) * 10 + 8,
            "A": np.where(rng.uniform(size=n) < 0.3, 1.5, 0.0),
            "B": np.where(rng.uniform(size=n) < 0.2, 0.7, 0.0),
        }
    )
    param = {"calls": calls, "snippets": {"fraction_removal": 0.9}}

    ours = filter_snippet_table(
        table.copy(), param, rng=np.random.default_rng([2, 123]),
        msgr=Messenger(verbosity=0),
    )
    theirs = ref_snip._filter_snippet_table(
        table.copy(), param, rng=np.random.default_rng([2, 123]),
        msgr=ref_aux.Messenger(verbosity=0),
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(ours, theirs)


def test_get_call_weights_parity():
    """Weight math identical across methods, reference fed via tf.data."""
    from orcai_tpu.pipeline.snippets import get_call_weights

    ref_snip = _import_reference_module("snippets")

    rng = np.random.default_rng(22)
    names = ["A", "B", "C"]
    ys = [
        np.where(rng.uniform(size=(6, 3)) < 0.3, 1.0, 0.0).astype(np.float32)
        for _ in range(10)
    ]
    xs = [np.zeros((4, 2, 1), np.float32) for _ in ys]

    class Loader:
        def __len__(self):
            return len(ys)

        def __iter__(self):
            return iter(zip(xs, ys))

    dataset = tf.data.Dataset.from_tensor_slices(
        (np.stack(xs), np.stack(ys))
    )
    for method in ("balanced", "max", "uniform"):
        ours = get_call_weights(Loader(), names, method=method)
        theirs = ref_snip._get_call_weights(dataset, len(ys), names, method)
        if method == "uniform":
            theirs = dict(zip(names, theirs))  # ref returns an array here
        assert set(ours) == set(theirs)
        for k in names:
            assert ours[k] == pytest.approx(float(theirs[k]), rel=1e-6)


def test_default_config_assets_parity():
    """The bundled default JSONs carry the reference's schema: same keys
    recursively (values may differ only where documented, e.g. seed)."""
    import json

    ref_defaults = REFERENCE_SRC / "orcAI" / "defaults"
    from orcai_tpu.resources import (
        DEFAULT_CALL_DURATION_LIMITS,
        DEFAULT_HPS_PARAMETER,
        DEFAULT_ORCAI_PARAMETER,
    )

    def key_tree(obj):
        if isinstance(obj, dict):
            return {k: key_tree(v) for k, v in obj.items()}
        return None

    pairs = [
        (DEFAULT_ORCAI_PARAMETER, ref_defaults / "default_orcai_parameter.json"),
        (DEFAULT_HPS_PARAMETER, ref_defaults / "default_hps_parameter.json"),
        (DEFAULT_CALL_DURATION_LIMITS,
         ref_defaults / "default_call_duration_limits.json"),
    ]
    for ours_path, ref_path in pairs:
        ours = json.loads(Path(ours_path).read_text())
        theirs = json.loads(ref_path.read_text())
        assert key_tree(ours) == key_tree(theirs), ours_path
