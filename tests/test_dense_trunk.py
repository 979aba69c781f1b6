"""Dense-trunk inference mode (ORCAI_TPU_DENSE_TRUNK=1, ops/overlap.py).

The opt-in mode runs the conv trunk once per slab of consecutive windows
(overlap-save with a receptive-field halo) instead of once per 50%-
overlapping window, then windows only the sequence head's inputs on the
trunk-step grid. Three claims pinned here:

1. trunk_only -> head_input composes to exactly the full model apply
   (the graph split itself changes nothing).
2. The slab-stitched dense path equals a MONOLITHIC dense trunk over the
   whole padded spectrogram — proving the halo size and the pool-grid
   alignment (stride-2 SAME stages stay shift-equivariant for slab
   starts on the downsample grid). Covers multi-slab chunks AND
   multi-chunk plans (chunk boundaries share the same global buffer, so
   no zero seams appear between chunks).
3. End to end, the golden wav's annotations stay in band (the mode's
   only semantic divergence from the windowed path is per-window zero
   padding vs real neighboring frames at window edges — measured, not
   assumed).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def loaded():
    import jax.numpy as jnp

    from orcai_tpu.io.model_store import load_orcai_model
    from orcai_tpu.resources import MODELS_DATA_DIR

    model, variables, orcai_parameter, shape = load_orcai_model(
        MODELS_DATA_DIR / "orcai-v1", dtype=jnp.float32
    )
    return model, variables, orcai_parameter, shape


def test_trunk_head_split_composes_exactly(loaded):
    import jax

    model, variables, _, shape = loaded
    rng = np.random.default_rng(3)
    x = rng.random((2, *shape["input_shape"]), np.float32)

    full = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, x)
    trunk = jax.jit(
        lambda v, x: model.apply(v, x, train=False, trunk_only=True)
    )(variables, x)
    composed = jax.jit(
        lambda v, h: model.apply(v, h, train=False, head_input=True)
    )(variables, trunk)
    np.testing.assert_array_equal(np.asarray(composed), np.asarray(full))


def _monolithic_dense_reference(model, variables, predictor, spec):
    """Overlap-add aggregation with ONE dense trunk over the whole padded
    spectrogram — the ground truth the slab-stitched mode must reproduce.
    Shares no slab/halo algebra with the implementation under test."""
    import jax
    import jax.numpy as jnp

    from orcai_tpu.ops.overlap import _next_pow2

    t, n_bins = spec.shape
    n_win, chunks, required, _ = predictor.plan(t)
    target = max(_next_pow2(required), t)
    h = predictor.halo
    padded = np.zeros((h + target + h, n_bins), np.float32)
    padded[h : h + t] = spec

    steps = jax.jit(
        lambda v, x: model.apply(v, x, train=False, trunk_only=True)
    )(variables, jnp.asarray(padded)[None, :, :, None])[0]
    steps = np.asarray(steps)[h // predictor.down :]

    head = jax.jit(
        lambda v, x: model.apply(v, x, train=False, head_input=True)
    )
    so, ol = predictor.shift_out, predictor.out_len
    n_out = t // predictor.down
    acc = None
    count = np.zeros(n_out, np.float32)
    for w in range(n_win):
        hi = jnp.asarray(steps[w * so : w * so + ol][None])
        pred = np.asarray(head(variables, hi))[0]
        if acc is None:
            acc = np.zeros((n_out, pred.shape[-1]), np.float32)
        rows = slice(w * so, w * so + ol)
        n_rows = min(n_out, w * so + ol) - w * so
        acc[rows] += pred[:n_rows]
        count[rows] += 1.0
    valid = count > 0
    acc[valid] /= count[valid, None]
    return acc, count


@pytest.mark.parametrize(
    "n_win,cap",
    [
        (8, 2048),  # single chunk, 2 slabs of 4
        (12, 8),    # two chunks (8 + ladder remainder 4): chunk-seam case
    ],
)
def test_dense_matches_monolithic_trunk(loaded, n_win, cap):
    from orcai_tpu.ops.overlap import WindowPredictor

    model, variables, orcai_parameter, shape = loaded
    predictor = WindowPredictor(
        model, variables,
        snippet_len=shape["input_shape"][0],
        n_filters=len(orcai_parameter["model"]["filters"]),
        batch_size=4,
        max_windows_per_chunk=cap,
        dense_trunk=True,
    )
    assert predictor.dense_trunk
    shift, snip = predictor.shift, predictor.snippet_len
    t = (n_win - 1) * shift + snip
    rng = np.random.default_rng(11)
    spec = rng.random((t, shape["input_shape"][1]), np.float32)

    agg, count = predictor.aggregate(spec)
    ref_agg, ref_count = _monolithic_dense_reference(
        model, variables, predictor, spec
    )
    np.testing.assert_array_equal(count, ref_count)
    np.testing.assert_allclose(agg, ref_agg, atol=2e-5, rtol=0)


def test_dense_golden_annotations_in_band(tmp_path, monkeypatch):
    """Full pipeline with ORCAI_TPU_DENSE_TRUNK=1 on the golden wav: every
    detection must match the golden TSV at annotation level (0.5 s
    boundary tolerance) — the mode's window-edge padding divergence may
    shift near-threshold boundaries but must not add or lose calls."""
    import pandas as pd

    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.resources import MODELS_DATA_DIR
    from orcai_tpu.utils import Messenger

    monkeypatch.setenv("ORCAI_TPU_DENSE_TRUNK", "1")
    out = tmp_path / "pred_dense.txt"
    predict(
        FIXTURES / "golden.wav",
        model_dir=MODELS_DATA_DIR / "orcai-v1",
        output_path=out,
        overwrite=True,
        msgr=Messenger(verbosity=0),
        verbosity=0,
        predict_batch_size=16,
    )
    got = pd.read_csv(out, sep="\t")
    exp = pd.read_csv(FIXTURES / "golden_expected.txt", sep="\t")

    def matched(row, table, tol=0.5):
        same = table[table["label"] == row["label"]]
        return bool(
            (
                (abs(same["start"] - row["start"]) <= tol)
                & (abs(same["stop"] - row["stop"]) <= tol)
            ).any()
        )

    missing = [r["label"] for _, r in exp.iterrows() if not matched(r, got)]
    extra = [r["label"] for _, r in got.iterrows() if not matched(r, exp)]
    assert not missing, f"dense mode lost golden detections: {missing}"
    assert not extra, f"dense mode invented detections: {extra}"


def test_chunk_fn_cache_keys_carry_variant(loaded):
    """The shared _chunk_fns cache must key on the body variant: the
    streaming predictor (and compute_floor_probe) insert WINDOWED bodies
    with dense=False keys, and a dense-trunk predictor must never alias
    them for an identical (spec_len, n_bins, wpc) shape tuple."""
    from orcai_tpu.ops.overlap import WindowPredictor

    model, variables, orcai_parameter, shape = loaded
    kwargs = dict(
        snippet_len=shape["input_shape"][0],
        n_filters=len(orcai_parameter["model"]["filters"]),
        batch_size=4,
        max_windows_per_chunk=8,
    )
    dense = WindowPredictor(model, variables, dense_trunk=True, **kwargs)
    rng = np.random.default_rng(0)
    spec = rng.random(
        (7 * dense.shift + dense.snippet_len, shape["input_shape"][1]),
        np.float32,
    )
    dense.aggregate(spec)
    assert dense._chunk_fns, "aggregate should have cached a chunk fn"
    assert all(k[-1] is True for k in dense._chunk_fns), (
        "dense-trunk entries must be keyed dense=True so windowed lookups "
        f"(streaming, floor probe) cannot alias them: {set(dense._chunk_fns)}"
    )

    windowed = WindowPredictor(model, variables, dense_trunk=False, **kwargs)
    windowed.aggregate(spec)
    assert all(k[-1] is False for k in windowed._chunk_fns)
