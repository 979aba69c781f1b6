"""Overlap-add window inference vs a direct numpy implementation of the
reference aggregation algorithm (predict.py:235-317)."""

import numpy as np
import jax
import jax.numpy as jnp

from orcai_tpu.models import build_model
from orcai_tpu.ops.overlap import WindowPredictor

PARAM = {
    "name": "tiny",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [4, 6, 8, 10],
        "kernel_size": 3,
        "dropout_rate": 0.5,
        "lstm_units": 8,
    },
    "calls": ["A", "B", "C"],
}
SNIPPET, NBINS, NFILT = 64, 21, 4


def _model_and_vars():
    model = build_model(PARAM)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SNIPPET, NBINS, 1)))
    return model, variables


def _reference_aggregate(spec, apply_fn):
    """Direct transcription of the reference's aggregation semantics."""
    shift = SNIPPET // 2
    down = 2**NFILT
    out_len = SNIPPET // down
    n_win = (spec.shape[0] - SNIPPET) // shift + 1
    snippets = np.stack([spec[i * shift : i * shift + SNIPPET] for i in range(n_win)])
    preds = apply_fn(snippets[..., None])  # (n_win, out_len, L)
    total = spec.shape[0] // down
    agg = np.zeros((total, preds.shape[-1]))
    cnt = np.zeros(total)
    for i, p in enumerate(preds):
        s = i * (shift // down)
        agg[s : s + out_len] += p
        cnt[s : s + out_len] += 1
    m = cnt > 0
    agg[m] /= cnt[m, None]
    return agg, cnt


def test_window_predictor_matches_reference_algorithm():
    model, variables = _model_and_vars()

    def apply_fn(x):
        return np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    rng = np.random.default_rng(0)
    # 319: n_win = 8 is an exact multiple of wpc AND the tail extends 31
    # frames past the last window, so n_out_total (19) exceeds the window
    # span's last output row (18) — the [:n_out_total] fetch reaches the
    # grid's final (trash) row, which must read as zero/uncovered
    for t in [SNIPPET, 200, 319, 513, 1024]:
        spec = rng.uniform(size=(t, NBINS)).astype(np.float32)
        wp = WindowPredictor(
            model, variables, snippet_len=SNIPPET, n_filters=NFILT,
            batch_size=4, max_windows_per_chunk=8,
        )
        agg, cnt = wp.aggregate(spec)
        exp_agg, exp_cnt = _reference_aggregate(spec, apply_fn)
        assert agg.shape == exp_agg.shape
        np.testing.assert_array_equal(cnt, exp_cnt)
        np.testing.assert_allclose(agg, exp_agg, atol=1e-5)

        binary = wp.binary_predictions(agg, cnt)
        exp_binary = (exp_agg > 0.5 / exp_cnt.max()).astype(np.int8)
        np.testing.assert_array_equal(binary, exp_binary)


def test_window_predictor_other_geometries():
    """The overlap-add grid matches the reference algorithm for snippet
    lengths and trunk depths beyond the shipped default — the whole domain
    the constructor's divisibility validation admits."""
    rng = np.random.default_rng(2)
    for snippet_len, filters in [
        (96, [4, 6, 8, 10]),  # longer snippet, default depth
        (64, [4, 6, 8]),  # 3 stages: down = 8
        (128, [2, 3, 4, 5, 6]),  # 5 stages: down = 32
    ]:
        nfilt = len(filters)
        param = {**PARAM, "model": {**PARAM["model"], "filters": filters}}
        model = build_model(param)
        variables = model.init(
            jax.random.key(1), jnp.zeros((1, snippet_len, NBINS, 1))
        )
        shift, down = snippet_len // 2, 2**nfilt
        out_len = snippet_len // down
        t = snippet_len * 3 + shift // 2 + 3  # ragged tail past last window
        spec = rng.uniform(size=(t, NBINS)).astype(np.float32)
        wp = WindowPredictor(
            model, variables, snippet_len=snippet_len, n_filters=nfilt,
            batch_size=4, max_windows_per_chunk=8,
        )
        agg, cnt = wp.aggregate(spec)

        def apply_fn(x):
            return np.asarray(model.apply(variables, jnp.asarray(x), train=False))

        n_win = (t - snippet_len) // shift + 1
        snippets = np.stack(
            [spec[i * shift : i * shift + snippet_len] for i in range(n_win)]
        )
        preds = apply_fn(snippets[..., None])
        total = t // down
        exp = np.zeros((total, preds.shape[-1]))
        c = np.zeros(total)
        for i, p in enumerate(preds):
            s = i * (shift // down)
            exp[s : s + out_len] += p
            c[s : s + out_len] += 1
        m = c > 0
        exp[m] /= c[m, None]
        assert agg.shape == exp.shape, (snippet_len, filters)
        np.testing.assert_array_equal(cnt, c)
        np.testing.assert_allclose(agg, exp, atol=1e-5)


def test_planned_spec_bytes_counts_repad_copy():
    """Wave budgeting must count the re-padded spectrogram copy
    aggregate_device creates when the chunk plan's power-of-two span
    exceeds the source buffer (recordings near a bucket top double)."""
    from orcai_tpu.ops.overlap import _next_pow2

    model, variables = _model_and_vars()
    wp = WindowPredictor(
        model, variables, snippet_len=SNIPPET, n_filters=NFILT,
        batch_size=4, max_windows_per_chunk=8,
    )

    for t in [SNIPPET, 200, 513, 1000, 1024]:
        n_win = (t - SNIPPET) // wp.shift + 1
        wpc = wp._plan_chunk_size(n_win)
        required = (-(-n_win // wpc) * wpc + 1) * wp.shift
        for src_len in [t, _next_pow2(t)]:
            # ground truth: what _ensure_device actually allocates for a
            # device-resident source of src_len frames
            spec_dev = jnp.zeros((src_len, NBINS), jnp.float32)
            out = wp._ensure_device(spec_dev, t, required, NBINS)
            extra = 0 if out is spec_dev else out.shape[0] * NBINS * 4
            assert wp.planned_spec_bytes(t, NBINS, src_len) == (
                src_len * NBINS * 4 + extra
            )


def test_window_predictor_sharded_matches_single_device():
    """Window-axis sharding over the virtual 8-device mesh reproduces the
    single-device outputs (and therefore the same TSV downstream)."""
    from orcai_tpu.parallel.mesh import make_mesh

    model, variables = _model_and_vars()
    mesh = make_mesh(n_data=len(jax.devices()))
    rng = np.random.default_rng(3)
    for t in [200, 1024]:
        spec = rng.uniform(size=(t, NBINS)).astype(np.float32)
        single = WindowPredictor(
            model, variables, snippet_len=SNIPPET, n_filters=NFILT,
            batch_size=4, max_windows_per_chunk=16,
        )
        sharded = WindowPredictor(
            model, variables, snippet_len=SNIPPET, n_filters=NFILT,
            batch_size=4, max_windows_per_chunk=16, mesh=mesh,
        )
        agg0, cnt0 = single.aggregate(spec)
        agg1, cnt1 = sharded.aggregate(spec)
        np.testing.assert_array_equal(cnt0, cnt1)
        np.testing.assert_allclose(agg1, agg0, atol=1e-6)
        np.testing.assert_array_equal(
            sharded.binary_predictions(agg1, cnt1),
            single.binary_predictions(agg0, cnt0),
        )


def test_too_short_raises():
    model, variables = _model_and_vars()
    wp = WindowPredictor(model, variables, snippet_len=SNIPPET, n_filters=NFILT)
    try:
        wp.aggregate(np.zeros((SNIPPET - 1, NBINS), np.float32))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_fused_fetch_matches_default(monkeypatch):
    """ORCAI_TPU_FUSED_FETCH=1 (single [agg || count] fetch) is bit-equal
    to the default two-fetch path on the same device buffers."""
    model, variables = _model_and_vars()
    wp = WindowPredictor(
        model, variables, snippet_len=SNIPPET, n_filters=NFILT, batch_size=4
    )
    spec = (
        np.random.default_rng(5)
        .uniform(size=(SNIPPET * 5 + 7, NBINS))
        .astype(np.float32)
    )
    agg_dev, count_dev, n_out = wp.aggregate_device(spec)
    monkeypatch.delenv("ORCAI_TPU_FUSED_FETCH", raising=False)
    a0, c0 = WindowPredictor.fetch_aggregated(agg_dev, count_dev, n_out)
    monkeypatch.setenv("ORCAI_TPU_FUSED_FETCH", "1")
    a1, c1 = WindowPredictor.fetch_aggregated(agg_dev, count_dev, n_out)
    np.testing.assert_array_equal(c1, c0)
    np.testing.assert_array_equal(a1, a0)


def test_indivisible_snippet_len_raises():
    """An odd (or non-2*2**n_filters-divisible) snippet length would
    silently window (snippet_len - 1)-frame strides; it must refuse loudly
    at construction instead."""
    import pytest

    model, variables = _model_and_vars()
    for bad in (SNIPPET - 1, SNIPPET + 2**NFILT):
        with pytest.raises(ValueError, match="divisible"):
            WindowPredictor(
                model, variables, snippet_len=bad, n_filters=NFILT
            )


def test_window_predictor_mixed_chunk_sizes():
    """Beyond max_windows_per_chunk the plan runs full cap-size chunks plus
    one smaller ladder-planned remainder chunk (two DIFFERENT compiled wpc
    values in one recording); outputs must still match the reference
    algorithm exactly."""
    model, variables = _model_and_vars()
    wp = WindowPredictor(
        model, variables, snippet_len=SNIPPET, n_filters=NFILT,
        batch_size=4, max_windows_per_chunk=16,
    )
    t = SNIPPET + 16 * (SNIPPET // 2)  # n_win = 17: chunks ((16,1),(4,1))
    n_win, chunks, _, _ = wp.plan(t)
    assert n_win == 17 and chunks == ((16, 1), (4, 1))

    rng = np.random.default_rng(7)
    spec = rng.uniform(size=(t, NBINS)).astype(np.float32)

    def apply_fn(x):
        return np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    agg, cnt = wp.aggregate(spec)
    exp_agg, exp_cnt = _reference_aggregate(spec, apply_fn)
    np.testing.assert_array_equal(cnt, exp_cnt)
    np.testing.assert_allclose(agg, exp_agg, atol=1e-5)
