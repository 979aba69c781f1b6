"""The compute-floor probe's fused single-program pass computes EXACTLY
what the staged (production-structure) pass computes.

The fused pass (tools/compute_floor_probe.build_fused_pass) inlines the
tile DFT bodies, the finalize fn and the window-chunk fns into one jitted
program — jit-of-jit tracing, so equivalence should hold by construction;
these tests pin it across the structural branches: multiple real tiles,
all-padding zero tiles, a multi-chunk window plan (full cap chunks + a
ladder remainder), the spec re-pad branch (plan span exceeding the frame
bucket), and a bfp-coded wire (device decode inside the fused graph).

The tile size is shrunk via monkeypatching so the shapes stay CPU-sized;
every code path is parameterized by it (frontend._tile_plan).
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bundled():
    import jax.numpy as jnp

    from orcai_tpu.tools.bench_common import load_bench_predictor

    model_dir, orcai_parameter, shape, _ = load_bench_predictor()
    # small-batch predictor with a small chunk cap so a CPU-sized recording
    # exercises full-cap chunks plus a ladder remainder
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.io.model_store import load_orcai_model

    model, variables, _, _ = load_orcai_model(model_dir, dtype=jnp.float32)
    predictor = WindowPredictor(
        model, variables,
        snippet_len=shape["input_shape"][0],
        n_filters=len(orcai_parameter["model"]["filters"]),
        batch_size=16,
        max_windows_per_chunk=32,
    )
    return orcai_parameter, predictor


def _audio_for_frames(n_frames: int, hop: int, sr: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    n = (n_frames - 1) * hop
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _run_both(orcai_parameter, predictor, n_frames, wire, monkeypatch):
    from orcai_tpu.ops import frontend as fe
    from orcai_tpu.tools.compute_floor_probe import (
        build_fused_pass,
        prepare_state,
        staged_pass,
    )

    monkeypatch.setattr(fe, "_TILE_FRAMES", 2048)
    sp = orcai_parameter["spectrogram"]
    audio = _audio_for_frames(n_frames, sp["n_overlap"], sp["sampling_rate"])
    st = prepare_state(audio, orcai_parameter, predictor, wire=wire)
    agg_s, count_s = staged_pass(st)
    agg_f, count_f = build_fused_pass(st)()
    return st, (agg_s, count_s), (agg_f, count_f)


def test_fused_equals_staged_zero_tiles_multichunk(bundled, monkeypatch):
    """19600 frames @ tile 2048: 10 real + 6 zero tiles; 64 planned windows
    = one full 32-window cap chunk + one 32-window remainder chunk."""
    orcai_parameter, predictor = bundled
    st, (agg_s, count_s), (agg_f, count_f) = _run_both(
        orcai_parameter, predictor, 19600, "exact", monkeypatch
    )
    assert st.n_real < st.n_tiles  # zero-tile branch exercised
    assert len(predictor.plan(st.n_frames)[1]) == 2  # cap + remainder
    np.testing.assert_array_equal(count_f, count_s)
    np.testing.assert_allclose(agg_f, agg_s, atol=1e-6, rtol=0)


def test_fused_equals_staged_pad_branch_bfp_wire(bundled, monkeypatch):
    """32000 frames: the 96-window plan spans 35696 frames > the 32768
    bucket, forcing the fused graph's spec re-pad branch; bfp5 wire puts
    the block-float decode inside the fused program."""
    orcai_parameter, predictor = bundled
    st, (agg_s, count_s), (agg_f, count_f) = _run_both(
        orcai_parameter, predictor, 32000, "bfp5", monkeypatch
    )
    from orcai_tpu.ops.overlap import _next_pow2

    required = predictor.plan(st.n_frames)[2]
    assert _next_pow2(required) > st.n_tiles * st.tile  # pad branch
    assert st.chunks[0].dtype == np.uint8  # coded wire staged resident
    np.testing.assert_array_equal(count_f, count_s)
    np.testing.assert_allclose(agg_f, agg_s, atol=1e-6, rtol=0)
