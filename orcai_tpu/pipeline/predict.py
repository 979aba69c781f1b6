"""Prediction pipeline: wav recording(s) -> Audacity-format label files.

Pipeline-level equivalent of reference predict.py:14-757, with the compute
path (spectrogram frontend, window inference, overlap-add, thresholding)
running on device (orcai_tpu.ops.frontend / orcai_tpu.ops.overlap) and only
run-length extraction + table output on host. Output contracts preserved:
`<stem>_c<channel>_<model>_predicted.txt` TSV (start/stop seconds, label with
suffix, rounded to 4 decimals), optional `*_probabilities.csv.gz`, duration
filtering against call_duration_limits JSON.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from orcai_tpu.io import read_json
from orcai_tpu.io.model_store import load_orcai_model
from orcai_tpu.ops.overlap import WindowPredictor
from orcai_tpu.utils import Messenger
from orcai_tpu.utils.rle import runs_from_binary_matrix

from orcai_tpu.resources import (
    DEFAULT_CALL_DURATION_LIMITS as DEFAULT_DURATION_LIMITS,
)


# ---------------------------------------------------------------- filtering


def _duration_bounds(label: str, limits: dict) -> tuple[float, float]:
    if label in limits:
        lo, hi = limits[label]
    elif "default" in limits:
        lo, hi = limits["default"]
    else:
        lo, hi = None, None
    return (0.0 if lo is None else lo), (np.inf if hi is None else hi)


def filter_predictions(
    predicted_labels: pd.DataFrame,
    delta_t: float,
    call_duration_limits: dict | Path | str = DEFAULT_DURATION_LIMITS,
    label_suffix: str = "*",
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> pd.DataFrame:
    """Drop predictions outside their per-call duration limits.

    Matches reference filter_predictions (predict.py:69-159): limits are
    keyed by label with the prediction suffix stripped, falling back to a
    "default" entry; durations compared in seconds (duration * delta_t).
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Filtering predictions")
    msgr.part("Filtering predictions")

    if isinstance(call_duration_limits, (Path, str)):
        call_duration_limits = read_json(call_duration_limits)

    df = predicted_labels.copy()
    df["duration"] = df["stop"] - df["start"]

    msgr.part("Filtering calls based on duration")
    labels_stripped = df["label"].str.replace(label_suffix, "", regex=False)
    bounds = labels_stripped.map(
        lambda lab: _duration_bounds(lab, call_duration_limits)
    )
    lo = bounds.map(lambda b: b[0]).astype(float)
    hi = bounds.map(lambda b: b[1]).astype(float)
    dur_s = df["duration"] * delta_t
    status = np.where(dur_s < lo, "too short", np.where(dur_s > hi, "too long", "keep"))
    df["duration_ok"] = status

    n_short = int((status == "too short").sum())
    n_long = int((status == "too long").sum())
    msgr.info(
        f"Discarding {n_short + n_long} calls based on duration "
        f"(too short: {n_short}, too long: {n_long})"
    )
    kept = df[df["duration_ok"] == "keep"]
    msgr.success("Filtering predictions finished.")
    return kept


def filter_predictions_file(
    predicted_labels: Path | str,
    output_file: Path | str = "default",
    overwrite: bool = False,
    call_duration_limits: dict | Path | str = DEFAULT_DURATION_LIMITS,
    label_suffix: str = "*",
    verbosity: int = 2,
    msgr: Messenger | None = None,
) -> None:
    """Re-filter an existing predictions TSV (already in seconds: delta_t=1)."""
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Filtering predictions")
    if output_file == "default":
        filename = Path(predicted_labels).stem + "_filtered.txt"
        output_file = Path(predicted_labels).with_name(filename)
    else:
        output_file = Path(output_file)
    msgr.info(f"Output file: {output_file}")
    if output_file.exists() and not overwrite:
        raise FileExistsError(f"Annotation file already exists: {output_file}")

    df = pd.read_csv(predicted_labels, sep="\t", encoding="utf-8")
    kept = filter_predictions(
        df,
        delta_t=1,
        call_duration_limits=call_duration_limits,
        label_suffix=label_suffix,
        verbosity=verbosity,
        msgr=msgr,
    )
    save_predictions(kept, output_file, delta_t=1, msgr=msgr)


# ---------------------------------------------------------------- decoding


def compute_labels(
    row_starts,
    row_stops,
    label_names,
    time_steps_per_output_step: int,
    label_suffix: str | None,
) -> pd.DataFrame:
    """Output-step run indices -> sorted label table in spectrogram steps."""
    if label_suffix:
        label_names = [name + label_suffix for name in label_names]
    return (
        pd.DataFrame(
            {
                "start": np.asarray(row_starts, dtype=np.int64)
                * time_steps_per_output_step,
                "stop": np.asarray(row_stops, dtype=np.int64)
                * time_steps_per_output_step,
                "label": label_names,
            }
        )
        .sort_values(by=["start", "stop", "label"])
        .reset_index(drop=True)
    )


def _is_streaming_recording(n_samples: int, sp: dict, shape: dict) -> bool:
    """Whether a recording exceeds the spectrogram HBM budget (two-pass
    streaming path, ops/streaming.py: bounded device memory, same outputs)."""
    import os

    n_frames_est = 1 + n_samples // sp["n_overlap"]
    n_bins_est = shape["input_shape"][1]
    spec_budget = int(
        os.environ.get("ORCAI_TPU_STREAM_SPEC_BYTES", 4_000_000_000)
    )
    return 2 * n_frames_est * n_bins_est * 4 > spec_budget


def _dispatch_wav(
    recording_path: Path | str,
    channel: int,
    predictor: WindowPredictor,
    orcai_parameter: dict,
    shape: dict,
    msgr: Messenger | None = None,
    progressbar: tqdm | None = None,
    wire: str | None = None,
    on_estimate=None,
) -> dict:
    """Upload + dispatch the full device graph for one wav, WITHOUT fetching.

    `on_estimate(est_bytes)` fires after the host read but BEFORE any device
    work, with this recording's device-resident estimate — the batch wave
    uses it to flush pending fetches first so peak HBM stays at the wave
    budget instead of budget + one recording.

    Returns a dispatch record to pass to _finish_wav. For in-memory
    recordings no device->host transfer happens here, so a batch can
    dispatch a whole wave of recordings and pay only one sync round trip
    per recording at fetch time (on remote backends every fetch drains the
    dispatch queue; see ops/overlap.py and tools/tunnel_probe.py).
    Beyond-HBM recordings run the two-pass streaming path immediately
    (it is internally fetch-bound by design).
    """
    if msgr is None:
        msgr = Messenger(verbosity=0)
    recording_path = Path(recording_path)

    if progressbar:
        progressbar.set_description(f"{recording_path.stem}: Generating spectrogram")
        progressbar.refresh()

    # fused device path: audio (int16 when possible) is the only upload; the
    # spectrogram never crosses back to host (reference recomputes it in host
    # numpy and ships every window through model.predict, predict.py:235-268)
    from orcai_tpu.io.wav import load_wav_for_frontend
    from orcai_tpu.ops.frontend import (
        _bucket_frames,
        make_spectrogram_from_params_device,
    )

    sp = orcai_parameter["spectrogram"]
    audio, multichannel = load_wav_for_frontend(
        recording_path, sr=sp["sampling_rate"], channel=channel
    )
    if multichannel:
        msgr.warning(f"Multiple channels found, using channel {channel}")
    delta_t = sp["n_overlap"] / sp["sampling_rate"]  # hop / sr

    msgr.part(f"Prediction of annotations for wav_file: {recording_path.stem}")
    if progressbar:
        progressbar.set_description(f"{recording_path.stem} - Predicting annotations")
        progressbar.refresh()

    if _is_streaming_recording(audio.shape[-1], sp, shape):
        import os

        from orcai_tpu.ops.streaming import StreamingPredictor

        n_frames_est = 1 + audio.shape[-1] // sp["n_overlap"]
        msgr.info(
            f"Recording of {n_frames_est} frames exceeds the spectrogram HBM "
            "budget: two-pass streaming inference"
        )
        if on_estimate is not None:
            # the streaming path keeps the coded audio device-resident (up
            # to its own budget) plus tile transients: flush the pending
            # wave FIRST so peak HBM is max(wave budget, streaming
            # residency), not their sum. audio.nbytes (int16 host buffer)
            # bounds the coded wire size from above.
            on_estimate(min(
                int(audio.nbytes),
                int(os.environ.get("ORCAI_TPU_HBM_AUDIO_BYTES",
                                   8_000_000_000)),
            ))
        streaming = StreamingPredictor(predictor, sp, wire=wire)
        if streaming.hi_idx - streaming.lo_idx != shape["input_shape"][1]:
            raise ValueError(
                f"Spectrogram shape ({streaming.hi_idx - streaming.lo_idx}) "
                f"for {recording_path.stem} not equal to input shape "
                f"({shape['input_shape'][1]})"
            )
        aggregated, overlap_count = streaming.aggregate(audio)
        return {
            "mode": "host",
            "agg": aggregated,
            "count": overlap_count,
            "delta_t": delta_t,
            "est_bytes": 0,
        }

    if on_estimate is not None:
        # frame count is a pure function of the host-side audio length
        # (1 + n // hop, grid-preserved under the sp wires), so the wave's
        # HBM estimate is available before the upload commits any memory
        n_frames_pre = 1 + audio.shape[-1] // sp["n_overlap"]
        n_bins_pre = shape["input_shape"][1]
        on_estimate(
            _bucket_frames(n_frames_pre) * n_bins_pre * 4
            + predictor.planned_spec_bytes(
                n_frames_pre, n_bins_pre, _bucket_frames(n_frames_pre)
            )
        )
    spec_dev, n_frames, _, times = make_spectrogram_from_params_device(
        audio, sp, wire=wire
    )
    delta_t = float(times[1] - times[0])
    if spec_dev.shape[1] != shape["input_shape"][1]:
        raise ValueError(
            f"Spectrogram shape ({spec_dev.shape[1]}) for "
            f"{recording_path.stem} not equal to input shape "
            f"({shape['input_shape'][1]})"
        )
    agg_dev, count_dev, n_out_total = predictor.aggregate_device(
        spec_dev, n_frames=n_frames
    )
    # device-resident footprint this recording leaves until its fetch: the
    # transient frontend magnitude tiles (~one bucket) plus the spectrogram
    # and any re-padded copy the chunk plan forces (planned_spec_bytes —
    # recordings near a bucket top double there), plus small output grids
    est_bytes = _bucket_frames(n_frames) * spec_dev.shape[1] * 4
    est_bytes += predictor.planned_spec_bytes(
        n_frames, spec_dev.shape[1], spec_dev.shape[0]
    )
    return {
        "mode": "device",
        "agg_dev": agg_dev,
        "count_dev": count_dev,
        "n_out": n_out_total,
        "delta_t": delta_t,
        "est_bytes": est_bytes,
    }


def resolve_predict_dtype():
    """CRNN inference compute dtype from ORCAI_TPU_PREDICT_DTYPE.

    "f32" (default) or "bf16" (parameters stay float32 either way). The
    bf16 path is for compute-bound deployments: measured ~16% off the
    per-recording device compute with annotation-identical output on the
    bench recordings and golden fixture (PERFORMANCE.md "Compute floor").
    Shared by predict() and the serve watcher so one env var governs both.
    """
    import os

    import jax.numpy as jnp

    name = os.environ.get("ORCAI_TPU_PREDICT_DTYPE", "f32")
    if name not in ("f32", "bf16"):
        raise ValueError(
            f"ORCAI_TPU_PREDICT_DTYPE must be f32 or bf16, got {name!r}"
        )
    return jnp.bfloat16 if name == "bf16" else jnp.float32


def _finish_wav(
    disp: dict,
    predictor: WindowPredictor,
    orcai_parameter: dict,
    label_suffix: str = "*",
    msgr: Messenger | None = None,
) -> tuple[pd.DataFrame, np.ndarray, float]:
    """Fetch a dispatch record's outputs and decode them to a label table."""
    if msgr is None:
        msgr = Messenger(verbosity=0)
    if disp["mode"] == "device":
        aggregated, overlap_count = predictor.fetch_aggregated(
            disp.pop("agg_dev"), disp.pop("count_dev"), disp["n_out"]
        )
    else:
        aggregated, overlap_count = disp["agg"], disp["count"]
    binary = predictor.binary_predictions(
        aggregated, overlap_count, threshold=0.5
    )

    msgr.info("converting binary predictions into start and stop frames")
    starts, stops, names = runs_from_binary_matrix(binary, orcai_parameter["calls"])
    time_steps_per_output_step = 2 ** len(orcai_parameter["model"]["filters"])
    predicted_labels = compute_labels(
        starts, stops, names, time_steps_per_output_step, label_suffix
    )
    msgr.info(f"found {len(predicted_labels)} acoustic signals")
    msgr.success("Prediction finished.")
    return predicted_labels, aggregated, disp["delta_t"]


def predict_wav(
    recording_path: Path | str,
    channel: int,
    predictor: WindowPredictor,
    orcai_parameter: dict,
    shape: dict,
    label_suffix: str = "*",
    msgr: Messenger | None = None,
    progressbar: tqdm | None = None,
    wire: str | None = None,
) -> tuple[pd.DataFrame, np.ndarray, float]:
    """Predict calls in one wav file.

    Returns (predicted_labels, aggregated probabilities, delta_t).
    """
    disp = _dispatch_wav(
        recording_path, channel, predictor, orcai_parameter, shape,
        msgr=msgr, progressbar=progressbar, wire=wire,
    )
    return _finish_wav(
        disp, predictor, orcai_parameter, label_suffix=label_suffix, msgr=msgr
    )


# ---------------------------------------------------------------- saving


def _convert_times_to_seconds(df: pd.DataFrame, delta_t: float) -> pd.DataFrame:
    df = df.copy()
    df["start"] = df["start"] * delta_t
    df["stop"] = df["stop"] * delta_t
    return df


def save_predictions(
    predicted_labels: pd.DataFrame,
    output_path: Path | str,
    delta_t: float,
    msgr: Messenger | None = None,
) -> None:
    """Write the Audacity-compatible TSV: start/stop in seconds + label."""
    if msgr is None:
        msgr = Messenger(verbosity=0)
    out = _convert_times_to_seconds(predicted_labels, delta_t)
    out[["start", "stop", "label"]].round(4).to_csv(
        output_path, sep="\t", index=False
    )
    msgr.info(f"Predictions saved to {output_path}")


def save_prediction_probabilities(
    aggregated_predictions: np.ndarray,
    orcai_parameter: dict,
    delta_t: float,
    output_path: Path | str,
    msgr: Messenger | None = None,
) -> None:
    if msgr is None:
        msgr = Messenger(verbosity=0)
    output_path = Path(output_path)
    probs_path = output_path.with_name(f"{output_path.stem}_probabilities.csv.gz")
    pd.DataFrame(
        aggregated_predictions,
        columns=orcai_parameter["calls"],
        index=delta_t * np.arange(len(aggregated_predictions)),
    ).to_csv(probs_path, index_label="time", compression="gzip")
    msgr.info(f"Prediction probabilities saved to {probs_path}")


def _resolve_output_path(
    recording_path: Path,
    channel: int,
    orcai_parameter: dict,
    output_path: Path | str | None,
    overwrite: bool,
    msgr: Messenger,
) -> Path:
    # None falls through to the reference's "default" naming: previously it
    # leaked through to save_predictions, which silently discarded the TSV
    # (DataFrame.to_csv(None) returns a string) after doing all the compute
    if output_path is None or output_path == "default":
        filename = (
            f"{recording_path.stem}_c{channel}_"
            f"{orcai_parameter['name']}_predicted.txt"
        )
        output_path = recording_path.with_name(filename)
    else:
        output_path = Path(output_path)
    msgr.info(f"Output file: {output_path}")
    if output_path.exists():
        if overwrite:
            msgr.warning(
                f"Output file {output_path} already exists. Overwriting."
            )
        else:
            raise FileExistsError(
                f"Annotation file already exists: {output_path}"
            )
    return output_path


def _finish_and_save(
    disp: dict,
    output_path: Path | None,
    predictor: WindowPredictor,
    orcai_parameter: dict,
    save_probabilities: bool = False,
    call_duration_limits: dict | Path | str | None = None,
    label_suffix: str = "*",
    msgr: Messenger | None = None,
) -> None:
    if msgr is None:
        msgr = Messenger(verbosity=0)
    predicted_labels, aggregated, delta_t = _finish_wav(
        disp, predictor, orcai_parameter, label_suffix=label_suffix, msgr=msgr
    )
    if call_duration_limits is not None:
        predicted_labels = filter_predictions(
            predicted_labels,
            delta_t=delta_t,
            call_duration_limits=call_duration_limits,
            label_suffix=label_suffix,
            msgr=msgr,
        )
    save_predictions(predicted_labels, output_path, delta_t, msgr=msgr)
    if save_probabilities:
        save_prediction_probabilities(
            aggregated, orcai_parameter, delta_t, output_path, msgr=msgr
        )


def _predict_and_save(
    recording_path: Path,
    channel: int,
    predictor: WindowPredictor,
    orcai_parameter: dict,
    shape: dict,
    output_path: Path | str | None = "default",
    overwrite: bool = False,
    save_probabilities: bool = False,
    call_duration_limits: dict | Path | str | None = None,
    label_suffix: str = "*",
    msgr: Messenger | None = None,
    progressbar: tqdm | None = None,
    wire: str | None = None,
) -> None:
    if msgr is None:
        msgr = Messenger(verbosity=0)
    output_path = _resolve_output_path(
        recording_path, channel, orcai_parameter, output_path, overwrite, msgr
    )
    disp = _dispatch_wav(
        recording_path, channel, predictor, orcai_parameter, shape,
        msgr=msgr, progressbar=progressbar, wire=wire,
    )
    _finish_and_save(
        disp, output_path, predictor, orcai_parameter,
        save_probabilities=save_probabilities,
        call_duration_limits=call_duration_limits,
        label_suffix=label_suffix, msgr=msgr,
    )


def predict(
    recording_path: str | Path,
    channel: int = 1,
    model_dir: str | Path | None = None,
    output_path: str | Path | None = "default",
    overwrite: bool = False,
    save_probabilities: bool = False,
    base_dir_recording: str | Path | None = None,
    call_duration_limits: str | Path | None = None,
    label_suffix: str = "*",
    verbosity: int = 2,
    msgr: Messenger | None = None,
    predict_batch_size: int = 128,
    predictor: WindowPredictor | None = None,
    wire: str | None = None,
) -> None:
    """Predict calls in one wav file or every row of a recording table CSV.

    Batch mode wraps each recording in try/except so a single failure does
    not stop the run (reference predict.py:735-755). Passing `predictor`
    reuses an already-built WindowPredictor for the same model (its
    executables and loaded programs carry over between calls — remote
    backends lazily load each new predictor's programs on first execution).

    `wire` selects the host->device audio byte format (ops/wire_codec.py):
    "exact" ships PCM verbatim; "mulaw8" ships 8-bit companded codes (half
    the bytes); "bfp6"/"bfp5" ship packed block-floating-point mantissas
    (0.76 / 0.63 bytes per sample); "sp-bfp6"/"sp-bfp5" first resample 3/4
    on host — dropping only the band the frontend crops — and ship the
    base codec (0.57 / 0.47 bytes per native-rate sample, ops/spectral.py);
    "sp11-bfp5" resamples 11/16 instead (0.44 bytes per native-rate
    sample, within 3% of the crop's information floor, slightly more
    near-threshold flicker) — all coded wires hold annotation-level parity
    (tests/test_wire_codec.py, tests/test_spectral.py, PERFORMANCE.md wire
    lab); None/"auto" -> ORCAI_TPU_WIRE env var, else sp-bfp5 on TPU and
    exact elsewhere (sp-bfp6 remains opt-in for more SNR headroom, sp11
    for minimum link bytes).

    ORCAI_TPU_PREDICT_DTYPE=bf16 runs the CRNN forward in bfloat16
    (parameters stay float32): ~16% off the per-recording device compute
    on TPU with annotation-identical output on the bench recordings and
    the golden fixture (max aggregated-probability shift ~6e-3 — an order
    below the 0.5/overlap decision threshold's margin on real calls;
    PERFORMANCE.md "Compute floor"). Off by default: the flagship path is
    transfer-bound, so the default favors bit-stable f32 numerics; the
    flag matters on compute-bound (PCIe-attached) deployments.
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Predicting calls")

    if model_dir is None:
        from orcai_tpu.pipeline.helpers import bundled_model_dir

        model_dir = bundled_model_dir("orcai-v1")
    model_dir = Path(model_dir)
    recording_path = Path(recording_path)
    msgr.part(f"Loading model: {model_dir.stem}")

    if predictor is not None:
        # a warmed predictor already holds the model and device-resident
        # weights; deserializing the msgpack again per call would be pure
        # host I/O+CPU inside e.g. bench's timed passes — only the two
        # small JSONs are needed for the window geometry and call names
        from orcai_tpu.io.jsonio import read_json

        # the predictor's build-time dtype governs on this branch, but an
        # invalid ORCAI_TPU_PREDICT_DTYPE must still raise (same contract
        # as the cold path; advisor round-3 finding)
        resolve_predict_dtype()
        orcai_parameter = read_json(model_dir / "orcai_parameter.json")
        shape = read_json(model_dir / "model_shape.json")
        if predictor.snippet_len != shape["input_shape"][0]:
            raise ValueError(
                f"predictor was built for snippet_len "
                f"{predictor.snippet_len} but {model_dir} expects "
                f"{shape['input_shape'][0]} — cross-model predictor reuse"
            )
    else:
        model, variables, orcai_parameter, shape = load_orcai_model(
            model_dir, dtype=resolve_predict_dtype()
        )

    if predictor is None:
        # shard inference windows over the visible chips (SURVEY §5.7); a
        # single chip keeps the annotation-free fast path. In a multi-host
        # run the recording table is partitioned per process
        # (shard_table_for_process below), so each process dispatches
        # DIFFERENT recordings — the window mesh must span only the
        # process's LOCAL chips: a global mesh would device_put variables
        # onto non-addressable devices and desync the processes' programs
        import jax

        from orcai_tpu.parallel.mesh import make_mesh

        devices = (
            jax.local_devices() if jax.process_count() > 1 else jax.devices()
        )
        n_devices = len(devices)
        mesh = (
            make_mesh(n_data=n_devices, devices=devices)
            if n_devices > 1
            else None
        )
        if mesh is not None:
            msgr.info(f"Sharding inference windows over {n_devices} devices")
        predictor = WindowPredictor(
            model,
            variables,
            snippet_len=shape["input_shape"][0],
            n_filters=len(orcai_parameter["model"]["filters"]),
            batch_size=predict_batch_size,
            mesh=mesh,
        )

    if recording_path.suffix == ".wav":
        return _predict_and_save(
            recording_path=recording_path,
            channel=channel,
            predictor=predictor,
            orcai_parameter=orcai_parameter,
            shape=shape,
            output_path=output_path,
            overwrite=overwrite,
            save_probabilities=save_probabilities,
            call_duration_limits=call_duration_limits,
            label_suffix=label_suffix,
            msgr=msgr,
            wire=wire,
        )
    elif recording_path.suffix == ".csv":
        recording_table = pd.read_csv(recording_path)
    else:
        raise ValueError("Recording file must be a wav or csv file")

    if base_dir_recording is not None:
        recording_table["base_dir_recording"] = base_dir_recording

    if output_path is not None and output_path != "default":
        # in table mode output_path names a folder; create it up front so
        # every per-file write doesn't fail with the same missing-dir error
        Path(output_path).mkdir(parents=True, exist_ok=True)
        recording_table["output_path"] = [
            Path(output_path).joinpath(
                f"{recording}_{model_dir.stem}_predicted.txt"
            )
            for recording in recording_table["recording"]
        ]
    else:
        recording_table["output_path"] = output_path

    # multi-host pods: each process predicts a round-robin share of the
    # table's independent recordings (parallel/distributed.py — the
    # TPU-native replacement for the reference's removed predict
    # multiprocessing); single-process runs pass through unchanged
    from orcai_tpu.parallel.distributed import shard_table_for_process

    recording_table = shard_table_for_process(recording_table, msgr)

    msgr.part(f"Predicting annotations for {len(recording_table)} wav files")
    progressbar = tqdm(
        recording_table.index, desc="Starting ...", unit="file",
        disable=verbosity < 2,
    )

    # wave-based batch: dispatch (upload + device graph, NO fetches) as many
    # recordings as fit the HBM wave budget, THEN fetch + decode + save each.
    # On tunneled backends every fetch is a queue-drain + round trip
    # (tools/tunnel_probe.py), so front-loading the wave's uploads and
    # dispatches lets transfers and compute of different recordings overlap
    # freely; per-recording outputs are identical either way.
    import os

    wave_budget = int(os.environ.get("ORCAI_TPU_WAVE_HBM_BYTES", 6_000_000_000))
    pending: list[tuple[object, Path | None, dict]] = []
    pending_paths: set[Path] = set()
    pending_bytes = 0

    def flush_wave():
        nonlocal pending_bytes
        for row_i, out_path, disp in pending:
            try:
                _finish_and_save(
                    disp, out_path, predictor, orcai_parameter,
                    save_probabilities=save_probabilities,
                    call_duration_limits=call_duration_limits,
                    label_suffix=label_suffix, msgr=Messenger(verbosity=0),
                )
            except Exception as e:
                msgr.error(
                    f"Error predicting "
                    f"{recording_table.loc[row_i, 'recording']}: "
                    f"{e.args[0] if e.args else e}"
                )
        pending.clear()
        pending_paths.clear()
        pending_bytes = 0

    for i in progressbar:
        try:
            quiet = Messenger(verbosity=0)
            recording_path = Path(
                recording_table.loc[i, "base_dir_recording"]
            ).joinpath(recording_table.loc[i, "rel_recording_path"])
            out_path = _resolve_output_path(
                recording_path,
                recording_table.loc[i, "channel"],
                orcai_parameter,
                recording_table.loc[i, "output_path"],
                overwrite,
                quiet,
            )
            # files are written at flush time, so the on-disk existence
            # check in _resolve_output_path cannot see a duplicate output
            # path queued earlier in the SAME wave — without this guard the
            # later row would silently clobber the earlier one's TSV
            if out_path is not None and not overwrite and out_path in pending_paths:
                raise FileExistsError(
                    f"Annotation file already pending in this batch: "
                    f"{out_path}"
                )
            def flush_if_next_overflows(est: int) -> None:
                # bound PEAK device residency at the budget: fetch the
                # pending wave before this recording's upload commits
                # memory, not after the overshoot already happened
                if pending_bytes and pending_bytes + est > wave_budget:
                    flush_wave()

            disp = _dispatch_wav(
                recording_path,
                recording_table.loc[i, "channel"],
                predictor,
                orcai_parameter,
                shape,
                msgr=quiet,
                progressbar=progressbar,
                wire=wire,
                on_estimate=flush_if_next_overflows,
            )
        except Exception as e:  # keep batch going on per-file failure
            msgr.error(
                f"Error predicting {recording_table.loc[i, 'recording']}: "
                f"{e.args[0] if e.args else e}"
            )
            continue
        pending.append((i, out_path, disp))
        if out_path is not None:
            pending_paths.add(out_path)
        pending_bytes += disp["est_bytes"]
        if pending_bytes >= wave_budget:
            flush_wave()
    flush_wave()
    msgr.success("Predictions finished.")
