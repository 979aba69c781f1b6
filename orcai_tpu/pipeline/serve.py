"""Watch-folder prediction service (production serving mode).

Field deployments produce recordings continuously; the reference's predict
is strictly batch (one process per invocation, predict.py:635-757). On
remote-dispatch TPU backends a fresh process pays a large one-time warmup
— device init plus lazy per-executable program loads, seconds to minutes
(PERFORMANCE.md) — which per-invocation CLI usage re-pays every time. This
service holds ONE warmed WindowPredictor for the process lifetime and
amortizes that cost over every recording that arrives: steady-state cost
per file is the same as one recording inside a warmed batch pass.

Per-recording outputs are identical to `orcai predict` on the same file
(same `<stem>_c<channel>_<model>_predicted.txt` contract); a recording
that fails leaves a `<output>.failed` marker with the error text so it is
reported once and not retried in a loop. New files are picked up when
their (size, mtime) signature is stable across two consecutive polls, so
half-written uploads are never read early.

Crash recovery: the remote backend's worker process can die mid-queue
(CLAUDE.md), which poisons every device object the warmed predictor holds
— without recovery the first crash would `.failed`-mark every subsequent
arrival against dead handles. When a per-file error classifies as backend
death (utils/backend_health.is_backend_crash), serve rebuilds the
predictor from disk, re-warms it, and retries the in-flight file once;
only a second failure writes the `.failed` marker, and later arrivals use
the fresh predictor. Ordinary per-file errors (corrupt wav, too-short
recording) are never retried.
"""

from __future__ import annotations

import time
from pathlib import Path

from orcai_tpu.utils import Messenger
from orcai_tpu.utils.backend_health import is_backend_crash


def scan_ready(
    watch_dir: Path,
    prev_sigs: dict[Path, tuple[int, int]],
    done: set[Path],
) -> tuple[list[Path], dict[Path, tuple[int, int]]]:
    """One poll: (ready wav paths, current signatures).

    A file is ready when its (size, mtime_ns) matches the previous poll's
    signature — i.e. nothing wrote to it for a full poll interval — and it
    is larger than a bare RIFF header. Files in `done` are skipped without
    a stat-signature entry, so the dict stays bounded by the backlog, not
    the directory history.
    """
    cur: dict[Path, tuple[int, int]] = {}
    ready: list[Path] = []
    for p in sorted(watch_dir.glob("*.wav")):
        if p in done:
            continue
        try:
            st = p.stat()
        except OSError:
            continue  # vanished between glob and stat
        sig = (st.st_size, st.st_mtime_ns)
        cur[p] = sig
        if prev_sigs.get(p) == sig and st.st_size > 44:
            ready.append(p)
    return ready, cur


def serve(
    watch_dir: Path | str,
    model_dir: Path | str | None = None,
    output_dir: Path | str | None = None,
    channel: int = 1,
    overwrite: bool = False,
    save_probabilities: bool = False,
    call_duration_limits: Path | str | None = None,
    label_suffix: str = "*",
    predict_batch_size: int = 128,
    wire: str | None = None,
    poll_seconds: float = 2.0,
    warm_minutes: float = 0.0,
    max_files: int | None = None,
    max_idle_polls: int | None = None,
    verbosity: int = 2,
    msgr: Messenger | None = None,
    sleep=time.sleep,
) -> int:
    """Watch `watch_dir` for wav files and predict each as it arrives.

    Runs until interrupted; `max_files` / `max_idle_polls` bound the run
    for scripted and test use (`max_idle_polls` counts CONSECUTIVE polls
    that found nothing ready). Returns the number of recordings processed
    (including failures, which leave `.failed` markers). A path is
    processed at most once per service lifetime — replacing a wav in
    place requires a restart (with --overwrite) to re-predict it.

    `warm_minutes > 0` pre-compiles and pre-loads the predict executables
    for every recording-length bucket up to that duration through THIS
    predictor instance before the first poll — warming a separate
    predictor would fill the compile cache but leave this one's lazy
    program loads cold (CLAUDE.md: programs load per jit closure).
    """
    if msgr is None:
        msgr = Messenger(verbosity=verbosity, title="Serving predictions")
    watch_dir = Path(watch_dir)
    if not watch_dir.is_dir():
        raise NotADirectoryError(f"watch_dir does not exist: {watch_dir}")
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)

    if model_dir is None:
        from orcai_tpu.pipeline.helpers import bundled_model_dir

        model_dir = bundled_model_dir("orcai-v1")
    model_dir = Path(model_dir)
    msgr.part(f"Loading model: {model_dir.stem}")

    import jax

    from orcai_tpu.io.model_store import load_orcai_model
    from orcai_tpu.ops.overlap import WindowPredictor
    from orcai_tpu.parallel.mesh import make_mesh
    from orcai_tpu.pipeline.predict import (
        _predict_and_save,
        resolve_predict_dtype,
    )

    orcai_parameter = None
    shape = None

    def build_predictor() -> WindowPredictor:
        # also the crash-recovery path: after a backend/worker death every
        # device array and loaded executable the old predictor held is
        # poisoned, so recovery reloads weights from disk and rebuilds the
        # whole device state from scratch (model_store caches nothing on
        # device)
        nonlocal orcai_parameter, shape
        model, variables, orcai_parameter, shape = load_orcai_model(
            model_dir, dtype=resolve_predict_dtype()
        )
        # multi-process launches watch independent folders/files per
        # process; the window mesh must span only LOCAL chips (see
        # pipeline/predict.py)
        devices = (
            jax.local_devices() if jax.process_count() > 1 else jax.devices()
        )
        n_devices = len(devices)
        return WindowPredictor(
            model,
            variables,
            snippet_len=shape["input_shape"][0],
            n_filters=len(orcai_parameter["model"]["filters"]),
            batch_size=predict_batch_size,
            mesh=(
                make_mesh(n_data=n_devices, devices=devices)
                if n_devices > 1
                else None
            ),
        )

    def warm_predictor(predictor: WindowPredictor) -> None:
        if warm_minutes <= 0:
            return
        import numpy as np

        from orcai_tpu.ops.frontend import make_spectrogram_from_params_device
        from orcai_tpu.tools.warmup import bucket_warm_counts

        sp = orcai_parameter["spectrogram"]
        # one length per reachable (bucket, chunk-plan) executable, not just
        # per bucket: the chunk ladder keys extra programs off the window
        # count, and any cold one is a first-recording stall (lazy program
        # loads run 12-56 s on the remote backend)
        counts = bucket_warm_counts(
            warm_minutes, sp["sampling_rate"], sp["n_overlap"], predictor
        )
        msgr.part(f"Warming {len(counts)} recording-length executables")
        for i, n in enumerate(counts):
            t0 = time.time()
            spec_dev, n_frames, _, _ = make_spectrogram_from_params_device(
                np.zeros(n, dtype=np.int16), sp, wire=wire
            )
            predictor.aggregate(spec_dev, n_frames=n_frames)
            msgr.info(
                f"[{i + 1}/{len(counts)}] "
                f"{n / sp['sampling_rate'] / 60:.1f} min bucket ready "
                f"in {time.time() - t0:.1f} s"
            )

    predictor = build_predictor()
    warm_predictor(predictor)

    msgr.part(
        f"Watching {watch_dir} (poll every {poll_seconds:g} s; stop with ^C)"
    )

    def out_path_for(wav: Path) -> Path:
        name = f"{wav.stem}_c{channel}_{orcai_parameter['name']}_predicted.txt"
        return (output_dir or wav.parent) / name

    prev_sigs: dict[Path, tuple[int, int]] = {}
    done: set[Path] = set()
    n_processed = 0
    idle_polls = 0
    while True:
        ready, prev_sigs = scan_ready(watch_dir, prev_sigs, done)
        if not ready:
            idle_polls += 1
            if max_idle_polls is not None and idle_polls >= max_idle_polls:
                break
            sleep(poll_seconds)
            continue
        idle_polls = 0
        for wav in ready:
            done.add(wav)
            out_path = out_path_for(wav)
            failed_marker = out_path.with_suffix(out_path.suffix + ".failed")
            if not overwrite and (out_path.exists() or failed_marker.exists()):
                msgr.info(f"{wav.name}: output exists, skipping")
                continue
            t0 = time.time()

            def predict_one(wav: Path = wav, out_path: Path = out_path):
                _predict_and_save(
                    recording_path=wav,
                    channel=channel,
                    predictor=predictor,
                    orcai_parameter=orcai_parameter,
                    shape=shape,
                    output_path=out_path,
                    overwrite=True,  # pre-checked above with marker semantics
                    save_probabilities=save_probabilities,
                    call_duration_limits=call_duration_limits,
                    label_suffix=label_suffix,
                    msgr=Messenger(verbosity=0),
                    wire=wire,
                )

            try:
                try:
                    predict_one()
                except Exception as e:
                    # Backend/worker death (utils/backend_health.py) poisons
                    # every device object the predictor holds: without
                    # recovery, this file AND every later arrival would
                    # .failed against the dead handles. Rebuild the whole
                    # device state from disk, re-warm, and retry this file
                    # ONCE; a second failure falls through to the ordinary
                    # per-file marker path. Non-crash errors (bad wav, short
                    # recording) re-raise immediately — retrying them
                    # against the same input cannot succeed.
                    if not is_backend_crash(e):
                        raise
                    msgr.error(
                        f"Backend crash while predicting {wav.name} "
                        f"({e}); rebuilding predictor and retrying once"
                    )
                    predictor = build_predictor()
                    warm_predictor(predictor)
                    predict_one()
                failed_marker.unlink(missing_ok=True)
                msgr.info(
                    f"{wav.name} -> {out_path.name} "
                    f"({time.time() - t0:.1f} s)"
                )
            except Exception as e:  # keep serving on per-file failure
                try:
                    failed_marker.write_text(f"{e}\n")
                except OSError as marker_err:
                    # the marker write can fail for the same reason the
                    # predict did (disk full, read-only output dir) — the
                    # service must outlive that too; `done` already
                    # prevents a retry loop for this path
                    msgr.error(
                        f"Could not write {failed_marker.name}: {marker_err}"
                    )
                msgr.error(f"Error predicting {wav.name}: {e}")
            n_processed += 1
            if max_files is not None and n_processed >= max_files:
                return n_processed
        # no sleep after a productive poll: more files may be ready already
    return n_processed
