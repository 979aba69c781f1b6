"""Sliding-window CRNN inference with fused overlap-add, on device.

TPU-native replacement for the reference's predict hot loop
(predict.py:235-317): there, all 736-frame windows are materialized in host
numpy, pushed through keras model.predict, and overlap-add averaged in a
Python loop. Here the whole chain — window extraction (strided reshape of a
device-resident spectrogram, no host round-trip), chunked batched model
application (lax.map, one compiled model body), scatter-add overlap
aggregation — runs as jit'd XLA graphs; only the tiny per-output-step
probability sums return to host. Long recordings are processed in window
mega-chunks sliced out of the HBM-resident spectrogram, so transfer volume
is O(outputs), not O(spectrogram), and HBM stays bounded.

Window geometry matches the reference exactly: stride = snippet_len // 2,
output grid = T // 2**n_filters rows, window i writing output rows
[i * shift_out, i * shift_out + out_len), average over overlap counts,
binary threshold 0.5 / max(overlap_count) (predict.py:304-307).

Multi-chip: pass a mesh and the window axis is sharded over its "data"
axis — the spectrogram is replicated (small next to HBM), each device
runs its shard of every window batch, and GSPMD reduces the scatter-add
partial sums over ICI (SURVEY §5.7: windows are embarrassingly parallel
along time). Outputs are bit-identical to the single-device path: each
output row receives the same <= 2 window contributions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from orcai_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()


@jax.jit
def _fused_pack(agg: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """[agg (N, L) || count (N, 1)] as one buffer (both are float32), so
    fetch_aggregated can pay ONE blocking device->host round trip under
    ORCAI_TPU_FUSED_FETCH=1."""
    return jnp.concatenate([agg, count[:, None]], axis=1)


def _next_pow2(n: int, minimum: int = 4096) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class WindowPredictor:
    """Batched overlapping-window predictor for one loaded model."""

    def __init__(
        self,
        model,
        variables: dict,
        snippet_len: int = 736,
        n_filters: int = 4,
        batch_size: int = 128,
        max_windows_per_chunk: int = 2048,
        mesh=None,
        dense_trunk: bool | None = None,
    ):
        self.model = model
        self.mesh = mesh if mesh is not None and mesh.shape["data"] > 1 else None
        if self.mesh is not None:
            self.n_dev = self.mesh.shape["data"]
            self.variables = jax.device_put(
                variables, NamedSharding(self.mesh, P())
            )
            # per-apply batch stays ~batch_size in total, sharded over "data"
            self.batch_size = -(-batch_size // self.n_dev) * self.n_dev
        else:
            self.n_dev = 1
            self.variables = jax.device_put(variables)
            self.batch_size = batch_size
        self.snippet_len = snippet_len
        self.shift = snippet_len // 2
        self.down = 2**n_filters
        # the halves-reshape window extraction assumes snippet_len == 2 *
        # shift, and the overlap-add grid assumes the trunk's downsample
        # divides both; an odd or non-divisible length would otherwise
        # SILENTLY window (snippet_len - 1)-frame strides and mis-align the
        # output grid (reference models always satisfy this: 736 = 2*16*23)
        if snippet_len % (2 * self.down) != 0:
            raise ValueError(
                f"snippet_len {snippet_len} must be divisible by "
                f"2 * 2**n_filters = {2 * self.down} for half-overlap "
                "windowing and the overlap-add output grid"
            )
        self.out_len = snippet_len // self.down
        self.shift_out = self.shift // self.down
        self.max_windows_per_chunk = max(
            self.batch_size,
            max_windows_per_chunk // self.batch_size * self.batch_size,
        )
        # dense-trunk inference (opt-in, ORCAI_TPU_DENSE_TRUNK=1): run the
        # conv trunk ONCE over slabs of consecutive windows — 50%-overlapping
        # windows recompute every trunk frame twice in the windowed path —
        # and window only the sequence head's inputs on the trunk-step grid.
        # Exact overlap-save: each slab carries a halo >= the trunk's
        # receptive-field radius, so interior trunk steps are identical to a
        # monolithic dense trunk (tested); the numerics differ from the
        # windowed path only where the reference's per-window zero padding
        # differed from seeing the real neighboring frames. Requires the
        # architecture to expose trunk_only/head_input (all three do) and a
        # single-device predictor (the sharded path stays windowed).
        # OFF by default because it is MEASURED SLOWER on TPU v5e: the conv
        # emitter's per-position throughput collapses with spatial height
        # (5.4 Mpos/s at (128,736) vs 0.8-2.0 at slab shapes, amortized
        # sweep in PERFORMANCE.md "Measured-worse lever: dense trunk"), so
        # the ~1.9x FLOP dedup loses ~3x net. Kept exact + tested for
        # backends whose convs don't pay the tall-shape penalty.
        if dense_trunk is None:
            import os

            dense_trunk = os.environ.get("ORCAI_TPU_DENSE_TRUNK") == "1"
        self.dense_trunk = bool(dense_trunk) and self.mesh is None
        # trunk receptive-field radius in input frames: entry conv (k//2)
        # + per block b: two separable convs (2 * 2^b * (k//2)) + pool3
        # (2^b) + head separable conv (2^n_filters * (k//2)), rounded up to
        # the downsample grid so slab starts stay pool-aligned
        k_half = getattr(model, "kernel_size", 3) // 2
        radius = k_half + sum(
            (2 * k_half + 1) * 2**b for b in range(n_filters)
        ) + self.down * k_half
        self.halo = -(-radius // self.down) * self.down
        self._chunk_fns: dict[tuple, object] = {}
        self._pad_fns: dict[tuple, object] = {}
        self._zero_fns: dict[tuple, object] = {}

    def _plan_chunk_size(self, n_win: int) -> int:
        """Windows per compiled chunk: the batch-size multiple covering n_win,
        rounded up a {4, 5, 6} * 2**k batch-count ladder (1,2,3,4,5,6,8,10,
        12,16,...), capped at max_windows_per_chunk.

        The ladder bounds recompilation (recording lengths vary continuously;
        wpc may not — each value is one compiled executable and, on remote
        backends, one lazy program load) while cutting the round-2 pure
        power-of-two ladder's worst-case whole-batch padding from ~50% to
        ~22% (the final batch's internal padding is batch-granularity,
        not the ladder's): the flagship 20-min shape (610 windows, batch
        128 -> 5 batches) computes 640 windows instead of 1024 (PERFORMANCE.md
        "Chunk-ladder densification"). Recordings whose window count
        exceeds max_windows_per_chunk run full cap-size chunks plus one
        ladder-planned remainder chunk (see plan), so the bound holds at
        every length."""
        bsz = self.batch_size
        n_batches = max(1, -(-n_win // bsz))
        b = 1
        while b < n_batches:
            b *= 2
        if b > 4 and (b * 5) // 8 >= n_batches:
            b = (b * 5) // 8
        elif b > 2 and (b * 3) // 4 >= n_batches:
            b = (b * 3) // 4
        return min(self.max_windows_per_chunk, b * bsz)

    def plan(self, t: int) -> tuple[int, tuple, int, int]:
        """Static execution plan for a recording of t valid spectrogram
        frames: (n_win, chunks, required_frames, n_out_pad), where chunks
        is a tuple of (wpc, count) pairs executed in order — full
        max_windows_per_chunk chunks first, then at most one smaller
        ladder-planned remainder chunk. Planning the remainder on the same
        ladder instead of padding it to the cap matters right above cap
        multiples: a 90-min sp-wire recording (2750 windows, cap 2048)
        computes 2048+768 windows instead of 2x2048 (-31% CRNN compute)
        and its frame span then fits the frontend bucket instead of
        forcing a ~1.9 GB re-padded spectrogram copy.

        The single source of truth for every shape that keys a compiled
        executable on the predict path — aggregate_device executes it,
        planned_spec_bytes prices its HBM cost, and
        tools/warmup.bucket_warm_counts enumerates its distinct values so a
        warmed predictor has no cold first recording.

        n_out_pad is the output grid covering every chunk's window span
        (valid windows never write past the last window's rows; padded rows
        stay zero). The shift_out widening handles recordings whose tail
        extends past the last window while n_win is an exact multiple of
        wpc: there n_out_total exceeds the window span by up to shift_out-1
        rows and fetch_aggregated's [:n_out_total] slice would otherwise
        include the trash row — which happens to be all zeros in exactly
        that case (no invalid windows exist to write it), i.e. the correct
        value for uncovered tail rows, but only by coincidence; widening
        makes the invariant structural. Widening by a fixed shift_out (not
        to n_out_total) keeps the grid shape — and therefore the compiled
        executable — independent of the exact recording length (a new shape
        costs a retrace plus a lazy program load on remote backends)."""
        n_win = (t - self.snippet_len) // self.shift + 1
        cap = self.max_windows_per_chunk
        if n_win > cap:
            full, rem = divmod(n_win, cap)
            chunks = [(cap, full)]
            if rem:
                chunks.append((self._plan_chunk_size(rem), 1))
        else:
            chunks = [(self._plan_chunk_size(n_win), 1)]
        planned = sum(w * c for w, c in chunks)
        required = (planned + 1) * self.shift
        n_out_pad = (planned - 1) * self.shift_out + self.out_len
        if t // self.down > n_out_pad:
            n_out_pad += self.shift_out
        return n_win, tuple(chunks), required, n_out_pad

    def plan_signature(self, t: int, src_len: int) -> tuple:
        """(spec buffer length, chunks, n_out_pad) for a recording of t
        valid frames arriving in a (src_len, bins) device buffer — the
        shape tuple that keys every executable the recording will compile
        or lazily load (one chunk fn per distinct wpc with its agg/count
        grid, the zero-grid fn, and the pad fn when src_len < the chunk
        plan's span)."""
        _, chunks, required, n_out_pad = self.plan(t)
        target = _next_pow2(required)
        spec_len = src_len if src_len >= target else target
        return spec_len, chunks, n_out_pad

    # -- compiled bodies --------------------------------------------------------

    def _build_chunk_fn(self, spec_len: int, n_bins: int, wpc: int):
        """(agg, count, variables, spec in HBM, f0, w0, n_win_valid) ->
        updated (agg, count) after scatter-adding the wpc windows starting
        at frame f0 into the DONATED global output grid.

        Accumulation stays on device so a whole predict performs exactly ONE
        device->host fetch at the end — on remote-dispatch backends every
        fetch is a full queue-drain + round trip (readiness APIs return
        early; a fetch is the only real sync, tools/tunnel_probe.py), so
        per-chunk readbacks would serialize the pipeline on link latency.

        Model weights are an argument, not a closure constant: large embedded
        constants stall compilation on remote-dispatch TPU backends and
        defeat the persistent compilation cache.
        """
        model = self.model
        mesh = self.mesh
        snippet_len, shift = self.snippet_len, self.shift
        out_len, shift_out = self.out_len, self.shift_out
        bsz = min(self.batch_size, wpc)

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            jit_kwargs = dict(
                in_shardings=(repl,) * 7, out_shardings=(repl, repl)
            )
            batch_sharding = NamedSharding(mesh, P(None, "data"))
        else:
            jit_kwargs = {}
            batch_sharding = None

        @partial(jax.jit, donate_argnums=(0, 1), **jit_kwargs)
        def chunk_fn(
            agg: jnp.ndarray,
            count: jnp.ndarray,
            variables,
            spec: jnp.ndarray,
            f0: jnp.ndarray,
            w0: jnp.ndarray,
            n_win_valid: jnp.ndarray,
        ):
            n_out_pad = agg.shape[0] - 1  # last row is the trash row
            chunk = jax.lax.dynamic_slice(
                spec, (f0, 0), ((wpc + 1) * shift, n_bins)
            )
            halves = chunk.reshape(wpc + 1, shift, n_bins)
            windows = jnp.concatenate([halves[:-1], halves[1:]], axis=1)
            windows = windows[..., None]  # (wpc, snippet, bins, 1)

            batches = windows.reshape(wpc // bsz, bsz, snippet_len, n_bins, 1)
            if batch_sharding is not None:
                # each lax.map step's batch axis spreads over the mesh
                batches = jax.lax.with_sharding_constraint(
                    batches, batch_sharding
                )
            preds = jax.lax.map(
                lambda xb: model.apply(variables, xb, train=False), batches
            )
            preds = preds.reshape(wpc, out_len, -1)

            valid = jnp.arange(wpc) < n_win_valid
            n_labels = preds.shape[-1]
            win_ids = jnp.arange(wpc)[:, None]
            rows = (w0 + win_ids) * shift_out + jnp.arange(out_len)[None, :]
            rows = jnp.where(valid[:, None], rows, n_out_pad)  # trash row
            flat_rows = rows.reshape(-1)
            flat_preds = preds.reshape(-1, n_labels)

            agg = agg.at[flat_rows].add(flat_preds)
            count = count.at[flat_rows].add(1.0)
            return agg, count

        return chunk_fn

    def _dense_slab_windows(self, wpc: int) -> int:
        """Windows per trunk slab: bounds the slab's trunk activation
        footprint (a 33-window slab at the flagship geometry holds a
        ~165 MB entry-conv activation vs ~2.9 GB for a whole 640-window
        chunk) while keeping the trunk dedup near 2x: trunk frames per
        window = (S+1)/S * shift + 2*halo/S ~ 381 vs the windowed path's
        736 at S=32. Must divide wpc; ladder chunk sizes are batch-size
        multiples, so 32 works whenever 32 | wpc."""
        for s in (32, self.batch_size, wpc):
            if wpc % s == 0:
                return min(s, wpc)
        return wpc

    def _build_dense_chunk_fn(self, spec_len: int, n_bins: int, wpc: int):
        """Dense-trunk variant of _build_chunk_fn — same signature, same
        donated global output grid, same scatter-add tail.

        Structure per chunk: pad the spectrogram once with `halo` zero rows
        on both sides (so every slab slice is in range and recording edges
        see zeros, exactly like the windowed path's out-of-range frames);
        lax.map the trunk over slabs of S consecutive windows, each slab
        reading (S+1)*shift + 2*halo frames and keeping the halo-free
        (S+1)*shift_out trunk steps — overlap-save, exact vs a monolithic
        dense trunk (tests/test_dense_trunk.py); form per-window head
        inputs from adjacent step-halves (the same halves trick as the
        windowed path, on the 16x-coarser trunk grid); then lax.map the
        sequence head over window batches.
        """
        model = self.model
        shift = self.shift
        out_len, shift_out = self.out_len, self.shift_out
        down, halo = self.down, self.halo
        bsz = min(self.batch_size, wpc)
        S = self._dense_slab_windows(wpc)
        n_slabs = wpc // S
        slab_len = (S + 1) * shift + 2 * halo
        h_steps = halo // down
        # One slab per trunk application. Batching G slabs per application
        # was tried and measured NEUTRAL-to-worse on TPU v5e (0.340 ->
        # 0.378 s per flagship recording): the tall-shape conv-emitter
        # penalty depends on spatial height, not batch rows (see the
        # constructor comment and PERFORMANCE.md's shape sweep).

        @partial(jax.jit, donate_argnums=(0, 1))
        def chunk_fn(
            agg: jnp.ndarray,
            count: jnp.ndarray,
            variables,
            spec: jnp.ndarray,
            f0: jnp.ndarray,
            w0: jnp.ndarray,
            n_win_valid: jnp.ndarray,
        ):
            n_out_pad = agg.shape[0] - 1  # last row is the trash row
            spec_pad = (
                jnp.zeros((spec_len + 2 * halo, n_bins), spec.dtype)
                .at[halo : halo + spec_len]
                .set(spec)
            )

            def slab_windows(i):
                # absolute frame f maps to spec_pad row f + halo; slab i's
                # span starts at absolute f0 + i*S*shift and reads halo
                # extra frames on both sides -> row (f0 + i*S*shift)
                sl = jax.lax.dynamic_slice(
                    spec_pad, (f0 + i * (S * shift), 0), (slab_len, n_bins)
                )
                h = model.apply(
                    variables, sl[None, :, :, None], train=False,
                    trunk_only=True,
                )
                steps = jax.lax.slice_in_dim(
                    h[0], h_steps, h_steps + (S + 1) * shift_out, axis=0
                )
                halves = steps.reshape(S + 1, shift_out, *steps.shape[1:])
                return jnp.concatenate([halves[:-1], halves[1:]], axis=1)

            wins = jax.lax.map(slab_windows, jnp.arange(n_slabs))
            wins = wins.reshape(wpc, out_len, *wins.shape[3:])
            batches = wins.reshape(wpc // bsz, bsz, *wins.shape[1:])
            preds = jax.lax.map(
                lambda hb: model.apply(
                    variables, hb, train=False, head_input=True
                ),
                batches,
            )
            preds = preds.reshape(wpc, out_len, -1)

            valid = jnp.arange(wpc) < n_win_valid
            n_labels = preds.shape[-1]
            win_ids = jnp.arange(wpc)[:, None]
            rows = (w0 + win_ids) * shift_out + jnp.arange(out_len)[None, :]
            rows = jnp.where(valid[:, None], rows, n_out_pad)  # trash row
            flat_rows = rows.reshape(-1)
            flat_preds = preds.reshape(-1, n_labels)

            agg = agg.at[flat_rows].add(flat_preds)
            count = count.at[flat_rows].add(1.0)
            return agg, count

        return chunk_fn

    def _ensure_device(self, spectrogram, t: int, required: int, n_bins: int):
        """Device array of shape (>= required, bins) holding the spectrogram."""
        target = _next_pow2(required)
        if isinstance(spectrogram, np.ndarray):
            padded = np.zeros((target, n_bins), np.float32)
            padded[:t] = spectrogram
            return jnp.asarray(padded)
        # device array: zero-pad / extend under jit (no host round-trip)
        src_len = spectrogram.shape[0]
        if src_len >= target:
            return spectrogram
        key = (src_len, target, n_bins)
        if key not in self._pad_fns:

            @jax.jit
            def pad_fn(spec):
                return jnp.zeros((target, n_bins), jnp.float32).at[:src_len].set(
                    spec
                )

            self._pad_fns[key] = pad_fn
        return self._pad_fns[key](spectrogram)

    # -- host driver ------------------------------------------------------------

    def n_labels(self, n_bins: int) -> int:
        """Model output label count, discovered without running the model
        (eval_shape traces only: no compute, no transfers)."""
        if not hasattr(self, "_n_labels"):
            out = jax.eval_shape(
                lambda v, x: self.model.apply(v, x, train=False),
                self.variables,
                jax.ShapeDtypeStruct(
                    (1, self.snippet_len, n_bins, 1), jnp.float32
                ),
            )
            self._n_labels = int(out.shape[-1])
        return self._n_labels

    def planned_spec_bytes(self, t: int, n_bins: int, src_len: int) -> int:
        """HBM bytes aggregate_device will hold for a (src_len, bins) f32
        spectrogram of t valid frames: the source buffer itself plus the
        re-padded copy _ensure_device creates when the chunk plan's
        power-of-two span exceeds src_len (recordings near the top of a
        frame bucket double here — wave budgeting must count it)."""
        required = self.plan(t)[2]
        target = _next_pow2(required)
        padded = target if src_len < target else 0
        return (src_len + padded) * n_bins * 4

    def _zero_grid(self, n_out_pad: int, n_labels: int):
        """Fresh donated (agg, count) device buffers with a trash row."""
        key = (n_out_pad, n_labels)
        if key not in self._zero_fns:
            repl = (
                NamedSharding(self.mesh, P()) if self.mesh is not None else None
            )
            kw = dict(out_shardings=(repl, repl)) if repl is not None else {}

            @partial(jax.jit, **kw)
            def zeros_fn():
                return (
                    jnp.zeros((n_out_pad + 1, n_labels), jnp.float32),
                    jnp.zeros((n_out_pad + 1,), jnp.float32),
                )

            self._zero_fns[key] = zeros_fn
        return self._zero_fns[key]()

    def aggregate_device(self, spectrogram, n_frames: int | None = None):
        """Spectrogram -> device (prob_sum (n_out_pad+1, L), count) buffers.

        Dispatches the full windowed inference + scatter-add overlap chain
        WITHOUT any device->host transfer; callers fetch the (tiny) result
        grid whenever they choose. This split lets batch predict queue a
        whole wave of recordings and pay exactly one sync round trip per
        recording at fetch time (every fetch drains the queue on remote
        backends; see _build_chunk_fn).

        Returns (agg_sum_dev, count_dev, n_out_total).
        """
        if n_frames is None:
            t = int(spectrogram.shape[0])
        else:
            t = int(n_frames)
        n_bins = int(spectrogram.shape[1])
        if t < self.snippet_len:
            raise ValueError(
                f"Recording too short for prediction: {t} spectrogram frames "
                f"< snippet length {self.snippet_len}"
            )
        n_win, chunks, required, n_out_pad = self.plan(t)
        n_out_total = t // self.down
        spec_dev = self._ensure_device(spectrogram, t, required, n_bins)

        # global output grid covering every chunk's window span, tail-
        # widened when needed (see plan() for the invariant)
        agg, count = self._zero_grid(n_out_pad, self.n_labels(n_bins))
        w0 = 0
        build = (
            self._build_dense_chunk_fn if self.dense_trunk
            else self._build_chunk_fn
        )
        for wpc, n_repeat in chunks:
            # the dense flag is part of the key: the windowed and dense-trunk
            # builders share this cache (and the streaming predictor reuses
            # it with dense=False), so identical shape tuples must not alias
            # across variants
            key = (spec_dev.shape[0], n_bins, wpc, self.dense_trunk)
            if key not in self._chunk_fns:
                self._chunk_fns[key] = build(spec_dev.shape[0], n_bins, wpc)
            chunk_fn = self._chunk_fns[key]
            for _ in range(n_repeat):
                n_valid = min(wpc, n_win - w0)
                agg, count = chunk_fn(
                    agg,
                    count,
                    self.variables,
                    spec_dev,
                    jnp.asarray(w0 * self.shift, jnp.int32),
                    jnp.asarray(w0, jnp.int32),
                    jnp.asarray(n_valid, jnp.int32),
                )
                w0 += wpc
        return agg, count, n_out_total

    @staticmethod
    def fetch_aggregated(
        agg_dev, count_dev, n_out_total: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """The recording's sync point -> (averaged probs (T//down, L), count).

        Default: two transfers — the agg fetch is the queue-draining round
        trip; the count fetch after it costs one more (post-drain) link RTT
        (~29 ms on the tunnel). ORCAI_TPU_FUSED_FETCH=1 instead dispatches
        one device-side concat and fetches a single [agg || count] buffer.
        Bit-identical outputs (tested); measured SLOWER on-chip (median
        +0.67 s per 5-recording batch, tools/fused_fetch_ab.py — the extra
        pack-program execution delays the drain more than the saved RTT),
        so two-fetch stays the default; the flag remains for re-testing on
        PCIe-attached hosts (PERFORMANCE.md "Measured-worse lever").
        """
        import os

        if os.environ.get("ORCAI_TPU_FUSED_FETCH") == "1":
            packed = np.asarray(_fused_pack(agg_dev, count_dev))
            agg = packed[:n_out_total, :-1].copy()  # np view is read-only
            count = packed[:n_out_total, -1]
        else:
            agg = np.asarray(agg_dev)[:n_out_total].copy()
            count = np.asarray(count_dev)[:n_out_total]
        valid = count > 0
        agg[valid] /= count[valid, None]
        return agg, count

    def aggregate(
        self, spectrogram, n_frames: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Spectrogram -> (aggregated (T//down, L), overlap_count).

        `spectrogram` is either a host (T, bins) array, or a device-resident
        (possibly padded) array with `n_frames` giving the valid frame count
        (the fused predict path — no spectrogram ever crosses the host
        boundary). Averaged sigmoid probabilities per output step, matching
        the reference's compute_aggregated_predictions (predict.py:235-295).
        """
        agg_dev, count_dev, n_out_total = self.aggregate_device(
            spectrogram, n_frames
        )
        return self.fetch_aggregated(agg_dev, count_dev, n_out_total)

    def binary_predictions(
        self,
        aggregated: np.ndarray,
        overlap_count: np.ndarray,
        threshold: float = 0.5,
    ) -> np.ndarray:
        """Binarize averaged probabilities: > threshold / max(overlap)."""
        adjusted = threshold / np.max(overlap_count)
        return (aggregated > adjusted).astype(np.int8)
