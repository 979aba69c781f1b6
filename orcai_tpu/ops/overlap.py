"""Sliding-window CRNN inference with fused overlap-add, on device.

TPU-native replacement for the reference's predict hot loop
(predict.py:235-317): there, all 736-frame windows are materialized in host
numpy, pushed through keras model.predict, and overlap-add averaged in a
Python loop. Here the whole chain — window extraction (strided-reshape, no
gather), chunked batched model application (lax.map, one compiled model
body), scatter-add overlap aggregation, averaging and thresholding — is a
single jit'd XLA graph per frame-count bucket. Long recordings are processed
in window mega-chunks so HBM usage stays bounded regardless of duration.

Window geometry matches the reference exactly: stride = snippet_len // 2,
output grid = T // 2**n_filters rows, window i writing output rows
[i * shift_out, i * shift_out + out_len), average over overlap counts,
binary threshold 0.5 / max(overlap_count) (predict.py:304-307).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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
    ):
        self.model = model
        self.variables = variables
        self.snippet_len = snippet_len
        self.shift = snippet_len // 2
        self.down = 2**n_filters
        self.out_len = snippet_len // self.down
        self.shift_out = self.shift // self.down
        self.batch_size = batch_size
        self.max_windows_per_chunk = max_windows_per_chunk
        self._chunk_fns: dict[tuple[int, int], object] = {}  # (wpc, bins) -> fn

    def _plan_chunk_size(self, n_win: int) -> int:
        """Windows per compiled chunk: the batch-size multiple covering n_win,
        rounded to a power-of-two batch count (bounds recompilation), capped
        at max_windows_per_chunk."""
        bsz = self.batch_size
        n_batches = max(1, -(-n_win // bsz))
        b = 1
        while b < n_batches:
            b *= 2
        return min(self.max_windows_per_chunk, b * bsz)

    # -- compiled chunk body --------------------------------------------------

    def _build_chunk_fn(self, n_bins: int, wpc: int):
        model, variables = self.model, self.variables
        snippet_len, shift = self.snippet_len, self.shift
        out_len, shift_out = self.out_len, self.shift_out
        bsz = min(self.batch_size, wpc)
        n_win_chunk = wpc
        n_out_chunk = (n_win_chunk - 1) * shift_out + out_len

        @jax.jit
        def chunk_fn(spec_chunk: jnp.ndarray, n_win_valid: jnp.ndarray):
            """spec_chunk: ((n_win_chunk+1)*shift, bins) frames covering the
            chunk's windows; returns (prob_sum, count) on the chunk's output
            grid, with invalid (padding) windows masked out."""
            halves = spec_chunk.reshape(n_win_chunk + 1, shift, n_bins)
            windows = jnp.concatenate([halves[:-1], halves[1:]], axis=1)
            windows = windows[..., None]  # (n_win_chunk, snippet, bins, 1)

            batches = windows.reshape(
                n_win_chunk // bsz, bsz, snippet_len, n_bins, 1
            )
            preds = jax.lax.map(
                lambda xb: model.apply(variables, xb, train=False), batches
            )
            preds = preds.reshape(n_win_chunk, out_len, -1)  # (W, 46, L)

            valid = jnp.arange(n_win_chunk) < n_win_valid
            n_labels = preds.shape[-1]

            # scatter-add overlap aggregation on the chunk-local output grid;
            # invalid windows are routed to a trash row
            win_ids = jnp.arange(n_win_chunk)[:, None]
            rows = win_ids * shift_out + jnp.arange(out_len)[None, :]
            rows = jnp.where(valid[:, None], rows, n_out_chunk)  # trash row
            flat_rows = rows.reshape(-1)
            flat_preds = preds.reshape(-1, n_labels)

            prob_sum = jnp.zeros((n_out_chunk + 1, n_labels), jnp.float32)
            prob_sum = prob_sum.at[flat_rows].add(flat_preds)
            count = jnp.zeros((n_out_chunk + 1,), jnp.float32)
            count = count.at[flat_rows].add(1.0)
            return prob_sum[:-1], count[:-1]

        return chunk_fn

    # -- host driver ------------------------------------------------------------

    def aggregate(self, spectrogram: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(T, bins) spectrogram -> (aggregated (T//down, L), overlap_count).

        Averaged sigmoid probabilities per output step, matching the
        reference's compute_aggregated_predictions (predict.py:235-295).
        """
        spec = np.asarray(spectrogram, dtype=np.float32)
        t, n_bins = spec.shape
        if t < self.snippet_len:
            raise ValueError(
                f"Recording too short for prediction: {t} spectrogram frames "
                f"< snippet length {self.snippet_len}"
            )
        n_win = (t - self.snippet_len) // self.shift + 1
        n_out_total = t // self.down
        n_labels = None

        wpc = self._plan_chunk_size(n_win)
        key = (wpc, n_bins)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = self._build_chunk_fn(n_bins, wpc)
        chunk_fn = self._chunk_fns[key]
        agg = None
        count = np.zeros((n_out_total,), np.float32)

        for w0 in range(0, n_win, wpc):
            n_valid = min(wpc, n_win - w0)
            # frames covering windows w0 .. w0+wpc: (wpc+1)*shift frames
            f0 = w0 * self.shift
            need = (wpc + 1) * self.shift
            chunk = np.zeros((need, n_bins), np.float32)
            have = min(need, t - f0)
            chunk[:have] = spec[f0 : f0 + have]

            prob_sum, cnt = chunk_fn(
                jnp.asarray(chunk), jnp.asarray(n_valid, jnp.int32)
            )
            prob_sum = np.asarray(prob_sum)
            cnt = np.asarray(cnt)
            if agg is None:
                n_labels = prob_sum.shape[-1]
                agg = np.zeros((n_out_total, n_labels), np.float32)
            o0 = w0 * self.shift_out
            o1 = min(o0 + prob_sum.shape[0], n_out_total)
            agg[o0:o1] += prob_sum[: o1 - o0]
            count[o0:o1] += cnt[: o1 - o0]

        valid = count > 0
        agg[valid] /= count[valid, None]
        return agg, count

    def binary_predictions(
        self,
        aggregated: np.ndarray,
        overlap_count: np.ndarray,
        threshold: float = 0.5,
    ) -> np.ndarray:
        """Binarize averaged probabilities: > threshold / max(overlap)."""
        adjusted = threshold / np.max(overlap_count)
        return (aggregated > adjusted).astype(np.int8)
