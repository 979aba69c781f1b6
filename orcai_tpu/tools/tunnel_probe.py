"""Characterize the remote TPU tunnel's buffering + sync behavior.

Measured facts this probe demonstrates (they shaped the predict pipeline):

1. Before a process's first device->host fetch, the client ACKs uploads
   and dispatches without waiting for the device: `device_put` +
   `block_until_ready` of 64 MB returns in ~50 ms (an APPARENT ~1.3 GB/s
   that is client-side buffering, not transfer), `is_ready()` reports
   True, and dependent dispatches complete instantly. Queued work — lazy
   program loads (tens of seconds each) included — has not necessarily
   run.
2. The FIRST fetch of any size (even 4 bytes) is the only real sync: it
   drains the entire backlog, so it can take minutes in a fresh process.
3. After that first fetch the client reports honestly: the sustained
   host->device rate measures ~40-60 MB/s, and block_until_ready reflects
   real completion.

Design consequences: every fetch is a full queue drain + round trip, so
the predict path defers fetches to the very end (ops/overlap.py
single-fetch aggregation, pipeline/predict.py batch waves), and any
benchmark must issue one forcing fetch after warmup before trusting a
single timing (bench.py does).

Usage:  python -m orcai_tpu.tools.tunnel_probe
"""

from __future__ import annotations

import json
import time

import numpy as np


def h2d_mb_s(payload: np.ndarray, reps: int = 3) -> float:
    import jax

    dev = jax.devices()[0]
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(jax.device_put(payload, dev))
        best = min(best, time.time() - t0)
    return round(payload.nbytes / 1e6 / best, 1)


def d2h_mb_s(nbytes: int = 32 * 1024 * 1024, reps: int = 3) -> float:
    """Device->host MB/s right now (best of reps).

    The complement of h2d_mb_s for paths that bring LARGE tensors back —
    create-spectrograms materializes the float32 spectrogram on host, so
    its auto engine needs the downlink rate, which this tunnel does not
    guarantee to match the uplink. Each rep fetches a DISTINCT device
    buffer (jax caches an array's host copy after its first np.asarray,
    so re-fetching one buffer would time a no-op); a 4-byte forcing fetch
    first drains any queued work so the timings are honest (the
    readiness-API caveat in this module's docstring).
    """
    import jax
    import jax.numpy as jnp

    n = nbytes // 2
    base = jnp.zeros((n,), jnp.int16)
    bufs = [
        jax.block_until_ready(base + np.int16(i)) for i in range(reps)
    ]
    _ = np.asarray(bufs[0][:2])  # forcing fetch: drain the queue
    best = np.inf
    for b in bufs:
        t0 = time.time()
        _ = np.asarray(b)
        best = min(best, time.time() - t0)
    return round(nbytes / 1e6 / best, 1)


def main() -> None:
    import jax
    import jax.numpy as jnp

    payload = np.random.default_rng(0).integers(
        -32768, 32768, 32 * 1024 * 1024
    ).astype(np.int16)
    jax.block_until_ready(jax.device_put(payload[:1024], jax.devices()[0]))

    apparent = h2d_mb_s(payload)  # pre-sync: buffered ACKs, not transfer

    # compute + block_until_ready does NOT force the queue either
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    jax.block_until_ready(y)
    ready_before_sync = bool(y.is_ready())

    # the forcing fetch: 4 bytes; drains every queued transfer/load/exec
    t0 = time.time()
    _ = np.asarray(jax.block_until_ready(jnp.ones((1,), jnp.float32)))
    first_fetch_s = time.time() - t0

    real = h2d_mb_s(payload)  # post-sync: honest sustained rate
    time.sleep(2)
    real_later = h2d_mb_s(payload)

    print(json.dumps({
        "h2d_mb_s_apparent_presync": apparent,
        "is_ready_true_before_any_fetch": ready_before_sync,
        "first_4b_fetch_seconds": round(first_fetch_s, 2),
        "h2d_mb_s_real_postsync": real,
        "h2d_mb_s_real_after_2s": real_later,
        "payload_mb": 64,
    }))


if __name__ == "__main__":
    main()
