"""Persistent XLA compilation cache setup.

Compilation on remote-dispatch TPU backends costs tens of seconds; caching
compiled executables on disk makes every CLI invocation after the first
start hot. Called from the compute-path modules at import time.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache() -> None:
    global _enabled
    if _enabled or os.environ.get("ORCAI_TPU_DISABLE_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "ORCAI_TPU_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/orcai_tpu/xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
