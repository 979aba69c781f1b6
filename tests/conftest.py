"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/pjit paths are exercised without TPU hardware via XLA's
host-platform device-count override — the standard JAX fake-backend idiom.
Must run before jax initializes, hence the env mutation at import time.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# The shell presets JAX_PLATFORMS=axon (TPU); the explicit config update is
# what actually forces the CPU backend for the virtual 8-device test mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
