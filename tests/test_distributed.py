"""Executable coverage for the multi-host init helpers.

True multi-host needs multiple processes on real pods; what CAN be proven
here is that the single-controller path actually runs: distributed
initialization with an explicit coordinator, hybrid-mesh construction over
virtual devices, and a collective over the resulting mesh. Runs in a
subprocess because jax.distributed state is process-global.
"""

import subprocess
import sys
from pathlib import Path

CHILD = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from orcai_tpu.parallel.distributed import initialize_distributed, make_hybrid_mesh
from orcai_tpu.parallel.mesh import batch_sharding

# single-process "cluster" with an explicit coordinator: exercises the real
# jax.distributed.initialize code path end to end
initialize_distributed(
    coordinator_address="localhost:12473", num_processes=1, process_id=0
)
assert jax.process_count() == 1

mesh = make_hybrid_mesh()
assert mesh.shape["data"] == jax.device_count(), mesh.shape

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

x = jax.device_put(
    np.arange(mesh.shape["data"] * 4, dtype=np.float32).reshape(-1, 4),
    batch_sharding(mesh),
)
total = jax.jit(
    lambda x: jnp.sum(x),
    in_shardings=batch_sharding(mesh),
    out_shardings=NamedSharding(mesh, P()),
)(x)
expected = float(np.arange(mesh.shape["data"] * 4).sum())
assert float(total) == expected, (float(total), expected)
print("DISTRIBUTED-OK", mesh.shape["data"])
"""


def test_single_controller_distributed_init_and_hybrid_mesh():
    env = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PATH": "/usr/bin:/bin",
        "PYTHONPATH": str(Path(__file__).resolve().parents[1]),
        "HOME": str(Path.home()),
    }
    proc = subprocess.run(
        [sys.executable, "-c", CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DISTRIBUTED-OK 4" in proc.stdout
