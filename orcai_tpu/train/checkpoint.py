"""Preemption-safe training checkpoints (orbax).

TPU pods preempt; the reference has no mid-training resume beyond its
best-model file (SURVEY §5.3/5.4). Here every epoch end persists the FULL
training state — params, batch stats, optimizer state, PRNG key, epoch,
learning rate and metric history — through orbax, and `train` auto-resumes
from the latest step when a resume directory is present.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


class TrainCheckpointer:
    """Rolling orbax checkpoints of the full training state."""

    def __init__(self, directory: Path | str, max_to_keep: int = 1):
        self.directory = Path(directory).resolve()
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        epoch: int,
        state,
        history: dict,
        lr: float,
        counters: dict | None = None,
    ) -> None:
        params, batch_stats, opt_state, rng = state
        payload = {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "opt_state": jax.device_get(opt_state),
            "rng_data": np.asarray(jax.random.key_data(rng)),
        }
        # counters: exact EarlyStopping/ReduceLROnPlateau staleness at epoch
        # end, so a resumed run reduces LR / stops at the same epoch an
        # uninterrupted run would
        meta = {
            "epoch": int(epoch),
            "lr": float(lr),
            "history": history,
            "counters": counters,
        }
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self, state_template
    ) -> tuple[tuple, dict, float, int, dict | None] | None:
        """Restore (state, history, lr, epoch, counters) from the latest
        checkpoint; counters is None for checkpoints written before counter
        persistence."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        params, batch_stats, opt_state, rng = state_template
        template = {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "opt_state": jax.device_get(opt_state),
            "rng_data": np.asarray(jax.random.key_data(rng)),
        }
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        payload = restored["state"]
        meta = restored["meta"]
        import jax.numpy as jnp

        state = (
            jax.tree.map(jnp.asarray, payload["params"]),
            jax.tree.map(jnp.asarray, payload["batch_stats"]),
            jax.tree.map(jnp.asarray, payload["opt_state"]),
            jax.random.wrap_key_data(jnp.asarray(payload["rng_data"])),
        )
        return state, meta["history"], meta["lr"], meta["epoch"], meta.get("counters")

    def close(self) -> None:
        self._mgr.close()

    def cleanup(self) -> None:
        """Remove the resume directory (called after a completed run)."""
        self.close()
        shutil.rmtree(self.directory, ignore_errors=True)
