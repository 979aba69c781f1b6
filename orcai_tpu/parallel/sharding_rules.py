"""Parameter sharding rules for the CRNN models (tensor parallelism).

The production orcai-v1 model is small enough that pure data parallelism is
the right deployment (SURVEY §2: TP "not needed" for ~1-2 M params), but the
framework supports sharding model weights over the mesh "model" axis for
larger variants: LSTM input/recurrent kernels and dense kernels are split
along their output (gate/unit) dimension, biases along the same dimension,
convolution kernels along output channels. XLA GSPMD then partitions the
matching activations and inserts the collectives.

Rules are expressed as path-suffix matchers over the flax parameter tree, so
they apply to any of the architectures in orcai_tpu.models.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_keys: tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for one parameter, sharding output dims over "model"."""
    last = path_keys[-1]
    parent = path_keys[-2] if len(path_keys) > 1 else ""

    if last in ("kernel", "recurrent_kernel"):
        if ndim == 2:  # dense / LSTM fused kernels: (in, out-ish)
            return P(None, "model")
        if ndim == 4:  # conv kernels (kh, kw, in, out)
            if parent == "depthwise":
                # depthwise factor (kh, kw, 1, in_ch): its last dim is the
                # INPUT-channel axis of the composed kernel — sharding it
                # while the pointwise in_ch stays replicated would force
                # GSPMD to reconcile them with extra collectives
                return P()
            return P(None, None, None, "model")
        if ndim == 3:  # Conv1D (k, in, out)
            return P(None, None, "model")
    if last in ("bias", "scale"):
        return P("model") if ndim == 1 else P()
    return P()


def params_shardings(params, mesh: Mesh):
    """NamedSharding tree for a parameter pytree over the given mesh.

    Leaves whose sharded dimension is not divisible by the "model" axis size
    (e.g. a 7-label output head on a 2-way model axis) stay replicated.
    With mesh["model"] == 1 this degenerates to replication.
    """
    n_model = mesh.shape["model"]

    def one(path, leaf):
        keys = tuple(getattr(p, "key", "") for p in path)
        spec = _spec_for(keys, leaf.ndim)
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % n_model != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    shardings = params_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
