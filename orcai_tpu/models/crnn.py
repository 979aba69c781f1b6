"""CRNN detector architectures.

Functional equivalents of the reference's two Keras graphs
(architectures.py:18-241): a conv-ResNet trunk that downsamples
(736, 171, 1) -> (46, 11, C), topped either with bidirectional LSTMs + dense
head ("ResNetLSTM", the production model) or a frequency-mean + Conv1D head
("ResNet1DConv"). Per-frame multi-label sigmoid output of shape
(input_t / 2**len(filters), num_labels).

Training-time regularization matches the reference: l2(0.001) on the LSTM
input kernels and the 128-unit dense kernel (architectures.py:215,225,235)
is exposed through `l2_regularization`, added to the loss by the trainer.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from orcai_tpu.models.layers import BiLSTM, FrozenBiasConv, SeparableConv
from orcai_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

Dtype = Any
L2_SCALE = 0.001


class ResNetTrunk(nn.Module):
    """Entry conv + residual separable-conv blocks with (2, 2) downsampling."""

    filters: Sequence[int]
    kernel_size: int
    dropout_rate: float = 0.0
    block_dropout: bool = False  # ResNet1DConv drops out inside the trunk
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel_size, self.kernel_size)
        x = FrozenBiasConv(16, k, dtype=self.dtype, name="entry_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="entry_bn",
        )(x)
        x = nn.relu(x)

        previous = x
        for bi, size in enumerate(self.filters):
            y = nn.relu(x)
            y = SeparableConv(size, k, dtype=self.dtype, frozen_bias=True,
                              name=f"block{bi}_sep1")(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name=f"block{bi}_bn1",
            )(y)
            y = nn.relu(y)
            y = SeparableConv(size, k, dtype=self.dtype, frozen_bias=True,
                              name=f"block{bi}_sep2")(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name=f"block{bi}_bn2",
            )(y)
            y = nn.max_pool(y, (3, 2), strides=(2, 2), padding="SAME")
            shortcut = nn.Conv(
                size,
                (1, 1),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                name=f"block{bi}_shortcut",
            )(previous)
            x = y + shortcut
            previous = x
            if self.block_dropout:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        x = SeparableConv(36, k, dtype=self.dtype, frozen_bias=True,
                          name="head_sep")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="head_bn",
        )(x)
        x = nn.relu(x)
        return x


class ResNetLSTM(nn.Module):
    """Conv-ResNet trunk + 2x BiLSTM + dense head (reference production arch)."""

    num_labels: int
    filters: Sequence[int] = (30, 40, 50, 60)
    kernel_size: int = 3
    dropout_rate: float = 0.5
    lstm_units: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False,
                 trunk_only: bool = False, head_input: bool = False):
        # trunk_only / head_input split the graph for the dense-trunk
        # inference mode (ops/overlap.py): the conv trunk runs ONCE over a
        # slab of consecutive overlapping windows (they share 50% of their
        # frames), then only the sequence head runs per window. Submodule
        # names are explicit, so apply() binds the same parameter tree on
        # every path (flax creates compact submodules lazily — skipped
        # branches simply leave their params unread).
        if not head_input:
            x = ResNetTrunk(
                self.filters, self.kernel_size, dtype=self.dtype, name="trunk"
            )(x, train=train)
            if trunk_only:
                return x

        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)  # (B, 46, 11*36) — freq-major like Keras Reshape

        x = BiLSTM(self.lstm_units, dtype=self.dtype, name="bilstm1")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = BiLSTM(self.lstm_units, dtype=self.dtype, name="bilstm2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        x = nn.Dense(128, dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="dense_bn",
        )(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_labels, dtype=self.dtype, name="out")(x)
        logits = logits.astype(jnp.float32)
        return logits if return_logits else nn.sigmoid(logits)


class ResNet1DConv(nn.Module):
    """Conv-ResNet trunk + frequency-mean + wide Conv1D head."""

    num_labels: int
    filters: Sequence[int] = (30, 40, 50, 60)
    kernel_size: int = 3
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False,
                 trunk_only: bool = False, head_input: bool = False):
        if not head_input:
            x = ResNetTrunk(
                self.filters,
                self.kernel_size,
                dropout_rate=self.dropout_rate,
                block_dropout=True,
                dtype=self.dtype,
                name="trunk",
            )(x, train=train)
            if trunk_only:
                return x
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        x = jnp.mean(x, axis=2)  # reduce frequency axis -> (B, T, C)
        # the reference sizes the Conv1D kernel by the post-reduction channel
        # count (architectures.py:108-115)
        k_size = x.shape[-1]
        logits = nn.Conv(
            self.num_labels,
            (k_size,),
            padding="SAME",
            dtype=self.dtype,
            name="out_conv1d",
        )(x)
        logits = logits.astype(jnp.float32)
        return logits if return_logits else nn.sigmoid(logits)


class ResNetTCN(nn.Module):
    """Conv-ResNet trunk + dilated temporal-conv head (TPU-native extension).

    No upstream equivalent (the reference's two heads either scan
    sequentially — BiLSTM, architectures.py:210-229 — or see one fixed
    receptive field — Conv1D, architectures.py:109-115). The TCN head
    covers the full 46-step output sequence with purely parallel ops: a
    channel projection, then residual [relu -> dilated Conv1D -> BN ->
    dropout] blocks at dilations 1/2/4/8/16 (receptive field 1 + 2*31 = 63
    frames > 46), then the same dense head as ResNetLSTM. Everything maps
    to the MXU with no lax.scan, so training steps avoid the LSTM's
    sequential dependency chain. Reuses the `lstm_units` schema key as the
    TCN channel width — the parameter JSON schema is a preserved contract,
    so no new key is introduced.
    """

    num_labels: int
    filters: Sequence[int] = (30, 40, 50, 60)
    kernel_size: int = 3
    dropout_rate: float = 0.5
    lstm_units: int = 128  # TCN channel width (schema-compatible name)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False,
                 trunk_only: bool = False, head_input: bool = False):
        if not head_input:
            x = ResNetTrunk(
                self.filters, self.kernel_size, dtype=self.dtype, name="trunk"
            )(x, train=train)
            if trunk_only:
                return x

        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dense(self.lstm_units, dtype=self.dtype, name="proj")(x)

        for i, dilation in enumerate((1, 2, 4, 8, 16)):
            y = nn.relu(x)
            y = nn.Conv(
                self.lstm_units,
                (3,),
                kernel_dilation=(dilation,),
                padding="SAME",
                dtype=self.dtype,
                name=f"tcn{i}_conv",
            )(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name=f"tcn{i}_bn",
            )(y)
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            x = x + y

        x = nn.Dense(128, dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="dense_bn",
        )(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_labels, dtype=self.dtype, name="out")(x)
        logits = logits.astype(jnp.float32)
        return logits if return_logits else nn.sigmoid(logits)


ORCAI_ARCHITECTURES = {
    "ResNetLSTM": ResNetLSTM,
    "ResNet1DConv": ResNet1DConv,
    "ResNetTCN": ResNetTCN,
}


def build_model(orcai_parameter: dict, dtype: Dtype = jnp.float32):
    """Instantiate an architecture from the orcai parameter schema."""
    arch = orcai_parameter["architecture"]
    if arch not in ORCAI_ARCHITECTURES:
        raise ValueError(f"Unknown model architecture: {arch}")
    mp = orcai_parameter["model"]
    num_labels = len(orcai_parameter["calls"])
    kwargs = dict(
        num_labels=num_labels,
        filters=tuple(mp["filters"]),
        kernel_size=mp["kernel_size"],
        dropout_rate=mp["dropout_rate"],
        dtype=dtype,
    )
    if arch in ("ResNetLSTM", "ResNetTCN"):
        kwargs["lstm_units"] = mp["lstm_units"]
    return ORCAI_ARCHITECTURES[arch](**kwargs)


def init_variables(model, input_shape, seed: int = 0) -> dict:
    """Initialize model variables under jit.

    Eager initialization dispatches hundreds of tiny ops — prohibitively
    slow on remote-dispatch TPU backends; one compiled executable is ~10x
    faster end to end.
    """
    import jax

    init = jax.jit(model.init)
    return init(jax.random.key(seed), jnp.zeros((1, *input_shape)))


def l2_regularization(params) -> jnp.ndarray:
    """l2(0.001) on LSTM input kernels and the 128-dense kernel.

    Matches the kernel_regularizer placement in the reference graph
    (architectures.py:210-236): LSTM `kernel` (not the recurrent kernel)
    and the Dense(128) kernel; Keras l2 is scale * sum(x**2).
    """
    import jax

    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", "") for p in path]
        if "bilstm1" in keys or "bilstm2" in keys:
            if keys[-1] == "kernel":
                total += jnp.sum(leaf.astype(jnp.float32) ** 2)
        elif "dense" in keys and keys[-1] == "kernel":
            total += jnp.sum(leaf.astype(jnp.float32) ** 2)
    return L2_SCALE * total
