"""Building-block layers for the CRNN detectors.

Implemented to be functionally interchangeable with the Keras layers the
reference composes (architectures.py:120-241) so trained checkpoints can be
converted 1:1, while the internals are TPU-idiomatic: the LSTM hoists the
input projection of all timesteps into one large MXU matmul and scans only
the recurrent part; convolutions use TF-style SAME padding to preserve the
(736, 171) -> (46, 11) trunk geometry.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class SeparableConv(nn.Module):
    """Depthwise + pointwise convolution (Keras SeparableConv2D semantics).

    Parameters are the standard depthwise/pointwise factors (identical tree
    to the two-conv formulation, so Keras checkpoint conversion is
    unchanged), but the forward pass composes them into ONE dense kernel
    K[h,w,i,o] = dw[h,w,i] * pw[i,o] and runs a single convolution: the
    function and its gradients are mathematically identical (chain rule
    through the composition), while XLA's dense-conv emitters replace the
    grouped-depthwise emitter, whose batch-in-lanes layout poisons every
    surrounding reduction (profiled: −15% on the full training step).
    """

    features: int
    kernel_size: tuple[int, int]
    dtype: Dtype = jnp.float32
    frozen_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        dw_kernel, _ = _ConvParams(
            (kh, kw, 1, in_ch), name="depthwise"
        )()
        pw_kernel, pw_bias = _ConvParams(
            (1, 1, in_ch, self.features), bias_features=self.features,
            name="pointwise",
        )()
        if self.frozen_bias:
            # a conv bias feeding straight into a BatchNorm has EXACTLY zero
            # gradient (the mean subtraction cancels any constant shift) and
            # is function-invariant; stop_gradient removes the pointless
            # full-tensor bias-grad reductions from the backward pass
            pw_bias = jax.lax.stop_gradient(pw_bias)
        k = jnp.einsum("hwqi,io->hwio", dw_kernel, pw_kernel[0, 0])
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + pw_bias.astype(self.dtype)


class FrozenBiasConv(nn.Module):
    """nn.Conv-compatible conv whose bias is excluded from gradients.

    For convolutions immediately followed by a BatchNorm: the bias has
    exactly zero gradient there (constant shifts cancel in the mean
    subtraction), so stop_gradient skips the full-tensor reduction that
    would otherwise compute it. Parameter tree matches nn.Conv.
    """

    features: int
    kernel_size: tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jax.lax.stop_gradient(bias).astype(self.dtype)


class _ConvParams(nn.Module):
    """Parameter holder matching an nn.Conv child scope (kernel [+ bias])."""

    kernel_shape: tuple[int, ...]
    bias_features: int | None = None

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape,
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.bias_features,),
                jnp.float32,
            )
            if self.bias_features is not None
            else None
        )
        return kernel, bias


def _unit_forget_bias(key, shape, dtype=jnp.float32):
    """Zeros with ones in the forget-gate block (Keras unit_forget_bias)."""
    units = shape[0] // 4
    b = jnp.zeros(shape, dtype)
    return b.at[units : 2 * units].set(1.0)


class LSTM(nn.Module):
    """Unidirectional LSTM over (B, T, D) returning all hidden states.

    Gate math and parameter layout follow Keras: fused kernels of shape
    (D, 4U) / (U, 4U) with gate order [input, forget, cell, output], hard
    sigmoid off, unit forget bias on. The x @ kernel product for every
    timestep is computed as one (B*T, D) @ (D, 4U) matmul before the scan,
    so the MXU sees one large GEMM and the scan carries only the (B, U)
    recurrent matmul per step.
    """

    units: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, _, d = x.shape
        u = self.units
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (d, 4 * u), jnp.float32
        )
        recurrent = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (u, 4 * u), jnp.float32
        )
        bias = self.param("bias", _unit_forget_bias, (4 * u,), jnp.float32)

        xp = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(
            self.dtype
        )  # (B, T, 4U)
        xp = jnp.swapaxes(xp, 0, 1)  # (T, B, 4U) scan-major
        rec = recurrent.astype(self.dtype)

        def step(carry, xt):
            h, c = carry
            z = xt + jnp.dot(h, rec)
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        b = x.shape[0]
        init = (
            jnp.zeros((b, u), self.dtype),
            jnp.zeros((b, u), self.dtype),
        )
        _, hs = jax.lax.scan(step, init, xp, reverse=self.reverse)
        return jnp.swapaxes(hs, 0, 1)  # (B, T, U)


class BiLSTM(nn.Module):
    """Bidirectional LSTM, concat merge (Keras Bidirectional default)."""

    units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = LSTM(self.units, reverse=False, dtype=self.dtype, name="forward")(x)
        bwd = LSTM(self.units, reverse=True, dtype=self.dtype, name="backward")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)
