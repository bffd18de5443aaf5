"""Shared NHWC building blocks (reference layers.py:106-165 ConvBlock family).

Parameter layout notes:
  - Conv kernels are HWIO; the PyTorch->JAX weight converter transposes
    torch's OIHW.
  - BatchNorm matches torch defaults (eps=1e-5, running-stat momentum 0.1,
    i.e. flax momentum 0.9). Under pjit with a batch-sharded input the batch
    statistics are computed over the *global* batch by XLA collectives, which
    reproduces the reference's SyncBatchNorm (train.py:205-208) for free.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class Conv3x3(nn.Module):
    """Reflection-padded 3x3 conv (reference layers.py:121-138)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from mono_vifi_tpu.ops.image import reflect_pad_2d

        x = reflect_pad_2d(x, 1)  # fused-backward reflect pad
        return nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (reference layers.py:106-118)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, self.dtype, name="conv")(x))


class ConvBlock1x1(nn.Module):
    """1x1 conv + ELU (reference layers.py:141-165)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.elu(
            nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv")(x)
        )


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) semantics)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, 0.25, jnp.float32), (x.shape[-1],)
        )
        alpha = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class ConvPReLU(nn.Module):
    """Conv + PReLU (reference networks/IFRNet.py:121-125 convrelu)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        return PReLU(name="prelu")(x)


class ConvTranspose4x4(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1): exact 2x upsampler, torch semantics.

    Implemented as an input-dilated conv (lhs_dilation=2, pad 2, kernel
    spatially flipped) which is mathematically identical to torch's
    transposed conv and lowers to a single XLA conv. Kernel stored HWIO for
    the equivalent dilated conv; the weight converter flips torch's
    (in, out, kh, kw) accordingly.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (4, 4, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(dtype)
        return y


def batch_norm(train: bool, name: str, dtype=None) -> nn.BatchNorm:
    """Torch-default BatchNorm; batch stats live in the 'batch_stats' collection."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )
