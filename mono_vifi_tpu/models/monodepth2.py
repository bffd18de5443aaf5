"""Monodepth2-style depth network: ResNet encoder + U-Net disparity decoder.

Reference: networks/monodepth2.py (DepthEncoder :11-45, DepthDecoder :48-96).
The decoder runs coarse-to-fine with nearest x2 upsampling, encoder skip
connections, reflection-padded 3x3 convs + ELU, and sigmoid disparity heads
at the requested scales.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvBlock, Conv3x3
from mono_vifi_tpu.models.resnet import ResNetFeatures, num_ch_enc
from mono_vifi_tpu.ops.image import upsample_nearest


class DepthEncoder(nn.Module):
    """ResNet feature encoder (networks/monodepth2.py:11-45)."""

    num_layers: int = 18
    dtype: jnp.dtype | None = None

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        return num_ch_enc(self.num_layers)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNetFeatures(self.num_layers, self.dtype, name="encoder")(x, train)


class DepthDecoder(nn.Module):
    """U-Net disparity decoder (networks/monodepth2.py:48-96).

    Returns {scale: disp} with disp in (0, 1), NHWC (B, H/2^s, W/2^s, 1).
    """

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0,)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(
                    self.num_output_channels, self.dtype, name=f"dispconv_{i}"
                )(x)
                outputs[i] = nn.sigmoid(disp)
        return outputs
