"""D-HRNet depth network (reference networks/DHRNet.py): HRNet18 encoder +
a progressive multi-scale-fusion decoder (per-level reflect-conv blocks,
nearest-upsampled cross-scale 1x1 fusions summed into the finer levels,
single full-res sigmoid disparity head)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvBlock, ConvBlock1x1, Conv3x3
from mono_vifi_tpu.models.hrnet import HighResolutionNet
from mono_vifi_tpu.ops.image import upsample_nearest


class DepthEncoder(nn.Module):
    """HRNet18 wrapper with the standard input normalization
    (reference DHRNet.py:9-24)."""

    arch: str = "hrnet18"
    dtype: jnp.dtype | None = None

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        return HighResolutionNet(self.arch).num_ch_enc

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = (x - 0.45) / 0.225
        return HighResolutionNet(self.arch, self.dtype, name="encoder")(x, train)


class DepthDecoder(nn.Module):
    """Multi-scale-fusion decoder (reference DHRNet.py:27-146).

    Rounds r=0..2 progressively collapse the 4 HRNet branches: each level gets
    a reflect-ConvBlock, every coarser level is nearest-upsampled + 1x1-fused
    and summed into each finer one; round 3 merges with the stem feature;
    rounds 4-5 upsample to full res; sigmoid disp at scale 0 only.
    """

    num_ch_enc: Sequence[int] = (64, 18, 36, 72, 144)
    scales: Sequence[int] = (0,)
    num_output_channels: int = 1
    dtype: jnp.dtype | None = None
    s2d_full_res: bool = True  # evaluate rounds 4-5 (the full-res tail) in
    # space-to-depth form — exact rearrangement of the same parameters; see
    # models/monodepth2.py S2D notes (16-ch/1-ch full-res planes pay 8-128x
    # lane-tile padding otherwise)

    @nn.compact
    def __call__(self, input_features):
        ch = self.num_ch_enc
        e0, e1, e2, e3, e4 = input_features

        # round 0: levels 1..4
        d = {
            i: ConvBlock(int(ch[i]), self.dtype, name=f"parallel_0_{i}")(f)
            for i, f in ((1, e1), (2, e2), (3, e3), (4, e4))
        }

        def fuse(rnd, src, dst, x, factor):
            x = upsample_nearest(x, factor)
            return ConvBlock1x1(
                int(ch[dst]), self.dtype, name=f"conv1x1_{rnd}_{src}{dst}"
            )(x)

        d1_in = d[1] + fuse(0, 2, 1, d[2], 2) + fuse(0, 3, 1, d[3], 4) + fuse(0, 4, 1, d[4], 8)
        d2_in = d[2] + fuse(0, 3, 2, d[3], 2) + fuse(0, 4, 2, d[4], 4)
        d3_in = d[3] + fuse(0, 4, 3, d[4], 2)

        # round 1: levels 1..3
        d1 = ConvBlock(int(ch[1]), self.dtype, name="parallel_1_1")(d1_in)
        d2 = ConvBlock(int(ch[2]), self.dtype, name="parallel_1_2")(d2_in)
        d3 = ConvBlock(int(ch[3]), self.dtype, name="parallel_1_3")(d3_in)
        d1_in = d1 + fuse(1, 2, 1, d2, 2) + fuse(1, 3, 1, d3, 4)
        d2_in = d2 + fuse(1, 3, 2, d3, 2)

        # round 2: levels 1..2
        d1 = ConvBlock(int(ch[1]), self.dtype, name="parallel_2_1")(d1_in)
        d2 = ConvBlock(int(ch[2]), self.dtype, name="parallel_2_2")(d2_in)
        d1_in = d1 + fuse(2, 2, 1, d2, 2)

        # round 3: merge with stem level 0
        d0 = ConvBlock(int(ch[0]), self.dtype, name="parallel_3_0")(e0)
        d1 = ConvBlock(int(ch[1]), self.dtype, name="parallel_3_1")(d1_in)
        d0_in = d0 + fuse(3, 1, 0, d1, 2)

        # rounds 4-5: up to full res
        d4 = ConvBlock(32, self.dtype, name="parallel_4_0")(d0_in)
        if self.s2d_full_res:
            from mono_vifi_tpu.models.monodepth2 import (
                _depth_to_space,
                _NestedConvParams,
                _s2d_conv3x3,
            )

            # nearest x2 == channel tile across the 4 phases; the two
            # full-res convs run in block space with the SAME parameters
            xs = jnp.tile(d4, (1, 1, 1, 4))
            kw, kb = _NestedConvParams((3, 3, 32, 16), 16, 2,
                                       name="parallel_5_0")()
            xs = nn.elu(_s2d_conv3x3(xs, kw, kb, 32, self.dtype))
            dw, db = _NestedConvParams(
                (3, 3, 16, self.num_output_channels),
                self.num_output_channels, 1, name="dispconv_0",
            )()
            ds = nn.sigmoid(_s2d_conv3x3(xs, dw, db, 16, self.dtype))
            return {0: _depth_to_space(
                ds.astype(jnp.float32), self.num_output_channels
            )}
        d4 = upsample_nearest(d4, 2)
        d5 = ConvBlock(16, self.dtype, name="parallel_5_0")(d4)
        disp = nn.sigmoid(
            Conv3x3(self.num_output_channels, self.dtype, name="dispconv_0")(d5)
        )
        return {0: disp}
