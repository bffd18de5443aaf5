"""ResNet feature backbone with torchvision-compatible structure (NHWC).

Used by the Monodepth2-style depth encoder (reference networks/monodepth2.py)
and the two-frame PoseNet encoder (reference networks/posenet.py:10-52, which
widens conv1 to 6 input channels). Module names mirror torchvision state_dict
keys (conv1/bn1/layer{1..4}/<idx>/conv{1,2}...) so the PyTorch->JAX weight
converter is a mechanical key mapping.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import batch_norm
from mono_vifi_tpu.ops.image import max_pool_3x3_s2_p1


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(
            self.planes, (3, 3), (self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = batch_norm(train, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = batch_norm(train, "bn2", self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = batch_norm(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype | None = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), (self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = batch_norm(train, "bn2", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype, name="conv3",
        )(y)
        y = batch_norm(train, "bn3", self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = batch_norm(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(y + identity)


_LAYER_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2), 1),
    34: (BasicBlock, (3, 4, 6, 3), 1),
    50: (Bottleneck, (3, 4, 6, 3), 4),
    101: (Bottleneck, (3, 4, 23, 3), 4),
    152: (Bottleneck, (3, 8, 36, 3), 4),
}


def num_ch_enc(num_layers: int) -> tuple[int, ...]:
    """Per-scale channel counts of the 5 feature maps."""
    _, _, exp = _LAYER_SPECS[num_layers]
    return (64, 64 * exp, 128 * exp, 256 * exp, 512 * exp)


class ResNetFeatures(nn.Module):
    """ResNet trunk returning the 5-scale feature pyramid.

    Applies the reference's input normalization (x - 0.45) / 0.225
    (networks/monodepth2.py:35, networks/posenet.py:83).
    """

    num_layers: int = 18
    dtype: jnp.dtype | None = None
    block_l1: bool = True  # evaluate layer1 on fy=2 row blocks: a 64-ch conv
    # at 1/4 res runs at ~16% of MXU peak (lane padding); the exact 128-ch
    # block form is 2.4x faster (tools/bench_conv.py). BasicBlock archs only.

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mono_vifi_tpu.ops import blockconv as bc

        block_cls, counts, _ = _LAYER_SPECS[self.num_layers]

        x = (x - 0.45) / 0.225
        use_block_stem = self.block_l1 and x.shape[1] % 4 == 0
        if use_block_stem:
            # stem on fy=2 row blocks: the 7x7/s2 conv emits block-form
            # output (one 9-row phase-major kernel), so conv1's lanes run
            # full and bn1/relu (the single largest BN-backward reduction
            # in the step) see 128-channel tiles
            w = bc._KernelOnly((7, 7, x.shape[-1], 64), name="conv1")()
            xb = bc.stem_conv_s2_blocked(x, w, self.dtype)
            xb = bc.BlockBatchNorm(64, 2, self.dtype, name="bn1")(xb, train)
            f0 = bc.d2s_rows(nn.relu(xb), 2)
        else:
            x = nn.Conv(
                64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
            x = batch_norm(train, "bn1", self.dtype)(x)
            f0 = nn.relu(x)

        feats = [f0]
        x = max_pool_3x3_s2_p1(f0)
        in_planes = 64
        use_block_l1 = (
            self.block_l1 and block_cls is BasicBlock and x.shape[1] % 2 == 0
        )
        for li, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), counts), start=1
        ):
            if li == 1 and use_block_l1:
                from mono_vifi_tpu.ops.blockconv import (
                    BlockBasicBlock, d2s_rows, s2d_rows,
                )

                xb = s2d_rows(x, 2)
                for bi in range(n_blocks):
                    xb = BlockBasicBlock(
                        64, 2, self.dtype, name=f"layer1_{bi}"
                    )(xb, train)
                x = d2s_rows(xb, 2)
                feats.append(x)
                continue
            stride = 1 if li == 1 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                exp = getattr(block_cls, "expansion", 1) if block_cls is Bottleneck else 1
                out_planes = planes * (4 if block_cls is Bottleneck else 1)
                downsample = bi == 0 and (s != 1 or in_planes != out_planes)
                x = block_cls(
                    planes, s, downsample, self.dtype, name=f"layer{li}_{bi}"
                )(x, train)
                in_planes = out_planes
            feats.append(x)
        return feats
