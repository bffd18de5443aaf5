"""HRNet backbone (reference networks/hrnet_encoder.py + hrnet_config.py),
NHWC Flax.

HighResolutionNet: 3x3/s2 conv stem x2 (features at 1/2 and 1/4), a
Bottleneck stage-1, then three multi-branch stages exchanging information
through fuse layers (1x1 conv + bn + bilinear align_corners=True upsample for
lower->higher resolution, chains of stride-2 3x3 conv+bn(+relu) for
higher->lower). Returns 5 features: [stem@1/2 (64ch), branch outputs
18/36/72/144 at 1/4..1/32] for hrnet18.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import batch_norm
from mono_vifi_tpu.models.resnet import BasicBlock, Bottleneck
from mono_vifi_tpu.ops import blockconv as bc
from mono_vifi_tpu.ops.image import resize_bilinear


def _branch_fb(c: int, b: int) -> int:
    """Batch-fold factor for a branch's BasicBlock run (ops/blockconv.py).

    Folding fb samples into channels makes the branch convs block-diagonal at
    fb*c channels: fb x the dense FLOPs, but measured on v5e
    (tools/bench_conv.py) the 18ch conv runs at 6.2% of peak vs 69% for its
    126ch x7 block-diagonal form — a 1.6x wall-time WIN (vs row-blocking,
    which is only conv-par). Capped at fb*c <= 128 (one lane tile) and fb
    must divide the batch; largest qualifying factor wins.
    """
    best = 1
    for f in range(2, 9):
        if b % f == 0 and c * f <= 128:
            best = f
    return best


def _branch_fy(c: int, h: int) -> int:
    """Row-block factor for a branch's BasicBlock run (ops/blockconv.py).

    The 18/36-channel branch convs run at 6-9% of MXU peak from lane
    padding; evaluating them on fy row blocks (channels x fy, rows / fy)
    costs fy x the dense FLOPs. Measured on v5e (tools/bench_conv.py): the
    CONV is wall-time par up to fy*c = 72 (18ch 177us == fy4/72ch 173us)
    and loses beyond (fy4pad/128ch 221us, b2 fy2 +29%), so the cap is 72 —
    the win is the block's BN/relu/residual elementwise work and BN-stat
    reductions running on 4x fatter lanes. Factor capped so the blocked
    height stays >= 4 rows.
    """
    fy = 1
    while c * (fy * 2) <= 72 and h % (fy * 2) == 0 and h // (fy * 2) >= 4:
        fy *= 2
    return fy

# stage specs: (num_modules, num_branches, blocks_per_branch, channels, block)
HRNET_CONFIGS = {
    "hrnet18": dict(
        stage1=(1, 1, (4,), (64,), "bottleneck"),
        stage2=(1, 2, (4, 4), (18, 36), "basic"),
        stage3=(4, 3, (4, 4, 4), (18, 36, 72), "basic"),
        stage4=(3, 4, (4, 4, 4, 4), (18, 36, 72, 144), "basic"),
    ),
    "hrnet32": dict(
        stage1=(1, 1, (4,), (64,), "bottleneck"),
        stage2=(1, 2, (4, 4), (32, 64), "basic"),
        stage3=(4, 3, (4, 4, 4), (32, 64, 128), "basic"),
        stage4=(3, 4, (4, 4, 4, 4), (32, 64, 128, 256), "basic"),
    ),
    "hrnet48": dict(
        stage1=(1, 1, (4,), (64,), "bottleneck"),
        stage2=(1, 2, (4, 4), (48, 96), "basic"),
        stage3=(4, 3, (4, 4, 4), (48, 96, 192), "basic"),
        stage4=(3, 4, (4, 4, 4, 4), (48, 96, 192, 384), "basic"),
    ),
    "hrnet64": dict(
        stage1=(1, 1, (4,), (64,), "bottleneck"),
        stage2=(1, 2, (4, 4), (64, 128), "basic"),
        stage3=(4, 3, (4, 4, 4), (64, 128, 256), "basic"),
        stage4=(3, 4, (4, 4, 4, 4), (64, 128, 256, 512), "basic"),
    ),
}


class _ConvBNRelu(nn.Module):
    features: int
    stride: int = 1
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3), (self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = batch_norm(train, "bn", self.dtype)(x)
        return nn.relu(x) if self.relu else x


class _FoldConvBNRelu(nn.Module):
    """_ConvBNRelu evaluated on fb-batch-folded input (block-diagonal kernel
    + group-stat BN); identical param/stat tree ('conv'/kernel, 'bn'/...)."""

    features: int
    fb: int
    stride: int = 1
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1] // self.fb
        k = bc._KernelOnly((3, 3, cin, self.features), name="conv")()
        cd = self.dtype or x.dtype
        x = jax.lax.conv_general_dilated(
            x.astype(cd), bc.diag_kernel(k, self.fb).astype(cd),
            (self.stride, self.stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = bc.BlockBatchNorm(self.features, self.fb, self.dtype, name="bn")(
            x, train
        )
        return nn.relu(x) if self.relu else x


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch block runs + all-to-all fusion
    (reference hrnet_encoder.py:138-285).

    With fb != None, branch i's input/output are fb[i]-batch-folded
    (ops/blockconv.py): the branch BasicBlocks, the fuse 1x1 convs + BN +
    bilinear upsamples, the single-conv stride-2 fuse chains, and the fuse
    adds/relu all run on folded lanes — measured 1.6-1.9x conv wall-time
    wins at 18/36 channels (tools/bench_conv.py fold rows) plus 3-6x fatter
    elementwise lanes. Exact up to float reassociation; param tree unchanged.
    """

    channels: Sequence[int]
    num_blocks: Sequence[int]
    dtype: jnp.dtype | None = None
    block_branches: bool = True  # row-block fy fallback for unfolded branches
    fb: Sequence[int] | None = None  # per-branch batch-fold of input/output

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        fb = tuple(self.fb) if self.fb is not None else (1,) * n
        ys = []
        for i in range(n):
            y = xs[i]
            c = self.channels[i]
            if fb[i] > 1:
                for k in range(self.num_blocks[i]):
                    y = bc.FoldBasicBlock(
                        c, fb[i], self.dtype, name=f"branch{i}_{k}"
                    )(y, train)
            else:
                fy = _branch_fy(c, y.shape[1]) if self.block_branches else 1
                if fy > 1:
                    yb = bc.s2d_rows(y, fy)
                    for k in range(self.num_blocks[i]):
                        yb = bc.BlockBasicBlock(
                            c, fy, self.dtype, name=f"branch{i}_{k}"
                        )(yb, train)
                    y = bc.d2s_rows(yb, fy)
                else:
                    for k in range(self.num_blocks[i]):
                        y = BasicBlock(
                            c, 1, False, self.dtype, name=f"branch{i}_{k}"
                        )(y, train)
            ys.append(y)
        if n == 1:
            return ys

        plain = {}

        def as_fold(j: int, f: int):
            """Branch j's output re-expressed at fold factor f."""
            if f == fb[j]:
                return ys[j]
            if j not in plain:
                plain[j] = (
                    bc.unfold_batch(ys[j], fb[j]) if fb[j] > 1 else ys[j]
                )
            return bc.fold_batch(plain[j], f) if f > 1 else plain[j]

        fused = []
        for i in range(n):
            ci, fbi = self.channels[i], fb[i]
            hw_i = (ys[i].shape[1], ys[i].shape[2])
            acc = None
            for j in range(n):
                if j == i:
                    t = ys[j]
                elif j > i:
                    t = as_fold(j, fbi)
                    if fbi > 1:
                        k = bc._KernelOnly(
                            (1, 1, self.channels[j], ci),
                            name=f"fuse_{i}_{j}_conv",
                        )()
                        cd = self.dtype or t.dtype
                        t = jax.lax.conv_general_dilated(
                            t.astype(cd), bc.diag_kernel(k, fbi).astype(cd),
                            (1, 1), ((0, 0), (0, 0)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        )
                        t = bc.BlockBatchNorm(
                            ci, fbi, self.dtype, name=f"fuse_{i}_{j}_bn"
                        )(t, train)
                    else:
                        t = nn.Conv(
                            ci, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"fuse_{i}_{j}_conv",
                        )(t)
                        t = batch_norm(train, f"fuse_{i}_{j}_bn", self.dtype)(t)
                    t = resize_bilinear(t, hw_i, align_corners=True)
                else:
                    t = as_fold(j, fbi)
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = ci if last else self.channels[j]
                        if fbi > 1:
                            t = _FoldConvBNRelu(
                                out_ch, fbi, 2, relu=not last,
                                dtype=self.dtype, name=f"fuse_{i}_{j}_{k}",
                            )(t, train)
                        else:
                            t = _ConvBNRelu(
                                out_ch, 2, relu=not last, dtype=self.dtype,
                                name=f"fuse_{i}_{j}_{k}",
                            )(t, train)
                acc = t if acc is None else acc + t
            fused.append(nn.relu(acc))
        return fused


class HighResolutionNet(nn.Module):
    """Returns [stem@1/2, b0@1/4, b1@1/8, b2@1/16, b3@1/32]."""

    arch: str = "hrnet18"
    dtype: jnp.dtype | None = None
    block_branches: bool = True  # batch-fold / row-block the branch runs

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        cfg = HRNET_CONFIGS[self.arch]
        return (64,) + tuple(cfg["stage4"][3])

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = HRNET_CONFIGS[self.arch]

        x = nn.Conv(64, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, "bn1", self.dtype)(x)
        f_stem = nn.relu(x)

        x = nn.Conv(64, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(f_stem)
        x = batch_norm(train, "bn2", self.dtype)(x)
        x = nn.relu(x)

        # stage 1: Bottleneck x4 at 1/4 res
        n_blocks = cfg["stage1"][2][0]
        planes = cfg["stage1"][3][0]
        for k in range(n_blocks):
            x = Bottleneck(
                planes, 1, downsample=(k == 0), dtype=self.dtype, name=f"layer1_{k}"
            )(x, train)
        prev_channels = [planes * 4]
        ys = [x]

        for s_idx, stage_key in enumerate(("stage2", "stage3", "stage4"), start=2):
            num_modules, n_br, num_blocks, channels, _ = cfg[stage_key]
            # transition (reference :355-388)
            xs = []
            for i in range(n_br):
                if i < len(prev_channels):
                    if prev_channels[i] != channels[i]:
                        xs.append(
                            _ConvBNRelu(
                                channels[i], 1, dtype=self.dtype,
                                name=f"transition{s_idx - 1}_{i}",
                            )(ys[i], train)
                        )
                    else:
                        xs.append(ys[i])
                else:
                    t = ys[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_ch = channels[i] if j == i - len(prev_channels) else \
                            prev_channels[-1]
                        t = _ConvBNRelu(
                            out_ch, 2, dtype=self.dtype,
                            name=f"transition{s_idx - 1}_{i}_{j}",
                        )(t, train)
                    xs.append(t)
            # fold small-channel branches into lanes ONCE per stage; modules
            # pass folded tensors straight through (ops/blockconv.py)
            B0 = xs[0].shape[0]
            fb = tuple(
                _branch_fb(c, B0) if self.block_branches else 1
                for c in channels
            )
            xs = [
                bc.fold_batch(x, f) if f > 1 else x for x, f in zip(xs, fb)
            ]
            for m in range(num_modules):
                xs = HRModule(
                    channels, num_blocks, self.dtype,
                    block_branches=self.block_branches, fb=fb,
                    name=f"stage{s_idx}_{m}",
                )(xs, train)
            ys = [
                bc.unfold_batch(x, f) if f > 1 else x for x, f in zip(xs, fb)
            ]
            prev_channels = list(channels)

        return [f_stem] + ys
