"""Monodepth2-style depth network: ResNet encoder + U-Net disparity decoder.

Reference: networks/monodepth2.py (DepthEncoder :11-45, DepthDecoder :48-96).
The decoder runs coarse-to-fine with nearest x2 upsampling, encoder skip
connections, reflection-padded 3x3 convs + ELU, and sigmoid disparity heads
at the requested scales.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvBlock, Conv3x3
from mono_vifi_tpu.models.resnet import ResNetFeatures, num_ch_enc
from mono_vifi_tpu.ops.image import upsample_nearest


# ---------------------------------------------------------------- S2D stage
#
# The decoder's full-resolution stage (upsample -> 3x3 conv x2 at
# (H, W, 16)) is the worst TPU layout in the model: 16-channel minor dims
# get 8x lane-tile padding on every elementwise/copy op, and C=1 disp maps
# get 128x. The stage is therefore evaluated in SPACE-TO-DEPTH form: the
# (H, W, 16) plane becomes (H/2, W/2, 64) with phase-major channels
# (qy*2+qx)*16+c, where
#   - nearest x2 upsampling is a pure channel tile (all 4 phases equal),
#   - the reflect-padded 3x3 conv becomes a 3x3 conv over blocks with the
#     original kernel's taps scattered into a (3, 3, 64, 4*cout) kernel
#     (exact linear-algebra rearrangement of the SAME parameters),
#   - reflect padding of one original pixel becomes phase-selected edge
#     blocks (the unused phases carry zero weights).
# Parameters keep the standard ConvBlock/Conv3x3 layout, so checkpoints
# and the torch parity oracle are unchanged.


class _ConvParams(nn.Module):
    """{kernel, bias} container matching nn.Conv names/inits."""

    kshape: tuple
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.kshape)
        b = self.param("bias", nn.initializers.zeros_init(), (self.cout,))
        return k, b


class _NestedConvParams(nn.Module):
    """Nests {kernel, bias} under `depth` levels of "conv" scopes so the
    param tree matches ConvBlock (conv/conv) or Conv3x3 (conv) exactly."""

    kshape: tuple
    cout: int
    depth: int

    @nn.compact
    def __call__(self):
        if self.depth == 1:
            return _ConvParams(self.kshape, self.cout, name="conv")()
        return _NestedConvParams(
            self.kshape, self.cout, self.depth - 1, name="conv"
        )()


def _s2d_kernel(w, b):
    """(3, 3, cin, cout) full-res kernel -> (3, 3, 4*cin, 4*cout) block
    kernel + tiled bias (phase-major channel order)."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for py in (0, 1):
        for px in (0, 1):
            for ky in range(3):
                for kx in range(3):
                    u, v = py + ky - 1, px + kx - 1
                    by, qy = u // 2, u % 2
                    bx, qx = v // 2, v % 2
                    ci = (qy * 2 + qx) * cin
                    co = (py * 2 + px) * cout
                    w2 = w2.at[
                        by + 1, bx + 1, ci : ci + cin, co : co + cout
                    ].set(w[ky, kx])
    b2 = jnp.tile(b, 4)
    return w2, b2


def _s2d_reflect_pad(xs, c):
    """One-original-pixel reflect pad in block space: edge blocks with the
    needed phases selected from the adjacent interior block (unused phases
    are zero — their block-kernel weights are zero)."""
    B, Hb, Wb, _ = xs.shape
    p = xs.reshape(B, Hb, Wb, 2, 2, c)
    zy = jnp.zeros_like(p[:, :1])
    top = zy.at[:, :, :, 1].set(p[:, :1, :, 1])
    bot = zy.at[:, :, :, 0].set(p[:, -1:, :, 0])
    p = jnp.concatenate([top, p, bot], axis=1)
    zx = jnp.zeros_like(p[:, :, :1])
    left = zx.at[:, :, :, :, 1].set(p[:, :, :1, :, 1])
    right = zx.at[:, :, :, :, 0].set(p[:, :, -1:, :, 0])
    p = jnp.concatenate([left, p, right], axis=2)
    return p.reshape(B, Hb + 2, Wb + 2, 4 * c)


def _s2d_conv3x3(xs, w, b, cin, dtype):
    """Reflect-padded full-res 3x3 conv evaluated in block space."""
    w2, b2 = _s2d_kernel(w, b)
    xp = _s2d_reflect_pad(xs, cin)
    cd = dtype or xs.dtype
    y = jax.lax.conv_general_dilated(
        xp.astype(cd), w2.astype(cd),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b2.astype(cd)


def _depth_to_space(xs, c):
    """(B, Hb, Wb, 4*c) phase-major -> (B, 2*Hb, 2*Wb, c)."""
    B, Hb, Wb, _ = xs.shape
    p = xs.reshape(B, Hb, Wb, 2, 2, c)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(B, 2 * Hb, 2 * Wb, c)


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
    s2d_full_res: bool = True  # evaluate the full-res stage in
    # space-to-depth form (exact; see module notes)

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f"upconv_{i}_0")(x)
            if i == 0 and self.s2d_full_res:
                # full-res stage in space-to-depth form (see module notes):
                # nearest x2 upsample == channel tile across the 4 phases
                c = num_ch_dec[0]
                xs = jnp.tile(x, (1, 1, 1, 4))
                kw, kb = _NestedConvParams(
                    (3, 3, c, c), c, 2, name="upconv_0_1"
                )()
                xs = nn.elu(_s2d_conv3x3(xs, kw, kb, c, self.dtype))
                dw, db = _NestedConvParams(
                    (3, 3, c, self.num_output_channels),
                    self.num_output_channels,
                    1,
                    name="dispconv_0",
                )()
                ds = nn.sigmoid(_s2d_conv3x3(xs, dw, db, c, self.dtype))
                outputs[0] = _depth_to_space(
                    ds.astype(jnp.float32), self.num_output_channels
                )
                continue
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
