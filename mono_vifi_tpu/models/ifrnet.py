"""IFRNet video-frame interpolation network (large/small), NHWC Flax.

Reference: networks/IFRNet.py:128-441. A 4-level conv pyramid encodes both
input frames; four decoders refine bidirectional flows coarse-to-fine, each
warping the encoder features of both frames by the current flow estimate and
doubling resolution with a transposed conv. The full-resolution head emits
two flows + a merge mask (the residual channel is dropped, as in the
reference :413-415). Losses for VFI pre-training: Charbonnier L1 + ternary
census + 0.01 * geometry-feature (reference :436-438).

All resolution branching (the (0.6, 0.3125) downscale override for 320x1024
inputs, reference :373-376) resolves at trace time from static shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvPReLU, ConvTranspose4x4, PReLU
from mono_vifi_tpu.ops.image import resize_bilinear
from mono_vifi_tpu.ops.sampling import warp
from mono_vifi_tpu.ops.losses import charbonnier_l1, ternary_loss, geometry_loss

_PYRAMID_CHANNELS = {
    "large": (64, 96, 144, 192),
    "small": (24, 36, 54, 72),
    # "tiny" is NOT a reference variant: it exists so multi-chip dryruns and
    # CPU tests can compile the full train-step graph in minutes instead of
    # tens of minutes. Same topology, 8x fewer channels.
    "tiny": (8, 12, 18, 24),
}
_SIDE_CHANNELS = {"large": 64, "small": 24, "tiny": 8}


class ResBlock(nn.Module):
    """Residual block with a side-channel subpath (networks/IFRNet.py:128-157)."""

    side_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = self.side_channels
        out = ConvPReLU(c, dtype=self.dtype, name="conv1")(x)
        side = ConvPReLU(s, dtype=self.dtype, name="conv2")(out[..., -s:])
        out = jnp.concatenate([out[..., :-s], side], axis=-1)
        out = ConvPReLU(c, dtype=self.dtype, name="conv3")(out)
        side = ConvPReLU(s, dtype=self.dtype, name="conv4")(out[..., -s:])
        out = jnp.concatenate([out[..., :-s], side], axis=-1)
        out = nn.Conv(
            c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv5"
        )(out)
        return PReLU(name="prelu")(x + out)


class Encoder(nn.Module):
    """4-level stride-2 conv pyramid (networks/IFRNet.py:160-185, :256-281)."""

    channels: Sequence[int]
    first_kernel: int = 3  # 7 for the large variant
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, img):
        feats = []
        x = img
        for i, c in enumerate(self.channels):
            k = self.first_kernel if i == 0 else 3
            x = ConvPReLU(c, k, 2, k // 2, dtype=self.dtype, name=f"pyramid{i + 1}_0")(x)
            x = ConvPReLU(c, 3, 1, 1, dtype=self.dtype, name=f"pyramid{i + 1}_1")(x)
            feats.append(x)
        return feats


class DecoderBlock(nn.Module):
    """convrelu -> ResBlock -> ConvTranspose(4,2,1) (networks/IFRNet.py:188-349)."""

    mid: int
    out: int
    side_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = ConvPReLU(self.mid, dtype=self.dtype, name="conv0")(x)
        x = ResBlock(self.side_channels, dtype=self.dtype, name="resblock")(x)
        return ConvTranspose4x4(self.out, dtype=self.dtype, name="up")(x)


def _resolve_scale_factor(H: int, W: int) -> tuple[float, float]:
    if H == 320 and W == 1024:
        return (0.6, 0.3125)
    return (1.0, 0.5)


class IFRNet(nn.Module):
    """Bidirectional-flow frame interpolator.

    __call__(img0, img1, embt, imgt=None, only_flow=False) returns a dict:
      only_flow:     {"flow0", "flow1", "mask"}
      imgt is None:  + {"imgt_pred"}
      imgt given:    + {"imgt_pred", "loss"} (VFI training losses)
    Flows are (B, H, W, 2) pixel displacements; mask is (B, H, W, 1).
    """

    scale: str = "large"
    dtype: jnp.dtype | None = None
    fast_warp: bool = False  # windowed Pallas kernel for full-res img warps

    @nn.compact
    def __call__(self, img0, img1, embt, imgt=None, only_flow: bool = False):
        B, H, W, _ = img0.shape
        channels = _PYRAMID_CHANNELS[self.scale]
        side = _SIDE_CHANNELS[self.scale]
        c1, c2, c3, c4 = channels
        sf = _resolve_scale_factor(H, W)

        # joint per-sample mean over both frames (reference :378-380)
        mean_ = 0.5 * (
            jnp.mean(img0, axis=(1, 2, 3), keepdims=True)
            + jnp.mean(img1, axis=(1, 2, 3), keepdims=True)
        )
        img0 = img0 - mean_
        img1 = img1 - mean_

        fh, fw = int(H * sf[0]), int(W * sf[1])
        img0_ = resize_bilinear(img0, (fh, fw))
        img1_ = resize_bilinear(img1, (fh, fw))

        encoder = Encoder(
            channels,
            first_kernel=7 if self.scale == "large" else 3,
            dtype=self.dtype,
            name="encoder",
        )
        f0 = encoder(img0_)
        f1 = encoder(img1_)

        decoder4 = DecoderBlock(2 * c4, 4 + c3, side, self.dtype, name="decoder4")
        decoder3 = DecoderBlock(3 * c3, 4 + c2, side, self.dtype, name="decoder3")
        decoder2 = DecoderBlock(3 * c2, 4 + c1, side, self.dtype, name="decoder2")
        decoder1 = DecoderBlock(3 * c1, 8, side, self.dtype, name="decoder1")

        embt_map = jnp.broadcast_to(
            embt.reshape(B, 1, 1, 1).astype(f0[3].dtype), f0[3].shape[:3] + (1,)
        )
        out4 = decoder4(jnp.concatenate([f0[3], f1[3], embt_map], axis=-1))
        flow0, flow1, ft_ = out4[..., 0:2], out4[..., 2:4], out4[..., 4:]
        fts = [ft_]

        for dec, lvl in ((decoder3, 2), (decoder2, 1), (decoder1, 0)):
            if self.fast_warp:
                # both frames' feature warps in one batched per-pixel
                # packed-footprint gather. NOT patch_gather: the C>=64
                # feature gather is BYTE-bound (~44 GB/s, PERF.md round-4
                # microbench), a 2x2-patch footprint saves no bytes at the
                # span real flows need (floor-noise alone breaks span<=1),
                # and its lax.cond guard costs ~ms in operand copies
                fw = warp(
                    jnp.concatenate([f0[lvl], f1[lvl]], 0),
                    jnp.concatenate([flow0, flow1], 0),
                )
                f0w, f1w = fw[: flow0.shape[0]], fw[flow0.shape[0] :]
            else:
                f0w = warp(f0[lvl], flow0)
                f1w = warp(f1[lvl], flow1)
            out = dec(jnp.concatenate([ft_, f0w, f1w, flow0, flow1], axis=-1))
            up0 = 2.0 * resize_bilinear(flow0, out.shape[1:3])
            up1 = 2.0 * resize_bilinear(flow1, out.shape[1:3])
            flow0 = out[..., 0:2] + up0
            flow1 = out[..., 2:4] + up1
            ft_ = out[..., 4:]
            fts.append(ft_)

        mask = nn.sigmoid(ft_[..., 0:1])  # out1[:, 4:5]

        # full-resolution flows: resize + component rescale (reference :417-423)
        scale_vec = jnp.asarray([1.0 / sf[1], 1.0 / sf[0]], flow0.dtype)
        flow0_full = resize_bilinear(flow0, (H, W)) * scale_vec
        flow1_full = resize_bilinear(flow1, (H, W)) * scale_vec
        mask_full = resize_bilinear(mask, (H, W))

        if only_flow:
            return {"flow0": flow0_full, "flow1": flow1_full, "mask": mask_full}

        img0_warp_flow = flow0_full
        img1_warp_flow = flow1_full
        merge_mask = mask_full

        Bw = img0.shape[0]
        if self.fast_warp:
            from mono_vifi_tpu.ops.pallas.warp import warp_windowed_safe, windowed_ok

            if windowed_ok(img0.shape, (Bw, H, W, 2)):
                # both frame warps in ONE kernel launch (one span guard, one
                # grid) — same taps, half the per-call overhead
                w2 = warp_windowed_safe(
                    jnp.concatenate([img0, img1], 0),
                    jnp.concatenate([img0_warp_flow, img1_warp_flow], 0),
                    tap_dtype=self.dtype,
                )
                img0_warp, img1_warp = w2[:Bw], w2[Bw:]
            else:
                img0_warp = warp(img0, img0_warp_flow, gather_dtype=self.dtype)
                img1_warp = warp(img1, img1_warp_flow, gather_dtype=self.dtype)
        else:
            img0_warp = warp(img0, img0_warp_flow, gather_dtype=self.dtype)
            img1_warp = warp(img1, img1_warp_flow, gather_dtype=self.dtype)
        imgt_merge = merge_mask * img0_warp + (1 - merge_mask) * img1_warp
        imgt_pred = jnp.clip(imgt_merge + mean_, 0.0, 1.0)

        out = {
            "imgt_pred": imgt_pred,
            "flow0": flow0_full,
            "flow1": flow1_full,
            "mask": mask_full,
        }
        if imgt is not None:
            imgt_sub = imgt - mean_
            imgt_ = resize_bilinear(imgt_sub, (fh, fw))
            ft = encoder(imgt_)
            loss_rec = charbonnier_l1(imgt_merge - imgt_sub) + ternary_loss(
                imgt_merge, imgt_sub
            )
            # fts[0]=ft_3_, fts[1]=ft_2_, fts[2]=ft_1_ (pre-final-decoder outputs)
            loss_geo = 0.01 * (
                geometry_loss(fts[2], ft[0])
                + geometry_loss(fts[1], ft[1])
                + geometry_loss(fts[0], ft[2])
            )
            out["loss"] = loss_rec + loss_geo
        return out
