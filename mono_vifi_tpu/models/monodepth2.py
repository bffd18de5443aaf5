"""Monodepth2-style depth network: ResNet encoder + U-Net disparity decoder.

Reference: networks/monodepth2.py (DepthEncoder :11-45, DepthDecoder :48-96).
The decoder runs coarse-to-fine with nearest x2 upsampling, encoder skip
connections, reflection-padded 3x3 convs + ELU, and sigmoid disparity heads
at the requested scales.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvBlock, Conv3x3
from mono_vifi_tpu.models.resnet import ResNetFeatures, num_ch_enc
from mono_vifi_tpu.ops.image import upsample_nearest


# ---------------------------------------------------------- S2D decoder tail
#
# The decoder's high-resolution levels (1 and 0) are the worst TPU layouts in
# the model: 16/32/96-channel minor dims leave the MXU at 2-19% utilization
# (a (3, 3, 96, 32) conv takes as long as a (3, 3, 128, 128) one) and C=1
# disp maps get 128x lane-tile padding on every elementwise/copy op. The
# whole tail below level 2 is therefore evaluated in SPACE-TO-DEPTH form on
# the 1/4-resolution block grid:
#   - a full-res (H, W, C) plane becomes (H/f, W/f, f*f*C) with phase-major
#     channels (qy*f+qx)*C+c,
#   - nearest x2 upsampling is a pure channel tile (all phases equal),
#   - a reflect-padded 3x3 conv becomes a 3x3 conv over blocks with the
#     original kernel's taps scattered into a (3, 3, f^2*cin, f^2*cout)
#     block kernel (exact linear-algebra rearrangement of the SAME
#     parameters; block channels 128+ run the MXU at full tiles),
#   - reflect padding of one original pixel becomes phase-selected edge
#     blocks (the unused phases carry zero weights),
#   - conv-after-nearest-upsample contracts duplicated channels, so the
#     duplicates are summed INTO the kernel instead of materialized
#     ("collapsed" kernel: 4x fewer FLOPs than the naive block form).
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


# The three block-kernel builders below are einsums against PRECOMPUTED
# constant 0/1 scatter tensors: the scatter pattern (which full-res tap lands
# in which block-kernel slot) is static, so building w2 costs ONE fused
# 9-element contraction instead of a chain of up to 144 sequential
# dynamic-update-slices executed (fwd + transposed bwd) every train step.
# Values are bit-identical to the loop form (each slot sums exactly the taps
# the loop wrote/added; multiplications are by 1.0).
import numpy as _np


@functools.lru_cache(maxsize=None)
def _s2d_scatter_const(f: int):
    """M[BY, BX, q, p, ky, kx] = 1 iff full-res tap (ky, kx) of output phase
    p=(py*f+px) reads input phase q=(qy*f+qx) of block offset (BY-1, BX-1)."""
    M = _np.zeros((3, 3, f * f, f * f, 3, 3), _np.float32)
    for py in range(f):
        for px in range(f):
            for ky in range(3):
                for kx in range(3):
                    u, v = py + ky - 1, px + kx - 1
                    by, qy = u // f, u % f
                    bx, qx = v // f, v % f
                    M[by + 1, bx + 1, qy * f + qx, py * f + px, ky, kx] = 1
    return M


@functools.lru_cache(maxsize=None)
def _s2d_scatter_const_up2():
    """f=4 scatter with the input-phase axis COLLAPSED onto the f=2 source
    phases of a nearest-x2 upsample (duplicate taps accumulate)."""
    M = _np.zeros((3, 3, 4, 16, 3, 3), _np.float32)
    for py in range(4):
        for px in range(4):
            for ky in range(3):
                for kx in range(3):
                    u, v = py + ky - 1, px + kx - 1
                    by, qy = u // 4, u % 4
                    bx, qx = v // 4, v % 4
                    M[by + 1, bx + 1, (qy // 2) * 2 + (qx // 2),
                      py * 4 + px, ky, kx] += 1
    return M


@functools.lru_cache(maxsize=None)
def _s2d_scatter_const_plain2():
    """f=2 scatter with NO input-phase axis: the upsample duplicates collapse
    onto the plain half-res pixels themselves."""
    M = _np.zeros((3, 3, 4, 3, 3), _np.float32)
    for py in range(2):
        for px in range(2):
            for ky in range(3):
                for kx in range(3):
                    u, v = py + ky - 1, px + kx - 1
                    by, bx = u // 2, v // 2
                    M[by + 1, bx + 1, py * 2 + px, ky, kx] += 1
    return M


def _s2d_kernel(w, b, f=2):
    """(3, 3, cin, cout) full-res kernel -> (3, 3, f^2*cin, f^2*cout) block
    kernel + tiled bias (phase-major channel order)."""
    cin, cout = w.shape[2], w.shape[3]
    M = jnp.asarray(_s2d_scatter_const(f), w.dtype)
    w2 = jnp.einsum("YXqpkx,kxio->YXqipo", M, w).reshape(
        3, 3, f * f * cin, f * f * cout
    )
    b2 = jnp.tile(b, f * f)
    return w2, b2


def _s2d_kernel_collapsed_up2(w, b):
    """(3, 3, cin, cout) full-res kernel -> (3, 3, 4*cin, 16*cout) block
    kernel for a conv whose input is the nearest-x2 UPSAMPLE of a half-res
    plane held in f=2 block form on the same f=4 block grid.

    The f=4 block conv would contract 16*cin input channels, but the
    upsample duplicates each f=2 phase into 4 f=4 phases — accumulating the
    duplicate entries into the kernel gives the identical result at 1/4 the
    FLOPs, with no materialized upsample at all."""
    cin, cout = w.shape[2], w.shape[3]
    M = jnp.asarray(_s2d_scatter_const_up2(), w.dtype)
    w2 = jnp.einsum("YXqpkx,kxio->YXqipo", M, w).reshape(
        3, 3, 4 * cin, 16 * cout
    )
    b2 = jnp.tile(b, 16)
    return w2, b2


def _s2d_kernel_collapsed_plain2(w, b):
    """(3, 3, cin, cout) full-res kernel -> (3, 3, cin, 4*cout) kernel for a
    conv whose input is the nearest-x2 UPSAMPLE of a PLAIN (un-blocked)
    half-res plane, evaluated on the f=2 block grid (= the half-res pixel
    grid). The duplicate phases collapse onto the plain pixels, and the
    full-res reflect pad reduces to an EDGE pad of the half-res plane
    (full-res row -1 reflects to row 1, whose half-res source is row 0)."""
    cin, cout = w.shape[2], w.shape[3]
    M = jnp.asarray(_s2d_scatter_const_plain2(), w.dtype)
    w2 = jnp.einsum("YXpkx,kxio->YXipo", M, w).reshape(3, 3, cin, 4 * cout)
    b2 = jnp.tile(b, 4)
    return w2, b2


def _up2_blocks_bilinear(x):
    """(B, Hb, Wb, C) -> (B, Hb, Wb, 4C): f=2 phase-major blocks of the
    bilinear x2 upsample (torch align_corners=False semantics, exactly
    ops.image.resize_bilinear's weights incl. the src >= 0 clamp, which the
    edge pad reproduces: 0.25*edge + 0.75*row0 == row0).

    Per axis: out row 2i = 0.25*in[i-1] + 0.75*in[i]; out row 2i+1 =
    0.75*in[i] + 0.25*in[i+1]. Evaluated as shifted fused multiply-adds on
    the half-res grid — no materialized upsample, no C-minor layout tax."""
    xv = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    y0 = 0.25 * xv[:, :-2] + 0.75 * xv[:, 1:-1]
    y1 = 0.75 * xv[:, 1:-1] + 0.25 * xv[:, 2:]

    def hphases(y):
        yh = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
        return (
            0.25 * yh[:, :, :-2] + 0.75 * yh[:, :, 1:-1],
            0.75 * yh[:, :, 1:-1] + 0.25 * yh[:, :, 2:],
        )

    p00, p01 = hphases(y0)
    p10, p11 = hphases(y1)
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)


@functools.lru_cache(maxsize=None)
def _up2_f4_kernel_const(c: int = 1):
    """(3, 3, 4c, 16c) constant block kernel: f=2 blocks of a half-res plane
    -> f=4 blocks of its bilinear x2 upsample (align_corners=False), on the
    same quarter-res block grid. Input must be edge-padded with
    _s2d_reflect_pad(..., f=2, top_src=0, bot_src=1) (the up-clamp's
    boundary sources, same geometry as the collapsed nearest-up kernel)."""
    # per-axis: full-res phase φ of block I reads (block offset, f=2 phase,
    # weight); derived from src = (R + 0.5)/2 - 0.5 with R = 4I + φ
    taps = {
        0: ((-1, 1, 0.25), (0, 0, 0.75)),
        1: ((0, 0, 0.75), (0, 1, 0.25)),
        2: ((0, 0, 0.25), (0, 1, 0.75)),
        3: ((0, 1, 0.75), (1, 0, 0.25)),
    }
    M = _np.zeros((3, 3, 4, 16, c, c), _np.float32)
    eye = _np.eye(c, dtype=_np.float32)
    for fy in range(4):
        for fx in range(4):
            for by, qy, wy in taps[fy]:
                for bx, qx, wx in taps[fx]:
                    M[by + 1, bx + 1, qy * 2 + qx, fy * 4 + fx] += wy * wx * eye
    return M.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, 4 * c, 16 * c)


def _s2d_reflect_pad(xs, c, f=2, top_src=None, bot_src=None):
    """One-original-pixel reflect pad in block space: edge blocks with the
    needed phases selected from the adjacent interior block (unused phases
    are zero — their block-kernel weights are zero).

    Plain block tensors reflect full-res row/col +-1 -> phase 1 / f-2; the
    collapsed-upsample form (f=2 blocks consumed by an f=4 kernel) reflects
    the half-res SOURCE of full-res row 1, i.e. phase 0 / f-1 — pass
    top_src/bot_src to override.

    Layout note: phase-major channels make every y-phase a CONTIGUOUS
    channel group, so the y edge blocks are plain channel slices and the
    big concats stay 4-D NHWC — a 6-D (f, f, c) reshape of the full tensor
    relayouts it on TPU (~2 ms per conv input at training shapes)."""
    if top_src is None:
        top_src = 1
    if bot_src is None:
        bot_src = f - 2
    B, Hb, Wb, FC = xs.shape
    g = f * c  # channels per y-phase group
    zg = jnp.zeros((B, 1, Wb, (f - 1) * g), xs.dtype)
    # top block: y-phase f-1 (last channel group) := block0 y-phase top_src
    top = jnp.concatenate(
        [zg, xs[:, :1, :, top_src * g : (top_src + 1) * g]], axis=-1
    )
    bot = jnp.concatenate(
        [xs[:, -1:, :, bot_src * g : (bot_src + 1) * g], zg], axis=-1
    )
    p = jnp.concatenate([top, xs, bot], axis=1)  # (B, Hb+2, Wb, FC)
    # x edge strips: qx phases interleave within each y group — reshape the
    # ONE-COLUMN strips only (tiny)
    zc = jnp.zeros((B, Hb + 2, 1, f, (f - 1) * c), xs.dtype)
    s = p[:, :, :1].reshape(B, Hb + 2, 1, f, f, c)
    left = jnp.concatenate([zc, s[..., top_src, :]], axis=-1).reshape(
        B, Hb + 2, 1, FC
    )
    e = p[:, :, -1:].reshape(B, Hb + 2, 1, f, f, c)
    right = jnp.concatenate([e[..., bot_src, :], zc], axis=-1).reshape(
        B, Hb + 2, 1, FC
    )
    return jnp.concatenate([left, p, right], axis=2)


def _block_conv(xp, w2, b2, dtype):
    cd = dtype or xp.dtype
    y = jax.lax.conv_general_dilated(
        xp.astype(cd), w2.astype(cd),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b2.astype(cd)


def _edge_strips_s2d(xs, c, f=2, top_src=None, bot_src=None):
    """The 1-block-wide ring of the virtual _s2d_reflect_pad, as THIN
    tensors: (top_ext, bot_ext, left, right) with top/bot (B, 1, Wb+2, FC)
    including their corners and left/right (B, Hb, 1, FC) spanning only the
    interior rows (their corners live in top/bot — no double count).
    Same phase-selection rules as _s2d_reflect_pad."""
    if top_src is None:
        top_src = 1
    if bot_src is None:
        bot_src = f - 2
    B, Hb, Wb, FC = xs.shape
    g = f * c
    zg = jnp.zeros((B, 1, Wb, (f - 1) * g), xs.dtype)
    top = jnp.concatenate(
        [zg, xs[:, :1, :, top_src * g : (top_src + 1) * g]], axis=-1
    )
    bot = jnp.concatenate(
        [xs[:, -1:, :, bot_src * g : (bot_src + 1) * g], zg], axis=-1
    )

    def xsel(strip, H1):
        zc = jnp.zeros((B, H1, 1, f, (f - 1) * c), xs.dtype)
        s = strip[:, :, :1].reshape(B, H1, 1, f, f, c)
        left = jnp.concatenate([zc, s[..., top_src, :]], axis=-1).reshape(
            B, H1, 1, FC
        )
        e = strip[:, :, -1:].reshape(B, H1, 1, f, f, c)
        right = jnp.concatenate([e[..., bot_src, :], zc], axis=-1).reshape(
            B, H1, 1, FC
        )
        return left, right

    tl, tr = xsel(top, 1)
    bl, br = xsel(bot, 1)
    top_ext = jnp.concatenate([tl, top, tr], axis=2)
    bot_ext = jnp.concatenate([bl, bot, br], axis=2)
    left, right = xsel(xs, Hb)
    return top_ext, bot_ext, left, right


def _edge_strips_edgepad(x):
    """Ring strips of a 1-pixel EDGE pad of a plain tensor (the half-res
    plane consumed by the collapsed plain-x2 kernel)."""
    top = x[:, :1]
    bot = x[:, -1:]
    top_ext = jnp.concatenate([top[:, :, :1], top, top[:, :, -1:]], axis=2)
    bot_ext = jnp.concatenate([bot[:, :, :1], bot, bot[:, :, -1:]], axis=2)
    return top_ext, bot_ext, x[:, :, :1], x[:, :, -1:]


def _padfree_conv(xs, w2, b2, dtype, strips):
    """conv(virtual_pad(xs), w2) WITHOUT materializing the padded tensor:
    a zero-padded conv (padding folds into the conv op — no copy) plus four
    THIN boundary-correction convs over the ring strips, added back as
    pad-fused adds. The materialized (B, Hb+2, Wb+2, FC) pad copies (and
    their slice+add backward) were the S2D decoder tail's dominant
    non-conv cost (~hundreds of MB/step of pure layout traffic)."""
    top_ext, bot_ext, left, right = strips
    cd = dtype or xs.dtype
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, padding="VALID"):
        return jax.lax.conv_general_dilated(
            x.astype(cd), k.astype(cd), window_strides=(1, 1),
            padding=padding, dimension_numbers=dn,
        )

    y = conv(xs, w2, padding=((1, 1), (1, 1)))
    B, Ho, Wo, O = y.shape
    ct = conv(top_ext, w2[0:1])  # kernel row 0 -> output row 0
    cb = conv(bot_ext, w2[2:3])  # kernel row 2 -> output row Ho-1
    zl = jnp.zeros_like(left[:, :1])
    cl = conv(jnp.concatenate([zl, left, zl], 1), w2[:, 0:1])
    zr = jnp.zeros_like(right[:, :1])
    cr = conv(jnp.concatenate([zr, right, zr], 1), w2[:, 2:3])
    # thin in-place row/col adds: padding the four ring corrections to full
    # size wrote 4 full output tensors per conv (~1 ms each at training
    # shapes); dynamic-update-slice touches only the boundary rows/cols
    y = y + b2.astype(cd)
    y = y.at[:, 0:1].add(ct)
    y = y.at[:, Ho - 1 : Ho].add(cb)
    y = y.at[:, :, 0:1].add(cl)
    y = y.at[:, :, Wo - 1 : Wo].add(cr)
    return y


def _s2d_conv3x3(xs, w, b, cin, dtype, f=2, top_src=None, bot_src=None):
    """Reflect-padded full-res 3x3 conv evaluated in block space (pad-free
    boundary-correction form)."""
    w2, b2 = _s2d_kernel(w, b, f)
    return _padfree_conv(
        xs, w2, b2, dtype, _edge_strips_s2d(xs, cin, f, top_src, bot_src)
    )


def _depth_to_space(xs, c, f=2):
    """(B, Hb, Wb, f^2*c) phase-major -> (B, f*Hb, f*Wb, c)."""
    B, Hb, Wb, _ = xs.shape
    p = xs.reshape(B, Hb, Wb, f, f, c)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(B, f * Hb, f * Wb, c)


def _space_to_depth(x, f=2):
    """(B, H, W, C) -> (B, H/f, W/f, f^2*C) phase-major (inverse of
    _depth_to_space)."""
    B, H, W, C = x.shape
    p = x.reshape(B, H // f, f, W // f, f, C)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(B, H // f, W // f, f * f * C)


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
    s2d_full_res: bool = True  # evaluate levels 1 and 0 in space-to-depth
    # block form on the 1/4-res grid (exact; see module notes)

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            if i == 1 and self.s2d_full_res:
                self._s2d_tail(x, input_features, num_ch_dec, outputs)
                break
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

    def _s2d_tail(self, x, input_features, num_ch_dec, outputs):
        """Levels 1 and 0 on the 1/4-res block grid (see module notes).

        x arrives at (B, H/4, W/4, num_ch_dec[2]); every op below is an
        exact rearrangement of the plain path's convs on the same params."""
        c1, c0 = num_ch_dec[1], num_ch_dec[0]
        noc = self.num_output_channels
        dt = self.dtype

        # ---- level 1: conv -> x2 upsample -> concat skip -> conv
        x = ConvBlock(c1, dt, name="upconv_1_0")(x)
        cin11 = c1 + (input_features[0].shape[-1] if self.use_skips else 0)
        kw, kb = _NestedConvParams((3, 3, cin11, c1), c1, 2, name="upconv_1_1")()
        # x-part: the nearest-x2 upsample collapses onto x itself (no tile,
        # no block pad — just an edge pad of the half-res plane)
        wx2, bx2 = _s2d_kernel_collapsed_plain2(kw[:, :, :c1], kb)
        y = _padfree_conv(x, wx2, bx2, dt, _edge_strips_edgepad(x))
        if self.use_skips:
            skip = input_features[0]
            cs = skip.shape[-1]
            ws2, _ = _s2d_kernel(kw[:, :, c1:], jnp.zeros_like(kb), 2)
            sb = _space_to_depth(skip, 2)
            y = y + _padfree_conv(
                sb, ws2, jnp.zeros((4 * c1,), kb.dtype), dt,
                _edge_strips_s2d(sb, cs, 2),
            )
        x = nn.elu(y)  # f=2 blocks, c1/phase
        if 1 in self.scales:
            dw, db = _NestedConvParams((3, 3, c1, noc), noc, 1, name="dispconv_1")()
            d = nn.sigmoid(_s2d_conv3x3(x, dw, db, c1, dt, f=2))
            outputs[1] = _depth_to_space(d.astype(jnp.float32), noc, 2)

        # ---- level 0: conv (at half res) -> x2 upsample -> conv -> disp head
        kw, kb = _NestedConvParams((3, 3, c1, c0), c0, 2, name="upconv_0_0")()
        x = nn.elu(_s2d_conv3x3(x, kw, kb, c1, dt, f=2))  # f=2, c0/phase
        # the f=4 conv over the x2-upsampled plane reads x's f=2 blocks
        # directly through the duplicate-collapsed kernel; the reflect pad of
        # full-res row/col +-1 selects the half-res SOURCE phases (0, f-1)
        kw, kb = _NestedConvParams((3, 3, c0, c0), c0, 2, name="upconv_0_1")()
        w2, b2 = _s2d_kernel_collapsed_up2(kw, kb)
        x = nn.elu(_padfree_conv(
            x, w2, b2, dt, _edge_strips_s2d(x, c0, 2, top_src=0, bot_src=1)
        ))  # f=4, c0/phase
        dw, db = _NestedConvParams((3, 3, c0, noc), noc, 1, name="dispconv_0")()
        d = nn.sigmoid(_s2d_conv3x3(x, dw, db, c0, dt, f=4))
        outputs[0] = _depth_to_space(d.astype(jnp.float32), noc, 4)
