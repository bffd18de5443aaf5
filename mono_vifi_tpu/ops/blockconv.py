"""Row-blocked (space-to-depth along H) evaluation of ZERO-padded stride-1
convolutions, and the phase-grouped BatchNorm that keeps running-stat /
parameter shapes checkpoint-compatible.

Motivation (measured on v5e, tools/bench_conv.py): the TPU conv emitter pads
the channel (lane) dimension, so a 64-channel 3x3 conv at 1/4 resolution runs
at ~16% of bf16 peak while the SAME math expressed over fy=2 row blocks
(channels x2 -> 128, rows /2) runs 2.4x faster; an 18-channel HRNet branch
conv runs at 6% of peak while its f=2 block form does 4x the FLOPs in the
SAME wall time. This module provides the exact rearrangement:

  - a full-res (B, H, W, C) plane becomes (B, H/fy, W, fy*C) with phase-major
    channels (q*C + c),
  - a zero-padded stride-1 (kh, kw) conv becomes a block conv whose kernel
    scatters the original taps into (3, kw, fy*cin, fy*cout) slots (an exact
    linear-algebra rearrangement of the SAME parameters; zero block-row
    padding reproduces the full-res zero padding exactly, because the only
    out-of-range slots read full-res rows -1 and H, which are zero-padded in
    both forms),
  - BatchNorm statistics are per ORIGINAL channel: per-(phase, c) moments are
    computed on the block layout and averaged across phases (identical values
    up to float reassociation), so 'batch_stats' keep shape (C,).

Square f x f blocking for reflect-padded convs lives in models/monodepth2.py
(the S2D decoder tail); this module is the zero-pad row-block variant used by
ResNet layer1 (models/resnet.py) and the HRNet branches (models/hrnet.py) —
reference networks/monodepth2.py:11-45, hrnet_encoder.py:138-293 contracts.
"""

from __future__ import annotations

import functools

import numpy as _np
import jax
import jax.numpy as jnp
import flax.linen as nn


def s2d_rows(x, fy: int):
    """(B, H, W, C) -> (B, H/fy, W, fy*C), phase-major channels."""
    B, H, W, C = x.shape
    assert H % fy == 0, (H, fy)
    x = x.reshape(B, H // fy, fy, W, C).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H // fy, W, fy * C)


def d2s_rows(x, fy: int):
    """Inverse of s2d_rows."""
    B, Hb, W, FC = x.shape
    C = FC // fy
    x = x.reshape(B, Hb, W, fy, C).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, Hb * fy, W, C)


@functools.lru_cache(maxsize=None)
def _row_scatter_const(fy: int, kh: int):
    """M[BY, q, p, ky] = 1 iff full-res tap ky of output phase p reads input
    phase q of block-row offset BY-1 (stride 1, 'same' padding kh//2)."""
    r = kh // 2
    M = _np.zeros((3, fy, fy, kh), _np.float32)
    for p in range(fy):
        for ky in range(kh):
            u = p + ky - r
            M[u // fy + 1, u % fy, p, ky] = 1
    return M


def block_kernel_rows(w, fy: int, b=None):
    """(kh, kw, cin, cout) full-res kernel -> (3, kw, fy*cin, fy*cout) block
    kernel (+ tiled bias). Requires kh//2 <= fy so taps span one block."""
    kh, kw, cin, cout = w.shape
    assert kh // 2 <= fy, (kh, fy)
    M = jnp.asarray(_row_scatter_const(fy, kh), w.dtype)
    w2 = jnp.einsum("Yqpk,kxio->Yxqipo", M, w).reshape(
        3, kw, fy * cin, fy * cout
    )
    b2 = None if b is None else jnp.tile(b, fy)
    return w2, b2


def block_conv_rows(xb, w2, b2=None, dtype=None, kw_pad: int = 1):
    """conv(x, w) with zero 'same' padding, evaluated on row blocks: one
    zero-padded block row top/bottom supplies exactly the full-res zero rows
    the scattered kernel slots read (see module docstring)."""
    cd = dtype or xb.dtype
    y = jax.lax.conv_general_dilated(
        xb.astype(cd),
        w2.astype(cd),
        window_strides=(1, 1),
        padding=((1, 1), (kw_pad, kw_pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b2 is not None:
        y = y + b2.astype(cd)
    return y


def stem_conv_s2_blocked(x, w, dtype=None):
    """7x7 stride-2 'same' conv emitting its output directly in fy=2 row
    blocks: (B, H, W, cin) -> (B, H/4, W/2, 2*cout), phase-major.

    Output phase p row j is full-res output row 2j+p, reading input rows
    4j + 2p + ky - 3 — both phases fold into ONE conv with a 9-row kernel
    (phase 0 occupies kernel rows 0..6, phase 1 rows 2..8) at stride (4, 2).
    9/7 the FLOPs of the plain conv at 2x the output-lane utilization, and
    the (B, H/2, W/2, cout) plain intermediate (whose BN/relu ran at half
    lane occupancy) never materializes. Requires H % 4 == 0.
    """
    kh, kw, cin, cout = w.shape
    assert kh == 7 and x.shape[1] % 4 == 0, (w.shape, x.shape)
    z = jnp.zeros((2, kw, cin, cout), w.dtype)
    w9 = jnp.concatenate(
        [jnp.concatenate([w, z], 0), jnp.concatenate([z, w], 0)], axis=-1
    )  # (9, kw, cin, 2*cout), phase-major
    cd = dtype or x.dtype
    return jax.lax.conv_general_dilated(
        x.astype(cd),
        w9.astype(cd),
        window_strides=(4, 2),
        padding=((3, 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def fold_batch(x, fb: int):
    """(B, H, W, C) -> (B/fb, H, W, fb*C), group-major channels (q*C + c).

    Folds fb consecutive batch samples into the channel (lane) dimension so
    small-channel convs/BN/relu run on full lanes. A conv becomes the SAME
    conv with a block-diagonal kernel (diag_kernel): fb x the dense FLOPs,
    but measured on v5e the 18-channel HRNet branch conv runs at 6% of bf16
    peak while its 126-channel block-diagonal form runs at 69% — a 1.6x
    wall-time win despite the waste (tools/bench_conv.py x7diag row).
    """
    B, H, W, C = x.shape
    assert B % fb == 0, (B, fb)
    x = x.reshape(B // fb, fb, H, W, C).transpose(0, 2, 3, 1, 4)
    return x.reshape(B // fb, H, W, fb * C)


def unfold_batch(x, fb: int):
    """Inverse of fold_batch."""
    Bg, H, W, FC = x.shape
    C = FC // fb
    x = x.reshape(Bg, H, W, fb, C).transpose(0, 3, 1, 2, 4)
    return x.reshape(Bg * fb, H, W, C)


def diag_kernel(w, fb: int):
    """(kh, kw, cin, cout) -> (kh, kw, fb*cin, fb*cout) block-diagonal kernel
    repeating the SAME weights on the diagonal: conv(fold_batch(x, fb),
    diag_kernel(w, fb)) == fold_batch(conv(x, w), fb) exactly (each group's
    channels only contract against its own diagonal block)."""
    kh, kw, cin, cout = w.shape
    eye = jnp.eye(fb, dtype=w.dtype)
    return jnp.einsum("qp,kxio->kxqipo", eye, w).reshape(
        kh, kw, fb * cin, fb * cout
    )


class FoldBasicBlock(nn.Module):
    """ResNet BasicBlock (stride 1, no downsample) on fb-batch-folded input.

    Param tree identical to models.resnet.BasicBlock (conv1/kernel, bn1/...,
    conv2/kernel, bn2/...) so checkpoints and the torch oracle are unchanged.
    BlockBatchNorm's (phase, c) averaging applies verbatim: here the phase is
    the position-in-group, and averaging per-(q, c) moments over q and the
    folded batch is the exact global-batch moment up to reassociation.
    Reference: torchvision BasicBlock via networks/hrnet_encoder.py:138-293.
    """

    planes: int
    fb: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xf, train: bool = False):
        c, fb = self.planes, self.fb
        k1 = _KernelOnly((3, 3, c, c), name="conv1")()
        y = block_conv_rows(xf, diag_kernel(k1, fb), dtype=self.dtype)
        y = BlockBatchNorm(c, fb, self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        k2 = _KernelOnly((3, 3, c, c), name="conv2")()
        y = block_conv_rows(y, diag_kernel(k2, fb), dtype=self.dtype)
        y = BlockBatchNorm(c, fb, self.dtype, name="bn2")(y, train)
        return nn.relu(y + xf)


class _KernelOnly(nn.Module):
    """Bare conv kernel parameter matching nn.Conv(use_bias=False) names."""

    kshape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.kshape)


class BlockBatchNorm(nn.Module):
    """BatchNorm over fy-row-blocked input with per-ORIGINAL-channel stats.

    Parameters/batch_stats have shape (c,) under the standard flax names
    (scale/bias, mean/var), so checkpoints and the torch converter see the
    exact same tree as models.common.batch_norm. Matches flax BatchNorm
    semantics: float32 stats, biased variance, running = m*old + (1-m)*batch.
    """

    c: int
    fy: int
    dtype: jnp.dtype | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, fy = self.c, self.fy
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((c,), jnp.float32)
        )
        if train:
            xf = x.astype(jnp.float32)
            m_pc = jnp.mean(xf, axis=(0, 1, 2))
            m2_pc = jnp.mean(xf * xf, axis=(0, 1, 2))
            mean = jnp.mean(m_pc.reshape(fy, c), axis=0)
            var = jnp.mean(m2_pc.reshape(fy, c), axis=0) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            inv = inv * scale
            shift = bias - mean * inv
        else:
            shift = -mean * inv
        dtype = self.dtype or x.dtype
        a = jnp.tile(inv, fy).astype(dtype)
        s = jnp.tile(shift, fy).astype(dtype)
        return x.astype(dtype) * a + s


class BlockBasicBlock(nn.Module):
    """ResNet BasicBlock (stride 1, no downsample) on fy-row blocks.

    Param tree identical to models.resnet.BasicBlock: conv1/kernel, bn1/...,
    conv2/kernel, bn2/... — checkpoints and the torch oracle are unchanged.
    Reference: torchvision BasicBlock via networks/monodepth2.py:11-45.
    """

    planes: int
    fy: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xb, train: bool = False):
        c, fy = self.planes, self.fy
        k1 = _KernelOnly((3, 3, c, c), name="conv1")()
        y = block_conv_rows(xb, *block_kernel_rows(k1, fy), dtype=self.dtype)
        y = BlockBatchNorm(c, fy, self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        k2 = _KernelOnly((3, 3, c, c), name="conv2")()
        y = block_conv_rows(y, *block_kernel_rows(k2, fy), dtype=self.dtype)
        y = BlockBatchNorm(c, fy, self.dtype, name="bn2")(y, train)
        return nn.relu(y + xb)
