"""Image resampling ops with exact PyTorch-interpolation semantics.

Bilinear resize is implemented as two small dense interpolation-matrix
contractions (separable: rows then columns). The matrices are built with
numpy at trace time from the static shapes, so resizing rides the MXU instead
of emitting gathers — the TPU-native formulation of `F.interpolate`.

Covers both align_corners conventions used by the reference:
  - align_corners=False: IFRNet input/flow resizes (networks/IFRNet.py:117-118,
    383-423), fusion-module flow/mask resizes (networks/fusion_module.py:85,99),
    affine-branch restores (train.py:900,912).
  - align_corners=True: eval-time prediction -> GT-resolution resize
    (evaluate_depth.py:161).

Also provides the batched affine-branch warps (rotate / crop-resize /
place-resize) that replace the reference's per-sample Python loops
(train.py:888-922) with fully batched grid_samples of static shape.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops.sampling import grid_sample


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix, torch semantics."""
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    lam = src - i0
    i1 = np.minimum(i0 + 1, in_size - 1)
    M = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(M, (rows, i0), (1.0 - lam).astype(np.float32))
    np.add.at(M, (rows, i1), lam.astype(np.float32))
    return M


def resize_bilinear(
    x: jax.Array, size: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of NHWC `x` to (H, W) = `size` via separable matmuls."""
    B, H, W, C = x.shape
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x
    dtype = x.dtype
    Mh = jnp.asarray(_interp_matrix(H, Ho, align_corners), dtype)
    Mw = jnp.asarray(_interp_matrix(W, Wo, align_corners), dtype)
    # f32 inputs get exact (HIGHEST) interpolation for eval parity; bf16
    # compute paths keep the fast MXU mode (weights are exact in bf16 anyway
    # only up to rounding, which bf16 activations already dominate).
    hp = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if C == 1:
        # planar path: a trailing C=1 minor dim would 128x lane-pad every
        # einsum temp (masks, disparities); squeeze, interpolate with W as
        # the real minor dim, restore
        xp = x[..., 0]
        y = jnp.einsum("oh,bhw->bow", Mh, xp, precision=hp)
        y = jnp.einsum("pw,bow->bop", Mw, y, precision=hp)
        return y[..., None]
    y = jnp.einsum("oh,bhwc->bowc", Mh, x, precision=hp)
    y = jnp.einsum("pw,bowc->bopc", Mw, y, precision=hp)
    return y


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor integer upsampling (reference layers.py:225-228)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


@jax.custom_vjp
def _reflect_pad1(x: jax.Array) -> jax.Array:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def _reflect_pad1_fwd(x):
    return _reflect_pad1(x), x.shape


def _reflect_pad1_bwd(shape, ct):
    # XLA's native pad-transpose lowers to a chain of full-tensor add_any
    # ops (~9 ms/step across the decoder's reflect convs); the fold is just
    # "interior + edge rows/cols added one pixel inward", which fuses into
    # two passes when written as masked adds. Columns first so corners flow
    # through both folds.
    B, H, W, C = shape
    colidx = jnp.arange(W).reshape(1, 1, W, 1)
    p = (
        ct[:, :, 1:-1]
        + jnp.where(colidx == 1, ct[:, :, 0:1], 0.0)
        + jnp.where(colidx == W - 2, ct[:, :, -1:], 0.0)
    )
    rowidx = jnp.arange(H).reshape(1, H, 1, 1)
    x = (
        p[:, 1:-1]
        + jnp.where(rowidx == 1, p[:, 0:1], 0.0)
        + jnp.where(rowidx == H - 2, p[:, -1:], 0.0)
    )
    return (x,)


_reflect_pad1.defvjp(_reflect_pad1_fwd, _reflect_pad1_bwd)


def reflect_pad_2d(x: jax.Array, pad: int = 1) -> jax.Array:
    """ReflectionPad2d on NHWC (pad=1 uses a fused custom backward)."""
    if pad == 1 and x.shape[1] >= 2 and x.shape[2] >= 2:
        return _reflect_pad1(x)
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool_3x3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 VALID average pool (SSIM building block)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def max_pool_3x3_s2_p1(x: jax.Array) -> jax.Array:
    """MaxPool2d(kernel=3, stride=2, padding=1), torch semantics (NHWC)."""
    # init must be a literal scalar so autodiff recognizes the max monoid
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _rotation_grid(
    angle_deg: jax.Array, height: int, width: int, inverse: bool = False
) -> jax.Array:
    """Pixel-space sampling grid for a rotation about the image center.

    Matches torchvision.transforms.functional.rotate on tensors: rotation by
    `angle_deg` counterclockwise (in display orientation, y down) about the
    center ((W-1)/2, (H-1)/2) of pixel centers, bilinear, zero fill.

    Returns normalized align_corners=True grid (B, H, W, 2).
    """
    theta = jnp.deg2rad(angle_deg).astype(jnp.float32)  # (B,)
    if inverse:
        theta = -theta
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) - cx
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) - cy
    # Inverse map of a CCW (display) rotation in y-down coords.
    sx = cos[:, None, None] * xs[None] - sin[:, None, None] * ys[None] + cx
    sy = sin[:, None, None] * xs[None] + cos[:, None, None] * ys[None] + cy
    gx = (sx / (width - 1) - 0.5) * 2.0
    gy = (sy / (height - 1) - 0.5) * 2.0
    return jnp.stack([gx, gy], axis=-1)


def rotate_bilinear(
    img: jax.Array,
    angle_deg: jax.Array,
    grad_via_splat: bool = False,
    fast: bool = False,
) -> jax.Array:
    """Batched rotation (one angle per sample), bilinear, zero fill.

    Replaces the reference's per-sample torchvision rotate loop
    (train.py:898, :915) with a single batched warp.

    With `grad_via_splat` (training-time rotations of gradient-carrying
    tensors, e.g. the SADC depth restore), the backward w.r.t. img goes
    through the MXU splat kernel instead of XLA's scatter-add; the grid
    (batch-constant angles) gets no gradient. The splat window is sized
    for rotations up to ~6 degrees — larger angles trip the runtime guard
    and fall back to the exact scatter.

    `fast` WITHOUT `grad_via_splat` is for gradient-free images only: the
    windowed kernel's taps are non-differentiable, so the input is
    explicitly stop_gradient'ed (a silent zero gradient would be a trap).

    Args:
      img: (B, H, W, C).
      angle_deg: (B,) rotation angles in degrees (counterclockwise).
    """
    B, H, W, _ = img.shape
    grid = _rotation_grid(angle_deg, H, W)
    if grad_via_splat:
        from mono_vifi_tpu.ops.pallas.splat import grid_sample_frozen_grid

        rows = -(-int(2 * (W / 2) * 0.105 + 12) // 8) * 8  # sin(6 deg)
        # cascade: small-angle rotations (roughly half the uniform(-5,5)
        # draws) fit a 48-row splat window at ~60% of the full window's cost
        win = ((48, 0), (rows, 0)) if rows > 48 else (rows, 0)
        return grid_sample_frozen_grid(
            img, grid, "zeros", win, True, False, fast
        )
    if fast:
        from mono_vifi_tpu.ops.pallas import warp as pwarp

        if pwarp.windowed_ok(img.shape, grid.shape):
            return pwarp.grid_sample_windowed_zeros_safe(
                jax.lax.stop_gradient(img), grid
            )
    return grid_sample(img, grid, padding_mode="zeros", align_corners=True)


def _interp_rows(src: jax.Array, inside: jax.Array, out_size: int,
                 in_size: int) -> jax.Array:
    """Per-sample 1-D interpolation matrix (B, out_size, in_size) from float
    source coordinates `src` (B, out_size), already clamped to [0, in_size-1];
    `inside` (B, out_size) zeroes whole output rows (place-resize canvas)."""
    i0 = jnp.clip(jnp.floor(src), 0, in_size - 2)
    f = (src - i0)[..., None]
    i = jnp.arange(in_size, dtype=src.dtype)
    i0 = i0[..., None]
    M = (i == i0) * (1.0 - f) + (i == i0 + 1) * f
    return M * inside[..., None]


def batched_crop_resize(img: jax.Array, box: jax.Array) -> jax.Array:
    """Crop per-sample `box` = (x0, y0, w, h) and resize back to (H, W).

    Bilinear align_corners=False within the crop (exactly
    `F.interpolate(img[..., y0:y0+h, x0:x0+w], (H, W))`), reference
    train.py:899-900. The map is axis-separable, so instead of a per-pixel
    gather (rate-bound at ~25M rows/s on TPU — this op was the hottest of
    the whole train step) it is computed as two per-sample interpolation
    MATMULS riding the MXU; gradients are transposed matmuls (no scatter).
    """
    B, H, W, _ = img.shape
    box = box.astype(jnp.float32)
    x0, y0 = box[:, 0], box[:, 1]
    w, h = box[:, 2], box[:, 3]

    j = jnp.arange(W, dtype=jnp.float32)[None]
    i = jnp.arange(H, dtype=jnp.float32)[None]
    sx = jnp.clip((j + 0.5) * (w / W)[:, None] - 0.5, 0.0, (w - 1)[:, None])
    sy = jnp.clip((i + 0.5) * (h / H)[:, None] - 0.5, 0.0, (h - 1)[:, None])
    # border-clamp to the image interior for out-of-image boxes (matches the
    # previous grid_sample border semantics; interpolation weights stay in
    # [0, 1] instead of extrapolating)
    sx = jnp.clip(sx + x0[:, None], 0.0, W - 1.0)
    sy = jnp.clip(sy + y0[:, None], 0.0, H - 1.0)
    one = jnp.ones_like(sy)
    My = _interp_rows(sy, one, H, H)  # (B, H, H)
    Mx = _interp_rows(sx, jnp.ones_like(sx), W, W)  # (B, W, W)
    hp = jax.lax.Precision.HIGHEST if img.dtype == jnp.float32 else None
    y = jnp.einsum("boh,bhwc->bowc", My.astype(img.dtype), img, precision=hp)
    return jnp.einsum("bpw,bowc->bopc", Mx.astype(img.dtype), y, precision=hp)


def batched_place_resize(img: jax.Array, box: jax.Array) -> jax.Array:
    """Resize each sample to (h, w) and place at (x0, y0) in a zero canvas.

    Exactly `canvas[y0:y0+h, x0:x0+w] = F.interpolate(img, (h, w))` with
    per-sample boxes (reference train.py:912-914). Axis-separable like
    `batched_crop_resize`, so computed as two per-sample interpolation
    matmuls (outside-canvas rows/cols get all-zero matrix rows) — no
    gather forward, no scatter backward.
    """
    B, H, W, _ = img.shape
    box = box.astype(jnp.float32)
    x0, y0 = box[:, 0], box[:, 1]
    w, h = box[:, 2], box[:, 3]

    j = jnp.arange(W, dtype=jnp.float32)[None]
    i = jnp.arange(H, dtype=jnp.float32)[None]
    jj = j - x0[:, None]  # coords within the placed patch
    ii = i - y0[:, None]
    inside_x = (jj >= 0) & (jj < w[:, None])
    inside_y = (ii >= 0) & (ii < h[:, None])
    sx = jnp.clip((jj + 0.5) * (W / w)[:, None] - 0.5, 0.0, W - 1)
    sy = jnp.clip((ii + 0.5) * (H / h)[:, None] - 0.5, 0.0, H - 1)
    My = _interp_rows(sy, inside_y.astype(jnp.float32), H, H)
    Mx = _interp_rows(sx, inside_x.astype(jnp.float32), W, W)
    hp = jax.lax.Precision.HIGHEST if img.dtype == jnp.float32 else None
    y = jnp.einsum("boh,bhwc->bowc", My.astype(img.dtype), img, precision=hp)
    return jnp.einsum("bpw,bowc->bopc", Mx.astype(img.dtype), y, precision=hp)
