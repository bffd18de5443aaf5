"""Bilinear grid sampling (the hot custom op of the whole framework).

Semantics match `torch.nn.functional.grid_sample` (reference usage:
train.py:966-969 view synthesis with border padding + align_corners=True;
networks/IFRNet.py:7-15 flow warp) for the configurations the reference uses:
mode='bilinear', padding_mode in {'border', 'zeros'}, align_corners=True/False.

Implementation notes (TPU):
  - The sample positions are data-dependent (depth / flow driven) so this is a
    true gather. We flatten spatial dims and issue 4 neighbor gathers with the
    channel axis minor-most, which XLA lowers to contiguous-C gathers.
  - For border mode the *float* coordinate is clamped before computing weights
    (exactly torch's grid_sampler_compute_source_index order), for zeros mode
    out-of-range taps get zero weight via masks.
  - Gradients flow to both the image (scatter-add adjoint of gather) and the
    grid, same as torch.
A Pallas kernel with the same contract lives in ops/pallas/grid_sample.py and
is used on TPU when it wins; this XLA version is the always-correct oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners"))
def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear sample `img` at `grid` positions.

    Args:
      img: (B, H, W, C) source image (NHWC).
      grid: (B, Ho, Wo, 2) normalized coords in [-1, 1], (x, y) order.
      padding_mode: 'border' or 'zeros'.
      align_corners: torch semantics.

    Returns:
      (B, Ho, Wo, C) sampled output.
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    compute_dtype = jnp.promote_types(img.dtype, grid.dtype)

    x = _unnormalize(grid[..., 0].astype(compute_dtype), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(compute_dtype), H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        # Per-tap in-bounds masks (weights of out-of-range taps zeroed).
        mx0 = (x0 >= 0) & (x0 <= W - 1)
        mx1 = (x1 >= 0) & (x1 <= W - 1)
        my0 = (y0 >= 0) & (y0 <= H - 1)
        my1 = (y1 >= 0) & (y1 <= H - 1)

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    # gather in the promoted dtype so the scatter-add adjoint's updates match
    # the operand dtype (avoids f32->bf16 scatter promotion errors)
    flat = img.reshape(B, H * W, C).astype(compute_dtype)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, Ho * Wo, 1)
        out = jnp.take_along_axis(flat, idx, axis=1)
        return out.reshape(B, Ho, Wo, C)

    g00 = gather(y0c, x0c)  # top-left
    g01 = gather(y0c, x1c)  # top-right
    g10 = gather(y1c, x0c)  # bottom-left
    g11 = gather(y1c, x1c)  # bottom-right

    w00 = (1.0 - wy) * (1.0 - wx)
    w01 = (1.0 - wy) * wx
    w10 = wy * (1.0 - wx)
    w11 = wy * wx

    if padding_mode == "zeros":
        zero = jnp.zeros((), compute_dtype)
        w00 = jnp.where(my0 & mx0, w00, zero)
        w01 = jnp.where(my0 & mx1, w01, zero)
        w10 = jnp.where(my1 & mx0, w10, zero)
        w11 = jnp.where(my1 & mx1, w11, zero)

    out = (
        w00[..., None] * g00
        + w01[..., None] * g01
        + w10[..., None] * g10
        + w11[..., None] * g11
    )
    return out.astype(img.dtype)


def warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp `img` by a pixel-displacement `flow`.

    Matches reference networks/IFRNet.py:7-15: a base identity grid in [-1,1]
    plus flow normalized by (size-1)/2, sampled bilinear/border/
    align_corners=True.

    Args:
      img: (B, H, W, C).
      flow: (B, H, W, 2), pixel displacements, channel order (dx, dy).
    """
    B, H, W, _ = flow.shape
    dtype = flow.dtype
    gx = jax.lax.broadcasted_iota(dtype, (H, W), 1) / ((W - 1.0) / 2.0) - 1.0
    gy = jax.lax.broadcasted_iota(dtype, (H, W), 0) / ((H - 1.0) / 2.0) - 1.0
    nx = gx[None] + flow[..., 0] / ((W - 1.0) / 2.0)
    ny = gy[None] + flow[..., 1] / ((H - 1.0) / 2.0)
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(img, grid, padding_mode="border", align_corners=True)
