"""Differentiable camera geometry: disparity/depth conversion, SE(3) from
axis-angle, and the fused backproject-project reprojection grid.

Functional equivalents of the reference's `layers.py` geometry modules
(reference: layers.py:16-25 disp_to_depth, :28-103 pose matrices, :168-197
BackprojectDepth, :200-222 Project3D), re-designed as pure functions with
static shapes so the whole view-synthesis path fuses into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def disp_to_depth(disp: jax.Array, min_depth: float, max_depth: float):
    """Convert a network's sigmoid disparity output into depth.

    Matches reference layers.py:16-25: scaled_disp in [1/max_depth,
    1/min_depth]; depth = 1/scaled_disp.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec: jax.Array) -> jax.Array:
    """Axis-angle (B, 3) -> rotation matrix embedded in a (B, 4, 4) transform.

    Rodrigues' formula with the reference's 1e-7 axis-normalization epsilon
    (layers.py:64-103).
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    B = vec.shape[0]
    zeros = jnp.zeros((B,), vec.dtype)
    ones = jnp.ones((B,), vec.dtype)

    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zeros,
            xyC + zs, y * yC + ca, yzC - xs, zeros,
            zxC - ys, yzC + xs, z * zC + ca, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(B, 4, 4)
    return rot


def get_translation_matrix(translation: jax.Array) -> jax.Array:
    """Translation (B, 3) -> (B, 4, 4) transform (layers.py:48-61)."""
    B = translation.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=translation.dtype), (B, 4, 4))
    return T.at[:, :3, 3].set(translation)


def transformation_from_parameters(
    axisangle: jax.Array, translation: jax.Array, invert: bool = False
) -> jax.Array:
    """(axis-angle, translation) -> (B, 4, 4) SE(3) matrix.

    Matches reference layers.py:28-45: forward is T @ R; inverse is
    R^T @ T(-t).
    """
    hp = jax.lax.Precision.HIGHEST
    R = rot_from_axisangle(axisangle)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -translation
        T = get_translation_matrix(t)
        return jnp.matmul(R, T, precision=hp)
    T = get_translation_matrix(translation)
    return jnp.matmul(T, R, precision=hp)


def _pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel coordinates, shape (3, H, W): rows are x, y, 1."""
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    ones = jnp.ones((height, width), dtype)
    return jnp.stack([xs, ys, ones], axis=0)


def reprojection_grid(
    depth: jax.Array,
    K: jax.Array,
    inv_K: jax.Array,
    T: jax.Array,
    eps: float = 1e-7,
) -> jax.Array:
    """Fused backproject + project: target depth -> source sampling grid.

    Equivalent to reference BackprojectDepth (layers.py:168-197) followed by
    Project3D (layers.py:200-222), algebraically collapsed: with P = K @ T,
    proj = depth * (P[:3,:3] @ inv_K[:3,:3]) @ pix + P[:3,3]. One (B,3,3)
    matmul folded ahead of a single broadcasted contraction — no (B,4,N)
    intermediates, fully fusable by XLA.

    Args:
      depth: (B, H, W) or (B, H, W, 1) target-frame depth.
      K: (B, 4, 4) intrinsics of the source camera.
      inv_K: (B, 4, 4) inverse intrinsics of the target camera.
      T: (B, 4, 4) target->source camera transform.
      eps: projection z epsilon (reference Project3D eps=1e-7).

    Returns:
      grid: (B, H, W, 2) normalized sampling coordinates in [-1, 1],
      (x, y) order, align_corners=True convention.
    """
    gx, gy = reprojection_grid_planar(depth, K, inv_K, T, eps)
    return jnp.stack([gx, gy], axis=-1)


def reprojection_grid_planar(
    depth: jax.Array,
    K: jax.Array,
    inv_K: jax.Array,
    T: jax.Array,
    eps: float = 1e-7,
):
    """`reprojection_grid` returning the PLANAR pair (gx, gy), each (B, H, W).

    The TPU training path stays planar end-to-end: a (..., 2)-minor grid
    tensor gets 64x lane-tile padding on every copy/concat/split it touches
    (the batch-concat of two grids alone cost ~6 ms/step in backward splits),
    while (B, H, W) planes tile perfectly.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    dtype = depth.dtype

    hp = jax.lax.Precision.HIGHEST
    P = jnp.matmul(K, T, precision=hp)  # (B, 4, 4)
    A = jnp.matmul(P[:, :3, :3], inv_K[:, :3, :3], precision=hp)  # (B, 3, 3)
    b = P[:, :3, 3]  # (B, 3)

    pix = _pixel_grid(H, W, dtype)  # (3, H, W)
    # rays[b, i, h, w] = sum_j A[b, i, j] * pix[j, h, w]
    rays = jnp.einsum("bij,jhw->bihw", A, pix, precision=jax.lax.Precision.HIGHEST)
    cam = depth[:, None] * rays + b[:, :, None, None]  # (B, 3, H, W)

    x = cam[:, 0] / (cam[:, 2] + eps)
    y = cam[:, 1] / (cam[:, 2] + eps)
    gx = (x / (W - 1) - 0.5) * 2.0
    gy = (y / (H - 1) - 0.5) * 2.0
    return gx, gy


def conjugate_pose(pose: jax.Array, Rc: jax.Array) -> jax.Array:
    """Affine-branch pose conjugation (reference train.py:819-828).

    Returns a (B, 4, 4) transform whose rotation block is Rc @ R @ Rc^{-1}
    and translation is Rc @ t; the bottom row is zero (the reference builds it
    with torch.zeros_like and never sets [3, 3] — reproduced faithfully, the
    projection path only ever reads rows :3).
    """
    hp = jax.lax.Precision.HIGHEST
    # conjugation runs in f32 regardless of the (possibly bf16) pose dtype:
    # 4x4 pose algebra is precision-critical and free, and a uniform f32
    # scatter avoids XLA's f32-value-into-bf16-operand scatter (a JAX
    # FutureWarning, soon an error)
    f32 = jnp.float32
    R = pose[:, :3, :3].astype(f32)
    t = pose[:, :3, 3:4].astype(f32)
    Rc = Rc.astype(f32)
    Rc_inv = jnp.linalg.inv(Rc)
    out = jnp.zeros(pose.shape, f32)
    RcR = jnp.matmul(Rc, jnp.matmul(R, Rc_inv, precision=hp), precision=hp)
    out = out.at[:, :3, :3].set(RcR)
    out = out.at[:, :3, 3:4].set(jnp.matmul(Rc, t, precision=hp))
    return out.astype(pose.dtype)
