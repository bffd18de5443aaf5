"""Loss building blocks: SSIM, photometric reprojection, edge-aware smoothness,
SI-log depth consistency, and the IFRNet VFI losses (Charbonnier, ternary
census, geometry-feature).

All functions take NHWC arrays and reduce exactly like the reference
(layers.py:231-311, train.py:924-941,973-985, networks/IFRNet.py:18-114) so
loss values are comparable across frameworks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops.image import avg_pool_3x3, reflect_pad_2d

_SSIM_C1 = 0.01**2
_SSIM_C2 = 0.03**2


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM loss map, clamped (1-SSIM)/2 in [0, 1].

    Reference layers.py:261-290: reflection pad 1 then 3x3 average pools.
    Returns (B, H, W, C).
    """
    x = reflect_pad_2d(x, 1)
    y = reflect_pad_2d(y, 1)

    mu_x = avg_pool_3x3(x)
    mu_y = avg_pool_3x3(y)

    sigma_x = avg_pool_3x3(x * x) - mu_x * mu_x
    sigma_y = avg_pool_3x3(y * y) - mu_y * mu_y
    sigma_xy = avg_pool_3x3(x * y) - mu_x * mu_y

    n = (2 * mu_x * mu_y + _SSIM_C1) * (2 * sigma_xy + _SSIM_C2)
    d = (mu_x**2 + mu_y**2 + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def reprojection_loss(pred: jax.Array, target: jax.Array, use_ssim: bool = True) -> jax.Array:
    """0.85*SSIM + 0.15*L1 per-pixel loss, channel-averaged -> (B, H, W, 1).

    Reference train.py:973-985.
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def smooth_loss(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware first-order smoothness (reference layers.py:231-242).

    disp: (B, H, W, 1) — typically mean-normalized; img: (B, H, W, 3).
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True
    )
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True
    )

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


# --------------------------------------------------------------------------
# Channel-planar photometric path (TPU layout optimization)
#
# NHWC tensors with tiny minor dims (C=3 images, C=1 disparity) get
# catastrophic (8, 128)-tile lane padding in elementwise/reduce_window
# chains on TPU (up to 42x memory amplification). The planar variants take
# (B, C, H, W) so the tiled pair is (H, W) — W is a multiple of 128 for all
# training resolutions — and reduce over the leading channel axis. Loss
# semantics are bit-identical to the NHWC versions (same reference
# layers.py:231-311, train.py:973-985 math, different layout).
# --------------------------------------------------------------------------


def _avg_pool_3x3_planar(x: jax.Array) -> jax.Array:
    """3x3 stride-1 VALID average pool over the last two dims of (..., H, W)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


_PAD_PL = ((0, 0), (0, 0), (1, 1), (1, 1))


def target_moments_planar(y: jax.Array):
    """Precompute the target-side SSIM terms shared by every comparison
    against the same target: (y_pad, mu_y, sigma_y). One photometric stack
    entry compares 4 sources (2 predictions + 2 identity) against one
    target — sharing these drops 6 of the 20 pools per entry, exactly."""
    y_pad = jnp.pad(y, _PAD_PL, mode="reflect")
    mu_y = _avg_pool_3x3_planar(y_pad)
    sigma_y = _avg_pool_3x3_planar(y_pad * y_pad) - mu_y * mu_y
    return y_pad, mu_y, sigma_y


def ssim_planar_pre(x: jax.Array, y_pad, mu_y, sigma_y) -> jax.Array:
    """SSIM loss map against precomputed target moments -> (B, C, H, W)."""
    x = jnp.pad(x, _PAD_PL, mode="reflect")
    mu_x = _avg_pool_3x3_planar(x)
    sigma_x = _avg_pool_3x3_planar(x * x) - mu_x * mu_x
    sigma_xy = _avg_pool_3x3_planar(x * y_pad) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _SSIM_C1) * (2 * sigma_xy + _SSIM_C2)
    d = (mu_x**2 + mu_y**2 + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def ssim_planar(x: jax.Array, y: jax.Array) -> jax.Array:
    """SSIM loss map on (B, C, H, W) planes -> (B, C, H, W)."""
    return ssim_planar_pre(x, *target_moments_planar(y))


def reprojection_loss_planar(
    pred: jax.Array, target: jax.Array, use_ssim: bool = True, moments=None
) -> jax.Array:
    """0.85*SSIM + 0.15*L1, channel-averaged: (B, C, H, W) -> (B, H, W).

    `moments`: optional precomputed target_moments_planar(target) to share
    target-side pools across comparisons (bit-identical result).
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=1)
    if not use_ssim:
        return l1
    if moments is None:
        moments = target_moments_planar(target)
    s = jnp.mean(ssim_planar_pre(pred, *moments), axis=1)
    return 0.85 * s + 0.15 * l1


def smooth_loss_planar(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware smoothness; disp: (B, H, W), img: (B, C, H, W)."""
    grad_disp_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    grad_disp_y = jnp.abs(disp[:, :-1, :] - disp[:, 1:, :])
    grad_img_x = jnp.mean(jnp.abs(img[..., :, :-1] - img[..., :, 1:]), axis=1)
    grad_img_y = jnp.mean(jnp.abs(img[..., :-1, :] - img[..., 1:, :]), axis=1)
    return jnp.mean(grad_disp_x * jnp.exp(-grad_img_x)) + jnp.mean(
        grad_disp_y * jnp.exp(-grad_img_y)
    )


def smooth_loss_dyn_planar(
    disp: jax.Array, img: jax.Array, mask_dyn: jax.Array
) -> jax.Array:
    """Planar-layout smooth_loss_dyn (reference layers.py:244-258).

    disp: (B, H, W); img: (B, C, H, W); mask_dyn: (B, H, W). A zero mask
    reduces exactly to smooth_loss_planar (M=1, img unchanged), so stacked
    targets without doj masks can share one call.
    """
    M = 100.0 * mask_dyn + (1.0 - mask_dyn)
    img = (1.0 - mask_dyn)[:, None] * img
    grad_disp_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    grad_disp_y = jnp.abs(disp[:, :-1, :] - disp[:, 1:, :])
    grad_img_x = jnp.mean(jnp.abs(img[..., :, :-1] - img[..., :, 1:]), axis=1)
    grad_img_y = jnp.mean(jnp.abs(img[..., :-1, :] - img[..., 1:, :]), axis=1)
    return jnp.mean(grad_disp_x * jnp.exp(-grad_img_x)) + jnp.mean(
        grad_disp_y * jnp.exp(-grad_img_y) * M[:, :-1, :]
    )


def to_planar(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C, H, W)."""
    return x.transpose(0, 3, 1, 2)


def si_log_depth_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array | None = None,
    beta: float = 0.5,
) -> jax.Array:
    """Scale-invariant log depth loss (reference train.py:924-941).

    pred/target: (B, H, W, 1); mask: (B, H, W, 1) or None.
    """
    if mask is None:
        mask = jnp.ones_like(pred)
    m = mask[..., 0]
    log_pred = jnp.log(pred[..., 0] + 1e-7) * m
    log_tgt = jnp.log(target[..., 0] + 1e-7) * m

    diff = log_pred - log_tgt
    valid = jnp.sum(m, axis=(1, 2)) + 1e-8
    sq_sum = jnp.sum(diff**2, axis=(1, 2))
    sum_sq = jnp.sum(diff, axis=(1, 2)) ** 2
    loss = sq_sum / valid - beta * sum_sq / (valid**2)
    return jnp.mean(loss)


def smooth_loss_dyn(disp: jax.Array, img: jax.Array, mask_dyn: jax.Array) -> jax.Array:
    """Dynamic-object-weighted smoothness (reference layers.py:244-258,
    kept for parity; unused by the trainer). mask_dyn: (B, H, W, 1)."""
    M = 100.0 * mask_dyn + (1.0 - mask_dyn)
    img = (1.0 - mask_dyn) * img
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True
    )
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True
    )
    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y) * M[:, :-1, :, :]
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


# --------------------------------------------------------------------------
# IFRNet VFI training losses (networks/IFRNet.py:18-114)
# --------------------------------------------------------------------------


def charbonnier_l1(diff: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Charbonnier L1 (networks/IFRNet.py:94-103)."""
    val = jnp.sqrt(diff**2 + 1e-6)
    if mask is None:
        return jnp.mean(val)
    return jnp.mean(val * mask) / (jnp.mean(mask) + 1e-9)


def charbonnier_ada(diff: jax.Array, weight: jax.Array) -> jax.Array:
    """Adaptive Charbonnier (networks/IFRNet.py:106-114)."""
    alpha = weight / 2
    epsilon = 10 ** (-(10 * weight - 1) / 3)
    return jnp.mean((diff**2 + epsilon**2) ** alpha)


def get_robust_weight(flow_pred: jax.Array, flow_gt: jax.Array, beta: float) -> jax.Array:
    """exp(-beta * EPE) with detached prediction (networks/IFRNet.py:18-21).

    flow_*: (B, H, W, 2); returns (B, H, W, 1).
    """
    epe = jnp.sqrt(
        jnp.sum((jax.lax.stop_gradient(flow_pred) - flow_gt) ** 2, axis=-1, keepdims=True)
    )
    return jnp.exp(-beta * epe)


@functools.lru_cache(maxsize=None)
def _eye_patch_kernel(patch_size: int) -> np.ndarray:
    """HWIO identity kernel (P, P, 1, P*P) extracting PxP patches by conv."""
    k = np.eye(patch_size * patch_size, dtype=np.float32)
    return k.reshape(patch_size, patch_size, 1, patch_size * patch_size)


def _extract_patches(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, 1) -> (B, H, W, P*P) neighborhood values, zero-padded."""
    kernel = jnp.asarray(_eye_patch_kernel(patch_size), x.dtype)
    pad = patch_size // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _census_transform(x: jax.Array, patch_size: int) -> jax.Array:
    patches = _extract_patches(x, patch_size)
    loc_diff = patches - x
    return loc_diff / jnp.sqrt(0.81 + loc_diff**2)


def _inner_mask(shape_bhw1: tuple[int, ...], pad: int, dtype) -> jax.Array:
    b, h, w, _ = shape_bhw1
    inner = jnp.ones((b, h - 2 * pad, w - 2 * pad, 1), dtype)
    return jnp.pad(inner, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def ternary_loss(x: jax.Array, y: jax.Array, patch_size: int = 7) -> jax.Array:
    """Census-transform distance (networks/IFRNet.py:24-55); y is detached."""
    gx = jnp.mean(x, axis=-1, keepdims=True)
    gy = jnp.mean(y, axis=-1, keepdims=True)
    tx = _census_transform(gx, patch_size)
    ty = jax.lax.stop_gradient(_census_transform(gy, patch_size))
    diff = tx - ty
    dist = jnp.mean(diff**2 / (0.1 + diff**2), axis=-1, keepdims=True)
    mask = _inner_mask(gx.shape, patch_size // 2, x.dtype)
    return jnp.mean(dist * mask)


def geometry_loss(x: jax.Array, y: jax.Array, patch_size: int = 3) -> jax.Array:
    """Feature-geometry census loss over all channels (networks/IFRNet.py:58-91).

    Applies the census transform per channel (grouped conv) — channel ordering
    differs from the reference's reshape trick but the channel-mean afterward
    makes the result identical.
    """
    C = x.shape[-1]
    kernel = jnp.asarray(_eye_patch_kernel(patch_size), x.dtype)
    kernel = jnp.tile(kernel, (1, 1, 1, C))  # (P, P, 1, C*P*P) grouped
    pad = patch_size // 2

    def census_all(t):
        patches = jax.lax.conv_general_dilated(
            t,
            kernel,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        center = jnp.repeat(t, patch_size * patch_size, axis=-1)
        loc_diff = patches - center
        return loc_diff / jnp.sqrt(0.81 + loc_diff**2)

    tx = census_all(x)
    ty = census_all(y)
    diff = tx - ty
    dist = jnp.mean(diff**2 / (0.1 + diff**2), axis=-1, keepdims=True)
    mask = _inner_mask((x.shape[0], x.shape[1], x.shape[2], 1), pad, x.dtype)
    return jnp.mean(dist * mask)
