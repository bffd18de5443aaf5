"""Fused SSIM+L1 photometric map as Pallas TPU kernels.

The reprojection loss map `0.85 * mean_c(SSIM(x, y)) + 0.15 * mean_c|x - y|`
(reference train.py:973-985 + layers.py:261-290) is, in XLA, a chain of ~20
pools and elementwise ops that materialize (N, 3, H, W) f32 intermediates —
a long tail of small loop fusions (~45 ms/step at the training shapes).
These kernels compute the whole map in ONE pass per image with the plane
resident in VMEM (grid = one program per image; pools are separable
shift-adds on the full plane), and the custom backward recomputes the pooled
statistics instead of storing them.

Numerics match ops.losses.ssim/reprojection_loss (reflect-pad 3x3 mean
pools, C1=0.01^2, C2=0.03^2, clip((1-SSIM)/2, 0, 1)) to f32 rounding;
tests/test_pallas_photometric.py pins both the forward map and the gradient
against the XLA path.

Only x receives a gradient (the target/source frames of the photometric
loss are leaves); dy is not computed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C1 = 0.01**2
_C2 = 0.03**2


def _pool_ref(xp):
    """3x3 mean pool of an already reflect-padded (H+2, W+2) plane -> (H, W)."""
    H, W = xp.shape[0] - 2, xp.shape[1] - 2
    rows = xp[0:H, :] + xp[1 : H + 1, :] + xp[2 : H + 2, :]
    return (rows[:, 0:W] + rows[:, 1 : W + 1] + rows[:, 2 : W + 2]) / 9.0


def _reflect_pad(x):
    """Reflect-pad a (H, W) plane by 1 (jnp.pad 'reflect' semantics)."""
    top = x[1:2, :]
    bot = x[-2:-1, :]
    x = jnp.concatenate([top, x, bot], axis=0)
    left = x[:, 1:2]
    right = x[:, -2:-1]
    return jnp.concatenate([left, x, right], axis=1)


def _pool(x):
    return _pool_ref(_reflect_pad(x))


def _pool_adjoint(ct):
    """Adjoint of `_pool` (reflect-pad then VALID 3x3 mean) applied to a
    (H, W) cotangent: zero-pad box-sum back to the padded plane, then fold
    the padded rows/cols onto their reflect sources."""
    H, W = ct.shape
    z = jnp.zeros((1, W), ct.dtype)
    cr = jnp.concatenate([z, z, ct, z, z], axis=0)  # (H+4, W)
    rows = cr[0 : H + 2, :] + cr[1 : H + 3, :] + cr[2 : H + 4, :]
    zc = jnp.zeros((H + 2, 1), ct.dtype)
    cc = jnp.concatenate([zc, zc, rows, zc, zc], axis=1)
    padded = (
        cc[:, 0 : W + 2] + cc[:, 1 : W + 3] + cc[:, 2 : W + 4]
    ) / 9.0  # (H+2, W+2): adjoint of the VALID pool
    # adjoint of reflect pad: interior + fold col 0 -> col 1, col W+1 -> W-2
    # (columns first so the corner cells flow through both folds), then rows
    colidx = jax.lax.broadcasted_iota(jnp.int32, (H + 2, W), 1)
    p = (
        padded[:, 1 : W + 1]
        + jnp.where(colidx == 1, jnp.broadcast_to(padded[:, 0:1], (H + 2, W)), 0.0)
        + jnp.where(
            colidx == W - 2,
            jnp.broadcast_to(padded[:, W + 1 : W + 2], (H + 2, W)),
            0.0,
        )
    )
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    return (
        p[1 : H + 1]
        + jnp.where(rowidx == 1, jnp.broadcast_to(p[0:1], (H, W)), 0.0)
        + jnp.where(
            rowidx == H - 2, jnp.broadcast_to(p[H + 1 : H + 2], (H, W)), 0.0
        )
    )


def _fwd_kernel(x_ref, y_ref, out_ref, *, C, use_ssim):
    f32 = jnp.float32
    acc = None
    for c in range(C):
        x = x_ref[0, c].astype(f32)
        y = y_ref[0, c].astype(f32)
        l1 = jnp.abs(y - x)
        if use_ssim:
            mu_x = _pool(x)
            mu_y = _pool(y)
            sigma_x = _pool(x * x) - mu_x * mu_x
            sigma_y = _pool(y * y) - mu_y * mu_y
            sigma_xy = _pool(x * y) - mu_x * mu_y
            n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
            d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
            s = jnp.clip((1 - n / d) / 2, 0.0, 1.0)
            v = 0.85 * s + 0.15 * l1
        else:
            v = l1
        acc = v if acc is None else acc + v
    out_ref[0] = acc / C


def _bwd_kernel(x_ref, y_ref, ct_ref, dx_ref, *, C, use_ssim):
    f32 = jnp.float32
    ct = ct_ref[0].astype(f32) / C
    for c in range(C):
        x = x_ref[0, c].astype(f32)
        y = y_ref[0, c].astype(f32)
        # L1 part: d|y - x|/dx = -sign(y - x)
        dx = (-0.15 if use_ssim else -1.0) * jnp.sign(y - x) * ct
        if use_ssim:
            mu_x = _pool(x)
            mu_y = _pool(y)
            sigma_x = _pool(x * x) - mu_x * mu_x
            sigma_y = _pool(y * y) - mu_y * mu_y
            sigma_xy = _pool(x * y) - mu_x * mu_y
            A = 2 * mu_x * mu_y + _C1
            Bs = 2 * sigma_xy + _C2
            Dm = mu_x * mu_x + mu_y * mu_y + _C1
            Ds = sigma_x + sigma_y + _C2
            n = A * Bs
            d = Dm * Ds
            L = (1 - n / d) / 2
            gate = jnp.where((L > 0.0) & (L < 1.0), 1.0, 0.0)
            g = 0.85 * ct * gate  # d loss / d ssim_clip pre-clip
            dn = -g / (2 * d)
            dd = g * n / (2 * d * d)
            dmu_x = dn * 2 * mu_y * Bs + dd * 2 * mu_x * Ds
            dsig_x = dd * Dm
            dsig_xy = dn * 2 * A
            # sigma_x = P(x^2) - mu_x^2 ; sigma_xy = P(xy) - mu_x mu_y
            gmu = dmu_x - 2 * mu_x * dsig_x - mu_y * dsig_xy  # coeff on P(x)
            dx = dx + _pool_adjoint(gmu)
            dx = dx + 2 * x * _pool_adjoint(dsig_x)
            dx = dx + y * _pool_adjoint(dsig_xy)
        dx_ref[0, c] = dx.astype(dx_ref.dtype)


def _run_fwd(x, y, use_ssim, interpret):
    N, C, H, W = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, use_ssim=use_ssim),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, H, W), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )(x, y)


def _run_bwd(x, y, ct, use_ssim, interpret):
    N, C, H, W = x.shape
    return pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, use_ssim=use_ssim),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, H, W), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, H, W), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )(x, y, ct)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ssim_l1_map(x, y, use_ssim=True, interpret=False):
    """Fused photometric map: (N, C, H, W) planes -> (N, H, W) f32.

    == 0.85*mean_c(ssim_planar(x, y)) + 0.15*mean_c|y - x| (use_ssim) or
    mean_c|y - x|. Gradient w.r.t. x only (y is a loss target/leaf)."""
    return _run_fwd(x, y, use_ssim, interpret)


def _fwd(x, y, use_ssim, interpret):
    return _run_fwd(x, y, use_ssim, interpret), (x, y)


def _bwd(use_ssim, interpret, res, ct):
    x, y = res
    dx = _run_bwd(x, y, ct, use_ssim, interpret).astype(x.dtype)
    return dx, jnp.zeros_like(y)


ssim_l1_map.defvjp(_fwd, _bwd)


def ssim_l1_map_nograd(x, y, use_ssim=True, interpret=False):
    """Forward-only variant for the identity (automask) comparisons."""
    return jax.lax.stop_gradient(_run_fwd(x, y, use_ssim, interpret))
