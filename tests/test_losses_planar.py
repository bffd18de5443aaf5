"""Planar (B, C, H, W) photometric-loss path == NHWC path bit-for-bit.

The planar variants exist purely as a TPU layout optimization (see
ops/losses.py); any numeric divergence from the NHWC reference-semantics
implementations is a bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_vifi_tpu.ops import losses as L


@pytest.fixture(scope="module")
def imgs():
    k = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(k, 3)
    pred = jax.random.uniform(k1, (2, 24, 40, 3), jnp.float32)
    tgt = jax.random.uniform(k2, (2, 24, 40, 3), jnp.float32)
    disp = jax.random.uniform(k3, (2, 24, 40, 1), jnp.float32) + 0.05
    return pred, tgt, disp


def test_ssim_planar_matches_nhwc(imgs):
    pred, tgt, _ = imgs
    a = L.ssim(pred, tgt)
    b = L.ssim_planar(L.to_planar(pred), L.to_planar(tgt))
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b.transpose(0, 2, 3, 1)), rtol=0, atol=1e-6
    )


@pytest.mark.parametrize("use_ssim", [True, False])
def test_reprojection_planar_matches_nhwc(imgs, use_ssim):
    pred, tgt, _ = imgs
    a = L.reprojection_loss(pred, tgt, use_ssim)[..., 0]
    b = L.reprojection_loss_planar(L.to_planar(pred), L.to_planar(tgt), use_ssim)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def test_smooth_planar_matches_nhwc(imgs):
    pred, tgt, disp = imgs
    a = L.smooth_loss(disp, tgt)
    b = L.smooth_loss_planar(disp[..., 0], L.to_planar(tgt))
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_planar_gradients_match(imgs):
    pred, tgt, _ = imgs

    def f_nhwc(p):
        return jnp.mean(L.reprojection_loss(p, tgt))

    def f_pl(p):
        return jnp.mean(L.reprojection_loss_planar(L.to_planar(p), L.to_planar(tgt)))

    ga = jax.grad(f_nhwc)(pred)
    gb = jax.grad(f_pl)(pred)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=0, atol=1e-6)


def test_shared_target_moments_identical(imgs):
    pred, tgt, _ = imgs
    pl_p, pl_t = L.to_planar(pred), L.to_planar(tgt)
    base = L.reprojection_loss_planar(pl_p, pl_t)
    mom = L.target_moments_planar(pl_t)
    np.testing.assert_array_equal(
        np.asarray(base),
        np.asarray(L.reprojection_loss_planar(pl_p, pl_t, moments=mom)),
    )


def test_photometric_ident_reuse_identical():
    """The identity-loss dedup over repeated stack targets must be
    numerically identical to the direct 6-block computation (same noise
    draw, same values)."""
    from types import SimpleNamespace

    from mono_vifi_tpu.config import Options
    from mono_vifi_tpu.training.monovifi import MonoViFiStep

    cfg = Options(height=24, width=40, use_affine=True)
    step = MonoViFiStep.__new__(MonoViFiStep)
    step.cfg = cfg
    step.b = SimpleNamespace(fast_warp=False, dtype=None)

    k = jax.random.PRNGKey(11)
    ks = jax.random.split(k, 8)
    B, H, W = 2, 24, 40
    u = lambda kk, *s: jax.random.uniform(kk, s, jnp.float32)
    # a 6-entry stack whose targets repeat as (0, pt, nt, 0, nt, pt)
    t0, tpt, tnt = u(ks[0], B, H, W, 3), u(ks[1], B, H, W, 3), u(ks[2], B, H, W, 3)
    tgt = jnp.concatenate([t0, tpt, tnt, t0, tnt, tpt], 0)
    disp = u(ks[3], 6 * B, H, W, 1) * 0.5 + 0.05
    src_n1 = jnp.concatenate([u(ks[4], B, H, W, 3)] * 6, 0)
    src_p1 = jnp.concatenate([u(ks[5], B, H, W, 3)] * 6, 0)
    K = jnp.tile(
        jnp.array(
            [
                [0.58 * W, 0, 0.5 * W, 0],
                [0, 1.92 * H, 0.5 * H, 0],
                [0, 0, 1, 0],
                [0, 0, 0, 1],
            ],
            jnp.float32,
        ),
        (6 * B, 1, 1),
    )
    invK = jnp.linalg.pinv(K)
    T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (6 * B, 1, 1))
    T = T.at[:, 0, 3].set(0.02)
    rng = jax.random.PRNGKey(3)
    args = (disp, tgt, src_n1, src_p1, T, T, K, invK, rng)
    plain = step._photometric(*args)
    dedup = step._photometric(*args, ident_reuse=(0, 1, 2, 0, 2, 1))
    np.testing.assert_allclose(float(plain), float(dedup), rtol=1e-6)
