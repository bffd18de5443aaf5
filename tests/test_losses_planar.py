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
