"""Fused Pallas SSIM+L1 photometric map == the XLA planar path, values and
gradients (ops/pallas/photometric.py; reference semantics train.py:973-985 +
layers.py:261-290)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_vifi_tpu.ops import losses as L
from mono_vifi_tpu.ops.pallas import photometric as P


@pytest.fixture(scope="module")
def planes():
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.uniform(k1, (3, 3, 24, 256), jnp.float32)
    y = jax.random.uniform(k2, (3, 3, 24, 256), jnp.float32)
    return x, y


@pytest.mark.parametrize("use_ssim", [True, False])
def test_forward_matches_xla(planes, use_ssim):
    x, y = planes
    ref = L.reprojection_loss_planar(x, y, use_ssim)
    out = P.ssim_l1_map(x, y, use_ssim, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("use_ssim", [True, False])
def test_gradient_matches_xla(planes, use_ssim):
    x, y = planes
    # weight the map so the cotangent is non-uniform (exercises the pooled
    # adjoint paths, not just constants)
    wk = jax.random.normal(jax.random.PRNGKey(9), x.shape[:1] + x.shape[2:])

    def f_ref(x_):
        return jnp.sum(L.reprojection_loss_planar(x_, y, use_ssim) * wk)

    def f_pal(x_):
        return jnp.sum(P.ssim_l1_map(x_, y, use_ssim, True) * wk)

    g_ref = jax.grad(f_ref)(x)
    g_pal = jax.grad(f_pal)(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=5e-6
    )
    # y gets no gradient from the kernel (targets are leaves)
    gy = jax.grad(lambda y_: jnp.sum(P.ssim_l1_map(x, y_, use_ssim, True)))(y)
    np.testing.assert_array_equal(np.asarray(gy), 0.0)


def test_nograd_variant_matches(planes):
    x, y = planes
    a = P.ssim_l1_map_nograd(x, y, True, True)
    b = P.ssim_l1_map(x, y, True, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reflect_pad_custom_vjp_matches_jnp_pad():
    """The fused reflect-pad backward must equal XLA's pad transpose."""
    from mono_vifi_tpu.ops.image import reflect_pad_2d

    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 10, 14, 5), jnp.float32)
    ref = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(np.asarray(reflect_pad_2d(x, 1)), np.asarray(ref))
    w = jax.random.normal(jax.random.PRNGKey(4), ref.shape)
    g_ref = jax.grad(
        lambda x_: jnp.sum(
            jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect") * w
        )
    )(x)
    g_new = jax.grad(lambda x_: jnp.sum(reflect_pad_2d(x_, 1) * w))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-6)
