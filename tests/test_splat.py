"""MXU splat kernel: the Pallas bilinear scatter-add adjoint matches the
exact XLA scatter and jax.grad of the exact warp (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops import sampling
from mono_vifi_tpu.ops.pallas import splat
from tests.test_pallas_warp import _smooth_grid

RNG = np.random.default_rng(23)


def _smooth_flow(B, H, W, mx=8.0, my=3.0):
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fl = []
    for b in range(B):
        ph = RNG.uniform(0, 2 * np.pi, 2)
        dx = mx * np.sin(2 * np.pi * ys / H + ph[0])
        dy = my * np.cos(2 * np.pi * xs / W + ph[1])
        fl.append(np.stack([dx, dy], -1))
    return jnp.asarray(np.stack(fl).astype(np.float32))


def test_bilinear_splat_matches_xla_scatter():
    B, Ho, Wo, C = 2, 24, 130, 5  # ragged dims exercise tile padding
    H, W = 40, 150
    ct = jnp.asarray(RNG.standard_normal((B, Ho, Wo, C)).astype(np.float32))
    ly = jnp.asarray(RNG.integers(0, H - 1, (B, Ho, Wo)).astype(np.int32))
    lx = jnp.asarray(RNG.integers(0, W - 1, (B, Ho, Wo)).astype(np.int32))
    w = [
        jnp.asarray(RNG.random((B, Ho, Wo)).astype(np.float32))
        for _ in range(4)
    ]
    ref = splat._xla_splat(ct, ly, lx, *w, (H, W))
    # full-plane window -> always exact regardless of index spread
    out = splat.bilinear_splat(
        ct, ly, lx, *w, (H, W), window=(48, 256), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=1e-2)  # bf16 matmul taps


def test_warp_frozen_flow_grad_matches_exact_border():
    B, H, W, C = 1, 32, 256, 4
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    flow = _smooth_flow(B, H, W)

    def loss_exact(im):
        return jnp.sum(sampling.warp(im, flow) ** 2)

    def loss_splat(im):
        return jnp.sum(
            splat.warp_frozen_flow(im, flow, "border", None, True, True) ** 2
        )

    assert np.allclose(loss_exact(img), loss_splat(img), rtol=1e-6)
    ge = jax.grad(loss_exact)(img)
    gs = jax.grad(loss_splat)(img)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ge), atol=5e-2,
                               rtol=2e-2)


def test_warp_frozen_flow_grad_xla_fallback_on_wild_flow():
    """Random huge flows violate the span contract -> cond picks the exact
    scatter; gradient must still match jax.grad of the exact warp.
    (W=512 > the 256-wide window, so the whole-plane always-exact case does
    not apply and the spans check must trip.)"""
    B, H, W, C = 1, 16, 512, 3
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    flow = jnp.asarray(
        (RNG.random((B, H, W, 2)) * 600 - 300).astype(np.float32)
    )
    grid = splat._flow_to_grid(flow, H, W)
    ly, lx, *_ = splat._border_factors((H, W), grid)
    assert not bool(splat.splat_spans_ok(ly, lx, 16, 512, (16, 256)))

    def loss_exact(im):
        return jnp.sum(sampling.warp(im, flow) ** 3)

    def loss_splat(im):
        return jnp.sum(
            splat.warp_frozen_flow(im, flow, "border", None, True, True) ** 3
        )

    ge = jax.grad(loss_exact)(img)
    gs = jax.grad(loss_splat)(img)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ge), atol=1e-4,
                               rtol=1e-4)


def test_zeros_mode_adjoint():
    """grid_sample_adjoint_image with zeros padding == jax.grad of the
    zeros-mode grid_sample."""
    B, H, W, C = 1, 16, 130, 3
    Ho, Wo = 16, 130
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    # grid partially out of range so zeros-mode masking matters
    grid = jnp.asarray(
        (_smooth_grid(B, Ho, Wo, 30.0, 10.0) * 1.3).astype(np.float32)
    )

    def loss(im):
        return jnp.sum(
            sampling.grid_sample(im, grid, padding_mode="zeros") ** 2
        )

    ge = jax.grad(loss)(img)
    pred = sampling.grid_sample(img, grid, padding_mode="zeros")
    ct = 2.0 * pred
    f = splat._zeros_factors((H, W), grid)
    adj = splat._xla_splat(ct, *f, (H, W))
    np.testing.assert_allclose(np.asarray(adj), np.asarray(ge), atol=1e-4)
    adj_k = splat.grid_sample_adjoint_image(
        ct, (H, W), grid, padding_mode="zeros", window=(16, 256),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(adj_k), np.asarray(ge), atol=2e-2,
                               rtol=1e-2)
