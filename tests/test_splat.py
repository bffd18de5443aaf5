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
    """In-budget taps (smooth flow + uniform shift, ragged dims exercising
    tile padding): windows path == exact XLA scatter up to bf16 weights."""
    B, C = 2, 5
    Ho, Wo = 24, 130
    H, W = Ho, Wo
    flow = _smooth_flow(B, H, W, mx=20.0, my=3.0) + jnp.asarray([40.0, 5.0])
    grid = splat._flow_to_grid(flow, H, W)
    ly, lx, a0, a1, c0, c1 = splat._border_factors((H, W), grid)
    ct = jnp.asarray(RNG.standard_normal((B, Ho, Wo, C)).astype(np.float32))
    assert bool(splat.splat_spans_ok(ly, lx, (H, W)))
    ref = splat._xla_splat(ct, ly, lx, a0, a1, c0, c1, (H, W))
    out = splat.bilinear_splat(
        ct, ly, lx, a0, a1, c0, c1, (H, W), interpret=True
    )
    # tap weights are bf16-rounded (rowsel/colsel separately): abs error up
    # to ~|ct| * 2^-7 per contribution — 0.4% gradient noise, immaterial for
    # training but too large for a tight atol on unit-normal cotangents
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-1,
                               rtol=1e-2)


def test_spans_guard_rejects_scattered_indices():
    B, Ho, Wo = 1, 24, 130
    H, W = 64, 640
    ly = jnp.asarray(RNG.integers(0, H - 1, (B, Ho, Wo)).astype(np.int32))
    lx = jnp.asarray(RNG.integers(0, W - 1, (B, Ho, Wo)).astype(np.int32))
    assert not bool(splat.splat_spans_ok(ly, lx, (H, W)))


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
    """Random huge flows violate the vertical window budget -> cond picks
    the exact scatter; gradient must still match jax.grad of the exact warp.
    (H=64 > the 32-row window, so plane-fits-window mode A does not apply
    and the spans check must trip.)"""
    B, H, W, C = 1, 64, 512, 3
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    flow = jnp.asarray(
        (RNG.random((B, H, W, 2)) * 600 - 300).astype(np.float32)
    )
    grid = splat._flow_to_grid(flow, H, W)
    ly, lx, *_ = splat._border_factors((H, W), grid)
    assert not bool(splat.splat_spans_ok(ly, lx, (H, W)))

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


def test_rotate_grad_via_splat_matches_exact():
    """C=1 splat path (cotangent folded into row weights): gradient of a
    rotation w.r.t. the rotated depth matches the exact zeros-mode warp."""
    from mono_vifi_tpu.ops import image as image_ops
    from mono_vifi_tpu.ops.pallas.splat import grid_sample_frozen_grid

    B, H, W = 2, 32, 256
    depth = jnp.asarray(RNG.random((B, H, W, 1)).astype(np.float32)) + 0.2
    angle = jnp.asarray(np.array([3.0, -4.5], np.float32))
    grid = image_ops._rotation_grid(angle, H, W)

    def loss_exact(d):
        return jnp.sum(
            sampling.grid_sample(d, grid, padding_mode="zeros") ** 2
        )

    def loss_splat(d):
        return jnp.sum(
            grid_sample_frozen_grid(d, grid, "zeros", (48, 0), True, True) ** 2
        )

    assert np.allclose(loss_exact(depth), loss_splat(depth), rtol=1e-6)
    ge = jax.grad(loss_exact)(depth)
    gs = jax.grad(loss_splat)(depth)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ge), atol=5e-2,
                               rtol=2e-2)


def test_bilinear_splat_chunked_matches_single_chunk():
    """The lax.map batch-chunked path (taken only when the window transient
    exceeds the HBM cap) must equal the single-chunk path, including an
    uneven batch split (B=5 -> balanced 3+2 chunks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mono_vifi_tpu.ops.pallas import splat

    B, Ho, Wo, C, H, W = 5, 16, 128, 3, 16, 128
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 7)
    ct = jax.random.normal(ks[0], (B, Ho, Wo, C), jnp.float32)
    ly = jax.random.randint(ks[1], (B, Ho, Wo), 0, H - 1)
    lx = jax.random.randint(ks[2], (B, Ho, Wo), 0, W - 1)
    a0, a1, c0, c1 = (
        jax.random.uniform(ks[3 + i], (B, Ho, Wo), jnp.float32)
        for i in range(4)
    )
    args = (ct, ly, lx, a0, a1, c0, c1, (H, W))
    one = splat.bilinear_splat(*args, window=(32, 0), interpret=True)
    win_bytes = 2 * 16 * 128 * C * 2  # nty * WH * Wp * C * 2 for these shapes
    many = splat.bilinear_splat(
        *args, window=(32, 0), interpret=True,
        max_chunk_bytes=2 * win_bytes,  # forces 3 chunks of 2 (balanced 2+2+1->2)
    )
    np.testing.assert_allclose(np.asarray(one), np.asarray(many), atol=1e-5)
