"""Windowed Pallas warp: parity with the exact grid_sample (interpret mode on
CPU) for smooth flow fields within the window contract."""

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops import sampling
from mono_vifi_tpu.ops.pallas import warp as pwarp

RNG = np.random.default_rng(11)


def _smooth_grid(B, H, W, max_disp_x=40.0, max_disp_y=10.0):
    """A smooth, view-synthesis-like sampling grid (pixel displacements vary
    slowly; per-tile spread well within the window contract)."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    grids = []
    for b in range(B):
        ph = RNG.uniform(0, 2 * np.pi, 4)
        dx = max_disp_x * (
            0.5 * np.sin(2 * np.pi * ys / H + ph[0]) + 0.5 * np.cos(2 * np.pi * xs / W + ph[1])
        )
        dy = max_disp_y * (
            0.5 * np.sin(2 * np.pi * xs / W + ph[2]) + 0.5 * np.cos(2 * np.pi * ys / H + ph[3])
        )
        gx = (xs + dx) / (W - 1) * 2 - 1
        gy = (ys + dy) / (H - 1) * 2 - 1
        grids.append(np.stack([gx, gy], -1))
    return np.stack(grids).astype(np.float32)


def test_windowed_warp_matches_exact():
    # W > WW so the aligned-window-placement path is exercised
    B, H, W, C = 2, 64, 640, 3
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    grid = jnp.asarray(_smooth_grid(B, H, W))
    assert pwarp.windowed_ok(img.shape, grid.shape)

    exact = sampling.grid_sample(img, grid, "border", True)
    fast = pwarp.grid_sample_windowed(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_windowed_warp_grid_gradients_match():
    B, H, W, C = 1, 64, 640, 2
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    grid = jnp.asarray(_smooth_grid(B, H, W, 20.0, 8.0))

    def loss_exact(g):
        return jnp.sum(sampling.grid_sample(img, g, "border", True) ** 2)

    def loss_fast(g):
        return jnp.sum(pwarp.grid_sample_windowed(img, g, interpret=True) ** 2)

    ge = jax.grad(loss_exact)(grid)
    gf = jax.grad(loss_fast)(grid)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ge), atol=1e-3, rtol=1e-3)


def test_safe_fallback_on_adversarial_flows():
    """Large random flows (early-training random-depth regime) exceed the
    window contract; the _safe variant must detect it and return the exact
    result via the fallback path."""
    B, H, W, C = 1, 64, 640, 3
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    # fully random coords all over the image: per-tile span ~ W
    grid = jnp.asarray(
        RNG.uniform(-1, 1, (B, H, W, 2)).astype(np.float32)
    )
    y0, x0 = pwarp._source_coords(img.shape, grid)
    assert not bool(pwarp.spans_ok(y0, x0))

    exact = sampling.grid_sample(img, grid, "border", True)
    safe = pwarp.grid_sample_windowed_safe(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(exact), atol=1e-5)

    # while smooth flows take the windowed path and still match
    grid_s = jnp.asarray(_smooth_grid(B, H, W))
    y0, x0 = pwarp._source_coords(img.shape, grid_s)
    assert bool(pwarp.spans_ok(y0, x0))
    safe_s = pwarp.grid_sample_windowed_safe(img, grid_s, interpret=True)
    exact_s = sampling.grid_sample(img, grid_s, "border", True)
    np.testing.assert_allclose(np.asarray(safe_s), np.asarray(exact_s), atol=1e-5)


def test_windowed_ok_predicate():
    assert not pwarp.windowed_ok((1, 64, 256, 3), (1, 60, 256, 2))  # Ho % 8
    assert not pwarp.windowed_ok((1, 64, 256, 3), (1, 64, 200, 2))  # Wo % 128
    assert not pwarp.windowed_ok((1, 32, 256, 3), (1, 64, 256, 2))  # H < WH
    assert pwarp.windowed_ok((1, 192, 640, 3), (1, 192, 640, 2))
    # (H - WH) % 8 != 0 windows are unsound (origin clamp can't reach the
    # bottom rows) and must be dropped by resolution / rejected statically
    assert not pwarp.windowed_ok((1, 68, 640, 3), (1, 64, 640, 2))  # H%8
    assert not pwarp.windowed_ok(
        (1, 64, 640, 3), (1, 64, 640, 2), window=(52, 384)
    )
    assert pwarp._resolve_windows((1, 68, 640, 3), None) == []
    assert pwarp._resolve_windows((1, 6, 640, 3), None) == []  # H < 8


def test_h_not_multiple_of_8_takes_exact_path():
    """ADVICE r3 medium: H=68 previously passed the span guard yet returned
    errors up to 0.97 (bottom H%8 rows unreachable after the floor-8 origin
    clamp). The safe entry point must now route such shapes to the exact
    gather."""
    B, H, W, C = 1, 68, 640, 2
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    # taps concentrated at the BOTTOM rows — the previously-broken region
    ys, xs = np.meshgrid(np.arange(64), np.arange(W), indexing="ij")
    gx = xs / (W - 1) * 2 - 1
    gy = ((ys + 4) / (H - 1) * 2 - 1).clip(-1, 1)
    grid = jnp.asarray(
        np.stack([gx, gy], -1)[None].astype(np.float32)
    )
    exact = sampling.grid_sample(img, grid, "border", True)
    safe = pwarp.grid_sample_windowed_safe(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(exact), atol=1e-6)


def test_windowed_zeros_matches_exact_rotation():
    """Windowed zeros-mode sampling == exact XLA zeros grid_sample on
    rotation grids (the affine-branch rotate replacement)."""
    from mono_vifi_tpu.ops import image as image_ops
    from mono_vifi_tpu.ops import sampling

    B, H, W, C = 2, 64, 384, 3
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
    angle = jnp.asarray(np.array([4.0, -5.0], np.float32))
    grid = image_ops._rotation_grid(angle, H, W)
    ref = sampling.grid_sample(img, grid, padding_mode="zeros")
    out = pwarp.grid_sample_windowed_zeros(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_planar_entry_points_match_stacked():
    """The planar (gx, gy) entry points must equal the stacked-grid ones on
    both the windowed branch (smooth grid) and the exact fallback
    (adversarial grid) of the safe cascade."""
    B, H, W, C = 1, 64, 640, 3
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    for grid_np in (
        _smooth_grid(B, H, W),
        RNG.uniform(-1, 1, (B, H, W, 2)).astype(np.float32),
    ):
        grid = jnp.asarray(grid_np)
        gx, gy = grid[..., 0], grid[..., 1]
        stacked = pwarp.grid_sample_windowed_safe(img, grid, interpret=True)
        planar = pwarp.grid_sample_windowed_safe_planar(
            img, gx, gy, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(stacked), np.asarray(planar))
    # and the unguarded planar kernel entry
    grid = jnp.asarray(_smooth_grid(B, H, W))
    a = pwarp.grid_sample_windowed(img, grid, interpret=True)
    b = pwarp.grid_sample_windowed_planar(
        img, grid[..., 0], grid[..., 1], interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_bf16_taps_match_unpacked():
    """The u32 pair-packed bf16 kernel must produce values IDENTICAL to the
    unpacked kernel at tap_dtype=bfloat16 (rounding at pack time == rounding
    at tap-store time), in both border and zeros modes."""
    B, H, W, C = 2, 64, 640, 3
    img = jnp.asarray(RNG.random((B, H, W, C)).astype(np.float32))
    grid = jnp.asarray(_smooth_grid(B, H, W))

    packed = pwarp.grid_sample_windowed(
        img, grid, window=(H, 384), tap_dtype=jnp.bfloat16, interpret=True
    )
    # unpacked bf16 reference: run the f32 kernel on a pre-rounded image
    # (same value set: bf16(img) gathered exactly)
    ref = pwarp.grid_sample_windowed(
        img.astype(jnp.bfloat16).astype(jnp.float32), grid,
        window=(H, 384), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(packed, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2,
    )
    # and it stays close to the exact f32 sampler
    exact = sampling.grid_sample(img, grid, "border", True)
    err = np.max(np.abs(np.asarray(packed, np.float32) - np.asarray(exact)))
    assert err < 2e-2, err

    pz = pwarp.grid_sample_windowed_zeros(
        img, grid, window=(H, 384), tap_dtype=jnp.bfloat16, interpret=True
    )
    ez = sampling.grid_sample(img, grid, "zeros", True)
    assert np.max(np.abs(np.asarray(pz) - np.asarray(ez))) < 2e-2
