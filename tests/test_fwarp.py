"""Resident-plane feature-warp gather: exactness vs the XLA table gather.

The resident kernel has NO window/span contract — it must be exact for any
coordinates, including adversarial ones (motion boundaries, random flows).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops import sampling
from mono_vifi_tpu.ops.pallas import fwarp

RNG = np.random.default_rng(21)


def _grid(N, H, W, kind):
    if kind == "smooth":
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        g = []
        for n in range(N):
            ph = RNG.uniform(0, 2 * np.pi, 2)
            dx = 9.0 * np.sin(2 * np.pi * ys / H + ph[0])
            dy = 3.0 * np.cos(2 * np.pi * xs / W + ph[1])
            gx = (xs + dx) / (W - 1) * 2 - 1
            gy = (ys + dy) / (H - 1) * 2 - 1
            g.append(np.stack([gx, gy], -1))
        return np.stack(g).astype(np.float32)
    return RNG.uniform(-1.3, 1.3, (N, H, W, 2)).astype(np.float32)


def _check(U, N, H, W, C, kind):
    table = jnp.asarray(
        RNG.standard_normal((U, H, W, C)).astype(np.float32), jnp.bfloat16
    )
    ids = tuple(int(i) for i in (np.arange(N) % U))
    grid = jnp.asarray(_grid(N, H, W, kind))
    ref = sampling.grid_sample_table(table, ids, grid)
    out = fwarp.grid_sample_table_resident(
        table, ids, grid[..., 0], grid[..., 1], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_resident_matches_table_gather_smooth():
    # fusion L1-like shape, W % 128 != 0 (exercises the width padding)
    _check(U=3, N=6, H=48, W=160, C=8, kind="smooth")


def test_resident_exact_on_adversarial_coords():
    # no span contract: fully random far-out-of-range coords must be exact
    _check(U=2, N=4, H=24, W=80, C=8, kind="adversarial")


def test_resident_ids_none_and_wo128():
    table = jnp.asarray(
        RNG.standard_normal((2, 16, 128, 4)).astype(np.float32), jnp.bfloat16
    )
    grid = jnp.asarray(_grid(2, 16, 128, "smooth"))
    ref = sampling.grid_sample_table(table, (0, 1), grid)
    out = fwarp.grid_sample_table_resident(
        table, None, grid[..., 0], grid[..., 1], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_resident_grid_gradients_match():
    """Flow/grid gradient flows through the bilinear weights (taps are
    piecewise-constant): must match the XLA sampler's grid gradient."""
    U = N = 2
    H, W, C = 16, 128, 4
    table = jnp.asarray(
        RNG.standard_normal((U, H, W, C)).astype(np.float32), jnp.bfloat16
    )
    grid = jnp.asarray(_grid(N, H, W, "smooth"))

    def loss_ref(g):
        return jnp.sum(
            sampling.grid_sample_table(table, (0, 1), g).astype(jnp.float32)
            ** 2
        )

    def loss_res(g):
        return jnp.sum(
            fwarp.grid_sample_table_resident(
                table, (0, 1), g[..., 0], g[..., 1], interpret=True
            ).astype(jnp.float32)
            ** 2
        )

    ge = np.asarray(jax.grad(loss_ref)(grid))
    gf = np.asarray(jax.grad(loss_res)(grid))
    # the XLA reference lerps in bf16 (g.dtype) while the resident path
    # combines unpacked taps in f32 — gradients agree to bf16 arithmetic
    # noise relative to the gradient scale (~2*out*(t01-t00)*(W-1)/2)
    scale = np.abs(ge).max()
    np.testing.assert_allclose(gf / scale, ge / scale, atol=0.02)
