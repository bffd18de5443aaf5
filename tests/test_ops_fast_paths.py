"""Tests for TPU fast paths: reduced-precision gathers, dynamic smoothness."""

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops import sampling, losses

RNG = np.random.default_rng(9)


def test_grid_sample_gather_dtype_close_to_exact():
    img = jnp.asarray(RNG.random((2, 16, 24, 3)).astype(np.float32))
    grid = jnp.asarray((RNG.random((2, 16, 24, 2)) * 2.2 - 1.1).astype(np.float32))
    exact = sampling.grid_sample(img, grid)
    fast = sampling.grid_sample(img, grid, gather_dtype=jnp.bfloat16)
    assert fast.dtype == exact.dtype
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=6e-3)


def test_warp_gather_dtype():
    img = jnp.asarray(RNG.random((1, 12, 16, 4)).astype(np.float32))
    flow = jnp.asarray((RNG.random((1, 12, 16, 2)) * 4 - 2).astype(np.float32))
    exact = sampling.warp(img, flow)
    fast = sampling.warp(img, flow, gather_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=6e-3)


def test_bf16_operand_gather_preserves_dtype():
    img = jnp.asarray(RNG.random((1, 12, 16, 8)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    grid = jnp.asarray((RNG.random((1, 12, 16, 2)) * 2 - 1).astype(np.float32))
    out = sampling.grid_sample(img, grid)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_smooth_loss_dyn_matches_reference():
    import torch

    disp = RNG.random((2, 8, 10, 1)).astype(np.float32)
    img = RNG.random((2, 8, 10, 3)).astype(np.float32)
    mask = (RNG.random((2, 8, 10, 1)) > 0.7).astype(np.float32)
    ours = float(
        losses.smooth_loss_dyn(jnp.asarray(disp), jnp.asarray(img), jnp.asarray(mask))
    )

    # reference layers.py:244-258
    def t(x):
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    d, i, m = t(disp), t(img), t(mask)
    M = 100 * m + 1 - m
    i = (1 - m) * i
    gdx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gdy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    gix = torch.mean(torch.abs(i[:, :, :, :-1] - i[:, :, :, 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(i[:, :, :-1, :] - i[:, :, 1:, :]), 1, keepdim=True)
    gdx = gdx * torch.exp(-gix)
    gdy = gdy * torch.exp(-giy) * M[:, :, :-1, :]
    ref = float(gdx.mean() + gdy.mean())
    assert abs(ours - ref) < 1e-6
