"""Unique-table frozen-flow warp: forward and backward must equal the
repeated-pyramid concat formulation it replaces (reference train.py:762-789
fusion call pattern: 3 unique feature pyramids across 6 warp uses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_vifi_tpu.ops import sampling
from mono_vifi_tpu.ops.pallas import splat


def _mk(U=3, N=6, H=16, W=256, C=8, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    table = jax.random.normal(k1, (U, H, W, C), jnp.float32)
    flow = jax.random.normal(k2, (N, H, W, 2), jnp.float32) * 2.0
    ids = (1, 1, 0, 2, 0, 2)
    return table, ids, flow


def test_grid_sample_table_matches_per_use_warp():
    table, ids, flow = _mk()
    out = splat.warp_frozen_flow_table(table, ids, flow, None, True, True)
    ref = sampling.warp(
        jnp.concatenate([table[i : i + 1] for i in ids], 0), flow
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_frozen_flow_table_grad_matches_concat_formulation():
    """The table backward (per-use splat + static per-unique sum) must equal
    splatting the concat formulation and summing repeats — SAME adjoint
    kernel both sides, so the comparison is tight and isolates the indexing
    logic (the splat kernel's own accuracy envelope is pinned separately in
    test_splat.py at ~5e-2)."""
    table, ids, flow = _mk(C=64)  # C=64: the row-pair MXU packing path

    def via_table(t):
        return jnp.sum(
            splat.warp_frozen_flow_table(t, ids, flow, None, True, True) ** 2
        )

    def via_concat(t):
        rep = jnp.concatenate([t[i : i + 1] for i in ids], 0)
        return jnp.sum(
            splat.warp_frozen_flow(rep, flow, interpret=True) ** 2
        )

    g_new = jax.grad(via_table)(table)
    g_ref = jax.grad(via_concat)(table)
    # paired-use splat accumulates both uses in f32 and rounds the bf16
    # window ONCE where the per-use path sums two rounded planes: equal up
    # to 1 bf16 ulp of the combined magnitude (2^-7 relative)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), atol=1e-2, rtol=1e-2
    )

    def via_exact(t):
        rep = jnp.concatenate([t[i : i + 1] for i in ids], 0)
        return jnp.sum(sampling.warp(rep, flow) ** 2)

    g_exact = jax.grad(via_exact)(table)
    np.testing.assert_allclose(  # splat-kernel accuracy envelope
        np.asarray(g_new), np.asarray(g_exact), atol=5e-2, rtol=2e-2
    )


def test_fusion_module_table_path_matches_plain():
    """FusionModule(warp_table=...) == FusionModule(plain concat pyramids).

    Encoder pyramids start at 1/2 input resolution (ResNet conv1 stride 2),
    matching the module's per-level flow-halving contract."""
    from mono_vifi_tpu.models import fusion

    B, H, W = 2, 16, 32
    chans = (8, 16)
    shapes = [(H // 2, W // 2), (H // 4, W // 4)]
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 8)
    f0 = [jax.random.normal(ks[i], (B, *shapes[i], chans[i]))
          for i in range(2)]
    fn1 = [jax.random.normal(ks[2 + i], (B, *shapes[i], chans[i]))
           for i in range(2)]
    fp1 = [jax.random.normal(ks[4 + i], (B, *shapes[i], chans[i]))
           for i in range(2)]
    flow_prev = jax.random.normal(ks[6], (3 * B, H, W, 2))
    flow_next = jax.random.normal(ks[7], (3 * B, H, W, 2))
    mask = jnp.ones((3 * B, H, W, 1), jnp.float32) * 0.5

    center = [jnp.concatenate([a, b, c], 0) for a, b, c in zip(f0, fn1, fp1)]
    prev = [jnp.concatenate([a, a, b], 0) for a, b in zip(fn1, f0)]
    nxt = [jnp.concatenate([a, b, a], 0) for a, b in zip(fp1, f0)]
    unique = [jnp.concatenate([a, b, c], 0) for a, b, c in zip(f0, fn1, fp1)]
    ids = []
    for p in (1, 1, 0, 2, 0, 2):
        ids += [p * B + j for j in range(B)]

    # fast_grad_warp=True so the table path engages (forward values only;
    # the backward equivalence is pinned by the grad test above)
    mod = fusion.FusionModule(num_ch_enc=chans, fast_grad_warp=True)
    params = mod.init(
        jax.random.PRNGKey(2), [prev, center, nxt], (flow_prev, flow_next), mask
    )
    out_plain = mod.apply(
        params, [prev, center, nxt], (flow_prev, flow_next), mask
    )
    out_table = mod.apply(
        params, [None, center, None], (flow_prev, flow_next), mask,
        warp_table=(unique, tuple(ids)),
    )
    for a, b in zip(out_plain, out_table):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_patch_gather_matches_on_smooth_flow():
    """The 2x2-patch 3x3-footprint gather picks the same taps and lerp order
    as the per-pixel packed gather when flows satisfy the per-patch span
    guard — equal up to XLA fusion-level FMA reassociation (bit-equal on
    TPU; ~1-ulp on CPU)."""
    table, ids, flow = _mk(H=16, W=64, C=16)
    flow = flow * 0.3  # smooth, small: guard passes
    grid = splat._flow_to_grid(flow, 16, 64)
    a = sampling.grid_sample_table(table, ids, grid, patch_gather=True)
    b = sampling.grid_sample_table(table, ids, grid, patch_gather=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                               rtol=1e-6)


def test_patch_gather_guard_falls_back_on_wild_flow():
    """Per-pixel random grids violate every patch's span budget — the guard
    must route to the per-pixel path and values stay exact."""
    table, ids, _ = _mk(H=16, W=64, C=16)
    grid = jax.random.uniform(
        jax.random.PRNGKey(7), (6, 16, 64, 2), minval=-1.0, maxval=1.0
    )
    a = sampling.grid_sample_table(table, ids, grid, patch_gather=True)
    b = sampling.grid_sample_table(table, ids, grid, patch_gather=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                               rtol=1e-6)


def test_patch_gather_grad_matches_plain():
    """warp_frozen_flow_table with patch_gather: same custom-VJP backward,
    bit-equal forward -> grads must match the plain path."""
    table, ids, flow = _mk(H=16, W=64, C=16)
    flow = flow * 0.3

    def loss(t, pg):
        o = splat.warp_frozen_flow_table(t, ids, flow, None, True, True, pg)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = jax.grad(lambda t: loss(t, True))(table)
    g0 = jax.grad(lambda t: loss(t, False))(table)
    # the splat backward quantizes ct to bf16; a 1-ulp f32 forward
    # difference can flip a bf16 rounding boundary -> bf16-ulp tolerance
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=5e-3,
                               rtol=8e-3)
