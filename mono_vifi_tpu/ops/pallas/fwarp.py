"""Full-plane-resident C-chunked feature-warp forward gather (Pallas TPU).

The fusion/IFRNet feature warps (reference networks/fusion_module.py:80-103,
networks/IFRNet.py:7-15) sample C>=64 feature pyramids at flow-driven
positions. XLA serves them with packed-footprint gathers that are BYTE-bound
(~44 GB/s measured, PERF.md) — ~5% of v5e HBM bandwidth. This kernel keeps
the WHOLE (H, Wp) source plane of a CC-channel chunk resident in VMEM
(feature pyramids are small: 96x384 u32-packed = 147 KB/channel at the
largest level) and resolves taps with in-register selects:

  - source width is zero-padded to a 128 multiple (taps never reach the
    padding: x0 <= W-2), output coordinates edge-padded likewise, so there
    is NO window placement and NO span guard — the gather is
    UNCONDITIONALLY exact for any flow (unlike ops/pallas/warp.py whose
    windows need a runtime cascade),
  - bf16 channel values ride u32 horizontal-pair lanes (one gather fetches
    both column taps, as in warp._warp_taps_kernel_packed),
  - a use->unique table maps N warp uses onto U unique source images via the
    BlockSpec index map (no materialized repeats).

Gradients: taps are piecewise-constant in the coordinates, so the grid/flow
gradient flows exactly through the bilinear weights outside the kernel. The
IMAGE gradient is stop_gradient'ed — callers that need it (the fusion
training path) wrap this as the forward of a custom VJP whose backward is
the MXU splat kernel (ops/pallas/splat.py warp_frozen_flow_table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mono_vifi_tpu.ops.pallas.warp import _pack_pairs_u32, _unpack_pair

TILE_H = 8
TILE_W = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwarp_kernel(ids_ref, y0_ref, x0_ref, img_ref, out_ref, *, H, Wp, CC):
    """Packed-pair tap kernel with the full (H, Wp) plane resident.

    y0/x0: (1, 8, 128) int32 source bases, clamped to [0, H-2] / [0, W-2].
    img_ref: (1, CC, H, Wp) u32 horizontal bf16 pairs.
    out_ref: (1, CC, 2, 8, 128) i32 packed taps (row y0 pair, row y0+1 pair).

    Both the row-group loop AND the column-chunk loop use data-dependent
    fori_loop bounds: cost scales with the tile's actual tap span in each
    axis, not with the plane size.
    """
    ly = y0_ref[0]
    lx = x0_ref[0]

    g0 = jnp.min(ly) // 8
    g1 = (jnp.max(ly) + 1) // 8 + 1  # covers the ly+1 tap row
    k0 = jnp.min(lx) // 128
    k1 = jnp.max(lx) // 128 + 1  # lx pairs ride one u32 lane: no +1 chunk

    for c in range(CC):
        zero = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        def gbody(g, carry, c=c):
            t0, t1 = carry
            base = pl.multiple_of(g * 8, 8)

            def kbody(k, carry2):
                t0k, t1k = carry2
                off = pl.multiple_of(k * 128, 128)
                blk = img_ref[0, c, pl.ds(base, 8), pl.ds(off, 128)]
                lo = k * 128
                in_k = jnp.logical_and(lx >= lo, lx < lo + 128)
                rel = jnp.clip(lx - lo, 0, 127)
                for i in range(8):
                    row = jnp.broadcast_to(blk[i : i + 1, :], (TILE_H, TILE_W))
                    gk = jnp.take_along_axis(row, rel, axis=1)
                    r = g * 8 + i
                    t0k = jnp.where(jnp.logical_and(in_k, ly == r), gk, t0k)
                    t1k = jnp.where(
                        jnp.logical_and(in_k, ly == r - 1), gk, t1k
                    )
                return t0k, t1k

            t0, t1 = jax.lax.fori_loop(k0, k1, kbody, (t0, t1))
            return t0, t1

        t0, t1 = jax.lax.fori_loop(g0, g1, gbody, (zero, zero))
        out_ref[0, c, 0] = t0
        out_ref[0, c, 1] = t1


def resident_ok(table_shape, out_hw, vmem_budget=6 * 2**20) -> bool:
    """Static predicate: can the resident kernel serve this shape?"""
    U, H, W, C = table_shape
    Ho, Wo = out_hw
    if Ho % TILE_H != 0 or H < 2 or W < 2:
        return False
    Wp = _round_up(W, 128)
    cc = _pick_cc(C, H, Wp, vmem_budget)
    return cc >= 1 and H % 8 == 0


def _pick_cc(C: int, H: int, Wp: int, vmem_budget: int) -> int:
    per_ch = H * Wp * 4
    cc = max(1, min(8, vmem_budget // per_ch))
    while C % cc:
        cc -= 1
    return cc if cc * per_ch <= vmem_budget else 0


@functools.partial(
    jax.jit, static_argnames=("ids", "align_corners", "interpret")
)
def grid_sample_table_resident(
    table: jax.Array,
    ids: tuple[int, ...] | None,
    gx: jax.Array,
    gy: jax.Array,
    align_corners: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """out[k] = grid_sample(table[ids[k]], (gx[k], gy[k]), border, bilinear).

    ids=None means table is per-use already (N == U). Coordinates are the
    PLANAR normalized pair, each (N, Ho, Wo). Values match
    sampling.grid_sample_table with bf16 taps (the table is rounded to bf16
    at pack time; production feature tables are already bf16 — exact).
    Unconditionally exact for ANY coordinates (no window/span contract).
    """
    U, H, W, C = table.shape
    N, Ho, Wo = gx.shape
    if ids is None:
        ids = tuple(range(N))
    assert len(ids) == N and U >= 1, (table.shape, len(ids))
    assert Ho % TILE_H == 0 and H % 8 == 0, (Ho, H)

    Wp = _round_up(W, 128)
    Wo_p = _round_up(Wo, 128)
    CC = _pick_cc(C, H, Wp, 6 * 2**20)
    assert CC >= 1, (C, H, Wp)

    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0f = jnp.clip(jnp.floor(x), 0, W - 2)
    y0f = jnp.clip(jnp.floor(y), 0, H - 2)
    wx = x - x0f  # differentiable w.r.t. the coords
    wy = y - y0f
    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)

    if Wo_p != Wo:
        pad = ((0, 0), (0, 0), (0, Wo_p - Wo))
        x0 = jnp.pad(x0, pad, mode="edge")
        y0 = jnp.pad(y0, pad, mode="edge")

    packed = _pack_pairs_u32(table)  # (U, C, H, W) u32
    if Wp != W:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))

    ids_arr = jnp.asarray(ids, jnp.int32)

    # the use->unique id table rides a scalar-prefetch operand: BlockSpec
    # index maps may not capture traced constants, but they receive the
    # prefetched refs as trailing arguments
    coord_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda b, c, i, j, ids_ref: (b, i, j),
        memory_space=pltpu.VMEM,
    )
    img_spec = pl.BlockSpec(
        (1, CC, H, Wp), lambda b, c, i, j, ids_ref: (ids_ref[b], c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_fwarp_kernel, H=H, Wp=Wp, CC=CC)
    taps32 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, C // CC, Ho // TILE_H, Wo_p // TILE_W),
            in_specs=[coord_spec, coord_spec, img_spec],
            out_specs=pl.BlockSpec(
                (1, CC, 2, TILE_H, TILE_W),
                lambda b, c, i, j, ids_ref: (b, c, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N, C, 2, Ho, Wo_p), jnp.int32),
        interpret=interpret,
    )(ids_arr, y0, x0, packed)
    taps32 = jax.lax.stop_gradient(taps32)
    t00, t01 = _unpack_pair(taps32[:, :, 0])
    t10, t11 = _unpack_pair(taps32[:, :, 1])
    if Wo_p != Wo:
        t00, t01, t10, t11 = (t[..., :Wo] for t in (t00, t01, t10, t11))
    wxc = wx[:, None]  # (N, 1, Ho, Wo)
    wyc = wy[:, None]
    top = (1.0 - wxc) * t00 + wxc * t01
    bot = (1.0 - wxc) * t10 + wxc * t11
    out = (1.0 - wyc) * top + wyc * bot
    return out.transpose(0, 2, 3, 1).astype(table.dtype)
