"""Windowed bilinear warp as a Pallas TPU kernel.

XLA's TPU gather retires ~60-75M rows/s regardless of row width (see
PERF.md), which makes `grid_sample` the dominant cost of the whole training
step. This kernel replaces the HBM gather with VPU-speed intra-window
selection:

  - grid over (batch, channel, row-tile, col-tile); the full (H, W) image
    plane of the current (b, c) sits in VMEM (fetched once per plane since
    the block index is constant across tiles),
  - each (8, 128) output tile dynamically slices a (WH, WW) source window at
    an offset derived from the tile's min source coordinate,
  - a static loop over the window's WH rows resolves the per-element column
    taps with Mosaic `dynamic_gather` (take_along_axis on (8, 128) vregs)
    and accumulates the 4 bilinear taps via row-match selects.

The kernel emits the four taps; the (differentiable) bilinear combination
happens outside in XLA, so gradients w.r.t. the grid flow through the
weights with no custom VJP (taps are piecewise-constant in the grid — their
a.e.-zero gradient is exact).

EXACTNESS CONTRACT: the result equals grid_sample(..., 'border',
align_corners=True) whenever each output tile's source coordinates span at
most (WH-8) rows x (WW-130) cols after 8/128-aligned window placement
(default window (56, 384): ~40 px vertical and ~254 px horizontal budget per
8x128 output tile — far beyond real view-synthesis / optical-flow locality).
Out-of-window coordinates clamp to the window edge. Use for training-time warps of gradient-free operands; the
exact XLA path remains the default and the eval path.

Reference semantics: torch F.grid_sample as used in train.py:966-969 and
networks/IFRNet.py:7-15.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
PACK_BF16_TAPS = True  # u32 pair-packed bf16 tap kernel (see _windowed_taps4)


def _auto_tile_h(Ho: int) -> int:
    """Output-tile height. MEASURED (v5e, 120x(192,640,3) photometric-shape
    warp): 8 rows 39.0 ms, 16 rows 43.0, 32 rows 57.9 — taller tiles LOSE
    because every visited source row runs its gather/selects over the whole
    (tile_h, 128) tile while rows-visited only shrinks ~(span+8)/span, so
    per-element VPU work grows ~linearly with tile height. Per-program
    dispatch (~2 us x 14k programs) is NOT the binding cost. Fixed at 8;
    the plumbing stays for experimentation."""
    return TILE_H


def _warp_taps_kernel(y0_ref, x0_ref, img_ref, out_ref, *, WH, WW, H, W,
                      CG=1, TH=TILE_H):
    y0 = y0_ref[0]  # (TH, 128) int32, clamped to [0, H-2]
    x0 = x0_ref[0]

    # window origin aligned to VMEM tiling (8 sublanes / 128 lanes) so the
    # dynamic slice is provably aligned for Mosaic
    oy = (jnp.clip(jnp.min(y0), 0, max(H - WH, 0)) // 8) * 8
    ox = (jnp.clip(jnp.min(x0), 0, max(W - WW, 0)) // 128) * 128
    oy = pl.multiple_of(oy, 8)
    ox = pl.multiple_of(ox, 128)

    ly = jnp.clip(y0 - oy, 0, WH - 2)
    lx = jnp.clip(x0 - ox, 0, WW - 2)
    lx1 = lx + 1

    n_chunks = WW // 128
    in_chunk = [
        jnp.logical_and(lx >= k * 128, lx < (k + 1) * 128) for k in range(n_chunks)
    ]
    in_chunk1 = [
        jnp.logical_and(lx1 >= k * 128, lx1 < (k + 1) * 128) for k in range(n_chunks)
    ]
    lx_rel = [jnp.clip(lx - k * 128, 0, 127) for k in range(n_chunks)]
    lx1_rel = [jnp.clip(lx1 - k * 128, 0, 127) for k in range(n_chunks)]

    # DYNAMIC row-group loop: this tile's taps live in window rows
    # [min(ly), max(ly)+1], so only the 8-row-aligned groups covering that
    # span are visited (fori_loop with data-dependent bounds; each group is
    # an aligned (8, WW) ref load). Cost scales with the tile's ACTUAL
    # vertical tap span instead of the static window height WH — typical
    # warps touch 1-2 groups where the static scan paid WH rows, and a tall
    # (exactness-friendly) window costs nothing extra. The group granule
    # stays 8 (the VMEM sublane tile) independent of the output tile height
    # TH, so taller tiles change neither the rows visited per span nor the
    # per-element select work — only the fixed per-program overhead.
    g0 = jnp.min(ly) // 8
    g1 = (jnp.max(ly) + 1) // 8 + 1

    # CG channel planes share one program: the per-pixel index resolution
    # above is reused, and grid overhead (the dominant cost for small-C
    # image warps at ~2us/program) drops by CG
    for c in range(CG):
        zero = jnp.zeros((TH, TILE_W), img_ref.dtype)

        def body(g, carry, c=c):
            t00, t01, t10, t11 = carry
            base = pl.multiple_of(oy + g * 8, 8)
            blk = img_ref[0, c, pl.ds(base, 8), pl.ds(ox, WW)]
            for i in range(8):
                row = blk[i : i + 1, :]  # (1, WW), static slice
                left = zero
                right = zero
                for k in range(n_chunks):
                    chunk = jnp.broadcast_to(
                        row[:, k * 128 : (k + 1) * 128], (TH, TILE_W)
                    )
                    gl = jnp.take_along_axis(chunk, lx_rel[k], axis=1)
                    gr = jnp.take_along_axis(chunk, lx1_rel[k], axis=1)
                    left = jnp.where(in_chunk[k], gl, left)
                    right = jnp.where(in_chunk1[k], gr, right)
                r = g * 8 + i
                m0 = ly == r
                m1 = ly == r - 1  # i.e. ly + 1 == r
                t00 = jnp.where(m0, left, t00)
                t01 = jnp.where(m0, right, t01)
                t10 = jnp.where(m1, left, t10)
                t11 = jnp.where(m1, right, t11)
            return t00, t01, t10, t11

        t00, t01, t10, t11 = jax.lax.fori_loop(
            g0, g1, body, (zero, zero, zero, zero)
        )
        od = out_ref.dtype
        out_ref[0, c, 0] = t00.astype(od)
        out_ref[0, c, 1] = t01.astype(od)
        out_ref[0, c, 2] = t10.astype(od)
        out_ref[0, c, 3] = t11.astype(od)


def _warp_taps_kernel_packed(y0_ref, x0_ref, img_ref, out_ref, *,
                             WH, WW, H, W, CG=1, TH=TILE_H):
    """bf16 PAIR-PACKED variant: img_ref holds u32 lanes
    P[y, x] = bits16(img[y, x]) | bits16(img[y, x+1]) << 16, so ONE gather
    fetches both horizontal taps and ONE select resolves each chunk —
    ~45% less dynamic-gather/select work than the unpacked kernel (the
    binding cost of the warp at training shapes). Outputs the 2 packed row
    taps (t0 = row ly pair, t1 = row ly+1 pair) as i32; the caller unpacks
    via bit shifts (bf16 bits << 16 IS the f32 bit pattern), which XLA
    fuses into the bilinear combine."""
    y0 = y0_ref[0]  # (TH, 128) int32, clamped to [0, H-2]
    x0 = x0_ref[0]

    oy = (jnp.clip(jnp.min(y0), 0, max(H - WH, 0)) // 8) * 8
    ox = (jnp.clip(jnp.min(x0), 0, max(W - WW, 0)) // 128) * 128
    oy = pl.multiple_of(oy, 8)
    ox = pl.multiple_of(ox, 128)

    ly = jnp.clip(y0 - oy, 0, WH - 2)
    lx = jnp.clip(x0 - ox, 0, WW - 2)

    n_chunks = WW // 128
    in_chunk = [
        jnp.logical_and(lx >= k * 128, lx < (k + 1) * 128) for k in range(n_chunks)
    ]
    lx_rel = [jnp.clip(lx - k * 128, 0, 127) for k in range(n_chunks)]
    # NOTE: skipping tapless chunks via pl.when + a VMEM scratch accumulator
    # was MEASURED 5.5x SLOWER (148.9 vs 27.3 ms on the 120-image
    # photometric shape): predicated control flow in the inner loop breaks
    # Mosaic's vectorization/pipelining. Keep the straight-line where-chain.

    g0 = jnp.min(ly) // 8
    g1 = (jnp.max(ly) + 1) // 8 + 1

    for c in range(CG):
        zero = jnp.zeros((TH, TILE_W), jnp.int32)

        def body(g, carry, c=c):
            t0, t1 = carry
            base = pl.multiple_of(oy + g * 8, 8)
            blk = img_ref[0, c, pl.ds(base, 8), pl.ds(ox, WW)]
            for i in range(8):
                row = blk[i : i + 1, :]  # (1, WW) i32
                comb = zero
                for k in range(n_chunks):
                    chunk = jnp.broadcast_to(
                        row[:, k * 128 : (k + 1) * 128], (TH, TILE_W)
                    )
                    g_k = jnp.take_along_axis(chunk, lx_rel[k], axis=1)
                    comb = jnp.where(in_chunk[k], g_k, comb)
                r = g * 8 + i
                t0 = jnp.where(ly == r, comb, t0)
                t1 = jnp.where(ly == r - 1, comb, t1)
            return t0, t1

        t0, t1 = jax.lax.fori_loop(g0, g1, body, (zero, zero))
        out_ref[0, c, 0] = t0
        out_ref[0, c, 1] = t1


def _pack_pairs_u32(img: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C, H, W) uint32 with each lane holding the bf16
    bit pairs (img[y, x], img[y, x+1]); column W-1 pairs with itself (never
    gathered: lx <= W-2)."""
    u = jax.lax.bitcast_convert_type(
        img.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    right = jnp.concatenate([u[:, :, 1:], u[:, :, -1:]], axis=2)
    return (u | (right << 16)).transpose(0, 3, 1, 2)


def _unpack_pair(t: jax.Array):
    """i32/u32 packed pair -> (left, right) f32 (bf16 bits << 16 == f32)."""
    t = t.astype(jnp.uint32)
    left = jax.lax.bitcast_convert_type(t << 16, jnp.float32)
    right = jax.lax.bitcast_convert_type(
        t & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return left, right


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "align_corners", "interpret", "tap_dtype", "planar", "tile_h"
    ),
)
def grid_sample_windowed(
    img: jax.Array,
    grid: jax.Array,
    window: tuple[int, int] = (56, 384),
    align_corners: bool = True,
    interpret: bool = False,
    tap_dtype=None,
    planar: bool = False,
    tile_h: int | None = None,
) -> jax.Array:
    """Bilinear border-padded sampling via the windowed Pallas kernel.

    Requires Ho % 8 == 0, Wo % 128 == 0, H >= window[0], W >= window[1].
    `planar=True` returns (B, C, Ho, Wo) — the kernel's native channel-planar
    tap layout — skipping the NHWC transpose for consumers (the photometric
    losses) that operate planar anyway. `tile_h` (None = auto) sets the
    output-tile height; span guards must use the same value.
    See module docstring for the exactness contract.
    """
    return grid_sample_windowed_planar(
        img, grid[..., 0], grid[..., 1], window=window,
        align_corners=align_corners, interpret=interpret,
        tap_dtype=tap_dtype, planar=planar, tile_h=tile_h,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "align_corners", "interpret", "tap_dtype", "planar", "tile_h"
    ),
)
def grid_sample_windowed_planar(
    img: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    window: tuple[int, int] = (56, 384),
    align_corners: bool = True,
    interpret: bool = False,
    tap_dtype=None,
    planar: bool = False,
    tile_h: int | None = None,
) -> jax.Array:
    """grid_sample_windowed with the grid as a PLANAR (gx, gy) pair, each
    (B, Ho, Wo). The (..., 2)-minor stacked grid pays 64x lane-tile padding
    on every copy/concat/split; planar planes tile perfectly — the TPU
    training path passes coordinates planar end-to-end."""
    B, H, W, C = img.shape
    _, Ho, Wo = gx.shape
    WH, WW = window
    tile_h = tile_h or _auto_tile_h(Ho)
    assert Ho % tile_h == 0 and Wo % TILE_W == 0, (Ho, Wo, tile_h)
    # (H - WH) % 8 == 0: the floor-8-aligned origin clamp must be able to
    # reach H - WH exactly, else the bottom (H - WH) % 8 rows are
    # unreachable and the span guard is unsound (see _resolve_windows)
    assert (
        H >= WH >= 8
        and W >= WW
        and WW % 128 == 0
        and WH % 8 == 0
        and (H - WH) % 8 == 0
    ), (H, W, window)

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
    wx = (x - x0f)[..., None]  # differentiable
    wy = (y - y0f)[..., None]

    x0 = jax.lax.stop_gradient(x0f).astype(jnp.int32)
    y0 = jax.lax.stop_gradient(y0f).astype(jnp.int32)

    t00, t01, t10, t11 = _windowed_taps4(
        img, y0, x0, window=window, tap_dtype=tap_dtype, interpret=interpret,
        tile_h=tile_h,
    )

    wxc = wx[..., 0][:, None]  # (B, 1, Ho, Wo)
    wyc = wy[..., 0][:, None]
    top = (1.0 - wxc) * t00 + wxc * t01
    bot = (1.0 - wxc) * t10 + wxc * t11
    out_chw = (1.0 - wyc) * top + wyc * bot
    if planar:
        return out_chw.astype(img.dtype)
    return out_chw.transpose(0, 2, 3, 1).astype(img.dtype)


def _windowed_taps4(img, y0, x0, window, tap_dtype, interpret,
                    tile_h=TILE_H):
    """Run a tap kernel and return the 4 border-clamped bilinear taps
    (t00, t01, t10, t11), each (B, C, Ho, Wo), at integer base (y0, x0)
    (clipped to [0,H-2]/[0,W-2]).

    tap_dtype bf16 takes the PAIR-PACKED kernel: horizontal tap pairs ride
    one u32 gather, the kernel emits packed i32 taps, and the unpack (bit
    shifts) returned here is lazy — XLA fuses it into the caller's bilinear
    combine. Values are identical to bf16 taps from the unpacked kernel
    (rounding happens at pack time instead of store time)."""
    B, H, W, C = img.shape
    _, Ho, Wo = y0.shape
    WH, WW = window
    # group up to 4 channel planes per program: index resolution is shared
    # and grid overhead drops by CG (big for C=3 image warps)
    CG = C if C <= 4 else 1
    n_ty, n_tx = Ho // tile_h, Wo // TILE_W
    packed = (
        PACK_BF16_TAPS
        and tap_dtype is not None
        and jnp.dtype(tap_dtype) == jnp.bfloat16
    )

    coord_spec = pl.BlockSpec(
        (1, tile_h, TILE_W), lambda b, c, i, j: (b, i, j),
        memory_space=pltpu.VMEM,
    )
    img_spec = pl.BlockSpec(
        (1, CG, H, W), lambda b, c, i, j: (b, c, 0, 0),
        memory_space=pltpu.VMEM,
    )

    if packed:
        kernel = functools.partial(
            _warp_taps_kernel_packed, WH=WH, WW=WW, H=H, W=W, CG=CG,
            TH=tile_h,
        )
        taps32 = pl.pallas_call(
            kernel,
            grid=(B, C // CG, n_ty, n_tx),
            in_specs=[coord_spec, coord_spec, img_spec],
            out_specs=pl.BlockSpec(
                (1, CG, 2, tile_h, TILE_W),
                lambda b, c, i, j: (b, c, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, C, 2, Ho, Wo), jnp.int32),
            interpret=interpret,
        )(y0, x0, _pack_pairs_u32(img))
        taps32 = jax.lax.stop_gradient(taps32)
        t00, t01 = _unpack_pair(taps32[:, :, 0])
        t10, t11 = _unpack_pair(taps32[:, :, 1])
        return t00, t01, t10, t11

    kernel = functools.partial(
        _warp_taps_kernel, WH=WH, WW=WW, H=H, W=W, CG=CG, TH=tile_h
    )
    taps = pl.pallas_call(
        kernel,
        grid=(B, C // CG, n_ty, n_tx),
        in_specs=[coord_spec, coord_spec, img_spec],
        out_specs=pl.BlockSpec(
            (1, CG, 4, tile_h, TILE_W),
            lambda b, c, i, j: (b, c, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, 4, Ho, Wo), tap_dtype or img.dtype),
        interpret=interpret,
    )(y0, x0, img.transpose(0, 3, 1, 2))
    taps = jax.lax.stop_gradient(taps)
    return tuple(taps[:, :, k] for k in range(4))


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "align_corners", "interpret", "tap_dtype", "tile_h"
    ),
)
def grid_sample_windowed_zeros(
    img: jax.Array,
    grid: jax.Array,
    window: tuple[int, int] = (56, 384),
    align_corners: bool = True,
    interpret: bool = False,
    tap_dtype=None,
    tile_h: int | None = None,
) -> jax.Array:
    """Zeros-padding bilinear sampling via the windowed tap kernel.

    The kernel fetches border-clamped taps; zeros-mode semantics come from
    the mask-folded separable weights (same construction as
    splat._zeros_factors / sampling.grid_sample's zeros path): out-of-bounds
    taps get weight 0 and clipped tap pairs keep each weight attached to its
    true row/column. Exact under the same window contract as
    grid_sample_windowed. Used for the batched affine rotations
    (reference train.py:898/:915: torchvision rotate = zero fill)."""
    from mono_vifi_tpu.ops.pallas.splat import _zeros_factors

    B, H, W, C = img.shape
    WH, WW = window
    # same reachability contract as grid_sample_windowed: the floor-8-aligned
    # origin clamp must reach H - WH exactly, else the bottom (H - WH) % 8
    # rows are silently unreachable (see _resolve_windows)
    assert (
        H >= WH >= 8
        and W >= WW
        and WW % 128 == 0
        and WH % 8 == 0
        and (H - WH) % 8 == 0
    ), (H, W, window)
    ly, lx, a0, a1, c0, c1 = _zeros_factors(
        (H, W), grid.astype(jnp.float32), align_corners
    )
    t00, t01, t10, t11 = _windowed_taps4(
        img, ly, lx, window=window, tap_dtype=tap_dtype, interpret=interpret,
        tile_h=tile_h or _auto_tile_h(grid.shape[1]),
    )
    a0 = a0[:, None]
    a1 = a1[:, None]
    c0 = c0[:, None]
    c1 = c1[:, None]
    f32 = jnp.float32
    out = (
        a0 * (c0 * t00.astype(f32) + c1 * t01.astype(f32))
        + a1 * (c0 * t10.astype(f32) + c1 * t11.astype(f32))
    )
    return out.transpose(0, 2, 3, 1).astype(img.dtype)


def _resolve_windows(img_shape, window):
    """Normalize the window argument to an ordered list of (WH, WW).

    None -> one FULL-HEIGHT window (H, 384) when H % 8 == 0: the kernel's
    dynamic row-group loop makes its cost span-bound (not WH-bound), so the
    tallest window is free — and when WH == H the window placement is fixed
    at 0 and vertical exactness is unconditional (only the horizontal span
    can still force the exact-XLA fallback).

    EXACTNESS PRECONDITION: the kernel's window origin is clamped to H-WH
    then floor-8-aligned, so when (H - WH) % 8 != 0 the bottom (H-WH) % 8
    source rows are UNREACHABLE regardless of tile span. Since
    H - WH ≡ H (mod 8) for any WH % 8 == 0, such windows only exist when
    H % 8 == 0; any window violating the precondition (or with WH < 8) is
    dropped here so the caller falls back to the exact XLA path."""
    H, W = img_shape[1], img_shape[2]
    if window is None:
        windows = [(H, 384)] if H % 8 == 0 else []
    elif isinstance(window[0], int):
        windows = [window]
    else:
        windows = list(window)
    return [
        w
        for w in windows
        if 8 <= w[0] <= H
        and w[0] % 8 == 0
        and W >= w[1]
        and (H - w[0]) % 8 == 0
    ]


def _window_fits(img_shape, w, span_y, span_x):
    """Scalar predicate: do these tile spans fit window w? (WH >= H means
    the window IS the plane — vertically exact for any taps.)"""
    H = img_shape[1]
    vok = jnp.asarray(True) if w[0] >= H else span_y <= w[0] - 9
    return vok & (span_x <= w[1] - 129)


def grid_sample_windowed_zeros_safe(img, grid, window=None, **kwargs):
    """Windowed zeros-mode sampling with the runtime span-guard cascade
    (smallest window first; exact XLA zeros path as the final fallback).
    window=None -> one full-height window (see _resolve_windows)."""
    from mono_vifi_tpu.ops import sampling

    windows = _resolve_windows(img.shape, window)

    y0, x0 = _source_coords(img.shape, grid)
    tile_h = _auto_tile_h(grid.shape[1])

    def exact(im, g):
        return sampling.grid_sample(im, g, padding_mode="zeros").astype(
            img.dtype
        )

    branches = [
        (lambda im, g, w=w: grid_sample_windowed_zeros(
            im, g, window=w, tile_h=tile_h, **kwargs
        ))
        for w in windows
    ] + [exact]
    if len(branches) == 1:
        return exact(img, grid)
    # one switch, windows ordered small->large (see grid_sample_windowed_safe)
    span_y, span_x = tile_span_max(y0, x0, tile_h)
    idx = sum(
        jnp.where(_window_fits(img.shape, w, span_y, span_x), 0, 1).astype(
            jnp.int32
        )
        for w in windows
    )
    return jax.lax.switch(idx, branches, img, grid)


def warp_windowed(img: jax.Array, flow: jax.Array, **kwargs) -> jax.Array:
    """Flow-displacement warp via the windowed kernel (same grid convention
    as ops.sampling.warp / reference networks/IFRNet.py:7-15)."""
    B, H, W, _ = flow.shape
    dtype = flow.dtype
    gx = jax.lax.broadcasted_iota(dtype, (H, W), 1) / ((W - 1.0) / 2.0) - 1.0
    gy = jax.lax.broadcasted_iota(dtype, (H, W), 0) / ((H - 1.0) / 2.0) - 1.0
    nx = gx[None] + flow[..., 0] / ((W - 1.0) / 2.0)
    ny = gy[None] + flow[..., 1] / ((H - 1.0) / 2.0)
    return grid_sample_windowed_planar(img, nx, ny, **kwargs)


def _source_coords(img_shape, grid, align_corners=True):
    """Integer base coords (y0, x0) exactly as the kernel computes them."""
    return _source_coords_planar(
        img_shape, grid[..., 0], grid[..., 1], align_corners
    )


def _source_coords_planar(img_shape, gx, gy, align_corners=True):
    """_source_coords from the planar (gx, gy) coordinate pair."""
    _, H, W, _ = img_shape
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    x0 = jnp.clip(jnp.floor(jnp.clip(x, 0.0, W - 1)), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(jnp.clip(y, 0.0, H - 1)), 0, H - 2).astype(jnp.int32)
    return jax.lax.stop_gradient(y0), jax.lax.stop_gradient(x0)


def tile_span_max(y0: jax.Array, x0: jax.Array, tile_h: int = TILE_H):
    """Max per-(tile_h,128)-output-tile source-coordinate spans -> two
    scalars. Must use the SAME tile height as the kernel it guards.

    Computed ONCE per call; window predicates are then scalar compares, so a
    guard cascade costs one reduction total."""
    B, Ho, Wo = y0.shape
    ty, tx = Ho // tile_h, Wo // TILE_W
    yr = y0.reshape(B, ty, tile_h, tx, TILE_W)
    xr = x0.reshape(B, ty, tile_h, tx, TILE_W)
    span_y = jnp.max(jnp.max(yr, (2, 4)) - jnp.min(yr, (2, 4)))
    span_x = jnp.max(jnp.max(xr, (2, 4)) - jnp.min(xr, (2, 4)))
    return span_y, span_x


def spans_ok(y0: jax.Array, x0: jax.Array, window=(56, 384)) -> jax.Array:
    """Scalar bool: does every output tile's source-coordinate span fit the
    exactness window? (max-min per 8x128 tile, plus the <=7/<=127 alignment
    slack of the 8/128-aligned window origin.)"""
    WH, WW = window
    span_y, span_x = tile_span_max(y0, x0)
    return jnp.logical_and(span_y <= WH - 9, span_x <= WW - 129)


def grid_sample_windowed_safe(
    img: jax.Array,
    grid: jax.Array,
    window: tuple[int, int] | tuple[tuple[int, int], ...] | None = None,
    align_corners: bool = True,
    tap_dtype=None,
    interpret: bool = False,
    planar: bool = False,
) -> jax.Array:
    """Windowed kernel with a runtime max-source-offset guard cascade.

    `window` may be None (default: ONE full-height window when H % 8 == 0 —
    the kernel's dynamic row-group loop makes cost span-bound, so vertical
    exactness then holds for any taps and only a horizontal tile span >
    WW-129 falls back to the exact XLA gather; H % 8 != 0 images always
    take the exact path, see _resolve_windows), a single (WH, WW), or a
    tuple of windows tried smallest first. All paths match torch
    grid_sample border/align_corners=True semantics, so the guard choice
    never changes values — only speed."""
    return grid_sample_windowed_safe_planar(
        img, grid[..., 0], grid[..., 1], window=window,
        align_corners=align_corners, tap_dtype=tap_dtype,
        interpret=interpret, planar=planar,
    )


def grid_sample_windowed_safe_planar(
    img: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    window: tuple[int, int] | tuple[tuple[int, int], ...] | None = None,
    align_corners: bool = True,
    tap_dtype=None,
    interpret: bool = False,
    planar: bool = False,
) -> jax.Array:
    """grid_sample_windowed_safe taking the coordinates as a PLANAR (gx, gy)
    pair, each (B, Ho, Wo). The stacked (..., 2)-minor grid is only
    materialized inside the (rarely taken) exact-fallback branch — the hot
    windowed branches consume the perfectly-tiled planes directly."""
    from mono_vifi_tpu.ops import sampling

    windows = _resolve_windows(img.shape, window)

    y0, x0 = _source_coords_planar(img.shape, gx, gy, align_corners)
    B, H, W, C = img.shape
    _, Ho, Wo = gx.shape
    tile_h = _auto_tile_h(Ho)

    def exact(im, gxx, gyy):
        g = jnp.stack([gxx, gyy], axis=-1)
        out = sampling.grid_sample(
            im, g, align_corners=align_corners, gather_dtype=tap_dtype
        ).astype(img.dtype)
        return out.transpose(0, 3, 1, 2) if planar else out

    branches = [
        (lambda im, gxx, gyy, w=w: grid_sample_windowed_planar(
            im, gxx, gyy, window=w, align_corners=align_corners,
            tap_dtype=tap_dtype, interpret=interpret, planar=planar,
            tile_h=tile_h,
        ))
        for w in windows
    ] + [exact]
    if len(branches) == 1:
        return exact(img, gx, gy)
    # ONE switch (single operand/result boundary) rather than nested conds:
    # every extra cond level re-copies the big image operands in canonical
    # tiled layouts (42x lane padding for C=3 minor -> HBM OOM)
    # windows must be ordered small->large so fits(w[i]) implies fits(w[j>i])
    # and the count of misses IS the first fitting branch index; one span
    # reduction serves every predicate
    span_y, span_x = tile_span_max(y0, x0, tile_h)
    idx = sum(
        jnp.where(_window_fits(img.shape, w, span_y, span_x), 0, 1).astype(
            jnp.int32
        )
        for w in windows
    )
    return jax.lax.switch(idx, branches, img, gx, gy)


def warp_windowed_safe(img: jax.Array, flow: jax.Array, **kwargs) -> jax.Array:
    """Flow-displacement warp with the runtime exactness guard."""
    B, H, W, _ = flow.shape
    dtype = flow.dtype
    gx = jax.lax.broadcasted_iota(dtype, (H, W), 1) / ((W - 1.0) / 2.0) - 1.0
    gy = jax.lax.broadcasted_iota(dtype, (H, W), 0) / ((H - 1.0) / 2.0) - 1.0
    nx = gx[None] + flow[..., 0] / ((W - 1.0) / 2.0)
    ny = gy[None] + flow[..., 1] / ((H - 1.0) / 2.0)
    return grid_sample_windowed_safe_planar(img, nx, ny, **kwargs)


def windowed_ok(img_shape, grid_shape, window=None) -> bool:
    """Static predicate: can the windowed kernel serve this call?

    Mirrors _resolve_windows: True iff at least one requested window
    survives resolution (which enforces WH % 8 == 0 via the
    (H - WH) % 8 == 0 reachability precondition, WW % 128 == 0, and the
    plane-fits checks) and the output tiling divides evenly."""
    B, H, W, C = img_shape
    _, Ho, Wo, _ = grid_shape
    if Ho % TILE_H != 0 or Wo % TILE_W != 0:
        return False
    windows = _resolve_windows(img_shape, window)
    return any(w[1] % 128 == 0 and w[0] % 8 == 0 for w in windows)
