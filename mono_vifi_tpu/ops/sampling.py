"""Bilinear grid sampling (the hot custom op of the whole framework).

Semantics match `torch.nn.functional.grid_sample` (reference usage:
train.py:966-969 view synthesis with border padding + align_corners=True;
networks/IFRNet.py:7-15 flow warp) for the configurations the reference uses:
mode='bilinear', padding_mode in {'border', 'zeros'}, align_corners=True/False.

Implementation notes (TPU):
  - The sample positions are data-dependent (depth / flow driven) so this is a
    true gather. We flatten spatial dims and issue 4 neighbor gathers with the
    channel axis minor-most, which XLA lowers to contiguous-C gathers.
  - For border mode the *float* coordinate is clamped before computing weights
    (exactly torch's grid_sampler_compute_source_index order), for zeros mode
    out-of-range taps get zero weight via masks.
  - Gradients flow to both the image (scatter-add adjoint of gather) and the
    grid, same as torch.
Pallas kernels with the same contract live in ops/pallas/warp.py (windowed
forward taps) and ops/pallas/splat.py (MXU splat adjoint) and are used on TPU
when they win; this XLA version is the always-correct oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


@functools.partial(
    jax.jit,
    static_argnames=(
        "padding_mode", "align_corners", "gather_dtype", "patch_gather"
    ),
)
def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
    align_corners: bool = True,
    gather_dtype=None,
    patch_gather: bool = False,
) -> jax.Array:
    """Bilinear sample `img` at `grid` positions.

    Args:
      img: (B, H, W, C) source image (NHWC).
      grid: (B, Ho, Wo, 2) normalized coords in [-1, 1], (x, y) order.
      padding_mode: 'border' or 'zeros'.
      align_corners: torch semantics.
      gather_dtype: optional reduced dtype (e.g. jnp.bfloat16) for the
        gathered taps — gather rows are rate/byte-bound on TPU, so bf16
        taps are ~1.5x faster at ~1e-3 precision cost. None = exact.
      patch_gather: border mode, Ho==H/Wo==W even sizes: serve each aligned
        2x2 output patch with ONE guarded 3x3-footprint gather row (4x fewer
        rows on the rate-bound TPU gather when the grid is locally smooth;
        exact always — a runtime span guard falls back to per-pixel rows).

    Returns:
      (B, Ho, Wo, C) sampled output.
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    compute_dtype = jnp.promote_types(img.dtype, grid.dtype)

    x = _unnormalize(grid[..., 0].astype(compute_dtype), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(compute_dtype), H, align_corners)

    if (
        patch_gather
        and padding_mode == "border"
        and (Ho, Wo) == (H, W)
        and H % 2 == 0
        and W % 2 == 0
        and H >= 2
        and W >= 2
    ):
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        x0 = jnp.clip(jnp.floor(x), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y), 0, H - 2)
        src = img if gather_dtype is None else img.astype(gather_dtype)
        out = _patch_or_pixel_gather(
            src, y0.astype(jnp.int32), x0.astype(jnp.int32),
            x - x0, y - y0, ids=tuple(range(B)), H=H, W=W,
        )
        return out.astype(img.dtype)

    if padding_mode == "border" and H >= 2 and W >= 2:
        # TPU fast path: pack each pixel's (2, 2, C) bilinear footprint into
        # one gather row. XLA's TPU gather is issue-rate-bound (~60-75M rows/s
        # regardless of row width), so fetching all four taps per row is ~4x
        # faster than four separate gathers. Base indices are clamped to
        # [0, size-2]; with the float coordinate clamped to [0, size-1] the
        # resulting weights reproduce border padding exactly.
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        x0 = jnp.clip(jnp.floor(x), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y), 0, H - 2)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]

        # gather in the source's (or requested reduced) dtype — rows are
        # rate/byte-bound, so never upcast before the gather; upcast after.
        # The 4-tap footprint block is built from ONE edge-padded tensor via
        # overlapping slices (a single fused concat) instead of a chain of
        # shifted-concat intermediates (each of which materialized).
        src = img if gather_dtype is None else img.astype(gather_dtype)
        srcp = jnp.pad(src, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        block = jnp.concatenate(
            [
                srcp[:, :H, :W],
                srcp[:, :H, 1:],
                srcp[:, 1:, :W],
                srcp[:, 1:, 1:],
            ],
            axis=-1,
        )  # [v00 v01 v10 v11]

        flat = block.reshape(B, H * W, 4 * C)
        idx = (y0.astype(jnp.int32) * W + x0.astype(jnp.int32)).reshape(B, Ho * Wo, 1)
        # indices are clamped above — promising in-bounds drops the gather's
        # fill-select and bounds-compare fusions (measured ~5 ms/step)
        g = jnp.take_along_axis(
            flat, idx, axis=1, mode="promise_in_bounds"
        ).reshape(B, Ho, Wo, 4 * C)
        # combine in the gathered dtype: upcasting g would materialize a
        # full-size f32 copy of the 4-tap block (GBs for feature warps), and
        # matching dtypes keeps the backward scatter-add well-typed. Taps
        # are LANE SLICES of the packed 4C row, not a (..., 4, C) reshape —
        # the reshape materializes a lane-repadded copy (measured ~10 ms/
        # step on the C=64 feature warps); slices fuse into the lerp.
        wxg = wx.astype(g.dtype)
        wyg = wy.astype(g.dtype)
        one = jnp.ones((), g.dtype)
        top = (one - wxg) * g[..., :C] + wxg * g[..., C : 2 * C]
        bot = (one - wxg) * g[..., 2 * C : 3 * C] + wxg * g[..., 3 * C :]
        out = (one - wyg) * top + wyg * bot
        return out.astype(img.dtype)

    # zeros padding (and degenerate sizes): blocked gather with per-tap
    # in-bounds masks. The block base is clamped to [0, size-2]; each tap
    # selects its entry inside the fetched (2, 2) block by its offset from
    # the base (out-of-range taps get zero weight, so their selected value
    # is irrelevant).
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    mx0 = (x0 >= 0) & (x0 <= W - 1)
    mx1 = (x1 >= 0) & (x1 <= W - 1)
    my0 = (y0 >= 0) & (y0 <= H - 1)
    my1 = (y1 >= 0) & (y1 <= H - 1)

    x0b = jnp.clip(x0, 0, max(W - 2, 0))
    y0b = jnp.clip(y0, 0, max(H - 2, 0))

    if H >= 2 and W >= 2:
        imgp = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        block = jnp.concatenate(
            [
                imgp[:, :H, :W],
                imgp[:, :H, 1:],
                imgp[:, 1:, :W],
                imgp[:, 1:, 1:],
            ],
            axis=-1,
        )
    else:  # degenerate sizes: fall back to shifted-concat construction
        sx = (
            jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
            if W >= 2 else img
        )
        if H >= 2:
            sy = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
            sxy = jnp.concatenate([sx[:, 1:], sx[:, -1:]], axis=1)
        else:
            sy, sxy = img, sx
        block = jnp.concatenate([img, sx, sy, sxy], axis=-1)

    flat = block.reshape(B, H * W, 4 * C).astype(compute_dtype)
    idx = (y0b * W + x0b).reshape(B, Ho * Wo, 1)
    g = jnp.take_along_axis(
        flat, idx, axis=1, mode="promise_in_bounds"
    ).reshape(B, Ho, Wo, 4 * C)

    def pick(ty, tx):
        # lane-sliced taps (see border path: a (..., 4, C) reshape would
        # materialize a lane-repadded copy)
        ry = jnp.clip(ty - y0b, 0, 1)[..., None]
        rx = jnp.clip(tx - x0b, 0, 1)[..., None]
        top = jnp.where(rx == 1, g[..., C : 2 * C], g[..., :C])
        bot = jnp.where(rx == 1, g[..., 3 * C :], g[..., 2 * C : 3 * C])
        return jnp.where(ry == 1, bot, top)

    w00 = jnp.where((my0 & mx0)[..., None], (1.0 - wy) * (1.0 - wx), 0.0)
    w01 = jnp.where((my0 & mx1)[..., None], (1.0 - wy) * wx, 0.0)
    w10 = jnp.where((my1 & mx0)[..., None], wy * (1.0 - wx), 0.0)
    w11 = jnp.where((my1 & mx1)[..., None], wy * wx, 0.0)

    out = (
        w00 * pick(y0, x0)
        + w01 * pick(y0, x1)
        + w10 * pick(y1, x0)
        + w11 * pick(y1, x1)
    )
    return out.astype(img.dtype)


def grid_sample_table(
    table: jax.Array,
    ids: tuple[int, ...],
    grid: jax.Array,
    gather_dtype=None,
    patch_gather: bool = False,
) -> jax.Array:
    """Border-mode bilinear sampling where N grids draw from U unique source
    images (N >= U): `out[k] = grid_sample(table[ids[k]], grid[k])`.

    The 4-tap footprint block is built ONCE over the U unique images and all
    N warps gather from it with id-offset row indices — on TPU the gather is
    issue-rate-bound per ROW, so rows scale with N (unavoidable) but the
    block-build write traffic scales with U (vs N for materializing
    `table[ids]` first). Used by the fusion feature warps, where 3 unique
    feature pyramids serve 6 warp uses (reference fusion_module.py:80-90 /
    train.py:762-789 call pattern).

    Args:
      table: (U, H, W, C) unique source images.
      ids: static length-N tuple of ints in [0, U).
      grid: (N, H, W, 2) normalized coords, (x, y), align_corners=True.
      patch_gather: enable the guarded 2x2-patch fast path — ONE
        3x3-footprint gather row serves each aligned 2x2 output patch
        (4x fewer rows; the TPU gather is issue-rate-bound per row).
        Exact iff within every patch the tap bases span <= 1 in y and x
        (locally smooth flow); a runtime guard falls back to the per-pixel
        path otherwise, so values are ALWAYS exact.
    """
    U, H, W, C = table.shape
    N, Ho, Wo, _ = grid.shape
    assert len(ids) == N and Ho == H and Wo == W, (table.shape, grid.shape)
    compute_dtype = jnp.promote_types(table.dtype, grid.dtype)

    x = _unnormalize(grid[..., 0].astype(compute_dtype), W, True)
    y = _unnormalize(grid[..., 1].astype(compute_dtype), H, True)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    wx = x - x0
    wy = y - y0

    src = table if gather_dtype is None else table.astype(gather_dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    if patch_gather and H % 2 == 0 and W % 2 == 0:
        out = _patch_or_pixel_gather(src, y0i, x0i, wx, wy, ids=ids, H=H, W=W)
    else:
        out = _table_gather_pixel(src, y0i, x0i, wx, wy, ids=ids, H=H, W=W)
    return out.astype(table.dtype)


def _patch_or_pixel_gather(src, y0i, x0i, wx, wy, *, ids, H, W):
    """Span-guarded dispatch: 2x2-patch 3x3-footprint gather when every
    patch's tap bases span <= 1 in each axis, per-pixel 4-tap rows
    otherwise. Both branches produce identical values."""
    N = y0i.shape[0]
    yv = y0i.reshape(N, H // 2, 2, W // 2, 2)
    xv = x0i.reshape(N, H // 2, 2, W // 2, 2)
    span_y = jnp.max(jnp.max(jnp.max(yv, 4), 2) - jnp.min(jnp.min(yv, 4), 2))
    span_x = jnp.max(jnp.max(jnp.max(xv, 4), 2) - jnp.min(jnp.min(xv, 4), 2))
    ok = (span_y <= 1) & (span_x <= 1)
    return jax.lax.cond(
        ok,
        functools.partial(_table_gather_patch, ids=ids, H=H, W=W),
        functools.partial(_table_gather_pixel, ids=ids, H=H, W=W),
        src, y0i, x0i, wx, wy,
    )


def _table_gather_pixel(src, y0i, x0i, wx, wy, *, ids, H, W):
    """Per-pixel 4-tap packed-footprint gather (one 4C row per pixel)."""
    U, C = src.shape[0], src.shape[-1]
    N, Ho, Wo = y0i.shape
    srcp = jnp.pad(src, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    block = jnp.concatenate(
        [srcp[:, :H, :W], srcp[:, :H, 1:], srcp[:, 1:, :W], srcp[:, 1:, 1:]],
        axis=-1,
    )
    flat = block.reshape(U * H * W, 4 * C)
    base = jnp.asarray([i * H * W for i in ids], jnp.int32).reshape(N, 1)
    idx = (base + (y0i * W + x0i).reshape(N, -1)).reshape(-1)
    g = flat.at[idx].get(mode="promise_in_bounds").reshape(N, Ho, Wo, 4 * C)
    # lane-sliced taps (see grid_sample: a (..., 4, C) reshape materializes
    # a lane-repadded copy; slices fuse into the lerp)
    wxg = wx[..., None].astype(g.dtype)
    wyg = wy[..., None].astype(g.dtype)
    one = jnp.ones((), g.dtype)
    top = (one - wxg) * g[..., :C] + wxg * g[..., C : 2 * C]
    bot = (one - wxg) * g[..., 2 * C : 3 * C] + wxg * g[..., 3 * C :]
    return (one - wyg) * top + wyg * bot


def _table_gather_patch(src, y0i, x0i, wx, wy, *, ids, H, W):
    """2x2-patch 3x3-footprint gather: one 9C row per aligned output patch.

    Each patch gathers the 3x3 source block at its min tap base; every
    pixel's 4 bilinear taps are then lane-slice SELECTS from the 9 fetched
    positions (its base offset within the patch block is 0 or 1 in each
    axis — the caller's span guard ensures this). Taps and lerp order are
    identical to the per-pixel path, so in-guard results are bit-equal.
    Gather rows drop 4x; the TPU gather retires ~60-75M rows/s regardless
    of row width, so this is ~4x on the dominant cost of C>=64 feature
    warps (PERF.md)."""
    U, C = src.shape[0], src.shape[-1]
    N = y0i.shape[0]
    H2, W2 = H // 2, W // 2
    srcp = jnp.pad(src, ((0, 0), (0, 2), (0, 2), (0, 0)), mode="edge")
    block = jnp.concatenate(
        [srcp[:, r : r + H, c : c + W] for r in range(3) for c in range(3)],
        axis=-1,
    )  # (U, H, W, 9C): position (r, c) of the footprint at lane slot 3r+c
    flat = block.reshape(U * H * W, 9 * C)

    yv = y0i.reshape(N, H2, 2, W2, 2)
    xv = x0i.reshape(N, H2, 2, W2, 2)
    by = jnp.min(jnp.min(yv, 4), 2)  # (N, H2, W2) patch tap base
    bx = jnp.min(jnp.min(xv, 4), 2)
    base = jnp.asarray([i * H * W for i in ids], jnp.int32).reshape(N, 1, 1)
    idx = (base + by * W + bx).reshape(-1)
    g = flat.at[idx].get(mode="promise_in_bounds").reshape(N, H2, W2, 9 * C)

    dy = yv - by[:, :, None, :, None]  # in {0, 1} under the span guard
    dx = xv - bx[:, :, None, :, None]
    wxv = wx.reshape(N, H2, 2, W2, 2)
    wyv = wy.reshape(N, H2, 2, W2, 2)
    one = jnp.ones((), g.dtype)

    def s(r, c):
        k = 3 * r + c
        return g[..., k * C : (k + 1) * C]

    rows_i = []
    for pi in range(2):
        row_j = []
        for pj in range(2):
            d_y = (dy[:, :, pi, :, pj] == 1)[..., None]
            d_x = (dx[:, :, pi, :, pj] == 1)[..., None]
            wxp = wxv[:, :, pi, :, pj][..., None].astype(g.dtype)
            wyp = wyv[:, :, pi, :, pj][..., None].astype(g.dtype)

            def tap(k, l):
                # tap at footprint (dy+k, dx+l); dy/dx in {0, 1}
                t0 = jnp.where(d_x, s(k, l + 1), s(k, l))
                t1 = jnp.where(d_x, s(k + 1, l + 1), s(k + 1, l))
                return jnp.where(d_y, t1, t0)

            top = (one - wxp) * tap(0, 0) + wxp * tap(0, 1)
            bot = (one - wxp) * tap(1, 0) + wxp * tap(1, 1)
            row_j.append((one - wyp) * top + wyp * bot)
        rows_i.append(jnp.stack(row_j, axis=3))  # (N, H2, W2, 2, C)
    out = jnp.stack(rows_i, axis=2)  # (N, H2, 2, W2, 2, C)
    return out.reshape(N, H, W, C)


def warp(img: jax.Array, flow: jax.Array, gather_dtype=None,
         patch_gather: bool = False) -> jax.Array:
    """Backward-warp `img` by a pixel-displacement `flow`.

    Matches reference networks/IFRNet.py:7-15: a base identity grid in [-1,1]
    plus flow normalized by (size-1)/2, sampled bilinear/border/
    align_corners=True.

    Args:
      img: (B, H, W, C).
      flow: (B, H, W, 2), pixel displacements, channel order (dx, dy).
      patch_gather: see grid_sample (guarded-exact 4x gather-row saving
        for locally smooth flows).
    """
    B, H, W, _ = flow.shape
    dtype = flow.dtype
    gx = jax.lax.broadcasted_iota(dtype, (H, W), 1) / ((W - 1.0) / 2.0) - 1.0
    gy = jax.lax.broadcasted_iota(dtype, (H, W), 0) / ((H - 1.0) / 2.0) - 1.0
    nx = gx[None] + flow[..., 0] / ((W - 1.0) / 2.0)
    ny = gy[None] + flow[..., 1] / ((H - 1.0) / 2.0)
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(
        img, grid, padding_mode="border", align_corners=True,
        gather_dtype=gather_dtype, patch_gather=patch_gather,
    )
