"""Bilinear splat (the adjoint of grid_sample w.r.t. the image) as an
MXU-matmul Pallas kernel.

Why: XLA's TPU scatter-add retires orders of magnitude fewer rows/s than its
(already rate-limited) gather, making the *backward* of every feature warp
the single most expensive op group of the Mono-ViFI train step (PERF.md:
~445 ms/step for the fusion feature warps' backward scatters alone).

The adjoint is a sum of weighted outer products
    adj[y, x, c] += (a0[p]*[y==ly_p] + a1[p]*[y==ly_p+1])
                  * (c0[p]*[x==lx_p] + c1[p]*[x==lx_p+1]) * ct[p, c]
which this kernel evaluates as dense one-hot matmuls: for each output tile
of 1024 cotangent pixels and each window row r, build the separable one-hot
selection matrix S_r[w, p] on the VPU and contract S_r @ V on the MXU
(bf16 inputs, f32 accumulate). Accumulation into the full adjoint plane uses
an explicit HBM<->VMEM read-modify-write of a per-tile window at a
dynamically computed 8/128-aligned origin (sequential grid steps make the
RMW race-free).

All padding-mode logic (border vs zeros: reference torch F.grid_sample
semantics, used at train.py:966-969 and for the batched affine rotations
replacing train.py:888-922) lives OUTSIDE the kernel in the separable
(a0, a1, c0, c1) weight factors, so one kernel serves every warp.

EXACTNESS: same windowing contract as ops/pallas/warp.py — exact whenever
each 8x128 cotangent tile's (clipped) source indices span <= (WH-9, WW-129)
after aligned window placement; `splat_spans_ok` checks this and callers
fall back to the XLA scatter path (lax.cond) otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
P = TILE_H * TILE_W  # pixels per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _splat_kernel(ly_ref, lx_ref, a0_ref, a1_ref, c0_ref, c1_ref, v_ref,
                  plane_in_ref, plane_out_ref, win, sem_in, sem_out,
                  *, WH, WW, Hpad, Wpad, C):
    b = pl.program_id(0)

    ly = ly_ref[0, 0]  # (1, P) int32 — window-row index of the upper tap
    lx = lx_ref[0, 0]  # (1, P)

    # aligned window origin from the tile's min source index
    oy = (jnp.clip(jnp.min(ly), 0, max(Hpad - WH, 0)) // 8) * 8
    ox = (jnp.clip(jnp.min(lx), 0, max(Wpad - WW, 0)) // 128) * 128
    oy = pl.multiple_of(oy, 8)
    ox = pl.multiple_of(ox, 128)
    lyl = jnp.clip(ly - oy, 0, WH - 2)
    lxl = jnp.clip(lx - ox, 0, WW - 2)

    # fetch the current window (read-modify-write accumulate) — read the
    # OUTPUT buffer: it aliases the zero-initialized input and carries the
    # accumulation across sequential grid steps
    dma_in = pltpu.make_async_copy(
        plane_out_ref.at[b, pl.ds(oy, WH), pl.ds(ox, WW)], win, sem_in
    )
    dma_in.start()

    a0 = a0_ref[0, 0]
    a1 = a1_ref[0, 0]
    c0 = c0_ref[0, 0]
    c1 = c1_ref[0, 0]
    v = v_ref[0, 0].astype(jnp.bfloat16)  # (P, C)

    wcol = jax.lax.broadcasted_iota(jnp.int32, (WW, P), 0)
    b0 = lxl == wcol  # (WW, P): [w == lx]
    b1 = (lxl + 1) == wcol
    zero = jnp.zeros((WW, P), jnp.bfloat16)

    dma_in.wait()

    for r in range(WH):
        arow = a0 * (lyl == r) + a1 * ((lyl + 1) == r)  # (1, P) f32
        s_r = jnp.where(b0, (arow * c0).astype(jnp.bfloat16), zero) + jnp.where(
            b1, (arow * c1).astype(jnp.bfloat16), zero
        )
        acc = jnp.dot(s_r, v, preferred_element_type=jnp.float32)  # (WW, C)
        win[r] = win[r] + acc

    dma_out = pltpu.make_async_copy(
        win, plane_out_ref.at[b, pl.ds(oy, WH), pl.ds(ox, WW)], sem_out
    )
    dma_out.start()
    dma_out.wait()


def _tile_flatten(x: jax.Array, Ho: int, Wo: int, pad_value=0):
    """(B, Ho, Wo, ...) -> (B, T, 1, P, ...) tile-major flattening with
    zero/constant padding of Ho, Wo to the 8/128 tile grid."""
    B = x.shape[0]
    Hp, Wp = _round_up(Ho, TILE_H), _round_up(Wo, TILE_W)
    pads = [(0, 0), (0, Hp - Ho), (0, Wp - Wo)] + [(0, 0)] * (x.ndim - 3)
    x = jnp.pad(x, pads, constant_values=pad_value)
    nty, ntx = Hp // TILE_H, Wp // TILE_W
    trailing = x.shape[3:]
    x = x.reshape((B, nty, TILE_H, ntx, TILE_W) + trailing)
    x = jnp.moveaxis(x, 3, 2)  # (B, nty, ntx, TILE_H, TILE_W, ...)
    return x.reshape((B, nty * ntx, 1, P) + trailing)


def splat_spans_ok(ly, lx, Hpad, Wpad, window) -> jax.Array:
    """Scalar bool: every tile's clipped index span fits the window.

    Budget = window minus the tap pair (2) minus the 8/128 alignment slack
    of the window origin; a window covering the whole padded plane has its
    origin pinned at 0 (no slack) and is exact for any span.
    """
    WH, WW = window
    budget_y = WH - 2 if WH >= Hpad else WH - 9
    budget_x = WW - 2 if WW >= Wpad else WW - 129
    B, Ho, Wo = ly.shape
    lyt = _tile_flatten(jnp.clip(ly, 0, Hpad - 2), Ho, Wo)[..., 0, :]
    lxt = _tile_flatten(jnp.clip(lx, 0, Wpad - 2), Ho, Wo, pad_value=0)[..., 0, :]
    # padding pixels carry index 0 which can inflate the span; callers pass
    # indices already clipped to valid range, and pad zeros only extend the
    # span toward 0 — conservative (may force fallback, never wrong results)
    span_y = jnp.max(lyt, -1) - jnp.min(lyt, -1)
    span_x = jnp.max(lxt, -1) - jnp.min(lxt, -1)
    return jnp.logical_and(
        jnp.all(span_y <= budget_y), jnp.all(span_x <= budget_x)
    )


@functools.partial(
    jax.jit, static_argnames=("out_hw", "window", "interpret")
)
def bilinear_splat(
    ct: jax.Array,
    ly: jax.Array,
    lx: jax.Array,
    a0: jax.Array,
    a1: jax.Array,
    c0: jax.Array,
    c1: jax.Array,
    out_hw: tuple[int, int],
    window: tuple[int, int] = (16, 256),
    interpret: bool = False,
) -> jax.Array:
    """Scatter-add ct into an (out_hw) plane with separable bilinear weights.

    Args:
      ct: (B, Ho, Wo, C) cotangent, C <= 128.
      ly, lx: (B, Ho, Wo) int32 upper-left tap indices, PRE-CLIPPED to
        [0, H-2] / [0, W-2].
      a0, a1: (B, Ho, Wo) row-tap weights (e.g. 1-wy and wy; any masks folded
        in). c0, c1: column-tap weights.
      out_hw: (H, W) of the adjoint plane.
      window: (WH, WW) VMEM window; WH mult of 8, WW mult of 128.

    Returns:
      (B, H, W, C) f32 adjoint.
    """
    B, Ho, Wo, C = ct.shape
    H, W = out_hw
    assert C <= 128, "channel-block >128 unsupported; fall back to XLA scatter"
    Hpad, Wpad = _round_up(max(H, 8), 8), _round_up(max(W, 128), 128)
    WH = min(_round_up(window[0], 8), Hpad)
    WW = min(_round_up(window[1], 128), Wpad)

    lyt = _tile_flatten(jnp.clip(ly, 0, Hpad - 2).astype(jnp.int32), Ho, Wo)
    lxt = _tile_flatten(jnp.clip(lx, 0, Wpad - 2).astype(jnp.int32), Ho, Wo)
    f32 = jnp.float32
    a0t = _tile_flatten(a0.astype(f32), Ho, Wo)
    a1t = _tile_flatten(a1.astype(f32), Ho, Wo)
    c0t = _tile_flatten(c0.astype(f32), Ho, Wo)
    c1t = _tile_flatten(c1.astype(f32), Ho, Wo)
    vt = _tile_flatten(ct.astype(f32), Ho, Wo)  # (B, T, 1, P, C)
    vt = vt.reshape(B, vt.shape[1], P, C)
    T = vt.shape[1]

    zeros = jnp.zeros((B, Hpad, Wpad, C), f32)

    vec_spec = pl.BlockSpec(
        (1, 1, 1, P), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _splat_kernel, WH=WH, WW=WW, Hpad=Hpad, Wpad=Wpad, C=C
    )
    plane = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            vec_spec,  # ly
            vec_spec,  # lx
            vec_spec,  # a0
            vec_spec,  # a1
            vec_spec,  # c0
            vec_spec,  # c1
            pl.BlockSpec(
                (1, 1, P, C), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # plane (aliased in/out)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Hpad, Wpad, C), f32),
        scratch_shapes=[
            pltpu.VMEM((WH, WW, C), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={7: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lyt, lxt, a0t, a1t, c0t, c1t, vt, zeros)
    return plane[:, :H, :W, :]


# ------------------------------------------------------------------ wrappers

def _border_factors(img_hw, grid, align_corners=True):
    """Border-mode tap indices + separable weights (matches
    ops.sampling.grid_sample's border fast path exactly)."""
    H, W = img_hw
    if align_corners:
        x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    else:
        x = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
        y = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    wx = x - x0
    wy = y - y0
    ly = y0.astype(jnp.int32)
    lx = x0.astype(jnp.int32)
    return ly, lx, 1.0 - wy, wy, 1.0 - wx, wx


def _zeros_factors(img_hw, grid, align_corners=True):
    """Zeros-padding tap indices + separable mask-folded weights (matches
    ops.sampling.grid_sample's zeros path)."""
    H, W = img_hw
    if align_corners:
        x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    else:
        x = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
        y = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    my0 = ((y0 >= 0) & (y0 <= H - 1)).astype(wy.dtype)
    my1 = ((y0 + 1 >= 0) & (y0 + 1 <= H - 1)).astype(wy.dtype)
    mx0 = ((x0 >= 0) & (x0 <= W - 1)).astype(wx.dtype)
    mx1 = ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)).astype(wx.dtype)
    ly = jnp.clip(y0, 0, max(H - 2, 0))
    lx = jnp.clip(x0, 0, max(W - 2, 0))
    # clipping moves the tap pair; keep each tap's weight attached to its
    # true row: when y0 was clipped up (y0=-1 -> ly=0), tap0 is out of
    # bounds (my0=0) and tap1 must land on row ly (=y0+1): fold via masks
    a0 = (1.0 - wy) * my0 * (y0 == ly) + wy * my1 * (y0 + 1 == ly)
    a1 = (1.0 - wy) * my0 * (y0 == ly + 1) + wy * my1 * (y0 + 1 == ly + 1)
    c0 = (1.0 - wx) * mx0 * (x0 == lx) + wx * mx1 * (x0 + 1 == lx)
    c1 = (1.0 - wx) * mx0 * (x0 == lx + 1) + wx * mx1 * (x0 + 1 == lx + 1)
    return ly, lx, a0, a1, c0, c1


def grid_sample_adjoint_image(
    ct, img_hw, grid, padding_mode="border", align_corners=True,
    window=(16, 256), interpret=False,
):
    """d(grid_sample)/d(img)^T applied to ct, via the MXU splat kernel with
    a runtime span guard falling back to the exact XLA scatter."""
    if padding_mode == "border":
        ly, lx, a0, a1, c0, c1 = _border_factors(img_hw, grid, align_corners)
    else:
        ly, lx, a0, a1, c0, c1 = _zeros_factors(img_hw, grid, align_corners)
    H, W = img_hw
    Hpad, Wpad = _round_up(max(H, 8), 8), _round_up(max(W, 128), 128)
    WH = min(_round_up(window[0], 8), Hpad)
    WW = min(_round_up(window[1], 128), Wpad)
    ok = splat_spans_ok(ly, lx, Hpad, Wpad, (WH, WW))

    def fast(ct_, ly_, lx_, a0_, a1_, c0_, c1_):
        return bilinear_splat(
            ct_, ly_, lx_, a0_, a1_, c0_, c1_, (H, W), (WH, WW),
            interpret=interpret,
        )

    def exact(ct_, ly_, lx_, a0_, a1_, c0_, c1_):
        return _xla_splat(ct_, ly_, lx_, a0_, a1_, c0_, c1_, (H, W))

    return jax.lax.cond(ok, fast, exact, ct, ly, lx, a0, a1, c0, c1)


def _xla_splat(ct, ly, lx, a0, a1, c0, c1, out_hw):
    """Reference XLA scatter-add adjoint (exact, slow on TPU)."""
    H, W = out_hw
    B, Ho, Wo, C = ct.shape
    ct = ct.astype(jnp.float32)
    flat_ct = ct.reshape(B, Ho * Wo, C)
    out = jnp.zeros((B, H * W, C), jnp.float32)
    for ar, dy in ((a0, 0), (a1, 1)):
        for cc, dx in ((c0, 0), (c1, 1)):
            w = (ar * cc).astype(jnp.float32).reshape(B, Ho * Wo, 1)
            idx = ((ly + dy) * W + (lx + dx)).reshape(B, Ho * Wo, 1)
            out = jax.vmap(
                lambda o, i, v: o.at[i[:, 0]].add(v, mode="drop")
            )(out, idx, flat_ct * w)
    return out.reshape(B, H, W, C)


# --------------------------------------------------- frozen-flow warp wrapper

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def warp_frozen_flow(img, flow, padding_mode="border", gather_dtype=None,
                     use_splat=True, interpret=False):
    """Backward-warp with a gradient-free flow (fusion feature warps,
    reference networks/fusion_module.py:80-90; batched affine warps,
    train.py:888-922). Forward = the exact XLA blocked-gather warp; backward
    w.r.t. img = the MXU splat kernel (span-guarded). flow receives NO
    gradient — it is stop_gradient'ed on entry (every caller's flow is
    frozen-VFI output or batch constants).
    """
    from mono_vifi_tpu.ops.sampling import warp

    return warp(img, jax.lax.stop_gradient(flow), gather_dtype=gather_dtype)


def _wff_fwd(img, flow, padding_mode, gather_dtype, use_splat, interpret):
    out = warp_frozen_flow(
        img, flow, padding_mode, gather_dtype, use_splat, interpret
    )
    return out, (flow,)


def _wff_bwd(padding_mode, gather_dtype, use_splat, interpret, res, ct):
    (flow,) = res
    H, W = flow.shape[1], flow.shape[2]  # img plane == flow plane here
    C = ct.shape[-1]
    grid = _flow_to_grid(jnp.asarray(flow, jnp.float32), H, W)
    if use_splat and C <= 128:
        adj = grid_sample_adjoint_image(
            ct, (H, W), grid, padding_mode=padding_mode, interpret=interpret
        )
    else:
        if padding_mode == "border":
            f = _border_factors((H, W), grid)
        else:
            f = _zeros_factors((H, W), grid)
        adj = _xla_splat(ct, *f, (H, W))
    return adj.astype(ct.dtype), jnp.zeros_like(flow)


def _flow_to_grid(flow, H, W):
    dtype = flow.dtype
    gx = jax.lax.broadcasted_iota(dtype, (H, W), 1) / ((W - 1.0) / 2.0) - 1.0
    gy = jax.lax.broadcasted_iota(dtype, (H, W), 0) / ((H - 1.0) / 2.0) - 1.0
    nx = gx[None] + flow[..., 0] / ((W - 1.0) / 2.0)
    ny = gy[None] + flow[..., 1] / ((H - 1.0) / 2.0)
    return jnp.stack([nx, ny], axis=-1)


warp_frozen_flow.defvjp(_wff_fwd, _wff_bwd)
