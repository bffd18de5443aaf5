"""Bilinear splat (the adjoint of grid_sample w.r.t. the image) as an
MXU-matmul Pallas kernel.

Why: XLA's TPU scatter-add retires orders of magnitude fewer rows/s than its
(already rate-limited) gather, making the *backward* of every feature warp
the single most expensive op group of the Mono-ViFI train step (PERF.md:
~445 ms/step for the fusion feature warps' backward scatters alone).

The adjoint is a sum of weighted outer products
    adj[y, x, c] += (a0[p]*[y==ly_p] + a1[p]*[y==ly_p+1])
                  * (c0[p]*[x==lx_p] + c1[p]*[x==lx_p+1]) * ct[p, c]
evaluated as dense one-hot matmuls. The selection matrix is separable, so
each tile of P=1024 cotangent pixels builds a row-independent column
selector colsel[w, p] ONCE plus a (WH, P) row-weight table, and each window
row costs one bf16 broadcast multiply and one MXU contraction
    win[r] = (colsel * rowsel[r]) @ V        (bf16 in, f32 accumulate).

Accumulation design (TPU-critical, learned the hard way on v5e):
  * Explicit HBM read-modify-write windows per tile: ~4 ms/program. Dead.
  * A VMEM-resident full adjoint plane as a revisited output block: ~100 ms
    per block lifecycle + minutes of Mosaic compile. Dead.
  * What works: each BAND_H-row band of output pixels writes a (WH, Wp, C)
    window to its OWN small output block (per-program changing index — the
    only pattern that streams at bandwidth) at the REGULAR origin
    (BAND_H*ty + dy_b - pad_y, 0): the window spans the FULL padded plane width
    (Wp <= ~1024 for every training resolution), so horizontal placement
    is static and border-clamped columns cost nothing; vertically the
    origin is tile-regular except one per-image shift dy_b (the rounded
    mean vertical displacement). The overlap-add of regularly-placed
    windows is pure static XLA (reshape + strided adds), and dy_b is
    undone by one per-image row gather (byte-bound, cheap).

All padding-mode logic (border vs zeros: reference torch F.grid_sample
semantics, used at train.py:966-969 and for the batched affine rotations
replacing train.py:888-922) lives OUTSIDE the kernel in the separable
(a0, a1, c0, c1) weight factors, so one kernel serves every warp.

EXACTNESS: exact (up to bf16 rounding of the tap weights and the bf16
window values) whenever every tap's window-local row lands inside its
band's window: residual vertical displacement after the per-image shift in
[-pad_y, WH-1-BAND_H-pad_y] (pad_y=(WH-BAND_H-2)//2; window heights are
requested on a BAND_H=8 budget basis, see the BAND_H note below, so the
budget is unchanged from the original 8-row design); columns are never a
constraint.
Planes whose padded height fits the window (mode A) are exact for ANY
taps. `_prepare` checks this per call and callers fall back to the XLA
scatter path (lax.cond) otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
PCHUNK = 1024  # pixels per column-chunk inside a row-band program
BAND_H = 8  # output rows per band program (must be a multiple of 8)
# Window heights are specified by callers as a RESIDUAL-BUDGET basis (the
# BAND_H=8 convention this kernel was designed with); _window_for adds
# BAND_H - 8 so the in-window residual-displacement budget is independent of
# the band height. MEASURED (v5e full train step, r4 bisect): BAND_H=16
# LOSES ~0.7 samples/s despite halving the window write/read redundancy and
# program count — the +8 window rows per band add more MXU row visits and
# scratch than the traffic saves. Keep 8; the generalized band machinery
# stays for re-evaluation at other shapes.


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _splat_band_kernel(rr_ref, lyl_ref, lx_ref, a0_ref, a1_ref, c0_ref,
                       c1_ref, v_ref, win_ref, acc_ref, *, WH, Wp, ntx):
    """One program = one BAND_H-row band of output pixels -> its (WH, Wp, C)
    window. The band's pixels are tile-major (see _band_flatten); ntx is the
    number of PCHUNK-pixel chunks per band. Loops over the band's chunks,
    accumulating the full-width window rows in VMEM scratch; columns need no
    windowing because the window spans the whole (padded) plane width.

    rr_ref (scalar prefetch, (B, nty, 2) i32): this band's [min, max] local
    tap row — window rows outside [rmin, rmax+1] hold no taps, and their
    whole row-pair (selects + MXU contraction + accumulate) is skipped.
    Real flows cluster within a few rows of the per-image shift, so the
    typical band touches ~1/3 of its window rows."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    rmin = rr_ref[b, t, 0]
    rmax = rr_ref[b, t, 1]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    wcol = jax.lax.broadcasted_iota(jnp.int32, (Wp, PCHUNK), 0)
    zc = jnp.zeros((Wp, PCHUNK), jnp.float32)
    rrowT = jax.lax.broadcasted_iota(jnp.int32, (PCHUNK, WH), 1)
    zrT = jnp.zeros((PCHUNK, WH), jnp.float32)

    for tx in range(ntx):
        sl = pl.ds(tx * PCHUNK, PCHUNK)
        lyl = lyl_ref[0, 0, :, sl]  # (1, PCHUNK)
        lx = lx_ref[0, 0, :, sl]
        a0 = a0_ref[0, 0, :, sl]
        a1 = a1_ref[0, 0, :, sl]
        c0 = c0_ref[0, 0, :, sl]
        c1 = c1_ref[0, 0, :, sl]
        v = v_ref[0, 0, sl, :]  # (PCHUNK, C) bf16

        # separable one-hot selection (f32 selects share the i1 masks'
        # (8,128) layout; Mosaic cannot relayout i1 vectors to bf16 tiling)
        colsel = (
            jnp.where(lx == wcol, c0, zc) + jnp.where((lx + 1) == wcol, c1, zc)
        ).astype(jnp.bfloat16)
        # row weights TRANSPOSED (PCHUNK, WH): the per-row column slice
        # below is then layout-natural (no per-row relayout)
        lylT = lyl.reshape(PCHUNK, 1)
        a0T = a0.reshape(PCHUNK, 1)
        a1T = a1.reshape(PCHUNK, 1)
        rowselT = (
            jnp.where(lylT == rrowT, a0T, zrT)
            + jnp.where((lylT + 1) == rrowT, a1T, zrT)
        ).astype(v.dtype)

        C = v.shape[-1]
        if C <= 64:
            # row-PAIR packing: with C <= 64 lanes a single row's RHS pads
            # the MXU's 128-wide N dimension to <=50% utilization — packing
            # two window rows' scaled values as one (P, 2C) RHS runs one
            # full-width contraction per pair (same flops, half the matmuls)
            for r in range(0, WH, 2):

                @pl.when(jnp.logical_and(rmax + 1 >= r, rmin <= r + 1))
                def _pair(r=r):
                    v2 = jnp.concatenate(
                        [
                            v * rowselT[:, r : r + 1],
                            v * rowselT[:, r + 1 : r + 2],
                        ],
                        axis=1,
                    )
                    acc = jnp.dot(
                        colsel, v2, preferred_element_type=jnp.float32
                    )
                    acc_ref[r] = acc_ref[r] + acc[:, :C]
                    acc_ref[r + 1] = acc_ref[r + 1] + acc[:, C:]
        else:
            for r in range(WH):

                @pl.when(jnp.logical_and(rmax + 1 >= r, rmin <= r))
                def _row(r=r):
                    # (colsel . rowsel[r]) @ v == colsel @ (rowsel[r] . v):
                    # scaling the (P, C) values side costs Wp/C-fold less
                    # VPU work than scaling the (Wp, P) selector, and the
                    # MXU LHS stays stationary
                    v_r = v * rowselT[:, r : r + 1]
                    acc = jnp.dot(
                        colsel, v_r, preferred_element_type=jnp.float32
                    )
                    acc_ref[r] = acc_ref[r] + acc

    win_ref[0, 0] = acc_ref[...].astype(win_ref.dtype)


def _splat_band_kernel1(lyl_ref, lx_ref, a0_ref, a1_ref, c0_ref, c1_ref,
                        win_ref, acc_ref, *, WH, Wp, ntx):
    """C=1 specialization: the cotangent is FOLDED INTO the row weights
    outside (contribution = a*c*v with scalar v), so each column chunk is a
    single MXU contraction rowsel @ colsel^T with no value tensor at all."""
    wcol = jax.lax.broadcasted_iota(jnp.int32, (Wp, PCHUNK), 0)
    rrow = jax.lax.broadcasted_iota(jnp.int32, (WH, PCHUNK), 0)
    zc = jnp.zeros((Wp, PCHUNK), jnp.float32)
    zr = jnp.zeros((WH, PCHUNK), jnp.float32)

    for tx in range(ntx):
        sl = pl.ds(tx * PCHUNK, PCHUNK)
        lyl = lyl_ref[0, 0, :, sl]
        lx = lx_ref[0, 0, :, sl]
        a0 = a0_ref[0, 0, :, sl]
        a1 = a1_ref[0, 0, :, sl]
        c0 = c0_ref[0, 0, :, sl]
        c1 = c1_ref[0, 0, :, sl]
        colsel = (
            jnp.where(lx == wcol, c0, zc) + jnp.where((lx + 1) == wcol, c1, zc)
        ).astype(jnp.bfloat16)
        rowsel = (
            jnp.where(lyl == rrow, a0, zr) + jnp.where((lyl + 1) == rrow, a1, zr)
        ).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            rowsel, colsel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (WH, Wp)
        if tx == 0:
            acc_ref[...] = acc
        else:
            acc_ref[...] = acc_ref[...] + acc

    win_ref[0, 0] = acc_ref[...].astype(win_ref.dtype)


def _band_flatten(x: jax.Array, Ho: int, Wo: int, mode: str = "constant"):
    """(B, Ho, Wo, ...) -> (B, ntb, 1, BAND_H*Wp, ...) row-band flattening
    with tile-major pixel order p = tx*(BAND_H*128) + row*128 + col (so
    column chunks are contiguous). Pads Ho/Wo to the BAND_H/128 grid (zeros
    for weights/values, edge replication for indices)."""
    B = x.shape[0]
    Hp, Wp = _round_up(Ho, BAND_H), _round_up(Wo, TILE_W)
    pads = [(0, 0), (0, Hp - Ho), (0, Wp - Wo)] + [(0, 0)] * (x.ndim - 3)
    x = jnp.pad(x, pads, mode=mode)
    ntb, ntx = Hp // BAND_H, Wp // TILE_W
    trailing = x.shape[3:]
    x = x.reshape((B, ntb, BAND_H, ntx, TILE_W) + trailing)
    x = jnp.moveaxis(x, 3, 2)  # (B, ntb, ntx, BAND_H, 128, ...)
    return x.reshape((B, ntb, 1, ntx * BAND_H * TILE_W) + trailing)


def _combine_bands(windows, dy, *, H, W, WH, Wp, nty, pad_y, mode_a,
                   out_dtype=jnp.float32):
    """Overlap-add the regularly-placed band windows into the adjoint plane.

    `windows` is (B, ntb, WH, Wp, ...trailing) — the same logic serves the
    channelled and channel-less (C=1) kernels. Mode A: all bands at origin
    0 -> plain sum. Mode B: window-row chunk i of band t lands on canvas
    8-row band S*t + i (S = BAND_H//8 is the band stride in canvas-band
    units), so the overlap-add is a sum of band-padded chunk arrays — one
    fused XLA add-tree per stride residue, NOT a sequential .at[].add chain
    (which copies the whole canvas per chunk; measured ~4x slower) — and
    the per-image vertical shift dy is undone by one row gather
    (byte-bound, cheap). Sums run in f32; `out_dtype` sets the MATERIALIZED
    canvas/plane dtype — the training wrappers pass the cotangent dtype
    (bf16), halving the canvas write + row-gather traffic for a result that
    was about to be cast to ct.dtype anyway."""
    f32 = jnp.float32
    B = windows.shape[0]
    ntb = windows.shape[1]
    trailing = windows.shape[4:]
    if mode_a:
        plane = jnp.sum(windows.astype(f32), axis=1).astype(out_dtype)
        return plane[:, :H, :W]

    K = WH // 8
    S = BAND_H // 8
    chunks = windows.reshape((B, ntb, K, 8, Wp) + trailing)
    # canvas band S*t + i == strided index (t + i//S, residue i % S): group
    # chunks by residue so each group's placement is a plain pad along t
    L = ntb + (K - 1) // S  # strided length (uniform across residues)
    canvasH = 8 * S * L
    per_res = []
    for r in range(S):
        acc = None
        for i in range(r, K, S):
            o = i // S
            pads = [(0, 0), (o, L - ntb - o)] + [(0, 0)] * (chunks.ndim - 3)
            blk = jnp.pad(chunks[:, :, i].astype(f32), pads)
            acc = blk if acc is None else acc + blk
        if acc is None:
            acc = jnp.zeros((B, L, 8, Wp) + trailing, f32)
        per_res.append(acc.astype(out_dtype))
    # interleave residues: canvas band index S*g + r
    canvas = jnp.stack(per_res, axis=2).reshape(
        (B, canvasH, Wp) + trailing
    )

    rows = jnp.arange(H)[None, :] - dy[:, None] + pad_y  # (B, H)
    valid = (rows >= 0) & (rows < canvasH)
    rows_c = jnp.clip(rows, 0, canvasH - 1)
    idx = rows_c.reshape((B, H) + (1,) * (canvas.ndim - 2))
    plane = jnp.take_along_axis(canvas, idx, axis=1)
    vm = valid.reshape((B, H) + (1,) * (canvas.ndim - 2))
    plane = jnp.where(vm, plane, jnp.zeros((), plane.dtype))
    return plane[:, :, :W]


def _mode_a(out_hw, window) -> bool:
    """Full vertical coverage: window spans the whole padded plane height,
    origin 0 for every band -> exact for ANY taps (no budget, no shift)."""
    H, _ = out_hw
    Hpad = _round_up(max(H, BAND_H), BAND_H)
    return Hpad <= _window_for(out_hw, window)[0]


def _window_for(out_hw, window):
    """Resolved (WH, Wp). window[0] is the BAND_H=8-basis budget height;
    BAND_H - 8 is added so the residual-displacement budget is band-height
    independent (see module constants)."""
    H, W = out_hw
    Hpad = _round_up(max(H, BAND_H), BAND_H)
    Wp = _round_up(max(W, TILE_W), TILE_W)
    WH = min(_round_up(window[0], 8) + (BAND_H - 8), Hpad)
    return WH, Wp


def _pad_y_for(WH: int) -> int:
    """Budget placement: in-band row offset spans BAND_H rows, taps need 2,
    the rest is split between upward (pad_y) and downward slack. Equals the
    historical (WH - 10) // 2 at BAND_H == 8."""
    return (WH - BAND_H - 2) // 2


def _prepare(ly, lx, out_hw, window):
    """Window-local row indices + per-image vertical shift + exactness flag.

    Mode A (plane fits the window vertically): lyl = ly, always exact.
    Mode B: lyl = ly - (BAND_H*(qy//BAND_H) + dy - pad_y) with dy the
    per-image rounded mean vertical displacement; exact iff all lyl in
    [0, WH-2] (columns never constrain: the window spans the full plane
    width).
    """
    B, Ho, Wo = ly.shape
    WH, _ = _window_for(out_hw, window)
    if _mode_a(out_hw, window):
        return ly, jnp.zeros((B,), jnp.int32), jnp.asarray(True)
    pad_y = _pad_y_for(WH)
    qy = jax.lax.broadcasted_iota(jnp.int32, (Ho, Wo), 0)[None]
    disp_y = ly - qy
    dy = jnp.round(jnp.mean(disp_y.astype(jnp.float32), axis=(1, 2))).astype(
        jnp.int32
    )
    lyl = ly - (BAND_H * (qy // BAND_H) + dy[:, None, None] - pad_y)
    ok = jnp.all((lyl >= 0) & (lyl <= WH - 2))
    return lyl, dy, ok


def splat_spans_ok(ly, lx, out_hw, window=(24, 0)) -> jax.Array:
    """Scalar bool: would the windowed splat be exact for these taps?"""
    return _prepare(ly, lx, out_hw, window)[2]


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw", "window", "interpret", "max_chunk_bytes", "out_dtype"
    ),
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
    window: tuple[int, int] = (32, 0),
    interpret: bool = False,
    max_chunk_bytes: int = 1024 * 2**20,
    out_dtype=None,
) -> jax.Array:
    """Scatter-add ct into an (out_hw) plane with separable bilinear weights.

    Args:
      ct: (B, Ho, Wo, C) cotangent.
      ly, lx: (B, Ho, Wo) int32 upper-left tap indices, PRE-CLIPPED to
        [0, H-2] / [0, W-2].
      a0, a1: (B, Ho, Wo) row-tap weights (1-wy / wy with any masks folded
      in); c0, c1: column-tap weights.
      out_hw: (H, W) of the adjoint plane.
      window: (WH, _) — vertical window rows per 8-row output band (the
        horizontal extent is always the full padded plane width).

    Returns:
      (B, H, W, C) adjoint in `out_dtype` (None = f32; sums always run in
      f32 — out_dtype only sets the materialized plane dtype). Out-of-budget
      vertical taps are SILENTLY misplaced — call splat_spans_ok first (or
      grid_sample_adjoint_image, which guards and falls back).
    """
    B, Ho, Wo, C = ct.shape
    H, W = out_hw
    WH, Wp = _window_for(out_hw, window)
    mode_a = _mode_a(out_hw, window)
    pad_y = 0 if mode_a else _pad_y_for(WH)

    lyl, dy, _ = _prepare(
        jnp.clip(ly, 0, max(H - 2, 0)).astype(jnp.int32),
        lx,
        out_hw,
        window,
    )
    lyl = jnp.clip(lyl, 0, WH - 2)
    lxc = jnp.clip(lx, 0, max(W - 2, 0)).astype(jnp.int32)
    ntb = _round_up(Ho, BAND_H) // BAND_H
    ncol = _round_up(Wo, TILE_W) // TILE_W
    nchunks = ncol * BAND_H * TILE_W // PCHUNK  # PCHUNK chunks per band

    f32 = jnp.float32
    if C == 1:
        # fold the scalar cotangent into the row weights; windows drop the
        # channel axis entirely (a trailing C=1 would 128x-pad the lanes)
        v = ct[..., 0].astype(f32)
        a0 = a0.astype(f32) * v
        a1 = a1.astype(f32) * v

    # windows are the big transient ((Bc, nty, WH, Wp, C) bf16) — chunk the
    # batch through lax.map to bound peak HBM (~1 GB of windows per chunk;
    # the training shapes fit in ONE chunk, skipping the map entirely —
    # measured ~20 ms/step of lax.map slice/convert/add glue, and an
    # unbalanced last chunk would zero-pad up to chunk-1 images of pure
    # wasted kernel work). `max_chunk_bytes` exists for tests to force the
    # chunked path at small shapes.
    win_bytes = ntb * WH * Wp * max(C, 1) * 2
    chunk = max(1, min(B, max_chunk_bytes // max(win_bytes, 1)))
    n_chunks = -(-B // chunk)
    chunk = -(-B // n_chunks)  # balance chunks: no padded-image waste
    Bp = n_chunks * chunk

    def pad_b(x):
        return jnp.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))

    # values travel in bf16 (the kernel contracts in bf16 regardless) —
    # halves the band-flatten transpose and the per-program DMA
    args = (
        pad_b(lyl), pad_b(lxc),
        pad_b(a0.astype(f32)), pad_b(a1.astype(f32)),
        pad_b(c0.astype(f32)), pad_b(c1.astype(f32)),
        pad_b(ct.astype(jnp.bfloat16)), pad_b(dy),
    )
    args = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), args
    )

    core_fn = _splat_core1 if C == 1 else _splat_core
    core = functools.partial(
        core_fn, Ho=Ho, Wo=Wo, H=H, W=W, WH=WH, Wp=Wp,
        pad_y=pad_y, nty=ntb, ntx=nchunks, mode_a=mode_a,
        interpret=interpret, out_dtype=out_dtype or jnp.float32,
    )
    if n_chunks == 1:
        plane = core(tuple(a[0] for a in args))
    else:
        plane = jax.lax.map(core, args).reshape(Bp, H, W, C)[:B]
    return plane


def _splat_core1(args, *, Ho, Wo, H, W, WH, Wp, pad_y, nty, ntx, mode_a,
                 interpret, out_dtype=jnp.float32):
    """C=1 core: channel-less windows (B, nty, WH, Wp) with the cotangent
    pre-folded into (a0, a1); same band placement/combine as the general
    core but with perfectly-tiled planar arrays."""
    lyl, lx, a0, a1, c0, c1, _, dy = args
    B = lyl.shape[0]
    f32 = jnp.float32

    lylt = _band_flatten(lyl, Ho, Wo, mode="edge")
    lxt = _band_flatten(lx, Ho, Wo, mode="edge")
    a0t = _band_flatten(a0, Ho, Wo)
    a1t = _band_flatten(a1, Ho, Wo)
    c0t = _band_flatten(c0, Ho, Wo)
    c1t = _band_flatten(c1, Ho, Wo)

    Pband = ntx * PCHUNK
    vec_spec = pl.BlockSpec(
        (1, 1, 1, Pband), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    windows = pl.pallas_call(
        functools.partial(_splat_band_kernel1, WH=WH, Wp=Wp, ntx=ntx),
        grid=(B, nty),
        in_specs=[vec_spec] * 6,
        out_specs=pl.BlockSpec(
            (1, 1, WH, Wp), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nty, WH, Wp), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((WH, Wp), f32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
    )(lylt, lxt, a0t, a1t, c0t, c1t)

    return _combine_bands(
        windows, dy, H=H, W=W, WH=WH, Wp=Wp, nty=nty, pad_y=pad_y,
        mode_a=mode_a, out_dtype=out_dtype,
    )[..., None]


def _splat_core(args, *, Ho, Wo, H, W, WH, Wp, pad_y, nty, ntx, mode_a,
                interpret, out_dtype=jnp.float32):
    lyl, lx, a0, a1, c0, c1, ct, dy = args
    B, C = ct.shape[0], ct.shape[-1]
    f32 = jnp.float32

    lylt = _band_flatten(lyl, Ho, Wo, mode="edge")
    lxt = _band_flatten(lx, Ho, Wo, mode="edge")
    a0t = _band_flatten(a0, Ho, Wo)
    a1t = _band_flatten(a1, Ho, Wo)
    c0t = _band_flatten(c0, Ho, Wo)
    c1t = _band_flatten(c1, Ho, Wo)
    vt = _band_flatten(ct, Ho, Wo).reshape(B, nty, ntx * PCHUNK, C)

    # per-band local tap-row range (edge-padded pixels carry zero weights,
    # so including them only widens the range — never wrong)
    rowrange = jnp.stack(
        [jnp.min(lylt, axis=(2, 3)), jnp.max(lylt, axis=(2, 3))], axis=-1
    ).astype(jnp.int32)

    Pband = ntx * PCHUNK
    vec_spec = pl.BlockSpec(
        (1, 1, 1, Pband), lambda b, t, s: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    windows = pl.pallas_call(
        functools.partial(_splat_band_kernel, WH=WH, Wp=Wp, ntx=ntx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nty),
            in_specs=[vec_spec] * 6
            + [
                pl.BlockSpec(
                    (1, 1, Pband, C), lambda b, t, s: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, WH, Wp, C), lambda b, t, s: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((WH, Wp, C), f32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, nty, WH, Wp, C), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
    )(rowrange, lylt, lxt, a0t, a1t, c0t, c1t, vt)

    return _combine_bands(
        windows, dy, H=H, W=W, WH=WH, Wp=Wp, nty=nty, pad_y=pad_y,
        mode_a=mode_a, out_dtype=out_dtype,
    )


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
    window=(24, 0), interpret=False, out_dtype=None,
):
    """d(grid_sample)/d(img)^T applied to ct, via the MXU splat kernel with
    a runtime in-window guard cascade (smallest window first — the kernel's
    MXU/VPU work scales with the window height, and typical warps fit the
    small one) falling back to the exact XLA scatter. All branches compute
    the same values; the guard only picks speed. `out_dtype` (None = f32)
    sets the materialized plane dtype INSIDE each branch — callers that cast
    the adjoint to the cotangent dtype anyway pass it here so the combine
    canvas, the guard-switch result copy and the downstream sums all move
    half the bytes."""
    od = out_dtype or jnp.float32
    if padding_mode == "border":
        ly, lx, a0, a1, c0, c1 = _border_factors(img_hw, grid, align_corners)
    else:
        ly, lx, a0, a1, c0, c1 = _zeros_factors(img_hw, grid, align_corners)
    H, W = img_hw
    if isinstance(window[0], int):
        windows = (window,)
    else:
        windows = tuple(window)
    # drop cascade entries that the tallest window makes redundant (mode A
    # covers everything) and dedupe resolved heights
    seen = set()
    uniq = []
    for w in windows:
        WH, _ = _window_for((H, W), w)
        if WH in seen:
            continue
        seen.add(WH)
        uniq.append(w)
        if _mode_a((H, W), w):
            break

    B, Ho, Wo, C = ct.shape

    def exact(ct_, g_):
        # transpose of the PACKED blocked-gather sampler: XLA scatters one
        # 4C-wide row per pixel (~17x faster than four per-tap scatter-adds;
        # the unused forward gather is DCE'd — the transpose of a linear op
        # is value-independent)
        from mono_vifi_tpu.ops.sampling import grid_sample

        dummy = jnp.zeros((B, H, W, C), jnp.float32)
        _, vjp = jax.vjp(
            lambda im: grid_sample(
                im, g_, padding_mode=padding_mode, align_corners=align_corners
            ),
            dummy,
        )
        return vjp(ct_.astype(jnp.float32))[0].astype(od)

    branches = [
        (lambda ct_, g_, w=w: bilinear_splat(
            ct_, ly, lx, a0, a1, c0, c1, (H, W), w, interpret=interpret,
            out_dtype=od,
        ))
        for w in uniq
    ] + [exact]
    if len(uniq) == 1 and _mode_a((H, W), uniq[0]):
        return branches[0](ct, grid)  # unconditionally exact
    # one switch, windows ordered small->large: fits(w[i]) implies
    # fits(w[j>i]), so the miss count is the first fitting branch index.
    # The per-image residual row offsets are reduced ONCE; each window's
    # predicate is then a scalar range check (same math as _prepare).
    lyc = jnp.clip(ly, 0, max(H - 2, 0)).astype(jnp.int32)
    qy = jax.lax.broadcasted_iota(jnp.int32, ly.shape[1:], 0)[None]
    dy = jnp.round(
        jnp.mean((lyc - qy).astype(jnp.float32), axis=(1, 2))
    ).astype(jnp.int32)
    resid = lyc - (BAND_H * (qy // BAND_H) + dy[:, None, None])
    rmin, rmax = jnp.min(resid), jnp.max(resid)
    idx = jnp.zeros((), jnp.int32)
    for w in uniq:
        if _mode_a((H, W), w):
            continue  # always fits
        WH = _window_for((H, W), w)[0]
        pad_y = _pad_y_for(WH)
        ok = (rmin >= -pad_y) & (rmax <= WH - 2 - pad_y)
        idx = idx + jnp.where(ok, 0, 1).astype(jnp.int32)
    return jax.lax.switch(idx, branches, ct, grid)


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
    w.r.t. img = the MXU splat kernel (guarded). flow receives NO gradient —
    it is stop_gradient'ed on entry (every caller's flow is frozen-VFI
    output or batch constants).
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
    grid = _flow_to_grid(jnp.asarray(flow, jnp.float32), H, W)
    if use_splat:
        adj = grid_sample_adjoint_image(
            ct, (H, W), grid, padding_mode=padding_mode, interpret=interpret,
            out_dtype=ct.dtype,
        )
    else:
        if padding_mode == "border":
            f = _border_factors((H, W), grid)
        else:
            f = _zeros_factors((H, W), grid)
        adj = _xla_splat(ct, *f, (H, W))
    return adj.astype(ct.dtype), jnp.zeros_like(flow)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5, 6))
def warp_frozen_flow_table(table, ids, flow, gather_dtype=None,
                           use_splat=True, interpret=False,
                           patch_gather=False):
    """Indexed frozen-flow warp: N warps drawing from U unique source images
    (see sampling.grid_sample_table). Forward builds the 4-tap gather block
    on the U uniques only (`patch_gather` additionally serves each 2x2
    output patch with ONE guarded 3x3-footprint row — 4x fewer gather rows);
    backward runs the MXU splat per USE and statically
    sums each unique image's uses — replacing the batch-concat of repeated
    feature pyramids (and its backward split+add) that the plain
    warp_frozen_flow path would require (reference train.py:762-789: 3
    fusion triplets share 3 unique feature pyramids across 6 warps)."""
    from mono_vifi_tpu.ops.sampling import grid_sample_table

    return grid_sample_table(
        table, ids, _flow_to_grid(
            jax.lax.stop_gradient(jnp.asarray(flow, jnp.float32)),
            table.shape[1], table.shape[2],
        ),
        gather_dtype=gather_dtype,
        patch_gather=patch_gather,
    )


def _wfft_fwd(table, ids, flow, gather_dtype, use_splat, interpret,
              patch_gather):
    out = warp_frozen_flow_table(
        table, ids, flow, gather_dtype, use_splat, interpret, patch_gather
    )
    return out, (flow, table.shape)


def _wfft_bwd(ids, gather_dtype, use_splat, interpret, patch_gather, res, ct):
    flow, table_shape = res
    U, H, W, C = table_shape
    grid = _flow_to_grid(jnp.asarray(flow, jnp.float32), H, W)

    groups = [[] for _ in range(U)]
    for k, u in enumerate(ids):
        groups[u].append(k)
    sizes = {len(g) for g in groups}

    if use_splat and len(sizes) == 1 and not (sizes & {0, 1}):
        # PAIRED-USE splat: all n uses of one unique CONCATENATE ALONG WIDTH
        # into one splat image (pixel positions only index the bands; ly/lx
        # stay plane coordinates) — the adjoint comes out per-unique already
        # summed. Windows, band programs, and the overlap-add all shrink
        # n-fold vs per-use splats, and the static per-unique add tree
        # disappears. The per-image vertical shift dy is then shared by the
        # n uses (residual budget covers the union; the usual runtime guard
        # falls back to the exact scatter when it doesn't fit).
        ct_g = jnp.concatenate(
            [
                jnp.concatenate([ct[k : k + 1] for k in g], axis=2)
                for g in groups
            ],
            axis=0,
        )  # (U, Ho, n*Wo, C)
        grid_g = jnp.concatenate(
            [
                jnp.concatenate([grid[k : k + 1] for k in g], axis=2)
                for g in groups
            ],
            axis=0,
        )
        adj = grid_sample_adjoint_image(
            ct_g, (H, W), grid_g, interpret=interpret, out_dtype=ct.dtype
        )
        return adj.astype(ct.dtype), jnp.zeros_like(flow)

    if use_splat:
        adj = grid_sample_adjoint_image(
            ct, (H, W), grid, interpret=interpret, out_dtype=ct.dtype
        )
    else:
        f = _border_factors((H, W), grid)
        adj = _xla_splat(ct, *f, (H, W))
    # static per-unique accumulation of the N per-use adjoints; a unique
    # with zero uses (legal table) contributes a zeros plane
    parts = [[] for _ in range(U)]
    for k, u in enumerate(ids):
        parts[u].append(adj[k : k + 1])
    zero = jnp.zeros((1, H, W, C), adj.dtype)
    g = jnp.concatenate(
        [functools.reduce(jnp.add, p) if p else zero for p in parts], axis=0
    )
    return g.astype(ct.dtype), jnp.zeros_like(flow)


warp_frozen_flow_table.defvjp(_wfft_fwd, _wfft_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grid_sample_frozen_grid(img, grid, padding_mode="border",
                            window=(32, 0), use_splat=True, interpret=False,
                            fast_forward=False):
    """grid_sample with a gradient-free grid (batched affine rotations
    replacing train.py:888-922: the grid comes from batch constants).
    Forward = the windowed Pallas tap kernel when `fast_forward` (TPU) else
    the exact XLA blocked-gather sampler; backward w.r.t. img = the MXU
    splat kernel (guarded, falls back to XLA scatter). `window` sets the
    vertical splat window — for a rotation by <=a degrees over width W it
    must cover ~W*sin(a) + 10 rows."""
    from mono_vifi_tpu.ops.sampling import grid_sample

    grid = jax.lax.stop_gradient(grid)
    if fast_forward and padding_mode == "zeros":
        from mono_vifi_tpu.ops.pallas import warp as pwarp

        if pwarp.windowed_ok(img.shape, grid.shape):
            return pwarp.grid_sample_windowed_zeros_safe(img, grid)
    return grid_sample(img, grid, padding_mode=padding_mode)


def _gsfg_fwd(img, grid, padding_mode, window, use_splat, interpret,
              fast_forward):
    out = grid_sample_frozen_grid(
        img, grid, padding_mode, window, use_splat, interpret, fast_forward
    )
    return out, (grid, img.shape)


def _gsfg_bwd(padding_mode, window, use_splat, interpret, fast_forward,
              res, ct):
    grid, img_shape = res
    H, W = img_shape[1], img_shape[2]
    if use_splat:
        adj = grid_sample_adjoint_image(
            ct, (H, W), jnp.asarray(grid, jnp.float32),
            padding_mode=padding_mode, window=window, interpret=interpret,
            out_dtype=ct.dtype,
        )
    else:
        if padding_mode == "border":
            f = _border_factors((H, W), grid)
        else:
            f = _zeros_factors((H, W), grid)
        adj = _xla_splat(ct, *f, (H, W))
    return adj.astype(ct.dtype), jnp.zeros_like(grid)


grid_sample_frozen_grid.defvjp(_gsfg_fwd, _gsfg_bwd)


def _flow_to_grid(flow, H, W):
    dtype = flow.dtype
    gx = jax.lax.broadcasted_iota(dtype, (H, W), 1) / ((W - 1.0) / 2.0) - 1.0
    gy = jax.lax.broadcasted_iota(dtype, (H, W), 0) / ((H - 1.0) / 2.0) - 1.0
    nx = gx[None] + flow[..., 0] / ((W - 1.0) / 2.0)
    ny = gy[None] + flow[..., 1] / ((H - 1.0) / 2.0)
    return jnp.stack([nx, ny], axis=-1)


warp_frozen_flow.defvjp(_wff_fwd, _wff_bwd)
