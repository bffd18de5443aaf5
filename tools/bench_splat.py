"""Microbenchmark: MXU splat kernel vs XLA scatter-add for the bilinear-warp
image adjoint, on real fusion-feature-warp shapes (640x192, bs10 -> fusion
stack 3B=30, both neighbors batched = 60 per level).

Run on the real TPU: python tools/bench_splat.py
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mono_vifi_tpu.ops.pallas import splat as S
from mono_vifi_tpu.ops.sampling import warp


def _sync(out):
    # device_get of the full array would ship hundreds of MB through the
    # axon tunnel (seconds!) — sync on a single on-device scalar instead
    return float(jnp.ravel(out)[0])


def timeit(fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    # fusion levels for ResNet18 @ 640x192 (B=60: 3 triplets x 2 neighbors x bs10)
    levels = [
        (60, 96, 320, 64),
        (60, 48, 160, 64),
        (60, 24, 80, 128),
        (60, 12, 40, 128),  # C=256 handled as 2x128 chunks -> model with 128
        (60, 6, 20, 128),
    ]
    for B, H, W, C in levels:
        k1, k2, k3, key = jax.random.split(key, 4)
        img = jax.random.normal(k1, (B, H, W, C), jnp.float32)
        # smooth flow: per-sample uniform shift (+-20 px) + low-frequency
        # sinusoidal variation (+-2 px) — realistic VFI/view-synthesis fields
        # horizontal shifts large (no budget), vertical modest so the
        # fast path's border-residual budget holds (the training guard
        # falls back on wilder fields)
        base = jnp.concatenate([
            jax.random.uniform(k2, (B, 1, 1, 1), minval=-20.0, maxval=20.0),
            jax.random.uniform(k2, (B, 1, 1, 1), minval=-4.0, maxval=4.0),
        ], -1)
        xs = jnp.linspace(0, 2 * jnp.pi, W)[None, None, :, None]
        ys = jnp.linspace(0, 2 * jnp.pi, H)[None, :, None, None]
        flow = base + 2.0 * jnp.sin(xs) * jnp.cos(ys)
        ct = jax.random.normal(k3, (B, H, W, C), jnp.float32)

        # XLA path: transpose of the packed blocked-gather sampler (the
        # best XLA formulation — one 4C-wide scatter row per pixel; the
        # unused forward gather is DCE'd, so this times the adjoint alone)
        def xla_adj(flow_, ct_):
            dummy = jnp.zeros((B, H, W, C), jnp.float32)
            _, vjp = jax.vjp(lambda im: warp(im, flow_), dummy)
            return vjp(ct_)[0]

        xla_adj_j = jax.jit(xla_adj)

        def splat_adj(flow_, ct_):
            grid = S._flow_to_grid(flow_, H, W)
            return S.grid_sample_adjoint_image(ct_, (H, W), grid)

        splat_adj_j = jax.jit(splat_adj)

        t_xla = timeit(xla_adj_j, flow, ct)
        t_spl = timeit(splat_adj_j, flow, ct)
        a = xla_adj_j(flow, ct)
        b = splat_adj_j(flow, ct)
        err = float(jnp.max(jnp.abs(a - b)))
        rel = err / (float(jnp.max(jnp.abs(a))) + 1e-12)
        print(
            f"B{B} {H}x{W} C{C}: xla {t_xla:7.2f} ms  splat {t_spl:7.2f} ms  "
            f"speedup {t_xla / t_spl:5.2f}x  maxerr {err:.2e} (rel {rel:.2e})"
        )


if __name__ == "__main__":
    main()
