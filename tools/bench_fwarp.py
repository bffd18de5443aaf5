"""Microbenchmark: fusion/IFRNet feature-warp FORWARD gathers on the real chip.

Compares, at the production fusion-table shapes (ResNet18 640x192, 3 unique
pyramids serving 6 warp uses, B=10 -> U=30/N=60) and the IFRNet decoder
feature-warp shapes:

  pixel    — per-pixel packed-footprint gather (production path,
             ops/sampling.py:_table_gather_pixel)
  patch    — guarded 2x2-patch 3x3-footprint gather (falls back per-pixel
             when any patch's tap-base span > 1)
  resident — full-plane-resident C-chunked Pallas tap kernel (if built)

Flows are smooth VFI-like fields plus an optional motion-boundary step
(--boundary) that breaks the patch guard, matching real flows (PERF.md
round-4 observation: the global guard trips on real motion boundaries).

Timing: host-materialized sum (axon block_until_ready returns early).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smooth_flow(N, H, W, mag=12.0, boundary=False, seed=0):
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    out = np.zeros((N, H, W, 2), np.float32)
    for n in range(N):
        ph = rng.uniform(0, 2 * np.pi, 4)
        fx = mag * (0.6 * np.sin(2 * np.pi * ys / H + ph[0])
                    + 0.4 * np.cos(2 * np.pi * xs / W + ph[1]))
        fy = 0.3 * mag * (0.6 * np.sin(2 * np.pi * xs / W + ph[2])
                          + 0.4 * np.cos(2 * np.pi * ys / H + ph[3]))
        if boundary:
            # a moving object: a rectangle with distinct flow (step edge)
            y0, x0 = H // 4, W // 4
            m = np.zeros((H, W), bool)
            m[y0 : y0 + H // 3, x0 : x0 + W // 3] = True
            fx = np.where(m, fx + 0.8 * mag, fx)
        out[n, ..., 0] = fx
        out[n, ..., 1] = fy
    return out


def bench(fn, *args, iters=20):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boundary", action="store_true",
                    help="add a motion-boundary step edge to the flows")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench as benchmod

    benchmod.enable_compile_cache()
    from mono_vifi_tpu.ops import sampling

    B = 10
    # (name, U, N, H, W, C, flow_mag_at_level)
    cases = [
        ("fusion_L0", 3 * B, 6 * B, 96, 320, 64, 10.0),
        ("fusion_L1", 3 * B, 6 * B, 48, 160, 64, 5.0),
        ("fusion_L2", 3 * B, 6 * B, 24, 80, 128, 2.5),
        ("ifrnet_l0", 6 * B, 6 * B, 96, 160, 64, 6.0),
        ("ifrnet_l1", 6 * B, 6 * B, 48, 80, 96, 3.0),
    ]
    rng = np.random.default_rng(1)
    print(f"{'case':>10} {'pixel':>8} {'patch':>8} {'resident':>9}  (ms, fwd)")
    totals = [0.0, 0.0, 0.0]
    for name, U, N, H, W, C, mag in cases:
        table = jnp.asarray(
            rng.standard_normal((U, H, W, C)).astype(np.float32),
            jnp.bfloat16,
        )
        ids = tuple(np.arange(N) % U)
        flow = jnp.asarray(smooth_flow(N, H, W, mag, args.boundary))
        # grids as the fusion module builds them
        from mono_vifi_tpu.ops.pallas.splat import _flow_to_grid

        grid = _flow_to_grid(flow, H, W)

        f_pixel = jax.jit(lambda t, g: sampling.grid_sample_table(
            t, ids, g, patch_gather=False))
        f_patch = jax.jit(lambda t, g: sampling.grid_sample_table(
            t, ids, g, patch_gather=True))
        t_pixel = bench(f_pixel, table, grid, iters=args.iters)
        t_patch = bench(f_patch, table, grid, iters=args.iters)
        t_res = float("nan")
        try:
            from mono_vifi_tpu.ops.pallas import fwarp

            f_res = jax.jit(lambda t, g: fwarp.grid_sample_table_resident(
                t, ids, g[..., 0], g[..., 1]))
            t_res = bench(f_res, table, grid, iters=args.iters)
            err = float(jnp.max(jnp.abs(
                (f_res(table, grid) - f_pixel(table, grid)).astype(jnp.float32)
            )))
            assert err < 1e-1, err
        except ImportError:
            pass
        print(f"{name:>10} {t_pixel:8.2f} {t_patch:8.2f} {t_res:9.2f}")
        totals[0] += t_pixel
        totals[1] += t_patch
        totals[2] += 0.0 if np.isnan(t_res) else t_res
    print(f"{'TOTAL':>10} {totals[0]:8.2f} {totals[1]:8.2f} {totals[2]:9.2f}")


if __name__ == "__main__":
    main()
