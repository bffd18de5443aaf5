"""Microbenchmark TPU conv-emitter efficiency for the channel counts this
framework actually runs (HRNet 18/36/72/144 branches, ResNet 64, decoder
16/32/96), answering: how much MXU time does a small-channel conv cost vs its
FLOPs, and does a space-to-depth f=2 re-expression (channels x4, pixels /4,
exact for zero-padded convs) win?

Usage: python tools/bench_conv.py [--batch 48]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import bench

    bench.enable_compile_cache()

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def run(x, w, n):
        def body(y, _):
            return conv(y, w), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    B = args.batch
    N_CHAIN = 400  # chained convs per timed call: amortizes dispatch + tunnel RTT
    cases = [
        # (label, H, W, cin, cout)
        ("hrnet b0 @1/4", 48, 160, 18, 18),
        ("hrnet b0 S2Df2", 24, 80, 72, 72),
        ("hrnet b0 fy2", 24, 160, 36, 36),
        ("hrnet b0 fy4", 12, 160, 72, 72),
        ("hrnet b0 fy4pad", 12, 160, 128, 128),
        ("hrnet b0 x2diag", 48, 160, 36, 36),
        ("hrnet b0 x4diag", 48, 160, 72, 72),
        ("hrnet b0 x7diag", 48, 160, 126, 126),
        # real folded shapes: batch divided by the fold factor (B=48 -> fb=6
        # for 18ch, fb=3 for 36ch), which is what models/hrnet.py runs
        ("b0 fold6 REAL", 48, 160, 108, 108, 6),
        ("b1 fold3 REAL", 24, 80, 108, 108, 3),
        ("b0 fold4 REAL", 48, 160, 72, 72, 4),
        ("hrnet b1 @1/8", 24, 80, 36, 36),
        ("hrnet b1 S2Dfy2", 12, 80, 72, 72),
        ("hrnet b1 fy4", 6, 80, 144, 144),
        ("hrnet b2 @1/16", 12, 40, 72, 72),
        ("hrnet b2 fy2", 6, 40, 144, 144),
        ("hrnet b3 @1/32", 6, 20, 144, 144),
        ("resnet l1 @1/4", 48, 160, 64, 64),
        ("resnet l1 S2Dfy2", 24, 160, 128, 128),
        ("resnet l2 @1/8", 24, 80, 128, 128),
        ("resnet l3 @1/16", 12, 40, 256, 256),
        ("resnet l4 @1/32", 6, 20, 512, 512),
        ("ctrl 128 @1/4", 48, 160, 128, 128),
        ("ctrl 256 @1/8", 24, 80, 256, 256),
    ]
    rng = np.random.default_rng(0)
    print(f"batch={B} chain={N_CHAIN} bf16")
    for case in cases:
        label, H, W, cin, cout = case[:5]
        Bc = B // case[5] if len(case) > 5 else B  # batch-folded: B/fb
        x = jnp.asarray(rng.standard_normal((Bc, H, W, cin)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16
        )
        float(run(x, w, N_CHAIN))  # compile
        t0 = time.time()
        for _ in range(args.iters):
            float(run(x, w, N_CHAIN))
        dt = (time.time() - t0) / args.iters / N_CHAIN
        flops = 2 * 9 * cin * cout * H * W * Bc
        eff = flops / dt / 1e12
        print(
            f"{label:18s} ({Bc},{H:3d},{W:3d},{cin:3d})->{cout:3d}"
            f"  {dt*1e6:8.1f} us/conv  {flops/1e9:6.2f} GF"
            f"  {eff:6.1f} TF/s  ({eff/197*100:4.1f}% peak)"
        )


if __name__ == "__main__":
    main()
