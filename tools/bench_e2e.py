"""End-to-end loader-fed training throughput (VERDICT r3 missing #2).

Times the ASSEMBLED train.py loop — real threaded `DataLoader` over a
synthetic native-resolution KITTI tree, `device_prefetch` double buffering,
and the jitted fused train step on the TPU — exactly the per-step workload
of reference train.py:640-705, and reports sustained samples/s vs the
device-only rate (`bench.py`).

    python tools/bench_e2e.py [--steps 60] [--workers N] [--batch 10]
        [--loader-only]   # also: loader rate alone at N workers

On a 1-core host the loader (~9 samples/s/core, PERF.md) cannot feed a
>20 samples/s device step, so the sustained number is loader-bound; the
tool reports both rates plus the measured overlap so the binding constraint
is explicit. Prints JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_loader import make_kitti_dir  # noqa: E402


def build_loader(root, batch_size, workers, n_files=200, stage_uint8=True):
    from mono_vifi_tpu.data import DataLoader, KITTIRAWDataset, StatefulSampler

    files = [
        f"2011_09_26/2011_09_26_drive_0001_sync {i} l" for i in range(1, 23)
    ]
    reps = max(1, (n_files + len(files) - 1) // len(files))
    ds = KITTIRAWDataset(
        root, files * reps, height=192, width=640, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=True, is_train=True, seed=1,
        stage_uint8=stage_uint8,
    )
    sampler = StatefulSampler(len(ds), seed=1)
    return DataLoader(ds, batch_size, sampler=sampler, num_workers=workers)


def bench_e2e(root, steps, batch_size, workers, stage_uint8=True):
    import jax

    from mono_vifi_tpu.config import Options
    from mono_vifi_tpu.data.loader import device_prefetch
    from mono_vifi_tpu.training import monovifi
    from mono_vifi_tpu.training.monovifi import MonoViFiStep

    cfg = Options(
        height=192, width=640, batch_size=batch_size, backbone="ResNet18",
        use_affine=True, compute_dtype="bfloat16",
        fuse_model_type="shared_encoder",
    )
    bundle, tx, state = monovifi.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=3981
    )
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")
    step = jax.jit(
        MonoViFiStep(bundle, tx).make_train_step(), donate_argnums=0
    )

    loader = build_loader(root, batch_size, workers,
                          n_files=(steps + 8) * batch_size,
                          stage_uint8=stage_uint8)
    rng = jax.random.PRNGKey(2)

    # warmup: compile on the first real batch (host-materialized sync)
    it = device_prefetch(loader, size=2)
    batch0 = next(it)
    state, metrics = step(state, vfi_params, batch0, jax.random.fold_in(rng, 0))
    float(metrics["loss"])

    t0 = time.perf_counter()
    n = 0
    t_wait = 0.0
    for i, batch in enumerate(it):
        tw = time.perf_counter()
        # async dispatch: the host thread only blocks here if the device has
        # >1 step queued; the loader wait is the data-starvation signal
        state, metrics = step(
            state, vfi_params, batch, jax.random.fold_in(rng, i + 1)
        )
        t_wait += time.perf_counter() - tw
        n += batch_size
        if i + 1 >= steps:
            break
    loss = float(metrics["loss"])  # full sync
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return {
        "metric": "monovifi_e2e_train_samples_per_sec_640x192",
        "value": round(n / dt, 2),
        "unit": "samples/s",
        "steps": steps,
        "workers": workers,
        "dispatch_fraction": round(t_wait / dt, 3),
    }


def bench_loader_rate(root, n_samples, batch_size, workers, stage_uint8=True):
    loader = build_loader(root, batch_size, workers, n_files=n_samples + 40,
                          stage_uint8=stage_uint8)
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["color_0"].shape[0]
        if n >= n_samples:
            break
    dt = time.perf_counter() - t0
    return {
        "metric": "loader_samples_per_sec",
        "value": round(n / dt, 2),
        "unit": "samples/s",
        "workers": workers,
        "stage_uint8": stage_uint8,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--workers", type=int, default=0,
                    help="0 = min(8, os.cpu_count())")
    ap.add_argument("--loader-only", action="store_true")
    ap.add_argument("--loader-sweep", action="store_true",
                    help="measure loader rate at 1, 2, 4, 8 workers")
    ap.add_argument("--no-uint8", action="store_true",
                    help="stage float32 batches (pre-round-5 behavior)")
    ap.add_argument("--keep-dir", default="")
    args = ap.parse_args()
    u8 = not args.no_uint8

    workers = args.workers or min(8, os.cpu_count() or 1)
    root = args.keep_dir or tempfile.mkdtemp(prefix="kitti_bench_")
    try:
        make_kitti_dir(root)
        if args.loader_sweep:
            for w in (1, 2, 4, 8):
                print(json.dumps(
                    bench_loader_rate(root, 60, args.batch, w, u8)
                ))
            return
        if args.loader_only:
            print(json.dumps(
                bench_loader_rate(root, 80, args.batch, workers, u8)
            ))
            return
        from bench import enable_compile_cache

        enable_compile_cache()
        print(json.dumps(
            bench_e2e(root, args.steps, args.batch, workers, u8)
        ))
    finally:
        if not args.keep_dir:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
