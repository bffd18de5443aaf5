"""Host input-pipeline benchmark (VERDICT r2 weak #2).

Synthesizes a KITTI-layout directory at native-ish resolution, then measures
the real `DataLoader` rate for the flagship training config (640x192, bs10,
affine augmentation on) and the per-stage cost of one `__getitem__`.

The training contract: the loader must sustain >= the device step rate
(ideally 2x) while overlapping with a ~0.5-0.7 s device step. Run:

    python tools/bench_loader.py [--samples 80] [--workers 8]

Prints a JSON line per measurement.
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
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mono_vifi_tpu.data import DataLoader, KITTIRAWDataset, StatefulSampler


def make_kitti_dir(root: str, n_frames: int = 24, size=(1242, 375)) -> None:
    img_dir = os.path.join(
        root, "2011_09_26", "2011_09_26_drive_0001_sync", "image_02", "data"
    )
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:010d}.png"))


def bench_loader(root, n_samples, batch_size, workers, use_affine=True):
    files = [
        f"2011_09_26/2011_09_26_drive_0001_sync {i} l" for i in range(1, 23)
    ]
    # repeat the file list so the run is long enough to time
    reps = max(1, (n_samples + len(files) - 1) // len(files))
    ds = KITTIRAWDataset(
        root, files * reps, height=192, width=640, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=use_affine, is_train=True, seed=1,
    )
    sampler = StatefulSampler(len(ds), seed=1)
    loader = DataLoader(ds, batch_size, sampler=sampler, num_workers=workers)
    it = iter(loader)
    next(it)  # warm the pool / page cache
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["color_0"].shape[0]
        if n >= n_samples:
            break
    dt = time.perf_counter() - t0
    return n / dt


def bench_stages(root):
    """Per-stage cost of one training sample (ms)."""
    files = ["2011_09_26/2011_09_26_drive_0001_sync 5 l"]
    ds = KITTIRAWDataset(
        root, files, height=192, width=640, frame_idxs=[0, -1, 1],
        num_scales=1, use_affine=True, is_train=True, seed=1,
    )

    def timeit(fn, iters=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters * 1e3

    folder, fidx, side = ds.index_to_folder_and_frame_idx(0)
    out = {}
    out["decode_3_frames_ms"] = timeit(
        lambda: [ds.get_color(folder, fidx + i, side, False) for i in (-1, 0, 1)]
    )
    raw = ds.get_color(folder, fidx, side, False)
    out["resize_to_640x192_ms"] = timeit(
        lambda: raw.resize((640, 192), ds.interp), iters=50
    )
    import random

    from mono_vifi_tpu.data.augment import ColorJitter, to_array

    resized = raw.resize((640, 192), ds.interp)
    jit = ColorJitter(rng=random.Random(0))
    out["color_jitter_ms"] = timeit(lambda: to_array(jit(resized)), iters=50)
    rng = ds._rng(0)
    K = ds.load_intrinsics(folder, fidx)
    K[0, :] *= 640
    K[1, :] *= 192
    p = ds._affine_params(rng, K, np.linalg.pinv(K))
    out["affine_full_chain_ms"] = timeit(
        lambda: to_array(
            raw.resize(p["size_re"], ds.interp)
            .rotate(p["angle"], resample=Image.BILINEAR, expand=False)
            .crop(p["crop"])
        ),
        iters=20,
    )
    out["affine_windowed_ms"] = timeit(
        lambda: to_array(ds._affine_window(raw, p)), iters=20
    )
    out["affine_masks_ms"] = timeit(lambda: ds._affine_masks(p), iters=50)
    out["full_getitem_ms"] = timeit(lambda: ds[0], iters=10)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=80)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=10)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="kitti_bench_")
    try:
        make_kitti_dir(root)
        stages = bench_stages(root)
        print(json.dumps({"metric": "getitem_stage_ms", **{
            k: round(v, 2) for k, v in stages.items()}}))
        for affine in (True, False):
            rate = bench_loader(
                root, args.samples, args.batch_size, args.workers, affine
            )
            print(json.dumps({
                "metric": "loader_samples_per_sec",
                "use_affine": affine,
                "workers": args.workers,
                "value": round(rate, 2),
                "unit": "samples/s",
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
