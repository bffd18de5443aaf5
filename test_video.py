"""Video depth prediction (reference test_video.py equivalent): run single-
AND multi-frame depth over a directory of sorted frames; neighbors are the
adjacent files (first/last frames reuse themselves); writes per-frame jpegs
(+ optional npy) and a stacked demo.gif.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from mono_vifi_tpu.ops.geometry import disp_to_depth
from mono_vifi_tpu.training.monovifi import multi_frame_disp, single_frame_disp
from mono_vifi_tpu.utils.colormap import magma
from evaluate_depth_mf import load_model


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="test_video")
    p.add_argument("--image_path", type=str, required=True,
                   help="directory of video frames")
    p.add_argument("--pretrained_path", type=str)
    p.add_argument("--backbone", type=str, default="ResNet18",
                   choices=["ResNet18", "ResNet50", "LiteMono", "DHRNet"])
    p.add_argument("--vfi_scale", type=str, default="small",
                   choices=["small", "large"])
    p.add_argument("--weights_dir", type=str, default="./weights")
    p.add_argument("--vfi_dataset_tag", type=str, default="KITTI",
                   choices=["KITTI", "CS"])
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=100.0)
    p.add_argument("--ext", type=str, default="png")
    p.add_argument("--save_npy", action="store_true")
    p.add_argument("--output_path", type=str, default=None)
    return p.parse_args(argv)


def main(args):
    bundle, params, bstats, vfi = load_model(args, args.vfi_dataset_tag)
    sf_fn = jax.jit(lambda img: single_frame_disp(bundle, params, bstats, img))
    mf_fn = jax.jit(
        lambda a, b, c: multi_frame_disp(bundle, params, bstats, vfi, a, b, c)
    )

    paths = sorted(glob.glob(os.path.join(args.image_path, f"*.{args.ext}")))
    assert paths, f"no *.{args.ext} frames in {args.image_path}"
    out_dir = args.output_path or args.image_path
    os.makedirs(out_dir, exist_ok=True)
    print(f"-> Predicting on {len(paths)} video frames")

    def load(p):
        img = Image.open(p).convert("RGB").resize(
            (args.width, args.height), Image.LANCZOS
        )
        return np.asarray(img, np.float32) / 255.0

    frames = [load(p) for p in paths]
    gif_frames = []
    for i, path in enumerate(paths):
        prev_i = max(i - 1, 0)
        next_i = min(i + 1, len(frames) - 1)
        img0 = jnp.asarray(frames[i])[None]
        imgn = jnp.asarray(frames[prev_i])[None]
        imgp = jnp.asarray(frames[next_i])[None]

        disp_sf = np.asarray(sf_fn(img0))[0, ..., 0]
        disp_mf = np.asarray(mf_fn(imgn, img0, imgp))[0, ..., 0]

        name = os.path.splitext(os.path.basename(path))[0]
        if args.save_npy:
            for tag, d in (("sf", disp_sf), ("mf", disp_mf)):
                sd, _ = disp_to_depth(d, args.min_depth, args.max_depth)
                np.save(os.path.join(out_dir, f"{name}_disp_{tag}.npy"), np.asarray(sd))

        row_img = (frames[i] * 255).astype(np.uint8)
        row_sf = magma(disp_sf / (np.percentile(disp_sf, 95) + 1e-8))
        row_mf = magma(disp_mf / (np.percentile(disp_mf, 95) + 1e-8))
        Image.fromarray(row_sf).save(os.path.join(out_dir, f"{name}_disp_sf.jpeg"))
        Image.fromarray(row_mf).save(os.path.join(out_dir, f"{name}_disp_mf.jpeg"))
        gif_frames.append(
            Image.fromarray(np.concatenate([row_img, row_sf, row_mf], axis=0))
        )
        print(f"   Processed {i + 1}/{len(paths)}")

    gif_frames[0].save(
        os.path.join(out_dir, "demo.gif"),
        save_all=True,
        append_images=gif_frames[1:],
        duration=100,
        loop=0,
    )
    print(f"-> Done! GIF at {os.path.join(out_dir, 'demo.gif')}")


if __name__ == "__main__":
    main(parse_args())
