"""Single-image depth prediction (reference test_simple.py equivalent).

    python test_simple.py --image_path img.png --pretrained_path ckpt.pth \
        --backbone ResNet18 [--save_npy]

Writes <name>_disp.jpeg (magma colormap) and optionally <name>_disp.npy.
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
from mono_vifi_tpu.training.monovifi import single_frame_disp
from mono_vifi_tpu.utils.colormap import magma
from evaluate_depth import load_model


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="test_simple")
    p.add_argument("--image_path", type=str, required=True,
                   help="image file or directory of images")
    p.add_argument("--pretrained_path", type=str)
    p.add_argument("--backbone", type=str, default="ResNet18",
                   choices=["ResNet18", "ResNet50", "LiteMono", "DHRNet"])
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=100.0)
    p.add_argument("--ext", type=str, default="png")
    p.add_argument("--save_npy", action="store_true")
    p.add_argument("--post_process", action="store_true", default=False)
    return p.parse_args(argv)


def main(args):
    bundle, params, bstats = load_model(args)
    fn = jax.jit(lambda img: single_frame_disp(bundle, params, bstats, img))

    if os.path.isfile(args.image_path):
        paths = [args.image_path]
        out_dir = os.path.dirname(args.image_path)
    else:
        paths = sorted(glob.glob(os.path.join(args.image_path, f"*.{args.ext}")))
        out_dir = args.image_path
    print(f"-> Predicting on {len(paths)} test images")

    for idx, path in enumerate(paths):
        img = Image.open(path).convert("RGB")
        original_size = img.size  # (W, H)
        x = img.resize((args.width, args.height), Image.LANCZOS)
        x = jnp.asarray(np.asarray(x, np.float32) / 255.0)[None]
        disp = np.asarray(fn(x))[0, ..., 0]
        scaled_disp, _ = disp_to_depth(disp, args.min_depth, args.max_depth)

        name = os.path.splitext(os.path.basename(path))[0]
        # resize to original resolution (align_corners=False, like the ref)
        from mono_vifi_tpu.evaluation import resize_np

        disp_full = resize_np(
            np.asarray(disp, np.float64),
            (original_size[1], original_size[0]),
            align_corners=False,
        )
        if args.save_npy:
            np.save(os.path.join(out_dir, f"{name}_disp.npy"), np.asarray(scaled_disp))

        rgb = magma(disp_full / (np.percentile(disp_full, 95) + 1e-8))
        Image.fromarray(rgb).save(os.path.join(out_dir, f"{name}_disp.jpeg"))
        print(f"   Processed {idx + 1} of {len(paths)} images - saved predictions")
    print("-> Done!")


if __name__ == "__main__":
    main(parse_args())
