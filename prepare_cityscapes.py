"""Preprocess Cityscapes for training (reference prepare_cityscapes.py):
for each train sequence frame, resize, crop the bottom 25% (ego car),
vertically concatenate the (t-1, t, t+1) triplet into one tall png and write
per-frame cam.txt intrinsics.

    python prepare_cityscapes.py --img_height 512 --img_width 1024 \
        --dataset_dir /data/cityscapes --dump_root /data/cs_preprocessed
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image


def load_intrinsics(dataset_dir, city, frame_name, split):
    camera_file = os.path.join(
        dataset_dir, "camera", split, city, frame_name + "_camera.json"
    )
    with open(camera_file) as f:
        camera = json.load(f)["intrinsic"]
    return np.array(
        [
            [camera["fx"], 0.0, camera["u0"]],
            [0.0, camera["fy"], camera["v0"]],
            [0.0, 0.0, 1.0],
        ]
    )


def dump_example(args, city, frame_name, split):
    city_, seq, frame = frame_name.split("_")
    fid = int(frame)
    frames = []
    for offset in (-1, 0, 1):
        name = f"{city_}_{seq}_{str(fid + offset).zfill(6)}"
        path = os.path.join(
            args.dataset_dir, "leftImg8bit_sequence", split, city,
            name + "_leftImg8bit.png",
        )
        if not os.path.exists(path):
            return
        img = Image.open(path)
        w, h = img.size
        img = img.crop((0, 0, w, h * 3 // 4))  # remove ego car
        img = img.resize((args.img_width, args.img_height * 3 // 4), Image.LANCZOS)
        frames.append(np.asarray(img))

    K = load_intrinsics(args.dataset_dir, city, frame_name, split)
    # rescale intrinsics to the dumped resolution
    w_scale = args.img_width / w
    h_scale = (args.img_height * 3 // 4) / (h * 3 // 4)
    K = K.copy()
    K[0] *= w_scale
    K[1] *= h_scale

    out_dir = os.path.join(args.dump_root, city)
    os.makedirs(out_dir, exist_ok=True)
    tall = np.concatenate(frames, axis=0)
    Image.fromarray(tall).save(os.path.join(out_dir, frame_name + ".png"))
    with open(os.path.join(out_dir, frame_name + "_cam.txt"), "w") as f:
        f.write(",".join(str(v) for v in K.flatten().tolist()))


def main():
    p = argparse.ArgumentParser(description="prepare_cityscapes")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--dump_root", type=str, required=True)
    p.add_argument("--img_height", type=int, default=512)
    p.add_argument("--img_width", type=int, default=1024)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--split", type=str, default="train")
    args = p.parse_args()

    seq_dir = os.path.join(args.dataset_dir, "leftImg8bit_sequence", args.split)
    tasks = []
    for city in sorted(os.listdir(seq_dir)):
        for fname in sorted(os.listdir(os.path.join(seq_dir, city))):
            if not fname.endswith("_leftImg8bit.png"):
                continue
            frame_name = fname.replace("_leftImg8bit.png", "")
            tasks.append((city, frame_name))
    print(f"{len(tasks)} frames to process")
    with ThreadPoolExecutor(max_workers=args.num_workers) as pool:
        list(pool.map(lambda t: dump_example(args, t[0], t[1], args.split), tasks))


if __name__ == "__main__":
    main()
