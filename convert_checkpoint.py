"""Convert a reference PyTorch checkpoint (.pth) into our .pkl format.

    python convert_checkpoint.py --input ResNet18_KITTI_MR.pth \
        --output ResNet18_KITTI_MR.pkl --backbone ResNet18
"""

from __future__ import annotations

import argparse
import pickle

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.training.checkpoint import load_reference_pth


def main():
    p = argparse.ArgumentParser(description="torch->jax checkpoint converter")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--backbone", default="ResNet18",
                   choices=["ResNet18", "ResNet50", "LiteMono", "DHRNet"])
    p.add_argument("--num_levels", type=int, default=None,
                   help="fusion-module pyramid levels (5 resnet/dhrnet, 3 litemono)")
    args = p.parse_args()

    levels = args.num_levels or (3 if args.backbone == "LiteMono" else 5)
    cfg = Options(backbone=args.backbone)
    loaded = load_reference_pth(args.input, cfg, num_levels=levels)
    raw = loaded.pop("raw")
    payload = {
        "params": loaded["params"],
        "batch_stats": loaded["batch_stats"],
        "height": raw.get("height"),
        "width": raw.get("width"),
        "use_stereo": raw.get("use_stereo", False),
    }
    with open(args.output, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    roles = ", ".join(loaded["params"].keys())
    print(f"Converted {args.input} -> {args.output} (roles: {roles})")


if __name__ == "__main__":
    main()
