"""Single-frame depth evaluation (reference evaluate_depth.py equivalent).

Evaluates a checkpoint on KITTI eigen + eigen_benchmark, Make3D, NYUv2 and/or
Cityscapes, gated by which --*_path flags are set. Accepts both our .pkl
checkpoints and reference .pth checkpoints (converted on load).

    python evaluate_depth.py --pretrained_path ckpt.pth --backbone ResNet18 \
        --kitti_path /data/kitti [--post_process] [--use_stereo]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu import evaluation
from mono_vifi_tpu.config import Options
from mono_vifi_tpu.data import (
    CityscapesDataset,
    DataLoader,
    KITTIRAWDataset,
    Make3DDataset,
    NYUDataset,
)
from mono_vifi_tpu.ops.geometry import disp_to_depth
from mono_vifi_tpu.training import checkpoint as ckpt_lib
from mono_vifi_tpu.training.factory import ModelBundle
from mono_vifi_tpu.training.monovifi import single_frame_disp
from mono_vifi_tpu.utils import readlines, xla_flops, count_params

SPLITS_DIR = os.path.join(os.path.dirname(__file__), "splits")


def eval_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluation Parser")
    p.add_argument("--pretrained_path", type=str)
    p.add_argument("--backbone", type=str, default="ResNet18",
                   choices=["ResNet18", "ResNet50", "LiteMono", "DHRNet"])
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=100.0)
    p.add_argument("--post_process", action="store_true")
    p.add_argument("--use_stereo", action="store_true")
    p.add_argument("--kitti_path", type=str)
    p.add_argument("--make3d_path", type=str)
    p.add_argument("--nyuv2_path", type=str)
    p.add_argument("--cityscapes_path", type=str)
    return p.parse_args(argv)


def load_model(args):
    """Build the bundle and load encoder/depth weights from a checkpoint."""
    print(f"-> Loading weights from {args.pretrained_path}")
    cfg = Options(backbone=args.backbone, height=args.height, width=args.width,
                  compute_dtype="float32", num_scales=1)
    bundle = ModelBundle(cfg)
    params, bstats = bundle.init_variables(jax.random.PRNGKey(0))
    if args.pretrained_path:
        if args.pretrained_path.endswith(".pth"):
            loaded = ckpt_lib.load_reference_pth(
                args.pretrained_path, cfg, len(bundle.num_ch_enc)
            )
        else:
            loaded = ckpt_lib.load_checkpoint(args.pretrained_path)
        params = ckpt_lib.merge_params(params, loaded["params"])
        bstats = ckpt_lib.merge_params(bstats, loaded.get("batch_stats", {}))

    n_params = count_params(params["encoder"]) + count_params(params["depth"])
    fn = lambda img: single_frame_disp(bundle, params, bstats, img)
    flops = xla_flops(fn, jnp.ones((1, args.height, args.width, 3), jnp.float32))
    print(f"\n  flops: {flops / 1e9:.2f} G, params: {n_params / 1e6:.2f} M\n")
    return bundle, params, bstats


def predict_disps(args, bundle, params, bstats, images_iter):
    """Run the network over an iterator of (B, H, W, 3) arrays -> (N, H, W)
    scaled disparities, with optional flip post-processing."""
    fn = jax.jit(lambda img: single_frame_disp(bundle, params, bstats, img))
    disps = []
    for img in images_iter:
        n = img.shape[0]
        x = jnp.asarray(img)
        if args.post_process:
            x = jnp.concatenate([x, x[:, :, ::-1]], 0)
        disp = fn(x)
        disp, _ = disp_to_depth(disp, args.min_depth, args.max_depth)
        disp = np.asarray(disp)[..., 0]
        if args.post_process:
            disp = evaluation.batch_post_process_disparity(
                disp[:n], disp[n:][:, :, ::-1]
            )
        disps.append(disp)
    return np.concatenate(disps, 0)


def _color0_iter(loader):
    for batch in loader:
        yield batch["color_0"]


def main(args):
    bundle, params, bstats = load_model(args)
    print(f" Evaluated at resolution {args.height} * {args.width}")
    print(" Post-process is used" if args.post_process else " No post-process")
    if args.use_stereo:
        print(f" Stereo evaluation - scaling by {evaluation.STEREO_SCALE_FACTOR}")
    else:
        print(" Mono evaluation - using median scaling\n")

    if args.kitti_path:
        for split in ("eigen", "eigen_benchmark"):
            print(f" Evaluate on KITTI with {split} split:")
            files = readlines(os.path.join(SPLITS_DIR, "kitti", split, "test_files.txt"))
            ds = KITTIRAWDataset(args.kitti_path, files, args.height, args.width,
                                 [0], 1, is_train=False)
            loader = DataLoader(ds, args.batch_size, num_workers=args.num_workers,
                                drop_last=False)
            gt = np.load(
                os.path.join(SPLITS_DIR, "kitti", split, "gt_depths.npz"),
                fix_imports=True, encoding="latin1", allow_pickle=True,
            )["data"]
            pred = predict_disps(args, bundle, params, bstats, _color0_iter(loader))
            evaluation.evaluate_kitti(pred, gt, split, args.use_stereo)

    if args.make3d_path:
        print(" Evaluate on Make3D:")
        files = readlines(os.path.join(SPLITS_DIR, "make3d", "test_files.txt"))
        ds = Make3DDataset(args.make3d_path, files, (args.height, args.width))
        imgs = (np.stack([ds[i]["color"]]) for i in range(len(ds)))
        gts = [ds[i]["depth"] for i in range(len(ds))]
        pred = predict_disps(args, bundle, params, bstats, imgs)
        evaluation.evaluate_make3d(pred, gts, args.use_stereo)

    if args.nyuv2_path:
        print(" Evaluate on NYU Depth v2:")
        files = readlines(os.path.join(SPLITS_DIR, "nyuv2", "test_files.txt"))
        ds = NYUDataset(args.nyuv2_path, files, args.height, args.width, [0], 1,
                        is_train=False)
        items = [ds.load_test_item(i) for i in range(len(ds))]
        imgs = (np.stack([c])[0][None] for c, _ in items)
        gts = [d for _, d in items]
        pred = predict_disps(args, bundle, params, bstats, imgs)
        evaluation.evaluate_nyuv2(pred, gts)

    if args.cityscapes_path:
        print(" Evaluate on Cityscapes:")
        files = readlines(os.path.join(SPLITS_DIR, "cityscapes", "test_files.txt"))
        ds = CityscapesDataset(args.cityscapes_path, files, args.height, args.width,
                               [0], 1, is_train=False)
        loader = DataLoader(ds, args.batch_size, num_workers=args.num_workers,
                            drop_last=False)
        gt_path = os.path.join(SPLITS_DIR, "cityscapes", "gt_depths")
        gts = [np.load(os.path.join(gt_path, str(i).zfill(3) + "_depth.npy"))
               for i in range(len(ds))]
        pred = predict_disps(args, bundle, params, bstats, _color0_iter(loader))
        evaluation.evaluate_cityscapes(pred, gts, args.use_stereo)


if __name__ == "__main__":
    main(eval_args())
