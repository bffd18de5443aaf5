"""Multi-frame (fused) depth evaluation (reference evaluate_depth_mf.py).

Loads encoder_mf/depth_mf/fusion_module from a checkpoint plus a frozen
IFRNet (small|large) from --weights_dir, runs VFI flows (onlyFlow) -> 3x
encoder -> fusion -> depth decoder, and evaluates KITTI (eigen +
eigen_benchmark) and/or Cityscapes with the standard protocols.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from mono_vifi_tpu import evaluation
from mono_vifi_tpu.config import Options
from mono_vifi_tpu.data import CityscapesDataset, DataLoader, KITTIRAWDataset
from mono_vifi_tpu.ops.geometry import disp_to_depth
from mono_vifi_tpu.training import checkpoint as ckpt_lib
from mono_vifi_tpu.training.factory import ModelBundle
from mono_vifi_tpu.training.monovifi import multi_frame_disp
from mono_vifi_tpu.utils import readlines, count_params

SPLITS_DIR = os.path.join(os.path.dirname(__file__), "splits")


def eval_args(argv=None):
    p = argparse.ArgumentParser(description="Multi-frame Evaluation Parser")
    p.add_argument("--pretrained_path", type=str)
    p.add_argument("--backbone", type=str, default="ResNet18",
                   choices=["ResNet18", "ResNet50", "LiteMono", "DHRNet"])
    p.add_argument("--vfi_scale", type=str, default="small",
                   choices=["small", "large"])
    p.add_argument("--weights_dir", type=str, default="./weights")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=100.0)
    p.add_argument("--kitti_path", type=str)
    p.add_argument("--cityscapes_path", type=str)
    return p.parse_args(argv)


def load_model(args, dataset_tag: str):
    cfg = Options(backbone=args.backbone, height=args.height, width=args.width,
                  compute_dtype="float32", vfi_scale=args.vfi_scale,
                  fuse_model_type="shared_encoder")
    bundle = ModelBundle(cfg)
    params, bstats = bundle.init_variables(jax.random.PRNGKey(0))
    if args.pretrained_path:
        if args.pretrained_path.endswith(".pth"):
            loaded = ckpt_lib.load_reference_pth(args.pretrained_path, cfg,
                                                 len(bundle.num_ch_enc))
            # multi-frame roles map onto encoder/depth slots
            lp = loaded["params"]
            params = ckpt_lib.merge_params(params, {
                "encoder": lp.get("encoder_mf", lp.get("encoder")),
                "depth": lp.get("depth_mf", lp.get("depth")),
                "depth_mf": lp.get("depth_mf", lp.get("depth")),
                "fusion_module": lp.get("fusion_module"),
            })
            bstats = ckpt_lib.merge_params(bstats, {
                "encoder": loaded["batch_stats"].get(
                    "encoder_mf", loaded["batch_stats"].get("encoder")
                ),
            })
        else:
            loaded = ckpt_lib.load_checkpoint(args.pretrained_path)
            params = ckpt_lib.merge_params(params, loaded["params"])
            bstats = ckpt_lib.merge_params(bstats, loaded.get("batch_stats", {}))

    tag = "S" if args.vfi_scale == "small" else "L"
    vfi_path = os.path.join(args.weights_dir, f"IFRNet_{tag}_{dataset_tag}.pth")
    if os.path.exists(vfi_path):
        from mono_vifi_tpu.convert import load_torch_checkpoint, convert_ifrnet

        print(f"-> Loading frozen VFI from {vfi_path}")
        vfi = convert_ifrnet(load_torch_checkpoint(vfi_path)["VFI"])["params"]
    else:
        print(f"!! VFI weights not found at {vfi_path}; using random init")
        vfi = bundle.init_vfi(
            jax.random.PRNGKey(7), "test" if args.vfi_scale == "small" else "train"
        )
    # the eval-time VFI module must match the requested scale
    if args.vfi_scale == "large":
        bundle.vfi_test = bundle.vfi_train
    n = sum(count_params(params[r]) for r in ("encoder", "depth_mf", "fusion_module"))
    print(f"  depth+fusion params: {n / 1e6:.2f} M")

    # FLOPs report with per-video amortization (reference
    # evaluate_depth_mf.py:136-156): in streaming video each frame is
    # encoded once, so the 3x-encoder cost amortizes to 1x + VFI + fusion.
    from mono_vifi_tpu.utils import xla_flops
    import jax.numpy as jnp
    import jax

    img = jnp.ones((1, args.height, args.width, 3), jnp.float32)
    embt = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    enc_fn = lambda x: bundle.encoder.apply(
        {"params": params["encoder"], "batch_stats": bstats["encoder"]}, x,
        train=False,
    )[-1]
    vfi_fn = lambda a, b: bundle.vfi_test.apply(
        {"params": vfi}, a, b, embt, only_flow=True
    )["flow0"]
    f_enc = xla_flops(enc_fn, img)
    f_vfi = xla_flops(vfi_fn, img, img)
    full_fn = lambda a, b, c: multi_frame_disp(bundle, params, bstats, vfi, a, b, c)
    f_full = xla_flops(full_fn, img, img, img)
    if f_full > 0 and f_enc > 0:
        amortized = f_full - 2 * f_enc
        print(
            f"  flops: full {f_full / 1e9:.2f} G | encoder {f_enc / 1e9:.2f} G | "
            f"VFI(onlyFlow) {f_vfi / 1e9:.2f} G | amortized/frame "
            f"{amortized / 1e9:.2f} G"
        )
    return bundle, params, bstats, vfi


def predict_disps_mf(args, bundle, params, bstats, vfi, loader):
    fn = jax.jit(
        lambda a, b, c: multi_frame_disp(bundle, params, bstats, vfi, a, b, c)
    )
    disps = []
    for batch in loader:
        disp = fn(
            jnp.asarray(batch["color_n1"]),
            jnp.asarray(batch["color_0"]),
            jnp.asarray(batch["color_p1"]),
        )
        disp, _ = disp_to_depth(disp, args.min_depth, args.max_depth)
        disps.append(np.asarray(disp)[..., 0])
    return np.concatenate(disps, 0)


def main(args):
    if args.kitti_path:
        bundle, params, bstats, vfi = load_model(args, "KITTI")
        for split in ("eigen", "eigen_benchmark"):
            print(f" Evaluate on KITTI (multi-frame) with {split} split:")
            files = readlines(os.path.join(SPLITS_DIR, "kitti", split, "test_files.txt"))
            ds = KITTIRAWDataset(args.kitti_path, files, args.height, args.width,
                                 [0, -1, 1], 1, is_train=False)
            loader = DataLoader(ds, args.batch_size, num_workers=args.num_workers,
                                drop_last=False)
            gt = np.load(
                os.path.join(SPLITS_DIR, "kitti", split, "gt_depths.npz"),
                fix_imports=True, encoding="latin1", allow_pickle=True,
            )["data"]
            pred = predict_disps_mf(args, bundle, params, bstats, vfi, loader)
            evaluation.evaluate_kitti(pred, gt, split, use_stereo=False)

    if args.cityscapes_path:
        bundle, params, bstats, vfi = load_model(args, "CS")
        print(" Evaluate on Cityscapes (multi-frame):")
        files = readlines(os.path.join(SPLITS_DIR, "cityscapes", "test_files.txt"))
        ds = CityscapesDataset(args.cityscapes_path, files, args.height,
                               args.width, [0, -1, 1], 1, is_train=False)
        loader = DataLoader(ds, args.batch_size, num_workers=args.num_workers,
                            drop_last=False)
        gt_path = os.path.join(SPLITS_DIR, "cityscapes", "gt_depths")
        gts = [np.load(os.path.join(gt_path, str(i).zfill(3) + "_depth.npy"))
               for i in range(len(ds))]
        pred = predict_disps_mf(args, bundle, params, bstats, vfi, loader)
        evaluation.evaluate_cityscapes(pred, gts, use_stereo=False)


if __name__ == "__main__":
    main(eval_args())
