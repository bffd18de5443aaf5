"""ImageNet-pretrained encoder initialization (weights_init="pretrained").

The reference trains every depth/pose encoder from ImageNet weights:
  - ResNet18/50 depth encoder: torchvision ImageNet state_dict
    (networks/monodepth2.py:28 `resnets[num_layers](pretrained)`),
  - pose encoder: torchvision ResNet18 with conv1 weights tiled over the
    6-channel two-frame input and halved (networks/posenet.py:47-50),
  - D-HRNet: ./weights/HRNet_W18_C_cosinelr_cutmix_300epoch.pth.tar,
    key-intersection filtered (networks/hrnet_encoder.py:504-509),
  - LiteMono: ./weights/lite-mono-pretrain.pth ['model'], excluding
    'norm*'-prefixed keys (train.py:156-164).

This module replicates that from local files in cfg.weights_dir (this
environment has no network; the torchvision download becomes "drop
resnet{18,50}.pth in weights_dir"). Missing files are logged and skipped —
training proceeds from random init, matching the reference's behavior when
pretrained=False.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from mono_vifi_tpu import convert
from mono_vifi_tpu.training.checkpoint import merge_params

log = logging.getLogger("mono_vifi_tpu")

# filenames searched in cfg.weights_dir, per reference provenance above
IMAGENET_FILES = {
    "ResNet18": "resnet18.pth",
    "ResNet50": "resnet50.pth",
    "DHRNet": "HRNet_W18_C_cosinelr_cutmix_300epoch.pth.tar",
    "LiteMono": "lite-mono-pretrain.pth",
}


def _load(path: str):
    return convert.load_torch_checkpoint(path)


def _convert_resnet_trunk(raw: dict, num_layers: int):
    """Raw torchvision state_dict (conv1.weight, layer1.0...) -> our trees."""
    sd = {f"encoder.{k}": v for k, v in raw.items()}
    return convert.convert_depth_encoder(sd, num_layers)


def pose_conv1_from_imagenet(w, num_input_images: int = 2) -> np.ndarray:
    """Reference posenet.py:47-50: tile the (64, 3, 7, 7) ImageNet conv1
    kernel across the stacked input frames and divide by their count."""
    w = np.asarray(w, np.float32)
    return np.concatenate([w] * num_input_images, axis=1) / num_input_images


def load_encoder_imagenet(cfg) -> dict | None:
    """Converted {params, batch_stats} for the depth encoder, or None."""
    path = os.path.join(cfg.weights_dir, IMAGENET_FILES[cfg.backbone])
    if not os.path.exists(path):
        log.warning(
            "weights_init=pretrained but %s not found — %s encoder keeps "
            "random init (reference would use ImageNet weights)",
            path, cfg.backbone,
        )
        return None
    raw = _load(path)
    if cfg.backbone in ("ResNet18", "ResNet50"):
        nl = 18 if cfg.backbone == "ResNet18" else 50
        return _convert_resnet_trunk(raw, nl)
    if cfg.backbone == "DHRNet":
        # raw HRNet classification ckpt: backbone keys unprefixed; extra
        # classifier/incre heads are simply never read by the converter
        return convert.convert_hrnet(raw, prefix="")
    if cfg.backbone == "LiteMono":
        sd = raw.get("model", raw)
        sd = {k: v for k, v in sd.items() if not k.startswith("norm")}
        return convert.convert_litemono_encoder(sd)
    raise ValueError(cfg.backbone)


def load_pose_encoder_imagenet(cfg) -> dict | None:
    """Converted pose-encoder trees (6-ch conv1 averaging trick), or None."""
    nl = cfg.num_layers
    path = os.path.join(cfg.weights_dir, f"resnet{nl}.pth")
    if not os.path.exists(path):
        log.warning(
            "weights_init=pretrained but %s not found — pose encoder keeps "
            "random init", path,
        )
        return None
    raw = dict(_load(path))
    raw["conv1.weight"] = pose_conv1_from_imagenet(raw["conv1.weight"], 2)
    return _convert_resnet_trunk(raw, nl)


def apply_pretrained(cfg, params: dict, batch_stats: dict) -> tuple[dict, dict]:
    """Merge ImageNet weights into freshly-initialized trees (in the roles
    the reference pretrains: encoder[, encoder_mf], pose_encoder)."""
    if cfg.weights_init != "pretrained":
        return params, batch_stats

    enc = load_encoder_imagenet(cfg)
    if enc is not None:
        for role in ("encoder", "encoder_mf"):
            if role in params:
                params[role] = merge_params(params[role], enc["params"])
            if role in batch_stats and enc["batch_stats"]:
                batch_stats[role] = merge_params(
                    batch_stats[role], enc["batch_stats"]
                )
        log.info("loaded ImageNet weights into depth encoder(s)")

    if "pose_encoder" in params:
        pe = load_pose_encoder_imagenet(cfg)
        if pe is not None:
            params["pose_encoder"] = merge_params(
                params["pose_encoder"], pe["params"]
            )
            if pe["batch_stats"]:
                batch_stats["pose_encoder"] = merge_params(
                    batch_stats["pose_encoder"], pe["batch_stats"]
                )
            log.info("loaded ImageNet weights into pose encoder")

    return params, batch_stats
