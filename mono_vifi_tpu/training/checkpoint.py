"""Checkpointing with the reference's schema (train.py:1108-1176).

A checkpoint is a dict keyed by model role (encoder / depth / depth_mf /
encoder_mf / fusion_module / pose_encoder / pose) plus height/width/
use_stereo, epoch / batch_idx / step_in_total, and optimizer state — saved as
a pickle of numpy pytrees (`ckpt.pkl`, plus per-epoch weight-only snapshots
`models/model_{ep}.pkl`). Mid-epoch saves every save_frequency batches give
step-granular resume together with the stateful sampler.

Reference-format .pth checkpoints (released weights) are loaded through
mono_vifi_tpu.convert; loading is key-intersection tolerant like the
reference (train.py:1149-1154).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import jax


def _to_np(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    state,
    cfg,
    epoch: int,
    batch_idx: int = 0,
    extra: dict | None = None,
):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_np(state.params),
        "batch_stats": _to_np(state.batch_stats),
        "opt_state": _to_np(state.opt_state),
        "height": cfg.height,
        "width": cfg.width,
        "use_stereo": cfg.use_stereo,
        "epoch": epoch,
        "batch_idx": batch_idx,
        "step_in_total": int(state.step),
    }
    if extra:
        payload.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def save_weights(path: str, params, cfg, extra: dict | None = None):
    """Per-epoch weight-only snapshot (reference models/model_{ep}.pth)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_np(params),
        "height": cfg.height,
        "width": cfg.width,
        "use_stereo": cfg.use_stereo,
    }
    if extra:
        payload.update(extra)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def merge_params(target: Any, loaded: Any, _path: str = "", _skipped=None):
    """Key-intersection merge (missing keys keep the init values), matching
    reference load_ckpt tolerance (train.py:1149-1154).

    Every key that is NOT taken from the checkpoint (missing, or present with
    a mismatched shape) is logged at WARNING level — a silently-random
    "successful" load of a wrong-backbone checkpoint is a debugging trap.
    """
    import logging

    top = _skipped is None
    if top:
        _skipped = []
    if isinstance(target, dict) and isinstance(loaded, dict):
        out = {}
        for k, v in target.items():
            p = f"{_path}/{k}" if _path else k
            if k in loaded:
                out[k] = merge_params(v, loaded[k], p, _skipped)
            else:
                out[k] = v
                _skipped.append(f"{p} (missing)")
        result = out
    elif loaded is None:
        _skipped.append(f"{_path} (None in checkpoint)")
        result = target
    else:
        loaded = np.asarray(loaded)
        if hasattr(target, "shape") and tuple(target.shape) != tuple(loaded.shape):
            _skipped.append(
                f"{_path} (shape {tuple(loaded.shape)} != {tuple(target.shape)})"
            )
            result = target
        else:
            result = loaded
    if top and _skipped:
        logging.getLogger("mono_vifi_tpu").warning(
            "merge_params: %d keys kept their init values: %s%s",
            len(_skipped),
            ", ".join(_skipped[:12]),
            " ..." if len(_skipped) > 12 else "",
        )
    return result


def load_reference_pth(path: str, cfg, num_levels: int = 5) -> dict:
    """Convert a reference .pth checkpoint dict into our params trees."""
    from mono_vifi_tpu import convert

    ckpt = convert.load_torch_checkpoint(path)
    params: dict = {}
    batch_stats: dict = {}

    def put(role, converted):
        params[role] = converted["params"]
        if converted["batch_stats"]:
            batch_stats[role] = converted["batch_stats"]

    if cfg.backbone in ("ResNet18", "ResNet50"):
        nl = 18 if cfg.backbone == "ResNet18" else 50
        conv_enc = lambda sd: convert.convert_depth_encoder(sd, nl)
        conv_dec = lambda sd: convert.convert_depth_decoder(sd, scales=(0,))
    elif cfg.backbone == "LiteMono":
        conv_enc = convert.convert_litemono_encoder
        conv_dec = lambda sd: convert.convert_litemono_decoder(sd, scales=(0,))
    elif cfg.backbone == "DHRNet":
        conv_enc = convert.convert_hrnet
        conv_dec = convert.convert_dhrnet_decoder
    else:
        raise ValueError(cfg.backbone)

    if "encoder" in ckpt:
        put("encoder", conv_enc(ckpt["encoder"]))
    if "depth" in ckpt:
        put("depth", conv_dec(ckpt["depth"]))
    if "encoder_mf" in ckpt:
        put("encoder_mf", conv_enc(ckpt["encoder_mf"]))
    if "depth_mf" in ckpt:
        put("depth_mf", conv_dec(ckpt["depth_mf"]))
    if "fusion_module" in ckpt:
        put(
            "fusion_module",
            convert.convert_fusion_module(ckpt["fusion_module"], num_levels),
        )
    if "pose_encoder" in ckpt:
        put("pose_encoder", convert.convert_pose_encoder(ckpt["pose_encoder"], 18))
    if "pose" in ckpt:
        put("pose", convert.convert_pose_decoder(ckpt["pose"]))
    if "VFI" in ckpt:
        put("VFI", convert.convert_ifrnet(ckpt["VFI"]))
    return {"params": params, "batch_stats": batch_stats, "raw": ckpt}
