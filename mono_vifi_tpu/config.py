"""Experiment configuration: every reference flag (options.py:1-226), backed
by a dataclass + a configargparse-compatible parser (`key = value` txt config
files with CLI overrides). The reference's DDP rank flags are replaced by the
JAX process/mesh model (config.num_devices; multi-host via
jax.distributed.initialize happens in the driver scripts).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


@dataclass
class Options:
    # paths
    config: str | None = None
    data_path: str = "kitti_data"
    data_path_pre: str | None = None
    log_dir: str = "logs"

    # training
    exp_name: str = "mdp"
    split: str = "eigen_zhou"
    eval_split: str = "eigen"
    num_layers: int = 18
    dataset: str = "kitti"
    jpg: bool = False
    height: int = 192
    width: int = 640
    disparity_smoothness: float = 1e-3
    num_scales: int = 1
    min_depth: float = 0.1
    max_depth: float = 100.0
    lamda: float = 0.2
    use_stereo: bool = False
    frame_ids: Sequence[int] = (0, -1, 1)

    # optimization
    optimizer: str = "adamw"
    lr_sche_type: str = "step"
    eta_min: float = 5e-6
    batch_size: int = 12
    learning_rate: float = 1e-4
    decay_rate: float = 0.1
    decay_step: Sequence[int] = (15,)
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    momentum: float = 0.9
    clip_grad: float = 5.0
    num_epochs: int = 20
    seed: int = 1234
    resume: bool = False

    # ablation / model
    avg_reprojection: bool = False
    disable_automasking: bool = False
    no_ssim: bool = False
    weights_init: str = "pretrained"
    backbone: str = "ResNet18"
    vfi_scale: str = "small"
    fuse_model_type: str = "shared_encoder"
    use_affine: bool = False
    doj_mask: bool = False  # load Cityscapes dynamic-object masks into the
    # batch (reference datasets/mono_dataset.py:171-186 — dataset-level only
    # in the reference; the trainer there never consumes them)
    mask_dir: str = ""  # doj mask directory (reference hardcodes ./train_mask)
    use_smooth_dyn: bool = False  # use doj-weighted smoothness
    # (reference layers.py:244-258 get_smooth_loss_dyn, unused by the
    # reference trainer) on frame-0 targets when doj masks are in the batch

    # system
    num_workers: int = 16
    pretrained_path: str | None = None
    log_frequency: int = 500
    save_frequency: int = 500

    # TPU-specific (new)
    num_devices: int = 0  # 0 = all local devices
    compute_dtype: str = "bfloat16"  # conv compute dtype; params stay f32
    weights_dir: str = "./weights"  # frozen VFI / pretrained encoder weights
    profile_steps: int = 0  # >0: capture a jax.profiler trace of N steps
    debug_nans: bool = False  # enable jax nan-checking (slow; debugging aid)
    encoder_remat: bool = False  # rematerialize the fused encoder pass in
    # backward (saves HBM at ~1 extra encoder forward/step; enable for HR)
    fast_warp: bool = True  # windowed Pallas warp for training-time image
    # warps (TPU only; see ops/pallas/warp.py exactness contract)
    vfi_train_scale: str = "large"  # frozen training-VFI variant
    # (reference hardcodes large: train.py:210-214); "tiny" exists for
    # fast-compiling dryruns/tests only
    vfi_test_scale: str = "small"  # frozen eval-VFI variant (train.py:216-221)
    distributed: bool = False  # multi-host: call jax.distributed.initialize()

    @property
    def use_pose_net(self) -> bool:
        return not (self.use_stereo and tuple(self.frame_ids) == (0,))


_BOOL_FIELDS = {
    "jpg", "use_stereo", "resume", "avg_reprojection", "disable_automasking",
    "no_ssim", "use_affine", "debug_nans", "fast_warp", "encoder_remat",
    "doj_mask", "use_smooth_dyn", "distributed",
}
_LIST_INT_FIELDS = {"frame_ids", "decay_step"}


def _parse_value(name: str, raw: str, target_type):
    raw = raw.strip()
    if name in _BOOL_FIELDS:
        return raw.lower() in ("1", "true", "yes")
    if name in _LIST_INT_FIELDS:
        return tuple(int(v) for v in raw.replace(",", " ").split())
    if target_type is int:
        return int(raw)
    if target_type is float:
        return float(raw)
    return raw


def load_config_file(path: str) -> dict:
    """Parse a `key = value` config txt (reference configs/*/*.txt format)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def parse_options(argv: Sequence[str] | None = None) -> Options:
    """-c config.txt plus --flag overrides, configargparse-style."""
    fields = {f.name: f for f in dataclasses.fields(Options)}
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("-c", "--config", default=None)
    ns, rest = pre.parse_known_args(argv)

    opts = Options()
    if ns.config:
        opts.config = ns.config
        for k, v in load_config_file(ns.config).items():
            if k not in fields:
                continue
            setattr(opts, k, _parse_value(k, v, type(getattr(opts, k))))

    parser = argparse.ArgumentParser(description="Mono-ViFI TPU options")
    parser.add_argument("-c", "--config", default=None)
    for name, f in fields.items():
        if name == "config":
            continue
        default = getattr(opts, name)
        if name in _BOOL_FIELDS:
            parser.add_argument(f"--{name}", default=default, type=str)
        elif name in _LIST_INT_FIELDS:
            parser.add_argument(f"--{name}", nargs="+", type=int, default=default)
        else:
            t = type(f.default) if f.default is not None else str
            if f.default is None:
                t = str
            parser.add_argument(f"--{name}", type=t, default=default)
    ns2 = parser.parse_args(rest)
    for name in fields:
        if name == "config":
            continue
        v = getattr(ns2, name)
        if name in _BOOL_FIELDS and isinstance(v, str):
            v = v.lower() in ("1", "true", "yes")
        if name in _LIST_INT_FIELDS and v is not None:
            v = tuple(v)
        setattr(opts, name, v)
    return opts
