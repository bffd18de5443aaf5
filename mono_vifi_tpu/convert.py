"""PyTorch checkpoint -> Flax parameter conversion.

The reference publishes checkpoints as a single torch dict keyed by model
role (encoder / depth / encoder_mf / depth_mf / fusion_module / pose_encoder /
pose / VFI — reference train.py:1108-1136). This module converts each role's
state_dict into the matching Flax {params, batch_stats} trees, preserving
that schema so released reference checkpoints load directly.

Layout conversions:
  - Conv2d  OIHW -> HWIO
  - ConvTranspose2d (I, O, kH, kW) -> spatially flipped HWIO kernel of the
    equivalent input-dilated conv (see models/common.ConvTranspose4x4)
  - BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
  - PReLU weight -> alpha
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def conv_kernel(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return _t(w).transpose(2, 3, 1, 0)


def conv_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kH, kW) -> flipped HWIO dilated-conv kernel."""
    w = _t(w)
    return np.flip(w, (2, 3)).transpose(2, 3, 0, 1)


class _TreeBuilder:
    """Accumulates params/batch_stats trees addressed by '/'-joined paths."""

    def __init__(self):
        self.params: dict[str, Any] = {}
        self.batch_stats: dict[str, Any] = {}

    def _set(self, tree, path: str, value: np.ndarray):
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def conv(self, sd, torch_prefix: str, flax_path: str, bias: bool | None = None):
        self._set(self.params, f"{flax_path}/kernel", conv_kernel(sd[f"{torch_prefix}.weight"]))
        has_bias = f"{torch_prefix}.bias" in sd if bias is None else bias
        if has_bias:
            self._set(self.params, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))

    def conv_transpose(self, sd, torch_prefix: str, flax_path: str):
        self._set(
            self.params, f"{flax_path}/kernel", conv_transpose_kernel(sd[f"{torch_prefix}.weight"])
        )
        if f"{torch_prefix}.bias" in sd:
            self._set(self.params, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))

    def bn(self, sd, torch_prefix: str, flax_path: str):
        self._set(self.params, f"{flax_path}/scale", _t(sd[f"{torch_prefix}.weight"]))
        self._set(self.params, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))
        self._set(self.batch_stats, f"{flax_path}/mean", _t(sd[f"{torch_prefix}.running_mean"]))
        self._set(self.batch_stats, f"{flax_path}/var", _t(sd[f"{torch_prefix}.running_var"]))

    def prelu(self, sd, torch_prefix: str, flax_path: str):
        self._set(self.params, f"{flax_path}/alpha", _t(sd[f"{torch_prefix}.weight"]))

    def done(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


_RESNET_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
_RESNET_BOTTLENECK = {18: False, 34: False, 50: True}


def _resnet_features(b: _TreeBuilder, sd, tp: str, fp: str, num_layers: int):
    """Map a torchvision-style resnet trunk (reference encoders wrap it as
    `encoder.` — networks/monodepth2.py:28, networks/posenet.py:55-75)."""
    b.conv(sd, f"{tp}conv1", f"{fp}conv1", bias=False)
    b.bn(sd, f"{tp}bn1", f"{fp}bn1")
    bottleneck = _RESNET_BOTTLENECK[num_layers]
    for li, n_blocks in enumerate(_RESNET_BLOCKS[num_layers], start=1):
        for bi in range(n_blocks):
            t = f"{tp}layer{li}.{bi}."
            f = f"{fp}layer{li}_{bi}/"
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                b.conv(sd, f"{t}conv{ci}", f"{f}conv{ci}", bias=False)
                b.bn(sd, f"{t}bn{ci}", f"{f}bn{ci}")
            if f"{t}downsample.0.weight" in sd:
                b.conv(sd, f"{t}downsample.0", f"{f}downsample_conv", bias=False)
                b.bn(sd, f"{t}downsample.1", f"{f}downsample_bn")


def convert_depth_encoder(sd: Mapping[str, Any], num_layers: int = 18):
    b = _TreeBuilder()
    _resnet_features(b, sd, "encoder.", "encoder/", num_layers)
    return b.done()


convert_pose_encoder = convert_depth_encoder


def convert_depth_decoder(sd: Mapping[str, Any], scales=(0,)):
    """Monodepth2 DepthDecoder: ModuleList order is upconv(4,0), upconv(4,1),
    ..., upconv(0,1), then dispconvs (networks/monodepth2.py:59-78)."""
    b = _TreeBuilder()
    idx = 0
    for i in range(4, -1, -1):
        for j in (0, 1):
            b.conv(sd, f"decoder.{idx}.conv.conv", f"upconv_{i}_{j}/conv/conv")
            idx += 1
    for s in scales:
        b.conv(sd, f"decoder.{idx}.conv", f"dispconv_{s}/conv")
        idx += 1
    return b.done()


def convert_pose_decoder(sd: Mapping[str, Any]):
    """PoseDecoder ModuleList order: squeeze, pose_0, pose_1, pose_2
    (networks/posenet.py:107-115)."""
    b = _TreeBuilder()
    b.conv(sd, "net.0", "squeeze")
    b.conv(sd, "net.1", "pose_0")
    b.conv(sd, "net.2", "pose_1")
    b.conv(sd, "net.3", "pose_2")
    return b.done()


def _conv_prelu(b, sd, tp: str, fp: str):
    b.conv(sd, f"{tp}.0", f"{fp}/conv")
    b.prelu(sd, f"{tp}.1", f"{fp}/prelu")


def _resblock(b, sd, tp: str, fp: str):
    for ci in (1, 2, 3, 4):
        _conv_prelu(b, sd, f"{tp}.conv{ci}", f"{fp}/conv{ci}")
    b.conv(sd, f"{tp}.conv5", f"{fp}/conv5")
    b.prelu(sd, f"{tp}.prelu", f"{fp}/prelu")


def convert_ifrnet(sd: Mapping[str, Any]):
    """IFRNet large/small (networks/IFRNet.py:160-370): encoder pyramids are
    Sequential(convrelu, convrelu); decoders are Sequential(convrelu,
    ResBlock, ConvTranspose2d)."""
    b = _TreeBuilder()
    for p in range(1, 5):
        _conv_prelu(b, sd, f"encoder.pyramid{p}.0", f"encoder/pyramid{p}_0")
        _conv_prelu(b, sd, f"encoder.pyramid{p}.1", f"encoder/pyramid{p}_1")
    for d in range(4, 0, -1):
        tp = f"decoder{d}.convblock"
        fp = f"decoder{d}"
        _conv_prelu(b, sd, f"{tp}.0", f"{fp}/conv0")
        _resblock(b, sd, f"{tp}.1", f"{fp}/resblock")
        b.conv_transpose(sd, f"{tp}.2", f"{fp}/up")
    return b.done()


def convert_fusion_module(sd: Mapping[str, Any], num_levels: int = 5):
    """FusionModule: fusion_conv ModuleList is built from level L-1 down to 0
    (networks/fusion_module.py:60-63)."""
    b = _TreeBuilder()
    for idx, level in enumerate(range(num_levels - 1, -1, -1)):
        b.conv(sd, f"fusion_conv.{idx}.conv.conv", f"conv1x1_{level}/conv")
    return b.done()


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint on CPU (requires torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
