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


def linear_kernel(w) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return _t(w).T


def _vector(b: _TreeBuilder, sd, torch_key: str, flax_path: str):
    b._set(b.params, flax_path, _t(sd[torch_key]))


def _layernorm(b: _TreeBuilder, sd, tp: str, fp: str):
    b._set(b.params, f"{fp}/scale", _t(sd[f"{tp}.weight"]))
    b._set(b.params, f"{fp}/bias", _t(sd[f"{tp}.bias"]))


def _dense(b: _TreeBuilder, sd, tp: str, fp: str):
    b._set(b.params, f"{fp}/kernel", linear_kernel(sd[f"{tp}.weight"]))
    if f"{tp}.bias" in sd:
        b._set(b.params, f"{fp}/bias", _t(sd[f"{tp}.bias"]))


# ------------------------------------------------------------------ LiteMono

_LITEMONO_DEPTH = {"lite-mono": (4, 4, 10), "lite-mono-small": (4, 4, 7),
                   "lite-mono-tiny": (4, 4, 7), "lite-mono-8m": (4, 4, 10)}


def convert_litemono_encoder(sd: Mapping[str, Any], model: str = "lite-mono"):
    """LiteMono encoder (networks/LiteMono.py:296-444): stem convs,
    downsample layers, CDC (DilatedConv) and LGFI blocks."""
    b = _TreeBuilder()
    for k in range(3):
        b.conv(sd, f"downsample_layers.0.{k}.conv", f"stem1_{k}/conv", bias=False)
        b.bn(sd, f"downsample_layers.0.{k}.bn_gelu.bn", f"stem1_{k}/bn")
    b.conv(sd, "stem2.0.conv", "stem2/conv", bias=False)
    for i in (1, 2):
        b.conv(sd, f"downsample_layers.{i}.0.conv", f"downsample{i}/conv", bias=False)

    depth = _LITEMONO_DEPTH[model]
    for i in range(3):
        for j in range(depth[i]):
            tp = f"stages.{i}.{j}"
            fp = f"stage{i}_{j}"
            if f"{tp}.ddwconv.conv.weight" in sd:  # DilatedConv block
                b.conv(sd, f"{tp}.ddwconv.conv", f"{fp}/ddwconv", bias=False)
                b.bn(sd, f"{tp}.bn1", f"{fp}/bn1")
                _layernorm(b, sd, f"{tp}.norm", f"{fp}/mlp/norm")
                _dense(b, sd, f"{tp}.pwconv1", f"{fp}/mlp/pwconv1")
                _dense(b, sd, f"{tp}.pwconv2", f"{fp}/mlp/pwconv2")
                _vector(b, sd, f"{tp}.gamma", f"{fp}/mlp/gamma")
            else:  # LGFI block
                if f"{tp}.pos_embd.token_projection.weight" in sd:
                    w = _t(sd[f"{tp}.pos_embd.token_projection.weight"])  # (C,64,1,1)
                    b._set(b.params, f"{fp}/pos_proj/kernel", w[:, :, 0, 0].T)
                    b._set(
                        b.params, f"{fp}/pos_proj/bias",
                        _t(sd[f"{tp}.pos_embd.token_projection.bias"]),
                    )
                _layernorm(b, sd, f"{tp}.norm_xca", f"{fp}/norm_xca")
                _vector(b, sd, f"{tp}.gamma_xca", f"{fp}/gamma_xca")
                _vector(b, sd, f"{tp}.xca.temperature", f"{fp}/xca/temperature")
                _dense(b, sd, f"{tp}.xca.qkv", f"{fp}/xca/qkv")
                _dense(b, sd, f"{tp}.xca.proj", f"{fp}/xca/proj")
                _layernorm(b, sd, f"{tp}.norm", f"{fp}/mlp/norm")
                _dense(b, sd, f"{tp}.pwconv1", f"{fp}/mlp/pwconv1")
                _dense(b, sd, f"{tp}.pwconv2", f"{fp}/mlp/pwconv2")
                _vector(b, sd, f"{tp}.gamma", f"{fp}/mlp/gamma")
    return b.done()


def convert_litemono_decoder(sd: Mapping[str, Any], scales=(0,)):
    """LiteMono decoder: ModuleList order upconv(2,0)..upconv(0,1), dispconvs
    (networks/LiteMono.py:460-478)."""
    b = _TreeBuilder()
    idx = 0
    for i in range(2, -1, -1):
        for j in (0, 1):
            b.conv(sd, f"decoder.{idx}.conv.conv", f"upconv_{i}_{j}/conv/conv")
            idx += 1
    for s in scales:
        b.conv(sd, f"decoder.{idx}.conv", f"dispconv_{s}/conv")
        idx += 1
    return b.done()


# --------------------------------------------------------------------- HRNet

_HRNET_STAGES = {  # (num_modules, num_branches, blocks)
    "hrnet18": ((1, 2, 4), (4, 3, 4), (3, 4, 4)),
}


def convert_hrnet(sd: Mapping[str, Any], prefix: str = "encoder.",
                  arch: str = "hrnet18"):
    """HRNet trunk (networks/hrnet_encoder.py:294-498)."""
    b = _TreeBuilder()
    fp0 = "encoder/"
    b.conv(sd, f"{prefix}conv1", f"{fp0}conv1", bias=False)
    b.bn(sd, f"{prefix}bn1", f"{fp0}bn1")
    b.conv(sd, f"{prefix}conv2", f"{fp0}conv2", bias=False)
    b.bn(sd, f"{prefix}bn2", f"{fp0}bn2")

    # stage 1 bottlenecks
    for k in range(4):
        tp = f"{prefix}layer1.{k}."
        fp = f"{fp0}layer1_{k}/"
        for ci in (1, 2, 3):
            b.conv(sd, f"{tp}conv{ci}", f"{fp}conv{ci}", bias=False)
            b.bn(sd, f"{tp}bn{ci}", f"{fp}bn{ci}")
        if f"{tp}downsample.0.weight" in sd:
            b.conv(sd, f"{tp}downsample.0", f"{fp}downsample_conv", bias=False)
            b.bn(sd, f"{tp}downsample.1", f"{fp}downsample_bn")

    stage_specs = _HRNET_STAGES[arch]
    for s_idx, (num_modules, n_br, n_blocks) in zip((2, 3, 4), stage_specs):
        t = s_idx - 1
        # transitions
        for i in range(n_br):
            direct = f"{prefix}transition{t}.{i}.0.weight"
            if direct in sd:
                b.conv(sd, f"{prefix}transition{t}.{i}.0",
                       f"{fp0}transition{t}_{i}/conv", bias=False)
                b.bn(sd, f"{prefix}transition{t}.{i}.1",
                     f"{fp0}transition{t}_{i}/bn")
            else:  # chain of Sequentials (new branches)
                j = 0
                while f"{prefix}transition{t}.{i}.{j}.0.weight" in sd:
                    b.conv(sd, f"{prefix}transition{t}.{i}.{j}.0",
                           f"{fp0}transition{t}_{i}_{j}/conv", bias=False)
                    b.bn(sd, f"{prefix}transition{t}.{i}.{j}.1",
                         f"{fp0}transition{t}_{i}_{j}/bn")
                    j += 1
        # modules
        for m in range(num_modules):
            mp = f"{prefix}stage{s_idx}.{m}."
            fpm = f"{fp0}stage{s_idx}_{m}/"
            for i in range(n_br):
                for k in range(n_blocks):
                    tp = f"{mp}branches.{i}.{k}."
                    fp = f"{fpm}branch{i}_{k}/"
                    for ci in (1, 2):
                        b.conv(sd, f"{tp}conv{ci}", f"{fp}conv{ci}", bias=False)
                        b.bn(sd, f"{tp}bn{ci}", f"{fp}bn{ci}")
            for i in range(n_br):
                for j in range(n_br):
                    if j == i:
                        continue
                    if j > i:
                        key = f"{mp}fuse_layers.{i}.{j}.0.weight"
                        if key in sd:
                            b.conv(sd, f"{mp}fuse_layers.{i}.{j}.0",
                                   f"{fpm}fuse_{i}_{j}_conv", bias=False)
                            b.bn(sd, f"{mp}fuse_layers.{i}.{j}.1",
                                 f"{fpm}fuse_{i}_{j}_bn")
                    else:
                        for k in range(i - j):
                            b.conv(sd, f"{mp}fuse_layers.{i}.{j}.{k}.0",
                                   f"{fpm}fuse_{i}_{j}_{k}/conv", bias=False)
                            b.bn(sd, f"{mp}fuse_layers.{i}.{j}.{k}.1",
                                 f"{fpm}fuse_{i}_{j}_{k}/bn")
    return b.done()


def convert_dhrnet_decoder(sd: Mapping[str, Any]):
    """D-HRNet decoder (networks/DHRNet.py:36-68): ModuleList order of the
    OrderedDict insertions."""
    order = [
        "parallel_0_1", "parallel_0_2", "parallel_0_3", "parallel_0_4",
        "conv1x1_0_21", "conv1x1_0_32", "conv1x1_0_31",
        "conv1x1_0_43", "conv1x1_0_42", "conv1x1_0_41",
        "parallel_1_1", "parallel_1_2", "parallel_1_3",
        "conv1x1_1_21", "conv1x1_1_32", "conv1x1_1_31",
        "parallel_2_1", "parallel_2_2", "conv1x1_2_21",
        "parallel_3_0", "parallel_3_1", "conv1x1_3_10",
        "parallel_4_0", "parallel_5_0", "dispconv_0",
    ]
    b = _TreeBuilder()
    for idx, name in enumerate(order):
        if name.startswith("dispconv"):
            b.conv(sd, f"decoder.{idx}.conv", f"{name}/conv")
        elif name.startswith("conv1x1"):
            # flax ConvBlock1x1 nests one level less than torch's
            b.conv(sd, f"decoder.{idx}.conv.conv", f"{name}/conv")
        else:
            b.conv(sd, f"decoder.{idx}.conv.conv", f"{name}/conv/conv")
    return b.done()


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint on CPU (requires torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
