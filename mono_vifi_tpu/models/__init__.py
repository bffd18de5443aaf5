"""Flax (linen) model zoo: depth backbones, pose network, IFRNet VFI nets,
and the flow-guided multi-frame fusion module. All modules are NHWC."""

from mono_vifi_tpu.models import common, resnet, monodepth2, posenet, ifrnet, fusion
