"""Mono-ViFI TPU: a TPU-native JAX framework for self-supervised single- and
multi-frame monocular depth estimation.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the feature
set of the Mono-ViFI reference (LiuJF1226/Mono-ViFI, ECCV 2024):

- depth backbones: ResNet18/50 (Monodepth2-style), LiteMono, D-HRNet (HRNet18)
- PoseNet (ResNet18 two-frame pose)
- IFRNet video-frame-interpolation networks (large/small) used as frozen
  virtual-frame synthesizers during training
- flow-guided multi-frame fusion module
- photometric view-synthesis losses (SSIM+L1, automasking, edge-aware
  smoothness), SVDC/SADC depth-consistency losses, affine augmentation branch
- KITTI / Cityscapes / NYUv2 / Make3D data pipelines and eval protocols

Everything under `jit` is one fused XLA program; hot custom ops (bilinear
grid-sampling) have Pallas/TPU paths; multi-device scaling uses a
`jax.sharding.Mesh` with a 1-D `data` axis (gradients averaged by XLA
collectives over ICI; BatchNorm statistics are globally batched under GSPMD,
which subsumes the reference's SyncBatchNorm).
"""

__version__ = "0.1.0"
