"""TPU-native compute ops: geometry, sampling, resizing, losses, metrics.

Layout convention: images and feature maps are NHWC (TPU-native); the channel
dimension is minor-most so it lands on the 128-wide lane dimension of the VPU
and feeds conv/matmul MXU tiles without transposes.
"""

from mono_vifi_tpu.ops.geometry import (
    disp_to_depth,
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
    reprojection_grid,
    conjugate_pose,
)
from mono_vifi_tpu.ops.sampling import grid_sample, warp
from mono_vifi_tpu.ops.image import (
    resize_bilinear,
    upsample_nearest,
    avg_pool_3x3,
    reflect_pad_2d,
)
from mono_vifi_tpu.ops.losses import (
    ssim,
    reprojection_loss,
    smooth_loss,
    si_log_depth_loss,
    charbonnier_l1,
    charbonnier_ada,
    ternary_loss,
    geometry_loss,
    get_robust_weight,
)
from mono_vifi_tpu.ops.metrics import compute_depth_errors
