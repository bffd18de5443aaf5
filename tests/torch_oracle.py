"""Tiny PyTorch-CPU oracles used by the tests to pin down the exact reference
semantics (grid_sample / interpolate / SSIM / pose math as used by
LiuJF1226/Mono-ViFI). These are test fixtures, not framework code.
"""

import numpy as np
import torch
import torch.nn.functional as F


def to_torch_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def to_np_nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.moveaxis(x_nchw.detach().numpy(), 1, -1)


def grid_sample(img_nhwc, grid, padding_mode="border", align_corners=True):
    img = to_torch_nchw(img_nhwc)
    g = torch.from_numpy(grid)
    out = F.grid_sample(
        img, g, mode="bilinear", padding_mode=padding_mode, align_corners=align_corners
    )
    return to_np_nhwc(out)


def interpolate(x_nhwc, size, mode="bilinear", align_corners=False):
    x = to_torch_nchw(x_nhwc)
    if mode == "nearest":
        out = F.interpolate(x, size=size, mode="nearest")
    else:
        out = F.interpolate(x, size=size, mode=mode, align_corners=align_corners)
    return to_np_nhwc(out)


def ssim_map(x_nhwc, y_nhwc):
    """SSIM loss map exactly as reference layers.py:261-290."""
    x = F.pad(to_torch_nchw(x_nhwc), (1, 1, 1, 1), mode="reflect")
    y = F.pad(to_torch_nchw(y_nhwc), (1, 1, 1, 1), mode="reflect")
    pool = torch.nn.AvgPool2d(3, 1)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x**2) - mu_x**2
    sigma_y = pool(y**2) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return to_np_nhwc(torch.clamp((1 - n / d) / 2, 0, 1))


def pose_from_axisangle(vec_np, trans_np, invert=False):
    """Reference layers.py:28-103 semantics."""
    vec = torch.from_numpy(vec_np)[:, None, :]  # B x 1 x 3
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    t = torch.from_numpy(trans_np).clone()
    R = rot
    if invert:
        R = R.transpose(1, 2)
        t = -t
    T = torch.zeros(t.shape[0], 4, 4)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, :3, 3] = t
    return (torch.matmul(R, T) if invert else torch.matmul(T, R)).numpy()


def reprojection_grid(depth_np, K_np, invK_np, T_np, eps=1e-7):
    """Reference BackprojectDepth + Project3D (layers.py:168-222)."""
    B, H, W = depth_np.shape
    depth = torch.from_numpy(depth_np)
    K = torch.from_numpy(K_np)
    invK = torch.from_numpy(invK_np)
    T = torch.from_numpy(T_np)

    mesh = np.meshgrid(range(W), range(H), indexing="xy")
    idc = torch.from_numpy(np.stack(mesh, 0).astype(np.float32))
    ones = torch.ones(B, 1, H * W)
    pix = torch.cat(
        [torch.stack([idc[0].view(-1), idc[1].view(-1)], 0)[None].repeat(B, 1, 1), ones], 1
    )
    cam = torch.matmul(invK[:, :3, :3], pix)
    cam = depth.view(B, 1, -1) * cam
    cam = torch.cat([cam, ones], 1)

    P = torch.matmul(K, T)[:, :3, :]
    cp = torch.matmul(P, cam)
    pc = cp[:, :2, :] / (cp[:, 2, :].unsqueeze(1) + eps)
    pc = pc.view(B, 2, H, W).permute(0, 2, 3, 1)
    pc[..., 0] /= W - 1
    pc[..., 1] /= H - 1
    return ((pc - 0.5) * 2).numpy()
