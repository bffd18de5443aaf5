"""Numerical parity tests for core ops against PyTorch-CPU oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mono_vifi_tpu.ops import geometry, sampling, image, losses, metrics
from tests import torch_oracle as oracle

RNG = np.random.default_rng(0)


def rand(*shape, lo=0.0, hi=1.0):
    return (lo + (hi - lo) * RNG.random(shape)).astype(np.float32)


# ---------------------------------------------------------------- grid_sample


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    img = rand(2, 9, 13, 3)
    # include far out-of-range coords
    grid = rand(2, 7, 11, 2, lo=-1.6, hi=1.6)
    ours = sampling.grid_sample(
        jnp.asarray(img), jnp.asarray(grid), padding_mode, align_corners
    )
    ref = oracle.grid_sample(img, grid, padding_mode, align_corners)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_grid_sample_gradients_match_torch():
    import torch
    import torch.nn.functional as F

    img = rand(1, 6, 8, 2)
    grid = rand(1, 5, 7, 2, lo=-1.2, hi=1.2)

    def loss_jax(i, g):
        out = sampling.grid_sample(i, g, "border", True)
        return jnp.sum(out * out)

    gi, gg = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    ti = oracle.to_torch_nchw(img).requires_grad_(True)
    tg = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(ti, tg, mode="bilinear", padding_mode="border", align_corners=True)
    (out * out).sum().backward()

    np.testing.assert_allclose(np.asarray(gi), oracle.to_np_nhwc(ti.grad), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), tg.grad.numpy(), atol=1e-4)


def test_warp_matches_reference_formula():
    import torch
    import torch.nn.functional as F

    img = rand(2, 8, 12, 3)
    flow = rand(2, 8, 12, 2, lo=-3.0, hi=3.0)
    ours = np.asarray(sampling.warp(jnp.asarray(img), jnp.asarray(flow)))

    # reference networks/IFRNet.py:7-15
    timg = oracle.to_torch_nchw(img)
    tflow = oracle.to_torch_nchw(flow)
    B, _, H, W = tflow.shape
    xx = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(B, -1, H, -1)
    yy = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(B, -1, -1, W)
    grid = torch.cat([xx, yy], 1)
    flow_ = torch.cat(
        [tflow[:, 0:1] / ((W - 1.0) / 2.0), tflow[:, 1:2] / ((H - 1.0) / 2.0)], 1
    )
    ref = F.grid_sample(
        timg, (grid + flow_).permute(0, 2, 3, 1),
        mode="bilinear", padding_mode="border", align_corners=True,
    )
    np.testing.assert_allclose(ours, oracle.to_np_nhwc(ref), atol=1e-5)


# --------------------------------------------------------------------- resize


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(5, 9), (12, 20), (8, 12), (17, 3)])
def test_resize_bilinear_matches_torch(align_corners, size):
    x = rand(2, 8, 12, 3)
    ours = image.resize_bilinear(jnp.asarray(x), size, align_corners)
    ref = oracle.interpolate(x, size, "bilinear", align_corners)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_upsample_nearest_matches_torch():
    x = rand(2, 5, 7, 4)
    ours = image.upsample_nearest(jnp.asarray(x), 2)
    ref = oracle.interpolate(x, (10, 14), "nearest")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)


def test_max_pool_matches_torch():
    import torch.nn.functional as F

    x = rand(2, 9, 11, 3, lo=-1, hi=1)
    ours = image.max_pool_3x3_s2_p1(jnp.asarray(x))
    ref = oracle.to_np_nhwc(
        F.max_pool2d(oracle.to_torch_nchw(x), kernel_size=3, stride=2, padding=1)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)


# --------------------------------------------------------------------- losses


def test_ssim_matches_reference():
    x, y = rand(2, 8, 10, 3), rand(2, 8, 10, 3)
    ours = losses.ssim(jnp.asarray(x), jnp.asarray(y))
    ref = oracle.ssim_map(x, y)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_smooth_loss_matches_reference():
    import torch

    disp, img = rand(2, 8, 10, 1), rand(2, 8, 10, 3)
    ours = float(losses.smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    # reference layers.py:231-242
    d, i = oracle.to_torch_nchw(disp), oracle.to_torch_nchw(img)
    gdx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gdy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    gix = torch.mean(torch.abs(i[:, :, :, :-1] - i[:, :, :, 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(i[:, :, :-1, :] - i[:, :, 1:, :]), 1, keepdim=True)
    ref = (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()
    assert abs(ours - float(ref)) < 1e-6


def test_si_log_depth_loss_matches_reference():
    import torch

    pred, tgt = rand(2, 6, 8, 1, lo=0.5, hi=5), rand(2, 6, 8, 1, lo=0.5, hi=5)
    mask = (rand(2, 6, 8, 1) > 0.3).astype(np.float32)
    ours = float(
        losses.si_log_depth_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
    )
    # reference train.py:924-941
    p, t, m = (oracle.to_torch_nchw(a) for a in (pred, tgt, mask))
    mm = m[:, 0]
    lp = torch.log(p[:, 0] + 1e-7) * mm
    lt = torch.log(t[:, 0] + 1e-7) * mm
    diff = lp - lt
    valid = mm.sum(1).sum(1) + 1e-8
    ref = (diff**2).sum(1).sum(1) / valid - 0.5 * (diff.sum(1).sum(1)) ** 2 / valid**2
    assert abs(ours - float(ref.mean())) < 1e-6


def test_charbonnier_and_robust_weight():
    diff = rand(2, 6, 8, 3, lo=-1, hi=1)
    v = float(losses.charbonnier_l1(jnp.asarray(diff)))
    ref = float(np.mean(np.sqrt(diff.astype(np.float64) ** 2 + 1e-6)))
    assert abs(v - ref) < 1e-6

    w = rand(2, 6, 8, 1, lo=0.1, hi=1.0)
    v = float(losses.charbonnier_ada(jnp.asarray(diff[..., :1]), jnp.asarray(w)))
    alpha = w / 2
    eps = 10 ** (-(10 * w - 1) / 3)
    ref = float(np.mean((diff[..., :1] ** 2 + eps**2) ** alpha))
    assert abs(v - ref) < 1e-5

    fp, fg = rand(1, 4, 4, 2), rand(1, 4, 4, 2)
    rw = np.asarray(losses.get_robust_weight(jnp.asarray(fp), jnp.asarray(fg), 0.3))
    ref = np.exp(-0.3 * np.sqrt(np.sum((fp - fg) ** 2, -1, keepdims=True)))
    np.testing.assert_allclose(rw, ref, atol=1e-5)


def test_ternary_loss_matches_reference():
    import torch
    import torch.nn.functional as F

    x, y = rand(2, 10, 12, 3), rand(2, 10, 12, 3)
    ours = float(losses.ternary_loss(jnp.asarray(x), jnp.asarray(y), 7))

    # reference networks/IFRNet.py:24-55
    P = 7
    w = np.eye(P * P).reshape((P, P, 1, P * P))
    w = torch.tensor(np.transpose(w, (3, 2, 0, 1))).float()

    def transform(t):
        t_ = t.mean(dim=1, keepdim=True)
        patches = F.conv2d(t_, w, padding=P // 2, bias=None)
        loc = patches - t_
        return loc / torch.sqrt(0.81 + loc**2)

    tx = transform(oracle.to_torch_nchw(x))
    ty = transform(oracle.to_torch_nchw(y)).detach()
    diff = tx - ty
    dist = (diff**2 / (0.1 + diff**2)).mean(dim=1, keepdim=True)
    b, _, h, wd = oracle.to_torch_nchw(x).shape
    pad = P // 2
    mask = F.pad(torch.ones(b, 1, h - 2 * pad, wd - 2 * pad), [pad] * 4)
    ref = float((dist * mask).mean())
    assert abs(ours - ref) < 1e-5


def test_geometry_loss_matches_reference():
    import torch
    import torch.nn.functional as F

    x, y = rand(1, 8, 10, 4), rand(1, 8, 10, 4)
    ours = float(losses.geometry_loss(jnp.asarray(x), jnp.asarray(y), 3))

    # reference networks/IFRNet.py:58-91
    P = 3
    w = np.eye(P * P).reshape((P, P, 1, P * P))
    w = torch.tensor(np.transpose(w, (3, 2, 0, 1))).float()

    def transform(t):
        b, c, h, wd = t.shape
        t_ = t.reshape(b * c, 1, h, wd)
        patches = F.conv2d(t_, w, padding=P // 2, bias=None)
        loc = patches - t_
        loc = loc.reshape(b, c * P * P, h, wd)
        return loc / torch.sqrt(0.81 + loc**2)

    tx = transform(oracle.to_torch_nchw(x))
    ty = transform(oracle.to_torch_nchw(y))
    diff = tx - ty
    dist = (diff**2 / (0.1 + diff**2)).mean(dim=1, keepdim=True)
    b, _, h, wd = oracle.to_torch_nchw(x).shape
    pad = P // 2
    mask = F.pad(torch.ones(b, 1, h - 2 * pad, wd - 2 * pad), [pad] * 4)
    ref = float((dist * mask).mean())
    assert abs(ours - ref) < 1e-4


# ------------------------------------------------------------------- geometry


@pytest.mark.parametrize("invert", [False, True])
def test_transformation_from_parameters(invert):
    aa = rand(3, 3, lo=-0.2, hi=0.2)
    tr = rand(3, 3, lo=-0.5, hi=0.5)
    ours = geometry.transformation_from_parameters(
        jnp.asarray(aa), jnp.asarray(tr), invert
    )
    ref = oracle.pose_from_axisangle(aa, tr, invert)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    if invert:
        fwd = geometry.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr))
        prod = np.asarray(jnp.matmul(fwd, ours, precision=jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_reprojection_grid_matches_reference():
    B, H, W = 2, 6, 8
    depth = rand(B, H, W, lo=1.0, hi=10.0)
    K = np.zeros((B, 4, 4), np.float32)
    K[:, 0, 0], K[:, 1, 1] = 4.0, 3.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    K[:, 2, 2] = K[:, 3, 3] = 1.0
    invK = np.linalg.inv(K).astype(np.float32)
    T = oracle.pose_from_axisangle(
        rand(B, 3, lo=-0.1, hi=0.1), rand(B, 3, lo=-0.2, hi=0.2)
    ).astype(np.float32)

    ours = geometry.reprojection_grid(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(invK), jnp.asarray(T)
    )
    ref = oracle.reprojection_grid(depth, K, invK, T)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_disp_to_depth():
    disp = rand(2, 4, 4, 1)
    sd, d = geometry.disp_to_depth(jnp.asarray(disp), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(sd), 0.01 + (10 - 0.01) * disp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d) * np.asarray(sd), 1.0, atol=1e-5)


# -------------------------------------------------------------------- metrics


def test_depth_errors_match_reference():
    import torch

    gt = rand(500, lo=1.0, hi=80.0)
    pred = gt * rand(500, lo=0.7, hi=1.4)
    ours = [float(v) for v in metrics.compute_depth_errors(jnp.asarray(gt), jnp.asarray(pred))]
    ours_np = list(metrics.compute_depth_errors_np(gt, pred))

    tg, tp = torch.from_numpy(gt), torch.from_numpy(pred)
    thresh = torch.max(tg / tp, tp / tg)
    ref = [
        float(torch.mean(torch.abs(tg - tp) / tg)),
        float(torch.mean((tg - tp) ** 2 / tg)),
        float(torch.sqrt(((tg - tp) ** 2).mean())),
        float(torch.sqrt(((torch.log(tg) - torch.log(tp)) ** 2).mean())),
        float((thresh < 1.25).float().mean()),
        float((thresh < 1.25**2).float().mean()),
        float((thresh < 1.25**3).float().mean()),
    ]
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    np.testing.assert_allclose(ours_np, ref, atol=1e-5)


# ------------------------------------------------------- batched affine warps


def test_batched_crop_resize_matches_torch_loop():
    import torch.nn.functional as F

    B, H, W = 3, 12, 16
    img = rand(B, H, W, 3)
    boxes = np.array([[2, 1, 10, 9], [0, 0, 16, 12], [5, 3, 7, 6]], np.float32)
    ours = np.asarray(image.batched_crop_resize(jnp.asarray(img), jnp.asarray(boxes)))

    t = oracle.to_torch_nchw(img)
    for b in range(B):
        x0, y0, w, h = (int(v) for v in boxes[b])
        crop = t[b : b + 1, :, y0 : y0 + h, x0 : x0 + w]
        ref = F.interpolate(crop, (H, W), mode="bilinear", align_corners=False)
        np.testing.assert_allclose(ours[b], oracle.to_np_nhwc(ref)[0], atol=1e-5)


def test_batched_place_resize_matches_torch_loop():
    import torch
    import torch.nn.functional as F

    B, H, W = 2, 12, 16
    img = rand(B, H, W, 1, lo=1.0, hi=5.0)
    boxes = np.array([[2, 1, 10, 9], [4, 2, 8, 7]], np.float32)
    ours = np.asarray(image.batched_place_resize(jnp.asarray(img), jnp.asarray(boxes)))

    t = oracle.to_torch_nchw(img)
    for b in range(B):
        x0, y0, w, h = (int(v) for v in boxes[b])
        tmp = F.interpolate(t[b : b + 1], (h, w), mode="bilinear", align_corners=False)
        canvas = torch.zeros((1, 1, H, W))
        canvas[:, :, y0 : y0 + h, x0 : x0 + w] = tmp
        np.testing.assert_allclose(ours[b], oracle.to_np_nhwc(canvas)[0], atol=1e-5)


def test_rotate_bilinear_against_pil():
    from PIL import Image as PILImage

    H, W = 32, 48
    base = np.zeros((H, W), np.float32)
    base[8:24, 12:36] = 1.0
    base += 0.3 * RNG.random((H, W)).astype(np.float32)
    # smooth it so interpolation differences are tiny
    k = np.ones((3, 3)) / 9.0
    from scipy.signal import convolve2d

    smooth = convolve2d(base, k, mode="same").astype(np.float32)

    for angle in (-5.0, 3.5):
        ours = np.asarray(
            image.rotate_bilinear(
                jnp.asarray(smooth[None, :, :, None]), jnp.asarray([angle], dtype=jnp.float32)
            )
        )[0, :, :, 0]
        pil = PILImage.fromarray(smooth)
        ref = np.array(pil.rotate(angle, resample=PILImage.BILINEAR, expand=False))
        # compare interior (edge fill conventions differ slightly)
        diff = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
        assert diff.mean() < 0.02, diff.mean()
