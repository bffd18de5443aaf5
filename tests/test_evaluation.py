"""Eval protocol tests: numpy resize parity with torch, KITTI eigen metric
loop sanity, flip post-processing."""

import numpy as np

from mono_vifi_tpu import evaluation


def test_resize_np_matches_torch():
    import torch
    import torch.nn.functional as F

    img = np.random.default_rng(0).random((24, 40)).astype(np.float32)
    for ac in (True, False):
        ours = evaluation.resize_np(img.astype(np.float64), (37, 61), ac)
        ref = F.interpolate(
            torch.from_numpy(img)[None, None], (37, 61), mode="bilinear",
            align_corners=ac,
        )[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)
    # nearest
    ours = evaluation.resize_np(img, (37, 61), mode="nearest")
    ref = F.interpolate(torch.from_numpy(img)[None, None], (37, 61),
                        mode="nearest")[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_eigen_protocol_perfect_prediction():
    rng = np.random.default_rng(1)
    gt_depths = [rng.uniform(2, 60, (375, 1242)).astype(np.float32) for _ in range(3)]
    # a disp whose upsampled inverse equals gt up to a global scale: use
    # constant depth to survive interpolation exactly
    gt_depths = [np.full((375, 1242), 10.0, np.float32) for _ in range(3)]
    pred_disps = np.full((3, 192, 640), 1.0 / 20.0, np.float32)  # scale 0.5
    out = evaluation.evaluate_kitti(
        pred_disps, gt_depths, "eigen", use_stereo=False, printer=lambda *a: None
    )
    assert out["abs_rel"] < 1e-6
    assert out["a1"] == 1.0


def test_post_process_shape_and_blend():
    l = np.ones((2, 8, 16), np.float32)
    r = np.zeros((2, 8, 16), np.float32)
    out = evaluation.batch_post_process_disparity(l, r)
    assert out.shape == (2, 8, 16)
    # left edge dominated by r_disp-weighted... just check in [0,1]
    assert (out >= 0).all() and (out <= 1).all()


def test_make3d_and_nyu_protocols_run():
    gt = [np.full((21, 305), 5.0, np.float32)]
    pred = np.full((1, 192, 640), 0.2, np.float32)
    out = evaluation.evaluate_make3d(pred, gt, printer=lambda *a: None)
    assert out["abs_rel"] < 1e-6
    gt = [np.full((427, 561), 3.0, np.float32)]
    out = evaluation.evaluate_nyuv2(pred, gt, printer=lambda *a: None)
    assert out["abs_rel"] < 1e-6
