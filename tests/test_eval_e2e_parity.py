"""Hermetic end-to-end eval parity: a random-init reference-structured torch
pipeline (encoder -> decoder -> flip post-process -> eigen metric protocol)
vs our single_frame_disp + evaluation.evaluate_kitti on the same synthetic
images and synthetic variable-size ground truths. Pins the WHOLE
evaluate_depth path (reference evaluate_depth.py:91-193), not just modules.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mono_vifi_tpu import convert, evaluation
from mono_vifi_tpu.config import Options
from mono_vifi_tpu.ops.geometry import disp_to_depth
from mono_vifi_tpu.training import monovifi
from mono_vifi_tpu.training.checkpoint import merge_params
from tests.torch_models import DepthEncoderT, DepthDecoderT

MIN_DEPTH, MAX_DEPTH = 1e-3, 80.0


def torch_disp_to_depth(disp, min_depth=0.1, max_depth=100.0):
    """reference layers.py:16-25."""
    min_disp = 1 / max_depth
    max_disp = 1 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1 / scaled_disp


def torch_post_process(l_disp, r_disp):
    """reference evaluate_depth.py:91-101 (numpy in the reference)."""
    _, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    l_grid, _ = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    l_mask = (1.0 - np.clip(20 * (l_grid - 0.05), 0, 1))[None, ...]
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m_disp


def torch_eigen_metrics(pred_disps, gt_depths):
    """reference evaluate_depth.py:134-193 + layers.py:293-311, verbatim
    semantics with torch interpolate."""
    errors, ratios = [], []
    for i in range(pred_disps.shape[0]):
        gt = gt_depths[i]
        gh, gw = gt.shape
        disp = F.interpolate(
            torch.from_numpy(pred_disps[i : i + 1, None]).double(),
            (gh, gw), mode="bilinear", align_corners=True,
        )[0, 0].numpy()
        pred = 1.0 / disp
        mask = (gt > MIN_DEPTH) & (gt < MAX_DEPTH)
        crop = np.zeros_like(mask)
        crop[
            int(0.40810811 * gh) : int(0.99189189 * gh),
            int(0.03594771 * gw) : int(0.96405229 * gw),
        ] = 1
        mask = mask & (crop > 0)
        p, g = pred[mask], gt[mask]
        ratio = np.median(g) / np.median(p)
        ratios.append(ratio)
        p = np.clip(p * ratio, MIN_DEPTH, MAX_DEPTH)
        thresh = np.maximum(g / p, p / g)
        errors.append(
            (
                np.mean(np.abs(g - p) / g),
                np.mean((g - p) ** 2 / g),
                np.sqrt(np.mean((g - p) ** 2)),
                np.sqrt(np.mean((np.log(g) - np.log(p)) ** 2)),
                np.mean(thresh < 1.25),
                np.mean(thresh < 1.25 ** 2),
                np.mean(thresh < 1.25 ** 3),
            )
        )
    return np.asarray(errors).mean(0)


@pytest.mark.parametrize("post_process", [False, True])
def test_eval_pipeline_parity(post_process):
    torch.manual_seed(0)
    rng = np.random.default_rng(5)
    N, H, W = 4, 64, 96

    # reference-structured torch pipeline, random init
    enc_t = DepthEncoderT().eval()
    dec_t = DepthDecoderT().eval()
    imgs = rng.random((N, H, W, 3), np.float32)
    imgs_in = imgs
    if post_process:  # reference evaluate_depth.py:144-151
        imgs_in = np.concatenate([imgs, imgs[:, :, ::-1]], 0)
    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(imgs_in.transpose(0, 3, 1, 2)))
        disp_t = dec_t(enc_t(x))[0].numpy()[:, 0]
    scaled_t, _ = torch_disp_to_depth(disp_t)
    if post_process:
        scaled_t = torch_post_process(
            scaled_t[:N], scaled_t[N:, :, ::-1]
        )

    # synthetic variable-size GTs (different shapes, like the 697 KITTI maps)
    gts = [
        (0.5 + 79 * rng.random((gh, gw))).astype(np.float32)
        for gh, gw in [(96, 160), (80, 128), (112, 176), (96, 144)]
    ]
    ref_metrics = torch_eigen_metrics(scaled_t.astype(np.float32), gts)

    # our pipeline: converted weights -> flax forward -> evaluation protocol
    cfg = Options(height=H, width=W, batch_size=1, compute_dtype="float32",
                  weights_init="scratch",
                  vfi_train_scale="tiny", vfi_test_scale="tiny")
    bundle, _, state = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)
    conv_e = convert.convert_depth_encoder(
        {f"encoder.{k}": v for k, v in enc_t.encoder.state_dict().items()}, 18
    )
    conv_d = convert.convert_depth_decoder(dec_t.state_dict(), scales=(0,))
    params = dict(state.params)
    params["encoder"] = merge_params(params["encoder"], conv_e["params"])
    params["depth"] = merge_params(params["depth"], conv_d["params"])
    bstats = dict(state.batch_stats)
    bstats["encoder"] = merge_params(bstats["encoder"], conv_e["batch_stats"])

    disp_j = np.asarray(
        monovifi.single_frame_disp(bundle, params, bstats, jnp.asarray(imgs_in))
    )[..., 0]
    # (a) network forward parity: converted weights reproduce the torch disp
    np.testing.assert_allclose(disp_j, disp_t, atol=2e-4)

    scaled_j = np.asarray(
        disp_to_depth(jnp.asarray(disp_j), cfg.min_depth, cfg.max_depth)[0]
    )
    if post_process:
        scaled_j = evaluation.batch_post_process_disparity(
            scaled_j[:N], scaled_j[N:, :, ::-1]
        )
        # (b) flip post-processing parity on identical inputs
        st, _ = torch_disp_to_depth(disp_j)
        np.testing.assert_allclose(
            scaled_j, torch_post_process(st[:N], st[N:, :, ::-1]), atol=1e-6
        )

    ours = evaluation.evaluate_kitti(
        scaled_j.astype(np.float32), gts, "eigen", use_stereo=False,
        printer=lambda *a: None,
    )
    ours_vec = np.asarray(
        [ours[k] for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")]
    )
    # (c) metric-protocol parity on the torch reference pipeline's own disps
    # (both sides see float-identical predictions -> ~exact agreement)
    ours_on_torch = evaluation.evaluate_kitti(
        scaled_t.astype(np.float32), gts, "eigen", use_stereo=False,
        printer=lambda *a: None,
    )
    ours_on_torch_vec = np.asarray(
        [
            ours_on_torch[k]
            for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
        ]
    )
    np.testing.assert_allclose(ours_on_torch_vec, ref_metrics, atol=1e-6, rtol=1e-6)
    # (d) end-to-end: full pipeline metrics agree to float-noise level
    np.testing.assert_allclose(ours_vec, ref_metrics, atol=5e-4, rtol=5e-3)
