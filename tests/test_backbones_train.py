"""Train-step smoke tests for the LiteMono and DHRNet backbones (validates
factory wiring, fusion channel counts, DropPath rng plumbing)."""

import numpy as np
import pytest
import jax

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.training import monovifi
from mono_vifi_tpu.training.monovifi import MonoViFiStep
from tests.test_train_step import make_batch


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["LiteMono", "DHRNet"])
def test_backbone_train_step(backbone):
    cfg = Options(
        height=64,
        width=96,
        batch_size=1,
        use_affine=False,
        backbone=backbone,
        compute_dtype="float32",
        fuse_model_type="shared_encoder",
        vfi_train_scale="tiny",
        vfi_test_scale="tiny",
    )
    bundle, tx, state = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)
    vfi_params = bundle.init_vfi(jax.random.PRNGKey(1), "train")
    step = jax.jit(MonoViFiStep(bundle, tx).make_train_step())
    batch = make_batch(1, cfg.height, cfg.width, use_affine=False)
    state1, metrics = step(state, vfi_params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["LiteMono", "DHRNet"])
def test_backbone_eval_forwards(backbone):
    cfg = Options(height=64, width=96, batch_size=1, backbone=backbone,
                  compute_dtype="float32",
                  vfi_train_scale="tiny", vfi_test_scale="tiny")
    bundle, tx, state = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)
    vfi_small = bundle.init_vfi(jax.random.PRNGKey(1), "test")
    img = jax.numpy.asarray(
        np.random.default_rng(0).random((1, 64, 96, 3), np.float32)
    )
    disp = monovifi.single_frame_disp(bundle, state.params, state.batch_stats, img)
    assert disp.shape == (1, 64, 96, 1)
    disp_mf = monovifi.multi_frame_disp(
        bundle, state.params, state.batch_stats, vfi_small, img, img, img
    )
    assert disp_mf.shape == (1, 64, 96, 1)
