"""VFI train-step + checkpoint round-trip tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.training import checkpoint as ckpt_lib
from mono_vifi_tpu.training.vfi import create_vfi_state, make_vfi_train_step
from mono_vifi_tpu.training import monovifi


@pytest.mark.slow
def test_vfi_train_step():
    cfg = Options(height=64, width=96, batch_size=2, vfi_scale="small",
                  compute_dtype="float32", lr_sche_type="cos",
                  learning_rate=1e-4, eta_min=1e-5)
    module, tx, state = create_vfi_state(cfg, jax.random.PRNGKey(0), 10)
    step = jax.jit(make_vfi_train_step(module, tx))
    rng = np.random.default_rng(0)
    batch = {
        "img0": jnp.asarray(rng.random((2, 64, 96, 3), np.float32)),
        "img1": jnp.asarray(rng.random((2, 64, 96, 3), np.float32)),
        "img2": jnp.asarray(rng.random((2, 64, 96, 3), np.float32)),
        "embt": jnp.full((2,), 0.5, jnp.float32),
    }
    state1, metrics, aux = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert aux["imgt_pred"].shape == (2, 64, 96, 3)
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_vfi_training_converges_on_synthetic_triplets():
    """train_vfi optimization dynamics (reference train_vfi.py:176-210): a
    tiny IFRNet on analytic linear-motion triplets (translating camera over
    the textured plane, tests/synthetic_scene.py — frame t=0.5 IS the
    geometric middle) must drive the Charbonnier+census+geometry loss DOWN
    and the middle-frame PSNR UP over ~60 steps. Guards that the VFI loss
    stack is minimizable, not merely finite."""
    from tests.synthetic_scene import render_view

    H, W, B = 64, 96, 2
    K = np.zeros((3, 3), np.float32)
    K[0, 0], K[1, 1] = 0.9 * W, 1.7 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    K[2, 2] = 1.0
    frames = {0.0: [], 0.5: [], 1.0: []}
    for i in range(B):
        ybase = 0.4 * i
        for t in frames:
            img, _ = render_view(K, (0.7 * t, ybase, 0.0), H, W)
            frames[t].append(img)
    batch = {
        "img0": jnp.asarray(np.stack(frames[0.0])),
        "img1": jnp.asarray(np.stack(frames[0.5])),
        "img2": jnp.asarray(np.stack(frames[1.0])),
        "embt": jnp.full((B,), 0.5, jnp.float32),
    }

    cfg = Options(height=H, width=W, batch_size=B, vfi_scale="tiny",
                  compute_dtype="float32", lr_sche_type="cos",
                  learning_rate=3e-4, eta_min=1e-5)
    module, tx, state = create_vfi_state(cfg, jax.random.PRNGKey(0), 100)
    step = jax.jit(make_vfi_train_step(module, tx), donate_argnums=0)

    losses, psnrs = [], []
    for _ in range(60):
        state, metrics, _ = step(state, batch)
        losses.append(float(metrics["loss"]))
        psnrs.append(float(metrics["psnr"]))
    k = 6
    first_l, last_l = sum(losses[:k]) / k, sum(losses[-k:]) / k
    first_p, last_p = sum(psnrs[:k]) / k, sum(psnrs[-k:]) / k
    assert last_l < 0.7 * first_l, (first_l, last_l)
    assert last_p > first_p + 1.0, (first_p, last_p)


def test_checkpoint_roundtrip(tmp_path):
    cfg = Options(height=64, width=96, batch_size=1, compute_dtype="float32")
    bundle, tx, state = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)
    path = str(tmp_path / "ckpt.pkl")
    ckpt_lib.save_checkpoint(path, state, cfg, epoch=3, batch_idx=7)
    ckpt = ckpt_lib.load_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["batch_idx"] == 7
    assert ckpt["height"] == 64 and ckpt["width"] == 96

    merged = ckpt_lib.merge_params(state.params, ckpt["params"])
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # partial load (missing role) keeps init values
    partial = {"depth": ckpt["params"]["depth"]}
    merged2 = ckpt_lib.merge_params(state.params, partial)
    assert set(merged2.keys()) == set(state.params.keys())


def test_load_reference_pth_roundtrip(tmp_path):
    """A torch-format checkpoint written with the reference's role schema
    loads through load_reference_pth into our params."""
    import torch
    from tests import torch_models as tm

    enc = tm.DepthEncoderT()
    dec = tm.DepthDecoderT()
    pose_enc = tm.DepthEncoderT(in_ch=6)
    pose_dec = tm.PoseDecoderT()
    fus = tm.FusionModuleT()
    payload = {
        "encoder": enc.state_dict(),
        "depth": dec.state_dict(),
        "depth_mf": dec.state_dict(),
        "fusion_module": fus.state_dict(),
        "pose_encoder": pose_enc.state_dict(),
        "pose": pose_dec.state_dict(),
        "height": 192,
        "width": 640,
    }
    path = str(tmp_path / "ref.pth")
    torch.save(payload, path)

    cfg = Options(height=64, width=96, batch_size=1, compute_dtype="float32")
    loaded = ckpt_lib.load_reference_pth(path, cfg, num_levels=5)
    bundle, tx, state = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)
    merged = ckpt_lib.merge_params(state.params, loaded["params"])
    # encoder conv1 kernel actually came from the torch ckpt
    ours = merged["encoder"]["encoder"]["conv1"]["kernel"]
    ref = enc.state_dict()["encoder.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)
