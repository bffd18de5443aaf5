"""weights_init="pretrained": ImageNet-format weights in weights_dir land in
the encoder / pose_encoder param trees and change the init forward output
(reference networks/monodepth2.py:28, networks/posenet.py:47-50)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mono_vifi_tpu.config import Options
from mono_vifi_tpu.training import monovifi
from mono_vifi_tpu.training.pretrained import pose_conv1_from_imagenet
from tests.torch_models import TVResNet18


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("weights")
    torch.manual_seed(0)
    m = TVResNet18(3)
    torch.save(m.state_dict(), d / "resnet18.pth")
    return d, m


def test_imagenet_weights_loaded_and_change_forward(weights_dir, tmp_path):
    d, torch_model = weights_dir
    img = np.random.default_rng(0).random((1, 64, 96, 3), np.float32)

    cfg_rand = Options(
        height=64, width=96, batch_size=1, compute_dtype="float32",
        weights_init="scratch", weights_dir=str(d),
        vfi_train_scale="tiny", vfi_test_scale="tiny",
    )
    bundle, _, st_rand = monovifi.create_train_state(
        cfg_rand, jax.random.PRNGKey(0), 10
    )

    cfg_pre = Options(
        height=64, width=96, batch_size=1, compute_dtype="float32",
        weights_init="pretrained", weights_dir=str(d),
        vfi_train_scale="tiny", vfi_test_scale="tiny",
    )
    _, _, st_pre = monovifi.create_train_state(cfg_pre, jax.random.PRNGKey(0), 10)

    # the flag is consulted: same seed, different encoder params
    k_rand = st_rand.params["encoder"]["encoder"]["conv1"]["kernel"]
    k_pre = st_pre.params["encoder"]["encoder"]["conv1"]["kernel"]
    assert not np.allclose(np.asarray(k_rand), np.asarray(k_pre))

    # the loaded weights are the torch ones (torch OIHW -> flax HWIO)
    w_t = torch_model.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(k_pre), w_t, rtol=0, atol=0)

    # forward output differs from random init and matches the torch trunk
    d_rand = monovifi.single_frame_disp(
        bundle, st_rand.params, st_rand.batch_stats, jnp.asarray(img)
    )
    d_pre = monovifi.single_frame_disp(
        bundle, st_pre.params, st_pre.batch_stats, jnp.asarray(img)
    )
    assert not np.allclose(np.asarray(d_rand), np.asarray(d_pre))

    feats = bundle.encoder.apply(
        {
            "params": st_pre.params["encoder"],
            "batch_stats": st_pre.batch_stats["encoder"],
        },
        jnp.asarray(img),
        train=False,
    )
    with torch.no_grad():
        torch_model.eval()
        feats_t = torch_model.features(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )
    np.testing.assert_allclose(
        np.asarray(feats[-1]),
        feats_t[-1].numpy().transpose(0, 2, 3, 1),
        atol=2e-4,
        rtol=1e-3,
    )


def test_pose_conv1_averaging(weights_dir):
    d, torch_model = weights_dir
    cfg = Options(
        height=64, width=96, batch_size=1, compute_dtype="float32",
        weights_init="pretrained", weights_dir=str(d),
        vfi_train_scale="tiny", vfi_test_scale="tiny",
    )
    _, _, st = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)

    w3 = torch_model.state_dict()["conv1.weight"].numpy()  # (64, 3, 7, 7)
    w6 = pose_conv1_from_imagenet(w3, 2)  # (64, 6, 7, 7)
    np.testing.assert_allclose(w6[:, :3], w3 / 2.0)
    np.testing.assert_allclose(w6[:, 3:], w3 / 2.0)

    k = np.asarray(st.params["pose_encoder"]["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(k, w6.transpose(2, 3, 1, 0), rtol=0, atol=0)


def test_missing_weights_warns_and_random_inits(tmp_path, caplog):
    import logging

    cfg = Options(
        height=64, width=96, batch_size=1, compute_dtype="float32",
        weights_init="pretrained", weights_dir=str(tmp_path / "nope"),
        vfi_train_scale="tiny", vfi_test_scale="tiny",
    )
    with caplog.at_level(logging.WARNING, logger="mono_vifi_tpu"):
        _, _, st = monovifi.create_train_state(cfg, jax.random.PRNGKey(0), 10)
    assert any("not found" in r.message for r in caplog.records)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(st.params["encoder"])[0])
    ).all()
