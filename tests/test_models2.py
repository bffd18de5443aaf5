"""LiteMono / DHRNet parity tests vs torch oracles."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mono_vifi_tpu import convert
from mono_vifi_tpu.models import litemono, dhrnet
from tests import torch_models2 as tm2
from tests.torch_oracle import to_torch_nchw, to_np_nhwc

RNG = np.random.default_rng(4)


def rand(*shape):
    return RNG.random(shape).astype(np.float32)


def test_litemono_parity():
    torch.manual_seed(0)
    tenc = tm2.LiteMonoEncoderT().eval()
    tdec = tm2.LiteMonoDecoderT().eval()
    enc_vars = convert.convert_litemono_encoder(tenc.state_dict(), "lite-mono")
    dec_vars = convert.convert_litemono_decoder(tdec.state_dict(), scales=(0,))

    x = rand(1, 64, 96, 3)
    with torch.no_grad():
        tfeats = tenc(to_torch_nchw(x))
        tdisp = tdec(tfeats)

    enc = litemono.DepthEncoder(model="lite-mono", height=64, width=96,
                                drop_path_rate=0.2)
    feats = enc.apply(
        {"params": enc_vars["params"], "batch_stats": enc_vars["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    assert len(feats) == 3
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(np.asarray(f), to_np_nhwc(tf), atol=3e-4)

    dec = litemono.DepthDecoder(num_ch_enc=(48, 80, 128), scales=(0,))
    disp = dec.apply({"params": dec_vars["params"]}, feats)
    assert disp[0].shape == (1, 64, 96, 1)
    np.testing.assert_allclose(np.asarray(disp[0]), to_np_nhwc(tdisp[0]), atol=3e-4)


def test_litemono_s2d_tail_matches_plain():
    """The level-0 space-to-depth tail (block-form bilinear up + block convs
    + constant up-kernel disp head) is an exact rearrangement of the plain
    decoder path on the SAME params."""
    feats = [
        jnp.asarray(rand(2, h, w, c))
        for (h, w, c) in ((24, 40, 48), (12, 20, 80), (6, 10, 128))
    ]
    plain = litemono.DepthDecoder(
        num_ch_enc=(48, 80, 128), scales=(0,), s2d_full_res=False
    )
    variables = plain.init(jax.random.PRNGKey(3), feats)
    s2d = litemono.DepthDecoder(num_ch_enc=(48, 80, 128), scales=(0,))
    d_plain = plain.apply(variables, feats)[0]
    d_s2d = s2d.apply(variables, feats)[0]
    assert d_s2d.shape == d_plain.shape == (2, 96, 160, 1)
    np.testing.assert_allclose(
        np.asarray(d_s2d), np.asarray(d_plain), atol=2e-6
    )


def test_dhrnet_parity():
    torch.manual_seed(1)
    tenc = tm2.HRNet18T().eval()
    tdec = tm2.DHRNetDecoderT().eval()
    # wrap with the reference's DepthEncoder "encoder." prefix
    enc_sd = {f"encoder.{k}": v for k, v in tenc.state_dict().items()}
    enc_vars = convert.convert_hrnet(enc_sd, prefix="encoder.", arch="hrnet18")
    dec_vars = convert.convert_dhrnet_decoder(tdec.state_dict())

    x = rand(1, 64, 96, 3)
    with torch.no_grad():
        tx = (to_torch_nchw(x) - 0.45) / 0.225
        tfeats = tenc(tx)
        tdisp = tdec(tfeats)

    enc = dhrnet.DepthEncoder()
    feats = enc.apply(
        {"params": enc_vars["params"], "batch_stats": enc_vars["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    assert len(feats) == 5
    assert [f.shape[-1] for f in feats] == [64, 18, 36, 72, 144]
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(np.asarray(f), to_np_nhwc(tf), atol=3e-4)

    dec = dhrnet.DepthDecoder()
    disp = dec.apply({"params": dec_vars["params"]}, feats)
    assert disp[0].shape == (1, 64, 96, 1)
    np.testing.assert_allclose(np.asarray(disp[0]), to_np_nhwc(tdisp[0]), atol=3e-4)
