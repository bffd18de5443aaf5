"""Model + weight-converter parity tests: random-init torch oracles, convert
their state_dicts, and assert Flax outputs match."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mono_vifi_tpu import convert
from mono_vifi_tpu.models import monodepth2, posenet, ifrnet, fusion
from tests import torch_models as tm
from tests.torch_oracle import to_torch_nchw, to_np_nhwc

RNG = np.random.default_rng(1)


def rand(*shape, lo=0.0, hi=1.0):
    return (lo + (hi - lo) * RNG.random(shape)).astype(np.float32)


@pytest.fixture(scope="module")
def resnet_pair():
    tmodel = tm.DepthEncoderT().eval()
    variables = convert.convert_depth_encoder(tmodel.state_dict(), 18)
    return tmodel, variables


def test_depth_encoder_parity(resnet_pair):
    tmodel, variables = resnet_pair
    x = rand(1, 64, 96, 3)
    with torch.no_grad():
        ref = tmodel(to_torch_nchw(x))
    model = monodepth2.DepthEncoder(18)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    assert len(ours) == 5
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), to_np_nhwc(r), atol=2e-4)


def test_depth_decoder_parity(resnet_pair):
    tmodel, variables = resnet_pair
    x = rand(1, 64, 96, 3)
    tdec = tm.DepthDecoderT().eval()
    dec_vars = convert.convert_depth_decoder(tdec.state_dict(), scales=(0,))
    with torch.no_grad():
        tfeats = tmodel(to_torch_nchw(x))
        ref = tdec(tfeats)
    enc = monodepth2.DepthEncoder(18)
    feats = enc.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    dec = monodepth2.DepthDecoder(scales=(0,))
    disp = dec.apply({"params": dec_vars["params"]}, feats)
    np.testing.assert_allclose(np.asarray(disp[0]), to_np_nhwc(ref[0]), atol=1e-4)


def test_pose_net_parity():
    x = rand(2, 64, 96, 6)
    tenc = tm.DepthEncoderT(in_ch=6).eval()
    tdec = tm.PoseDecoderT().eval()
    with torch.no_grad():
        feats = tenc(to_torch_nchw(x))
        aa_ref, tr_ref = tdec(feats[-1])

    enc_vars = convert.convert_pose_encoder(tenc.state_dict(), 18)
    dec_vars = convert.convert_pose_decoder(tdec.state_dict())
    enc = posenet.PoseEncoder(18)
    feats_j = enc.apply(
        {"params": enc_vars["params"], "batch_stats": enc_vars["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    dec = posenet.PoseDecoder()
    aa, tr = dec.apply({"params": dec_vars["params"]}, feats_j[-1])
    np.testing.assert_allclose(np.asarray(aa), aa_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr), tr_ref.numpy(), atol=1e-6)


def test_ifrnet_small_parity():
    torch.manual_seed(0)
    tnet = tm.IFRNetSmallT().eval()
    variables = convert.convert_ifrnet(tnet.state_dict())

    img0, img1 = rand(1, 64, 96, 3), rand(1, 64, 96, 3)
    embt = np.full((1, 1, 1, 1), 0.5, np.float32)
    with torch.no_grad():
        pred_ref, fl0_ref, fl1_ref, mask_ref = tnet(
            to_torch_nchw(img0), to_torch_nchw(img1), torch.tensor(0.5).view(1, 1, 1, 1)
        )

    net = ifrnet.IFRNet(scale="small")
    out = net.apply(
        {"params": variables["params"]},
        jnp.asarray(img0),
        jnp.asarray(img1),
        jnp.asarray(embt),
    )
    np.testing.assert_allclose(np.asarray(out["flow0"]), to_np_nhwc(fl0_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["flow1"]), to_np_nhwc(fl1_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["mask"]), to_np_nhwc(mask_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["imgt_pred"]), to_np_nhwc(pred_ref), atol=2e-4
    )

    # only_flow fast path returns identical flows
    out2 = net.apply(
        {"params": variables["params"]},
        jnp.asarray(img0),
        jnp.asarray(img1),
        jnp.asarray(embt),
        only_flow=True,
    )
    np.testing.assert_allclose(
        np.asarray(out2["flow0"]), np.asarray(out["flow0"]), atol=0
    )


def test_fusion_module_parity():
    torch.manual_seed(1)
    tfus = tm.FusionModuleT().eval()
    variables = convert.convert_fusion_module(tfus.state_dict(), num_levels=5)

    B, H, W = 1, 64, 64  # keep the deepest pyramid level >= 2x2 (H/32)
    feats_np = [
        [rand(B, H // s, W // s, c) for s, c in zip((2, 4, 8, 16, 32), (64, 64, 128, 256, 512))]
        for _ in range(3)
    ]
    fl_n1 = rand(B, H, W, 2, lo=-2, hi=2)
    fl_p1 = rand(B, H, W, 2, lo=-2, hi=2)
    mask = rand(B, H, W, 1)

    with torch.no_grad():
        ref = tfus(
            [[to_torch_nchw(f) for f in fs] for fs in feats_np],
            (to_torch_nchw(fl_n1), to_torch_nchw(fl_p1)),
            to_torch_nchw(mask),
        )

    fus = fusion.FusionModule(num_ch_enc=(64, 64, 128, 256, 512))
    ours = fus.apply(
        {"params": variables["params"]},
        [[jnp.asarray(f) for f in fs] for fs in feats_np],
        (jnp.asarray(fl_n1), jnp.asarray(fl_p1)),
        jnp.asarray(mask),
    )
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), to_np_nhwc(r), atol=2e-4)


def test_padfree_conv_matches_padded_block_conv():
    """_padfree_conv (zero-padded conv + thin ring corrections) must equal
    conv(_s2d_reflect_pad(x)) exactly, for both the reflect (top_src=1,
    bot_src=f-2) and collapsed-up (0, 1) phase selections, and for the plain
    edge pad."""
    import jax
    import jax.numpy as jnp

    from mono_vifi_tpu.models import monodepth2 as md

    rng = np.random.default_rng(5)
    B, Hb, Wb, c, f = 2, 6, 10, 3, 2
    xs = jnp.asarray(rng.random((B, Hb, Wb, f * f * c)).astype(np.float32))
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, f * f * c, 8)).astype(np.float32)
    )
    b2 = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    for ts, bs in ((1, f - 2), (0, 1)):
        ref = md._block_conv(
            md._s2d_reflect_pad(xs, c, f, top_src=ts, bot_src=bs), w2, b2, None
        )
        got = md._padfree_conv(
            xs, w2, b2, None, md._edge_strips_s2d(xs, c, f, ts, bs)
        )
        # zero-pad conv + ring corrections reassociate the boundary sums
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )

    # plain edge pad
    x = jnp.asarray(rng.random((B, Hb, Wb, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))
    ref = md._block_conv(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"), w, bb, None
    )
    got = md._padfree_conv(x, w, bb, None, md._edge_strips_edgepad(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
