"""IFRNet LARGE variant parity (the frozen VFI teacher used in training)."""

import numpy as np
import torch
import jax.numpy as jnp

from mono_vifi_tpu import convert
from mono_vifi_tpu.models import ifrnet
from tests import torch_models as tm
from tests.torch_oracle import to_torch_nchw, to_np_nhwc

RNG = np.random.default_rng(21)


def test_ifrnet_large_parity():
    torch.manual_seed(3)
    tnet = tm.IFRNetSmallT(c=(64, 96, 144, 192), side=64, first_kernel=7).eval()
    variables = convert.convert_ifrnet(tnet.state_dict())

    img0 = RNG.random((1, 64, 96, 3)).astype(np.float32)
    img1 = RNG.random((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        pred_ref, fl0_ref, fl1_ref, mask_ref = tnet(
            to_torch_nchw(img0), to_torch_nchw(img1),
            torch.tensor(0.5).view(1, 1, 1, 1),
        )

    net = ifrnet.IFRNet(scale="large")
    out = net.apply(
        {"params": variables["params"]},
        jnp.asarray(img0),
        jnp.asarray(img1),
        jnp.full((1, 1, 1, 1), 0.5, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(out["flow0"]), to_np_nhwc(fl0_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["flow1"]), to_np_nhwc(fl1_ref), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(out["imgt_pred"]), to_np_nhwc(pred_ref), atol=3e-4
    )
