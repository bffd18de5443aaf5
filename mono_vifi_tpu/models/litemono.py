"""Lite-Mono depth network (reference networks/LiteMono.py), NHWC Flax.

A CNN+transformer hybrid encoder: a conv stem (1/2 then 1/4 res), two
further stride-2 stages (1/8, 1/16), each stage a run of Consecutive Dilated
Convolutions (depthwise dilated conv + BN + inverted-bottleneck MLP with
layer scale and stochastic depth) capped by one LGFI block (Fourier
positional encoding on stage 0, LayerNorm, cross-covariance attention over
channels — d x d, linear in pixels — then the same MLP). Multi-scale image
re-injection: avg-pooled copies of the input concatenate into each
downsample. Decoder: 3-stage bilinear-upsampling U-Net with an extra
bilinear x2 on the disparity head (so scale-0 disp is full-res,
reference :502).

Per-resolution dilation schedules resolve statically from (height, width)
(reference :311-341); NHWC makes the reference's permute-heavy
channels-first/last dance disappear.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mono_vifi_tpu.models.common import ConvBlock, Conv3x3
from mono_vifi_tpu.models.common import batch_norm
from mono_vifi_tpu.ops.image import resize_bilinear

_MODELS = {
    "lite-mono": dict(dims=(48, 80, 128), depth=(4, 4, 10)),
    "lite-mono-small": dict(dims=(48, 80, 128), depth=(4, 4, 7)),
    "lite-mono-tiny": dict(dims=(32, 64, 128), depth=(4, 4, 7)),
    "lite-mono-8m": dict(dims=(64, 128, 224), depth=(4, 4, 10)),
}


def _dilation_schedule(model: str, height: int, width: int):
    big = _MODELS[model]["depth"][2] == 10
    hr = height == 320 and width == 1024 and model != "lite-mono-8m"
    a, b = (5, 10) if hr else (3, 6)
    stage3 = [1, 2, a, 1, 2, a, 2, 4, b] if big else [1, 2, a, 2, 4, b]
    return [[1, 2, a], [1, 2, a], stage3]


def fourier_pos_embedding(height: int, width: int, hidden_dim: int = 32,
                          temperature: float = 10000.0) -> np.ndarray:
    """Static (H, W, 2*hidden_dim) sin/cos position features (reference
    PositionalEncodingFourier :13-48; the mask is all-ones so this is a pure
    function of the spatial shape, computed once at trace time)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, height + 1, dtype=np.float64) / (height + eps) * scale)
    x = (np.arange(1, width + 1, dtype=np.float64) / (width + eps) * scale)
    dim_t = np.arange(hidden_dim, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / hidden_dim)

    pos_x = x[:, None] / dim_t  # (W, D)
    pos_y = y[:, None] / dim_t  # (H, D)

    def interleave(p):
        s = np.sin(p[:, 0::2])
        c = np.cos(p[:, 1::2])
        return np.stack([s, c], axis=2).reshape(p.shape[0], -1)

    ex = interleave(pos_x)[None, :, :]  # (1, W, D)
    ey = interleave(pos_y)[:, None, :]  # (H, 1, D)
    ex = np.broadcast_to(ex, (height, width, hidden_dim))
    ey = np.broadcast_to(ey, (height, width, hidden_dim))
    return np.concatenate([ey, ex], axis=-1).astype(np.float32)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class ConvBNAct(nn.Module):
    """Conv (+BatchNorm+GELU) (reference Conv/BNGELU :116-148)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    bn_act: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        if self.bn_act:
            x = batch_norm(train, "bn", self.dtype)(x)
            x = nn.gelu(x, approximate=False)
        return x


class XCA(nn.Module):
    """Cross-covariance (channel) attention (reference :51-86)."""

    dim: int
    num_heads: int = 6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # x: (B, N, C)
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        temperature = self.param(
            "temperature", nn.initializers.ones, (h, 1, 1), jnp.float32
        )
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, d).transpose(2, 0, 3, 4, 1)  # (3,B,h,d,N)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhdn,bhen->bhde", q, k) * temperature.astype(q.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)  # (B,h,d,N)
        out = out.transpose(0, 3, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class _MLP(nn.Module):
    """LayerNorm -> Dense(expand) -> GELU -> Dense -> layer scale."""

    dim: int
    expan_ratio: int = 6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        y = nn.Dense(self.expan_ratio * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32
        )
        return y * gamma.astype(y.dtype)


class DilatedConvBlock(nn.Module):
    """One CDC block (reference DilatedConv :179-223)."""

    dim: int
    dilation: int = 1
    drop_path: float = 0.0
    expan_ratio: int = 6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        pad = self.dilation  # k=3: (k-1)//2 * d
        y = nn.Conv(
            self.dim, (3, 3), padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.dim, use_bias=False,
            dtype=self.dtype, name="ddwconv",
        )(x)
        y = batch_norm(train, "bn1", self.dtype)(y)
        y = _MLP(self.dim, self.expan_ratio, self.dtype, name="mlp")(y)
        y = DropPath(self.drop_path, name="drop_path")(y, train)
        return inp + y


class LGFIBlock(nn.Module):
    """Local-Global Features Interaction (reference LGFI :226-279)."""

    dim: int
    drop_path: float = 0.0
    expan_ratio: int = 6
    use_pos_emb: bool = True
    num_heads: int = 6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        inp = x
        t = x.reshape(B, H * W, C)
        if self.use_pos_emb:
            pe = jnp.asarray(fourier_pos_embedding(H, W), x.dtype).reshape(
                1, H * W, 64
            )
            pe = nn.Dense(C, dtype=self.dtype, name="pos_proj")(pe)
            t = t + pe
        gamma_xca = self.param(
            "gamma_xca", nn.initializers.constant(1e-6), (C,), jnp.float32
        )
        t = t + gamma_xca.astype(t.dtype) * XCA(
            C, self.num_heads, self.dtype, name="xca"
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_xca")(t))
        t = t.reshape(B, H, W, C)
        y = _MLP(C, self.expan_ratio, self.dtype, name="mlp")(t)
        y = DropPath(self.drop_path, name="drop_path")(y, train)
        return inp + y


class DepthEncoder(nn.Module):
    """Lite-Mono encoder -> 3-scale pyramid [1/4, 1/8, 1/16]."""

    model: str = "lite-mono"
    height: int = 192
    width: int = 640
    drop_path_rate: float = 0.2
    expan_ratio: int = 6
    dtype: jnp.dtype | None = None

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        return tuple(_MODELS[self.model]["dims"])

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = _MODELS[self.model]
        dims, depth = spec["dims"], spec["depth"]
        dilation = _dilation_schedule(self.model, self.height, self.width)
        heads = (8, 8, 8)
        use_pos = (True, False, False)
        dp_rates = np.linspace(0.0, self.drop_path_rate, sum(depth)).tolist()

        x = (x - 0.45) / 0.225

        # avg-pooled input pyramid (1/2 .. 1/16)
        x_down = []
        d = x
        for i in range(4):
            d = nn.avg_pool(d, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                            count_include_pad=True)
            x_down.append(d)

        # stem1 (1/2) + stem2 (1/4 with image re-injection)
        y = ConvBNAct(dims[0], 3, 2, 1, True, self.dtype, name="stem1_0")(x, train)
        y = ConvBNAct(dims[0], 3, 1, 1, True, self.dtype, name="stem1_1")(y, train)
        y = ConvBNAct(dims[0], 3, 1, 1, True, self.dtype, name="stem1_2")(y, train)
        y = ConvBNAct(dims[0], 3, 2, 1, False, self.dtype, name="stem2")(
            jnp.concatenate([y, x_down[0]], -1), train
        )

        features = []
        cur = 0
        tmp = [y]
        for i in range(3):
            if i > 0:
                tmp.append(x_down[i])
                y = ConvBNAct(
                    dims[i], 3, 2, 1, False, self.dtype, name=f"downsample{i}",
                )(jnp.concatenate(tmp, -1), train)
            stage_in = y
            for j in range(depth[i]):
                if j == depth[i] - 1:  # final block of each stage: LGFI
                    y = LGFIBlock(
                        dims[i], dp_rates[cur + j], self.expan_ratio,
                        use_pos[i], heads[i], self.dtype, name=f"stage{i}_{j}",
                    )(y, train)
                else:
                    y = DilatedConvBlock(
                        dims[i], dilation[i][j], dp_rates[cur + j],
                        self.expan_ratio, self.dtype, name=f"stage{i}_{j}",
                    )(y, train)
            cur += depth[i]
            tmp = [stage_in, y]
            features.append(y)
        return features


class DepthDecoder(nn.Module):
    """3-stage bilinear U-Net decoder (reference LiteMono.DepthDecoder
    :447-505); disp heads get an extra bilinear x2 so scale 0 is full-res.

    With `s2d_full_res` (default) the level-0 stage — the decoder's worst
    TPU layouts: 24-channel half-res convs plus a C=1 half-res disp head —
    is evaluated in SPACE-TO-DEPTH block form on the 1/4-res grid (exact
    rearrangement of the same parameters, see models/monodepth2.py notes):
    the bilinear x2 upsample becomes shifted FMAs emitting f=2 phase-major
    blocks, the two 3x3 reflect convs become 96-channel block convs, and
    the final disp x2 upsample is a constant (3, 3, 4, 16) block kernel."""

    num_ch_enc: Sequence[int] = (48, 80, 128)
    scales: Sequence[int] = (0,)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: jnp.dtype | None = None
    s2d_full_res: bool = True

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = tuple(int(c) // 2 for c in self.num_ch_enc)
        outputs = {}
        x = input_features[-1]
        for i in range(2, -1, -1):
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f"upconv_{i}_0")(x)
            if i == 0 and self.s2d_full_res:
                self._s2d_tail(x, num_ch_dec[0], outputs)
                break
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                f = Conv3x3(
                    self.num_output_channels, self.dtype, name=f"dispconv_{i}"
                )(x)
                f = resize_bilinear(f, (f.shape[1] * 2, f.shape[2] * 2))
                outputs[i] = nn.sigmoid(f)
        return outputs

    def _s2d_tail(self, x, c0, outputs):
        """Level 0 on the 1/4-res block grid: x arrives as upconv_0_0's
        output at 1/4 res (c0 channels); every op below is an exact
        rearrangement of the plain path's bilinear-up + convs."""
        from mono_vifi_tpu.models.monodepth2 import (
            _NestedConvParams,
            _depth_to_space,
            _edge_strips_s2d,
            _padfree_conv,
            _s2d_conv3x3,
            _up2_blocks_bilinear,
            _up2_f4_kernel_const,
        )

        noc = self.num_output_channels
        dt = self.dtype
        xs = _up2_blocks_bilinear(x)  # f=2 blocks of the half-res plane
        kw, kb = _NestedConvParams((3, 3, c0, c0), c0, 2, name="upconv_0_1")()
        xs = nn.elu(_s2d_conv3x3(xs, kw, kb, c0, dt, f=2))
        if 0 in self.scales:
            dw, db = _NestedConvParams(
                (3, 3, c0, noc), noc, 1, name="dispconv_0"
            )()
            d = _s2d_conv3x3(xs, dw, db, c0, dt, f=2)  # (B, Hb, Wb, 4*noc)
            up_k = jnp.asarray(_up2_f4_kernel_const(noc), d.dtype)
            d4 = _padfree_conv(
                d, up_k, jnp.zeros((16 * noc,), d.dtype), dt,
                _edge_strips_s2d(d, noc, 2, top_src=0, bot_src=1),
            )
            outputs[0] = _depth_to_space(
                nn.sigmoid(d4).astype(jnp.float32), noc, 4
            )
