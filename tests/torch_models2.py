"""PyTorch oracle models for LiteMono / HRNet18 / DHRNet parity tests.
Mirror the reference structures and state_dict key naming (eval mode only —
DropPath is identity). Test fixtures, not framework code."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------------ LiteMono
class BNGELU(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.bn = nn.BatchNorm2d(n, eps=1e-5)
        self.act = nn.GELU()

    def forward(self, x):
        return self.act(self.bn(x))


class ConvT(nn.Module):
    def __init__(self, nIn, nOut, k, stride, padding=0, bn_act=False):
        super().__init__()
        self.bn_act = bn_act
        self.conv = nn.Conv2d(nIn, nOut, k, stride, padding, bias=False)
        if bn_act:
            self.bn_gelu = BNGELU(nOut)

    def forward(self, x):
        x = self.conv(x)
        if self.bn_act:
            x = self.bn_gelu(x)
        return x


class LayerNormT(nn.Module):
    def __init__(self, n, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(n))
        self.bias = nn.Parameter(torch.zeros(n))
        self.eps = eps
        self.n = (n,)

    def forward(self, x):
        return F.layer_norm(x, self.n, self.weight, self.bias, self.eps)


class DilatedConvT(nn.Module):
    def __init__(self, dim, k=3, dilation=1, expan_ratio=6):
        super().__init__()
        self.ddwconv = nn.Module()
        pad = (k - 1) // 2 * dilation
        self.ddwconv.conv = nn.Conv2d(dim, dim, k, 1, pad, dilation=dilation,
                                      groups=dim, bias=False)
        self.bn1 = nn.BatchNorm2d(dim)
        self.norm = LayerNormT(dim)
        self.pwconv1 = nn.Linear(dim, expan_ratio * dim)
        self.pwconv2 = nn.Linear(expan_ratio * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        inp = x
        x = self.bn1(self.ddwconv.conv(x))
        x = x.permute(0, 2, 3, 1)
        x = self.pwconv2(F.gelu(self.pwconv1(self.norm(x))))
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return inp + x


class PositionalEncodingFourierT(nn.Module):
    def __init__(self, hidden_dim=32, dim=128, temperature=10000):
        super().__init__()
        self.token_projection = nn.Conv2d(hidden_dim * 2, dim, 1)
        self.scale = 2 * math.pi
        self.temperature = temperature
        self.hidden_dim = hidden_dim

    def forward(self, B, H, W):
        not_mask = torch.ones(B, H, W)
        y_embed = not_mask.cumsum(1) / (not_mask.cumsum(1)[:, -1:, :] + 1e-6) * self.scale
        x_embed = not_mask.cumsum(2) / (not_mask.cumsum(2)[:, :, -1:] + 1e-6) * self.scale
        dim_t = torch.arange(self.hidden_dim, dtype=torch.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.hidden_dim)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                            dim=4).flatten(3)
        pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                            dim=4).flatten(3)
        pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
        return self.token_projection(pos)


class XCAT(nn.Module):
    def __init__(self, dim, num_heads=6):
        super().__init__()
        self.num_heads = num_heads
        self.temperature = nn.Parameter(torch.ones(num_heads, 1, 1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = (t.transpose(-2, -1) for t in (qkv[0], qkv[1], qkv[2]))
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        x = (attn @ v).permute(0, 3, 1, 2).reshape(B, N, C)
        return self.proj(x)


class LGFIT(nn.Module):
    def __init__(self, dim, use_pos_emb=True, num_heads=6, expan_ratio=6):
        super().__init__()
        self.pos_embd = PositionalEncodingFourierT(dim=dim) if use_pos_emb else None
        self.norm_xca = LayerNormT(dim)
        self.gamma_xca = nn.Parameter(1e-6 * torch.ones(dim))
        self.xca = XCAT(dim, num_heads)
        self.norm = LayerNormT(dim)
        self.pwconv1 = nn.Linear(dim, expan_ratio * dim)
        self.pwconv2 = nn.Linear(expan_ratio * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        inp = x
        B, C, H, W = x.shape
        x = x.reshape(B, C, H * W).permute(0, 2, 1)
        if self.pos_embd is not None:
            pe = self.pos_embd(B, H, W).reshape(B, -1, x.shape[1]).permute(0, 2, 1)
            x = x + pe
        x = x + self.gamma_xca * self.xca(self.norm_xca(x))
        x = x.reshape(B, H, W, C)
        x = self.pwconv2(F.gelu(self.pwconv1(self.norm(x))))
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return inp + x


class LiteMonoEncoderT(nn.Module):
    """Reference LiteMono.DepthEncoder structure + keys (eval mode)."""

    def __init__(self, dims=(48, 80, 128), depth=(4, 4, 10),
                 dilation=((1, 2, 3), (1, 2, 3), (1, 2, 3, 1, 2, 3, 2, 4, 6)),
                 heads=(8, 8, 8), use_pos=(True, False, False)):
        super().__init__()
        self.dims, self.depth = dims, depth
        stem1 = nn.Sequential(
            ConvT(3, dims[0], 3, 2, 1, bn_act=True),
            ConvT(dims[0], dims[0], 3, 1, 1, bn_act=True),
            ConvT(dims[0], dims[0], 3, 1, 1, bn_act=True),
        )
        self.stem2 = nn.Sequential(ConvT(dims[0] + 3, dims[0], 3, 2, 1))
        self.downsample_layers = nn.ModuleList([stem1])
        self.input_downsample = nn.ModuleList(
            [nn.Sequential(*[nn.AvgPool2d(3, 2, 1)] * i) for i in range(1, 5)]
        )
        for i in range(2):
            self.downsample_layers.append(
                nn.Sequential(ConvT(dims[i] * 2 + 3, dims[i + 1], 3, 2, 1))
            )
        self.stages = nn.ModuleList()
        for i in range(3):
            blocks = []
            for j in range(self.depth[i]):
                if j == self.depth[i] - 1:
                    blocks.append(LGFIT(dims[i], use_pos[i], heads[i]))
                else:
                    blocks.append(DilatedConvT(dims[i], 3, dilation[i][j]))
            self.stages.append(nn.Sequential(*blocks))

    def forward(self, x):
        feats = []
        x = (x - 0.45) / 0.225
        x_down = [self.input_downsample[i](x) for i in range(4)]
        tmp = []
        x = self.downsample_layers[0](x)
        x = self.stem2(torch.cat((x, x_down[0]), 1))
        tmp.append(x)
        for s in range(len(self.stages[0])):
            x = self.stages[0][s](x)
        tmp.append(x)
        feats.append(x)
        for i in range(1, 3):
            tmp.append(x_down[i])
            x = self.downsample_layers[i](torch.cat(tmp, 1))
            tmp = [x]
            for s in range(len(self.stages[i])):
                x = self.stages[i][s](x)
            tmp.append(x)
            feats.append(x)
        return feats


class LiteMonoDecoderT(nn.Module):
    """Reference LiteMono.DepthDecoder keys/order."""

    def __init__(self, num_ch_enc=(48, 80, 128), scales=(0,)):
        super().__init__()
        from tests.torch_models import ConvBlockT, Conv3x3T

        self.scales = scales
        dec = [c // 2 for c in num_ch_enc]
        self.convs = {}
        for i in range(2, -1, -1):
            cin = num_ch_enc[-1] if i == 2 else dec[i + 1]
            self.convs[("upconv", i, 0)] = ConvBlockT(cin, dec[i])
            cin = dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            self.convs[("upconv", i, 1)] = ConvBlockT(cin, dec[i])
        for s in scales:
            self.convs[("dispconv", s)] = Conv3x3T(dec[s], 1)
        self.decoder = nn.ModuleList(list(self.convs.values()))

    def forward(self, feats):
        out = {}
        x = feats[-1]
        for i in range(2, -1, -1):
            x = self.convs[("upconv", i, 0)](x)
            x = [F.interpolate(x, scale_factor=2, mode="bilinear")]
            if i > 0:
                x += [feats[i - 1]]
            x = torch.cat(x, 1)
            x = self.convs[("upconv", i, 1)](x)
            if i in self.scales:
                f = F.interpolate(
                    self.convs[("dispconv", i)](x), scale_factor=2, mode="bilinear"
                )
                out[i] = torch.sigmoid(f)
        return out


# --------------------------------------------------------------------- HRNet
class HRBasicBlockT(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class HRBottleneckT(nn.Module):
    def __init__(self, inplanes, planes, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class HRModuleT(nn.Module):
    def __init__(self, channels, num_blocks):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList()
        for i in range(n):
            blocks = [HRBasicBlockT(channels[i], channels[i])
                      for _ in range(num_blocks[i])]
            self.branches.append(nn.Sequential(*blocks))
        fuse_layers = []
        for i in range(n):
            row = []
            for j in range(n):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        nn.BatchNorm2d(channels[i]),
                    ))
                elif j == i:
                    row.append(None)
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = channels[i] if last else channels[j]
                        seq = [nn.Conv2d(channels[j], out_ch, 3, 2, 1, bias=False),
                               nn.BatchNorm2d(out_ch)]
                        if not last:
                            seq.append(nn.ReLU())
                        chain.append(nn.Sequential(*seq))
                    row.append(nn.Sequential(*chain))
            fuse_layers.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse_layers)
        self.relu = nn.ReLU()
        self.n = n

    def forward(self, x):
        x = [self.branches[i](x[i]) for i in range(self.n)]
        out = []
        for i in range(self.n):
            y = x[0] if i == 0 else self.fuse_layers[i][0](x[0])
            for j in range(1, self.n):
                if i == j:
                    y = y + x[j]
                elif j > i:
                    y = y + F.interpolate(
                        self.fuse_layers[i][j](x[j]),
                        size=x[i].shape[-2:], mode="bilinear", align_corners=True,
                    )
                else:
                    y = y + self.fuse_layers[i][j](x[j])
            out.append(self.relu(y))
        return out


class HRNet18T(nn.Module):
    """hrnet18 trunk with reference state_dict keys."""

    SPECS = ((1, (18, 36), (4, 4)), (4, (18, 36, 72), (4, 4, 4)),
             (3, (18, 36, 72, 144), (4, 4, 4, 4)))

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        ds = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False), nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(
            HRBottleneckT(64, 64, ds), *[HRBottleneckT(256, 64) for _ in range(3)]
        )
        prev = [256]
        for s_idx, (num_modules, channels, num_blocks) in zip((2, 3, 4), self.SPECS):
            trans = []
            for i in range(len(channels)):
                if i < len(prev):
                    if prev[i] != channels[i]:
                        trans.append(nn.Sequential(
                            nn.Conv2d(prev[i], channels[i], 3, 1, 1, bias=False),
                            nn.BatchNorm2d(channels[i]), nn.ReLU(),
                        ))
                    else:
                        trans.append(None)
                else:
                    chain = []
                    for j in range(i + 1 - len(prev)):
                        inch = prev[-1]
                        outch = channels[i] if j == i - len(prev) else inch
                        chain.append(nn.Sequential(
                            nn.Conv2d(inch, outch, 3, 2, 1, bias=False),
                            nn.BatchNorm2d(outch), nn.ReLU(),
                        ))
                    trans.append(nn.Sequential(*chain))
            setattr(self, f"transition{s_idx - 1}", nn.ModuleList(trans))
            setattr(self, f"stage{s_idx}", nn.Sequential(
                *[HRModuleT(channels, num_blocks) for _ in range(num_modules)]
            ))
            prev = list(channels)

    def forward(self, x):
        outputs = []
        x = self.relu(self.bn1(self.conv1(x)))
        outputs.append(x)
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        ys = [x]
        prev_n = 1
        for s_idx, (num_modules, channels, _) in zip((2, 3, 4), self.SPECS):
            trans = getattr(self, f"transition{s_idx - 1}")
            xs = []
            for i in range(len(channels)):
                if trans[i] is not None:
                    src = ys[i] if i < prev_n else ys[-1]
                    xs.append(trans[i](src))
                else:
                    xs.append(ys[i])
            ys = getattr(self, f"stage{s_idx}")(xs)
            prev_n = len(channels)
        return outputs + list(ys)


class DHRNetDecoderT(nn.Module):
    """Reference DHRNet.DepthDecoder keys/order."""

    def __init__(self, ch=(64, 18, 36, 72, 144)):
        super().__init__()
        from tests.torch_models import ConvBlockT, Conv3x3T

        class ConvBlock1x1T(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()

                class Conv1x1T(nn.Module):
                    def __init__(s, ci, co):
                        super().__init__()
                        s.conv = nn.Conv2d(ci, co, 1)

                    def forward(s, x):
                        return s.conv(x)

                self.conv = Conv1x1T(cin, cout)
                self.nonlin = nn.ELU()

            def forward(self, x):
                return self.nonlin(self.conv(x))

        c = {}
        c[("p", 0, 1)] = ConvBlockT(ch[1], ch[1])
        c[("p", 0, 2)] = ConvBlockT(ch[2], ch[2])
        c[("p", 0, 3)] = ConvBlockT(ch[3], ch[3])
        c[("p", 0, 4)] = ConvBlockT(ch[4], ch[4])
        c[("c", 0, 21)] = ConvBlock1x1T(ch[2], ch[1])
        c[("c", 0, 32)] = ConvBlock1x1T(ch[3], ch[2])
        c[("c", 0, 31)] = ConvBlock1x1T(ch[3], ch[1])
        c[("c", 0, 43)] = ConvBlock1x1T(ch[4], ch[3])
        c[("c", 0, 42)] = ConvBlock1x1T(ch[4], ch[2])
        c[("c", 0, 41)] = ConvBlock1x1T(ch[4], ch[1])
        c[("p", 1, 1)] = ConvBlockT(ch[1], ch[1])
        c[("p", 1, 2)] = ConvBlockT(ch[2], ch[2])
        c[("p", 1, 3)] = ConvBlockT(ch[3], ch[3])
        c[("c", 1, 21)] = ConvBlock1x1T(ch[2], ch[1])
        c[("c", 1, 32)] = ConvBlock1x1T(ch[3], ch[2])
        c[("c", 1, 31)] = ConvBlock1x1T(ch[3], ch[1])
        c[("p", 2, 1)] = ConvBlockT(ch[1], ch[1])
        c[("p", 2, 2)] = ConvBlockT(ch[2], ch[2])
        c[("c", 2, 21)] = ConvBlock1x1T(ch[2], ch[1])
        c[("p", 3, 0)] = ConvBlockT(ch[0], ch[0])
        c[("p", 3, 1)] = ConvBlockT(ch[1], ch[1])
        c[("c", 3, 10)] = ConvBlock1x1T(ch[1], ch[0])
        c[("p", 4, 0)] = ConvBlockT(ch[0], 32)
        c[("p", 5, 0)] = ConvBlockT(32, 16)
        c[("d", 0, 0)] = Conv3x3T(16, 1)
        self.convs = c
        self.decoder = nn.ModuleList(list(c.values()))

    def forward(self, feats):
        up = lambda x, f: F.interpolate(x, scale_factor=f, mode="nearest")
        c = self.convs
        e0, e1, e2, e3, e4 = feats
        d1 = c[("p", 0, 1)](e1)
        d2 = c[("p", 0, 2)](e2)
        d3 = c[("p", 0, 3)](e3)
        d4 = c[("p", 0, 4)](e4)
        d1 = d1 + c[("c", 0, 21)](up(d2, 2)) + c[("c", 0, 31)](up(d3, 4)) + \
            c[("c", 0, 41)](up(d4, 8))
        d2 = d2 + c[("c", 0, 32)](up(d3, 2)) + c[("c", 0, 42)](up(d4, 4))
        d3 = d3 + c[("c", 0, 43)](up(d4, 2))
        d1 = c[("p", 1, 1)](d1)
        d2 = c[("p", 1, 2)](d2)
        d3 = c[("p", 1, 3)](d3)
        d1 = d1 + c[("c", 1, 21)](up(d2, 2)) + c[("c", 1, 31)](up(d3, 4))
        d2 = d2 + c[("c", 1, 32)](up(d3, 2))
        d1 = c[("p", 2, 1)](d1)
        d2 = c[("p", 2, 2)](d2)
        d1 = d1 + c[("c", 2, 21)](up(d2, 2))
        d0 = c[("p", 3, 0)](e0)
        d1 = c[("p", 3, 1)](d1)
        d0 = d0 + c[("c", 3, 10)](up(d1, 2))
        d4_ = up(c[("p", 4, 0)](d0), 2)
        d5 = c[("p", 5, 0)](d4_)
        return {0: torch.sigmoid(c[("d", 0, 0)](d5))}
