"""Compact PyTorch oracle models for converter/parity tests.

These mirror the reference networks' structure and state_dict key naming
(torchvision ResNet trunk, Monodepth2 decoder, PoseDecoder, IFRNet, fusion
module) so we can random-init them, convert the state_dict with
mono_vifi_tpu.convert, and assert the Flax models produce identical outputs.
Test fixtures only — not framework code.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------ torchvision-style ResNet
class TVBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
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


class TVResNet18(nn.Module):
    """torchvision resnet18 trunk with the same state_dict keys."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            blocks = []
            for bi in range(2):
                s = stride if bi == 0 else 1
                ds = None
                if bi == 0 and (s != 1 or inplanes != planes):
                    ds = nn.Sequential(
                        nn.Conv2d(inplanes, planes, 1, s, bias=False),
                        nn.BatchNorm2d(planes),
                    )
                blocks.append(TVBasicBlock(inplanes, planes, s, ds))
                inplanes = planes
            setattr(self, f"layer{li}", nn.Sequential(*blocks))

    def features(self, x):
        x = (x - 0.45) / 0.225
        f0 = self.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(self.maxpool(f0))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [f0, f1, f2, f3, f4]


class DepthEncoderT(nn.Module):
    """Reference networks/monodepth2.py:11-45 wrapper naming (encoder.*)."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.encoder = TVResNet18(in_ch)

    def forward(self, x):
        return self.encoder.features(x)


# ----------------------------------------------------------- Monodepth2 decoder
class ConvBlockT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = Conv3x3T(cin, cout)
        self.nonlin = nn.ELU()

    def forward(self, x):
        return self.nonlin(self.conv(x))


class Conv3x3T(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class DepthDecoderT(nn.Module):
    """Reference networks/monodepth2.py:48-96 structure and key order."""

    def __init__(self, num_ch_enc=(64, 64, 128, 256, 512), scales=(0,)):
        super().__init__()
        self.scales = scales
        num_ch_dec = (16, 32, 64, 128, 256)
        self.convs = {}
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            self.convs[("upconv", i, 0)] = ConvBlockT(cin, num_ch_dec[i])
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            self.convs[("upconv", i, 1)] = ConvBlockT(cin, num_ch_dec[i])
        for s in scales:
            self.convs[("dispconv", s)] = Conv3x3T(num_ch_dec[s], 1)
        self.decoder = nn.ModuleList(list(self.convs.values()))

    def forward(self, feats):
        out = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = self.convs[("upconv", i, 0)](x)
            x = [F.interpolate(x, scale_factor=2, mode="nearest")]
            if i > 0:
                x += [feats[i - 1]]
            x = torch.cat(x, 1)
            x = self.convs[("upconv", i, 1)](x)
            if i in self.scales:
                out[i] = torch.sigmoid(self.convs[("dispconv", i)](x))
        return out


# ---------------------------------------------------------------- pose decoder
class PoseDecoderT(nn.Module):
    """Reference networks/posenet.py:96-137 with 1 input feature, 2 frames."""

    def __init__(self, ch_last=512):
        super().__init__()
        self.convs = {
            "squeeze": nn.Conv2d(ch_last, 256, 1),
            ("pose", 0): nn.Conv2d(256, 256, 3, 1, 1),
            ("pose", 1): nn.Conv2d(256, 256, 3, 1, 1),
            ("pose", 2): nn.Conv2d(256, 12, 1),
        }
        self.relu = nn.ReLU()
        self.net = nn.ModuleList(list(self.convs.values()))

    def forward(self, last_feat):
        out = self.relu(self.convs["squeeze"](last_feat))
        for i in range(3):
            out = self.convs[("pose", i)](out)
            if i != 2:
                out = self.relu(out)
        out = 0.01 * out.mean(3).mean(2).view(-1, 2, 1, 6)
        return out[..., :3], out[..., 3:]


# --------------------------------------------------------------------- IFRNet
def convreluT(cin, cout, k=3, s=1, p=1):
    return nn.Sequential(nn.Conv2d(cin, cout, k, s, p), nn.PReLU(cout))


class ResBlockT(nn.Module):
    def __init__(self, c, side):
        super().__init__()
        self.side_channels = side
        self.conv1 = convreluT(c, c)
        self.conv2 = convreluT(side, side)
        self.conv3 = convreluT(c, c)
        self.conv4 = convreluT(side, side)
        self.conv5 = nn.Conv2d(c, c, 3, 1, 1)
        self.prelu = nn.PReLU(c)

    def forward(self, x):
        s = self.side_channels
        out = self.conv1(x)
        out = torch.cat([out[:, :-s], self.conv2(out[:, -s:])], 1)
        out = self.conv3(out)
        out = torch.cat([out[:, :-s], self.conv4(out[:, -s:])], 1)
        return self.prelu(x + self.conv5(out))


class IFRNetSmallT(nn.Module):
    """Reference networks/IFRNet.py small/large variants (:160-349, :352-441)."""

    def __init__(self, c=(24, 36, 54, 72), side=24, first_kernel=3):
        super().__init__()
        chans = [3] + list(c)
        self.encoder = nn.Module()
        for i in range(4):
            k = first_kernel if i == 0 else 3
            setattr(
                self.encoder,
                f"pyramid{i + 1}",
                nn.Sequential(
                    convreluT(chans[i], chans[i + 1], k, 2, k // 2),
                    convreluT(chans[i + 1], chans[i + 1], 3, 1, 1),
                ),
            )
        self.decoder4 = nn.Module()
        self.decoder4.convblock = nn.Sequential(
            convreluT(2 * c[3] + 1, 2 * c[3]),
            ResBlockT(2 * c[3], side),
            nn.ConvTranspose2d(2 * c[3], 4 + c[2], 4, 2, 1),
        )
        self.decoder3 = nn.Module()
        self.decoder3.convblock = nn.Sequential(
            convreluT(3 * c[2] + 4, 3 * c[2]),
            ResBlockT(3 * c[2], side),
            nn.ConvTranspose2d(3 * c[2], 4 + c[1], 4, 2, 1),
        )
        self.decoder2 = nn.Module()
        self.decoder2.convblock = nn.Sequential(
            convreluT(3 * c[1] + 4, 3 * c[1]),
            ResBlockT(3 * c[1], side),
            nn.ConvTranspose2d(3 * c[1], 4 + c[0], 4, 2, 1),
        )
        self.decoder1 = nn.Module()
        self.decoder1.convblock = nn.Sequential(
            convreluT(3 * c[0] + 4, 3 * c[0]),
            ResBlockT(3 * c[0], side),
            nn.ConvTranspose2d(3 * c[0], 8, 4, 2, 1),
        )

    @staticmethod
    def _warp(img, flow):
        B, _, H, W = flow.shape
        xx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, -1, H, -1)
        yy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, -1, -1, W)
        grid = torch.cat([xx, yy], 1)
        fl = torch.cat(
            [flow[:, 0:1] / ((W - 1) / 2.0), flow[:, 1:2] / ((H - 1) / 2.0)], 1
        )
        return F.grid_sample(
            img, (grid + fl).permute(0, 2, 3, 1),
            mode="bilinear", padding_mode="border", align_corners=True,
        )

    def _enc(self, img):
        f1 = self.encoder.pyramid1(img)
        f2 = self.encoder.pyramid2(f1)
        f3 = self.encoder.pyramid3(f2)
        f4 = self.encoder.pyramid4(f3)
        return f1, f2, f3, f4

    def forward(self, img0, img1, embt, only_flow=False):
        _, _, H, W = img0.shape
        sf = (1.0, 0.5)
        mean_ = (
            torch.cat([img0, img1], 2).mean(1, keepdim=True).mean(2, keepdim=True).mean(3, keepdim=True)
        )
        img0 = img0 - mean_
        img1 = img1 - mean_
        fh, fw = int(H * sf[0]), int(W * sf[1])
        img0_ = F.interpolate(img0, (fh, fw), mode="bilinear", align_corners=False)
        img1_ = F.interpolate(img1, (fh, fw), mode="bilinear", align_corners=False)
        f0 = self._enc(img0_)
        f1 = self._enc(img1_)

        b, _, h4, w4 = f0[3].shape
        out4 = self.decoder4.convblock(
            torch.cat([f0[3], f1[3], embt.repeat(b, 1, h4, w4)], 1)
        )
        fl0, fl1, ft_ = out4[:, 0:2], out4[:, 2:4], out4[:, 4:]
        for dec, lvl in ((self.decoder3, 2), (self.decoder2, 1), (self.decoder1, 0)):
            f0w = self._warp(f0[lvl], fl0)
            f1w = self._warp(f1[lvl], fl1)
            out = dec.convblock(torch.cat([ft_, f0w, f1w, fl0, fl1], 1))
            fl0 = out[:, 0:2] + 2.0 * F.interpolate(
                fl0, scale_factor=2.0, mode="bilinear", align_corners=False
            )
            fl1 = out[:, 2:4] + 2.0 * F.interpolate(
                fl1, scale_factor=2.0, mode="bilinear", align_corners=False
            )
            ft_ = out[:, 4:]
        mask = torch.sigmoid(ft_[:, 0:1])
        fl0 = F.interpolate(fl0, (H, W), mode="bilinear", align_corners=False)
        fl0 = torch.cat([fl0[:, 0:1] / sf[1], fl0[:, 1:2] / sf[0]], 1)
        fl1 = F.interpolate(fl1, (H, W), mode="bilinear", align_corners=False)
        fl1 = torch.cat([fl1[:, 0:1] / sf[1], fl1[:, 1:2] / sf[0]], 1)
        mask = F.interpolate(mask, (H, W), mode="bilinear", align_corners=False)
        if only_flow:
            return fl0, fl1, mask
        i0w = self._warp(img0, fl0)
        i1w = self._warp(img1, fl1)
        merge = mask * i0w + (1 - mask) * i1w
        return torch.clamp(merge + mean_, 0, 1), fl0, fl1, mask


# -------------------------------------------------------------- fusion module
class FusionModuleT(nn.Module):
    """Reference networks/fusion_module.py semantics for ResNet backbones."""

    def __init__(self, num_ch_enc=(64, 64, 128, 256, 512), n_freqs=10):
        super().__init__()
        self.num_ch_enc = num_ch_enc
        self.n_freqs = n_freqs
        emb_dim = 2 + 4 * n_freqs

        class Conv1x1T(nn.Module):  # reference layers.py:141-150 key naming
            def __init__(self, cin, cout):
                super().__init__()
                self.conv = nn.Conv2d(cin, cout, 1)

            def forward(self, x):
                return self.conv(x)

        class ConvBlock1x1T(nn.Module):  # reference layers.py:153-165
            def __init__(self, cin, cout):
                super().__init__()
                self.conv = Conv1x1T(cin, cout)
                self.nonlin = nn.ELU()

            def forward(self, x):
                return self.nonlin(self.conv(x))

        convs = []
        for i in range(len(num_ch_enc) - 1, -1, -1):
            convs.append(ConvBlock1x1T(2 * (num_ch_enc[i] + emb_dim), num_ch_enc[i]))
        self.fusion_conv = nn.ModuleList(convs)

    def _embed(self, x):
        parts = [x]
        for k in range(self.n_freqs):
            parts += [torch.sin(x * 2**k), torch.cos(x * 2**k)]
        return torch.cat(parts, 1)

    def _emb_pyramid(self, flow):
        oups = []
        x = flow
        for _ in range(len(self.num_ch_enc)):
            x = F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=False) * 0.5
            oups.append(self._embed(x))
        return oups

    def _warp_pyr(self, feats, flow):
        outs = []
        _, _, fh, fw = flow.shape
        for f in feats:
            _, _, H, W = f.shape
            fl = F.interpolate(flow, (H, W), mode="bilinear", align_corners=False)
            fl = torch.cat([fl[:, 0:1] * (W / fw), fl[:, 1:2] * (H / fh)], 1)
            outs.append(IFRNetSmallT._warp(f, fl))
        return outs

    def forward(self, features, flows, mask):
        feats_n1, feats_0, feats_p1 = features
        fl_n1, fl_p1 = flows
        w_n1 = self._warp_pyr(feats_n1, fl_n1)
        w_p1 = self._warp_pyr(feats_p1, fl_p1)
        emb0 = self._emb_pyramid(0.0 * fl_n1.detach())
        embn = self._emb_pyramid(fl_n1)
        embp = self._emb_pyramid(fl_p1)
        outs = []
        L = len(self.num_ch_enc)
        for i in range(L):
            center = torch.cat([feats_0[i], emb0[i]], 1)
            n1 = torch.cat([w_n1[i], embn[i]], 1)
            p1 = torch.cat([w_p1[i], embp[i]], 1)
            _, _, H, W = center.shape
            m = F.interpolate(mask, (H, W), mode="bilinear", align_corners=False)
            blended = m * n1 + (1 - m) * p1
            # fusion_conv index: built from level L-1 down to 0
            outs.append(self.fusion_conv[L - 1 - i](torch.cat([center, blended], 1)))
        return outs
