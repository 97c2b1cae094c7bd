"""Minimal PyTorch twin of YOLOv11 (detect variant).

Implements the ultralytics module semantics (Conv+BN+SiLU, Bottleneck,
C3k/C3k2, SPPF, C2PSA attention, decoupled DFL detect head) with
parameter names matching ultralytics' `model.{i}.*` layout — the same
names circuitvision_tpu's yolo converter consumes/emits — so
`load_state_dict(strict=True)` on an exported Flax state validates the
converter's completeness, and a forward diff validates the composed
architecture (tests/test_full_model_parity.py).
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def autopad(k, p=None, d=1):
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p, d), groups=g,
                              dilation=d, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act is True else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(Conv):
    def __init__(self, c1, c2, k=1, s=1, d=1, act=True):
        super().__init__(c1, c2, k, s, g=min(c1, c2), d=d, act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3k(nn.Module):
    """C3 with configurable inner kernel (ultralytics C3k)."""

    def __init__(self, c1, c2, n=2, shortcut=True, g=1, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k2(nn.Module):
    """C2f whose units are C3k blocks or default-width Bottlenecks."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g)
            if c3k
            else Bottleneck(self.c, self.c, shortcut, g)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, attn_ratio=attn_ratio, num_heads=num_heads)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        return x + self.ffn(x) if self.add else self.ffn(x)


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(
                PSABlock(self.c, attn_ratio=0.5, num_heads=self.c // 64)
                for _ in range(n)
            )
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class Detect(nn.Module):
    """Decoupled detect head (raw per-scale outputs, no decode)."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1))
            for x in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )
            for x in ch
        )

    def forward(self, feats):
        return [
            torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
            for i, f in enumerate(feats)
        ]


class TorchYoloTwin(nn.Module):
    """YOLO11 detect model; indices mirror the ultralytics yaml so
    state-dict names are model.{i}.*"""

    def __init__(self, num_classes, channels, head_channels, repeats, c3k,
                 reg_max=16):
        super().__init__()
        ch = channels
        n = repeats
        hc3, hc4, hc5 = head_channels
        self.model = nn.ModuleList(
            [
                Conv(3, ch[0], 3, 2),                       # 0
                Conv(ch[0], ch[1], 3, 2),                   # 1
                C3k2(ch[1], ch[2], n, c3k, 0.25),           # 2
                Conv(ch[2], ch[3], 3, 2),                   # 3
                C3k2(ch[3], ch[4], n, c3k, 0.25),           # 4
                Conv(ch[4], ch[5], 3, 2),                   # 5
                C3k2(ch[5], ch[6], n, True, 0.5),           # 6 (c3k=True in yaml)
                Conv(ch[6], ch[7], 3, 2),                   # 7
                C3k2(ch[7], ch[8], n, True, 0.5),           # 8 (c3k=True in yaml)
                SPPF(ch[8], ch[9], 5),                      # 9
                C2PSA(ch[9], ch[10], n),                    # 10
                nn.Upsample(scale_factor=2, mode="nearest"),  # 11
                nn.Identity(),                              # 12 concat
                C3k2(ch[10] + ch[6], hc4, n, c3k, 0.5),     # 13
                nn.Upsample(scale_factor=2, mode="nearest"),  # 14
                nn.Identity(),                              # 15 concat
                C3k2(hc4 + ch[4], hc3, n, c3k, 0.5),        # 16
                Conv(hc3, hc3, 3, 2),                       # 17
                nn.Identity(),                              # 18 concat
                C3k2(hc3 + hc4, hc4, n, c3k, 0.5),          # 19
                Conv(hc4, hc4, 3, 2),                       # 20
                nn.Identity(),                              # 21 concat
                C3k2(hc4 + ch[10], hc5, n, True, 0.5),      # 22 (c3k=True in yaml)
                Detect(num_classes, (hc3, hc4, hc5), reg_max),  # 23
            ]
        )

    @torch.no_grad()
    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        x = m[9](x)
        p5 = m[10](x)
        u = torch.cat([m[11](p5), p4], 1)
        h13 = m[13](u)
        u = torch.cat([m[14](h13), p3], 1)
        h16 = m[16](u)
        d = m[17](h16)
        h19 = m[19](torch.cat([d, h13], 1))
        d = m[20](h19)
        h22 = m[22](torch.cat([d, p5], 1))
        return m[23]([h16, h19, h22])
