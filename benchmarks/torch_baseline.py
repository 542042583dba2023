"""PyTorch CPU baseline of the FSNet foveated-inference pipeline.

Benchmark harness only (NOT part of the framework): an independent torch
implementation of the same computation our TPU pipeline runs — gaze map,
FovSim saliency, dense-Gaussian grid solve (the reference's formulation,
/root/reference/models/models.py:594-634), grid_sample warp, HRNetV2-nodownsp
encoder, C1 decoder — used to measure the "PyTorch CPU baseline end-to-end
inference throughput" that BASELINE.md's >=5x target is defined against.
Eval mode, no_grad, float32, warped-domain output (the reference's
VAL.no_upsample=True eval config, README.md:73).
"""

from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BN = nn.BatchNorm2d


def _basic_block(cin, cout, stride=1):
    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = BN(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = BN(cout)
            self.ds = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), BN(cout))
                if (stride != 1 or cin != cout)
                else None
            )

        def forward(self, x):
            r = self.ds(x) if self.ds is not None else x
            y = F.relu(self.b1(self.c1(x)))
            y = self.b2(self.c2(y))
            return F.relu(y + r)

    return Blk()


def _bottleneck(cin, planes, stride=1):
    cout = planes * 4

    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.b1 = BN(planes)
            self.c2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.b2 = BN(planes)
            self.c3 = nn.Conv2d(planes, cout, 1, bias=False)
            self.b3 = BN(cout)
            self.ds = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), BN(cout))
                if (stride != 1 or cin != cout)
                else None
            )

        def forward(self, x):
            r = self.ds(x) if self.ds is not None else x
            y = F.relu(self.b1(self.c1(x)))
            y = F.relu(self.b2(self.c2(y)))
            y = self.b3(self.c3(y))
            return F.relu(y + r)

    return Blk()


class _HRModule(nn.Module):
    def __init__(self, channels, num_blocks=4):
        super().__init__()
        self.channels = channels
        self.branches = nn.ModuleList(
            [
                nn.Sequential(*[_basic_block(c, c) for _ in range(num_blocks)])
                for c in channels
            ]
        )
        n = len(channels)
        fuse = []
        for i in range(n):
            row = []
            for j in range(n):
                if j == i:
                    row.append(nn.Identity())
                elif j > i:
                    row.append(
                        nn.Sequential(
                            nn.Conv2d(channels[j], channels[i], 1, bias=False),
                            BN(channels[i]),
                        )
                    )
                else:
                    convs = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        co = channels[i] if last else channels[j]
                        convs.append(nn.Conv2d(channels[j] if k == 0 else channels[j], co, 3, 2, 1, bias=False))
                        convs.append(BN(co))
                        if not last:
                            convs.append(nn.ReLU())
                    row.append(nn.Sequential(*convs))
            fuse.append(nn.ModuleList(row))
        self.fuse = nn.ModuleList(fuse)

    def forward(self, xs):
        feats = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(self.channels)):
            y = None
            for j, f in enumerate(feats):
                t = self.fuse[i][j](f)
                if j > i:
                    t = F.interpolate(t, size=feats[i].shape[-2:], mode="bilinear", align_corners=False)
                y = t if y is None else y + t
            outs.append(F.relu(y))
        return outs


class TorchFSNet(nn.Module):
    """End-to-end FSNet (HRNetV2-nodownsp + C1) torch baseline."""

    def __init__(self, num_class=51, radius=45, sal=80, task=80):
        super().__init__()
        self.sal, self.task, self.radius = sal, task, radius
        # saliency
        self.fov = nn.Sequential(
            nn.Conv2d(5, 192, 3, 1, 1, bias=False), BN(192), nn.ReLU6(),
            nn.Conv2d(192, 192, 3, 1, 1, bias=False), BN(192), nn.ReLU6(),
            nn.Conv2d(192, 24, 3, 1, 1, bias=False), BN(24),
        )
        self.compress = nn.Conv2d(24, 1, 1)
        # dense gaussian filter (the reference's formulation)
        k = 2 * radius + 1
        x = np.arange(k) - k // 2
        g = np.exp(-4 * np.log(2) * x**2 / radius**2)
        kern = torch.tensor(np.outer(g, g), dtype=torch.float32)[None, None]
        self.register_buffer("gk", kern)
        u = (np.arange(sal + 2 * radius) - radius) / (sal - 1.0)
        uu = np.broadcast_to(u[None, :], (sal + 2 * radius, sal + 2 * radius))
        self.register_buffer("pu", torch.tensor(uu, dtype=torch.float32))
        self.register_buffer("pv", torch.tensor(uu.T.copy(), dtype=torch.float32))
        # encoder
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), BN(64), nn.ReLU(),
            nn.Conv2d(64, 64, 3, 1, 1, bias=False), BN(64), nn.ReLU(),
        )
        self.layer1 = nn.Sequential(*([_bottleneck(64, 64)] + [_bottleneck(256, 64) for _ in range(3)]))
        self.t1a = nn.Sequential(nn.Conv2d(256, 64, 3, 1, 1, bias=False), BN(64), nn.ReLU())
        self.t1b = nn.Sequential(nn.Conv2d(256, 128, 3, 2, 1, bias=False), BN(128), nn.ReLU())
        self.stage2 = nn.ModuleList([_HRModule((64, 128)) for _ in range(1)])
        self.t2 = nn.Sequential(nn.Conv2d(128, 256, 3, 2, 1, bias=False), BN(256), nn.ReLU())
        self.stage3 = nn.ModuleList([_HRModule((64, 128, 256)) for _ in range(4)])
        self.t3 = nn.Sequential(nn.Conv2d(256, 512, 3, 2, 1, bias=False), BN(512), nn.ReLU())
        self.stage4 = nn.ModuleList([_HRModule((64, 128, 256, 512)) for _ in range(3)])
        # decoder
        self.cbr = nn.Sequential(nn.Conv2d(960, 240, 3, 1, 1, bias=False), BN(240), nn.ReLU())
        self.mask = nn.Conv2d(240, 1, 1)
        self.cls = nn.Sequential(
            _basic_block(960, 512, 4), _basic_block(512, 512, 2),
            nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(512, num_class),
        )
        self.num_class = num_class

    def forward(self, x, focus):
        b = x.shape[0]
        sal, r = self.sal, self.radius
        x_low = F.interpolate(x, (sal, sal), mode="bilinear")
        yy, xx = torch.meshgrid(torch.arange(sal), torch.arange(sal), indexing="ij")
        d2 = (yy[None] - focus[:, 0, None, None] * (sal - 1)) ** 2 + (
            xx[None] - focus[:, 1, None, None] * (sal - 1)
        ) ** 2
        fm = (d2 / (2 * sal * sal)).unsqueeze(1).float()
        xs = self.compress(self.fov(torch.cat([x_low, fm, fm], 1)))
        xs = torch.softmax(xs.view(b, -1), -1).view(b, 1, sal, sal)
        hm = F.pad(xs, (r, r, r, r), mode="replicate")
        p = F.conv2d(hm, self.gk)
        fu = F.conv2d(hm * self.pu, self.gk)
        fv = F.conv2d(hm * self.pv, self.gk)
        gx = (fu / p * 2 - 1).clamp(-1, 1)
        gy = (fv / p * 2 - 1).clamp(-1, 1)
        grid = torch.stack([gx[:, 0], gy[:, 0]], -1)
        grid = F.interpolate(grid.permute(0, 3, 1, 2), (self.task, self.task), mode="bilinear").permute(0, 2, 3, 1)
        xw = F.grid_sample(x, grid, align_corners=False)
        # encoder
        y = self.layer1(self.stem(xw))
        feats = [self.t1a(y), self.t1b(y)]
        for m in self.stage2:
            feats = m(feats)
        feats = feats + [self.t2(feats[-1])]
        for m in self.stage3:
            feats = m(feats)
        feats = feats + [self.t3(feats[-1])]
        for m in self.stage4:
            feats = m(feats)
        h, w = feats[0].shape[-2:]
        cat = torch.cat(
            [feats[0]] + [F.interpolate(f, (h, w), mode="bilinear", align_corners=False) for f in feats[1:]], 1
        )
        mask = torch.sigmoid(self.mask(self.cbr(cat))) - 0.5
        cls = self.cls(cat)[:, :, None, None].expand(-1, -1, h, w).clone()
        cls[:, -1:] = cls[:, -1:] * mask
        return cls


def measure_torch_cpu_fps(batch: int = 8, iters: int = 5, warmup: int = 2) -> float:
    torch.set_grad_enabled(False)
    model = TorchFSNet().eval()
    x = torch.rand(batch, 3, 640, 640)
    f = torch.rand(batch, 2)
    for _ in range(warmup):
        model(x, f)
    t0 = time.perf_counter()
    for _ in range(iters):
        model(x, f)
    dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    fps = measure_torch_cpu_fps()
    print(f"torch CPU baseline: {fps:.3f} fps")
