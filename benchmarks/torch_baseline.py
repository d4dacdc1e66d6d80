"""Minimal PyTorch DDPM-UNet training-step baseline (CPU).

The reference publishes no throughput numbers (BASELINE.md), so we measure
our own torch reference on this host: a standard timestep-conditioned UNet
at the MedNIST tutorial scale (2d_ddpm_tutorial.py:166-177: channels
(128, 256, 256), attention at the two coarse levels, T=1000, batch 128,
64x64), written fresh in plain torch for the benchmark harness.
"""
from __future__ import annotations

import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResBlock(nn.Module):
    def __init__(self, c_in, c_out, temb):
        super().__init__()
        self.n1 = nn.GroupNorm(32, c_in, eps=1e-6)
        self.c1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.t = nn.Linear(temb, c_out)
        self.n2 = nn.GroupNorm(32, c_out, eps=1e-6)
        self.c2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        self.skip = nn.Conv2d(c_in, c_out, 1) if c_in != c_out else nn.Identity()

    def forward(self, x, emb):
        h = self.c1(F.silu(self.n1(x)))
        h = h + self.t(F.silu(emb))[:, :, None, None]
        h = self.c2(F.silu(self.n2(h)))
        return self.skip(x) + h


class Attn(nn.Module):
    def __init__(self, c, heads):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.qkv = nn.Linear(c, c * 3)
        self.proj = nn.Linear(c, c)
        self.heads = heads

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.norm(x).flatten(2).transpose(1, 2)
        q, k, v = self.qkv(y).chunk(3, -1)
        q = q.view(b, -1, self.heads, c // self.heads).transpose(1, 2)
        k = k.view(b, -1, self.heads, c // self.heads).transpose(1, 2)
        v = v.view(b, -1, self.heads, c // self.heads).transpose(1, 2)
        y = F.scaled_dot_product_attention(q, k, v)
        y = y.transpose(1, 2).reshape(b, -1, c)
        y = self.proj(y).transpose(1, 2).reshape(b, c, h, w)
        return x + y


class BenchUNet(nn.Module):
    def __init__(self, channels=(128, 256, 256), attn=(False, True, True)):
        super().__init__()
        temb = channels[0] * 4
        self.t1 = nn.Linear(channels[0], temb)
        self.t2 = nn.Linear(temb, temb)
        self.ch0 = channels[0]
        self.conv_in = nn.Conv2d(1, channels[0], 3, padding=1)

        self.down, self.downsample = nn.ModuleList(), nn.ModuleList()
        cin = channels[0]
        for i, c in enumerate(channels):
            self.down.append(
                nn.ModuleList([ResBlock(cin, c, temb), Attn(c, 1) if attn[i] else nn.Identity()])
            )
            self.downsample.append(
                nn.Conv2d(c, c, 3, stride=2, padding=1) if i < len(channels) - 1 else nn.Identity()
            )
            cin = c
        self.mid1 = ResBlock(cin, cin, temb)
        self.mid_attn = Attn(cin, 1)
        self.mid2 = ResBlock(cin, cin, temb)

        self.up = nn.ModuleList()
        rev = list(reversed(channels))
        for i, c in enumerate(rev):
            self.up.append(
                nn.ModuleList([ResBlock(cin + c, c, temb), Attn(c, 1) if list(reversed(attn))[i] else nn.Identity()])
            )
            cin = c
        self.out_norm = nn.GroupNorm(32, channels[0], eps=1e-6)
        self.out_conv = nn.Conv2d(channels[0], 1, 3, padding=1)

    def forward(self, x, t):
        emb = self.t2(F.silu(self.t1(timestep_embedding(t, self.ch0))))
        h = self.conv_in(x)
        skips = []
        for (res, attn), down in zip(self.down, self.downsample):
            h = attn(res(h, emb))
            skips.append(h)
            h = down(h)
        h = self.mid2(self.mid_attn(self.mid1(h, emb)), emb)
        for i, (res, attn) in enumerate(self.up):
            skip = skips.pop()
            if h.shape[-1] != skip.shape[-1]:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = attn(res(torch.cat([h, skip], 1), emb))
        return self.out_conv(F.silu(self.out_norm(h)))


def measure_torch_cpu_steps_per_sec(batch=128, size=64, steps=2, warmup=1) -> float:
    torch.manual_seed(0)
    model = BenchUNet()
    opt = torch.optim.Adam(model.parameters(), lr=2.5e-5)
    images = torch.rand(batch, 1, size, size)
    abar = torch.cumprod(1 - torch.linspace(1e-4, 2e-2, 1000), 0)

    def step():
        noise = torch.randn_like(images)
        t = torch.randint(0, 1000, (batch,))
        a = abar[t][:, None, None, None]
        noisy = a.sqrt() * images + (1 - a).sqrt() * noise
        pred = model(noisy, t)
        loss = F.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    return steps / (time.time() - t0)


if __name__ == "__main__":
    print(measure_torch_cpu_steps_per_sec())
