#!/usr/bin/env python3
"""Benchmark the REFERENCE architecture in pure PyTorch — one command the
moment a CUDA host exists.

Runs the flagship MargiPose v6.0.1 shape (4 stages, axis permutation,
InceptionV4 stem, 256x256, 17 joints) via the in-repo torch twin
(tests/torch_twin.py — the architecture used for checkpoint-parity testing,
pinned to the reference's own executable dsntnn code by
tests/test_reference_parity.py) and measures:

  * inference images/sec (eval mode, no_grad, batch 32 — the reference's
    measurement surface, reference: src/margipose/bin/eval_3d.py:60-62);
  * training-step images/sec (forward + Euclidean/JSD loss over all stages +
    backward + SGD step, batch 32 — the reference's hot loop,
    reference: src/margipose/bin/train_3d.py:145-196).

On this TPU host there is no CUDA device, so running it here measures torch
CPU only (printed with a clear device tag). The ≥5x north-star comparison
(BASELINE.md "North star") needs the CUDA number from this script on a
PyTorch-era GPU.
"""

from __future__ import annotations

import json
import sys
import time
from os import path

sys.path.insert(0, path.dirname(path.abspath(__file__)))

import torch


def _js_reg_loss(hm, mu, sigma_px=1.0):
    """JS divergence vs a rendered target Gaussian, matching
    margipose_tpu.ops.dsnt semantics (half-pixel-centre linspace)."""
    b, j, h, w = hm.shape
    eps = 1e-24

    def lin(n):
        first = -(n - 1.0) / n
        return torch.arange(n, dtype=hm.dtype, device=hm.device) * (2.0 / n) + first

    xs, ys = lin(w), lin(h)
    dx = (xs.view(1, 1, 1, w) - mu[..., 0].view(b, j, 1, 1)) ** 2
    dy = (ys.view(1, 1, h, 1) - mu[..., 1].view(b, j, 1, 1)) ** 2
    kx = -0.5 * (w / (2.0 * sigma_px)) ** 2
    ky = -0.5 * (h / (2.0 * sigma_px)) ** 2
    gauss = torch.exp(dx * kx) * torch.exp(dy * ky)
    gauss = gauss / (gauss.sum(dim=(-1, -2), keepdim=True) + eps)

    def kl(p, q):
        return (p * ((p + eps).log() - (q + eps).log())).sum(dim=(-1, -2))

    m = 0.5 * (hm + gauss)
    return (0.5 * kl(hm, m) + 0.5 * kl(gauss, m)).mean()


def _loss(xy_hms, zy_hms, xz_hms, target):
    from tests.torch_twin import t_heatmaps_to_coords

    total = 0.0
    for xy, zy, xz in zip(xy_hms, zy_hms, xz_hms):
        xyz = t_heatmaps_to_coords(xy, zy, xz)
        total = total + (xyz - target).pow(2).sum(-1).sqrt().mean()
        total = total + _js_reg_loss(xy, target[..., :2])
        total = total + _js_reg_loss(zy, target[..., [2, 1]])
        total = total + _js_reg_loss(xz, target[..., [0, 2]])
    return total


def bench(device="cuda" if torch.cuda.is_available() else "cpu",
          batch=32, iters=20, warmup=3, train_iters=10):
    from tests.torch_twin import TMargiPose

    torch.manual_seed(0)
    model = TMargiPose(n_joints=17, n_stages=4).to(device)
    x = torch.randn(batch, 3, 256, 256, device=device)
    target = torch.empty(batch, 17, 3, device=device).uniform_(-0.9, 0.9)

    def sync():
        if device.startswith("cuda"):
            torch.cuda.synchronize()

    # inference
    model.eval()
    with torch.no_grad():
        for _ in range(warmup):
            model(x)
        sync()
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        sync()
    infer_ips = batch * iters / (time.perf_counter() - t0)

    # training
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=0.01, momentum=0.9)

    def step():
        opt.zero_grad()
        xyz, (xy, zy, xz) = model(x)
        loss = _loss(xy, zy, xz, target)
        loss.backward()
        opt.step()

    for _ in range(2):
        step()
    sync()
    t0 = time.perf_counter()
    for _ in range(train_iters):
        step()
    sync()
    train_ips = batch * train_iters / (time.perf_counter() - t0)

    return dict(device=str(device),
                device_name=(torch.cuda.get_device_name(0)
                             if device.startswith("cuda") else "cpu"),
                torch_version=torch.__version__,
                batch=batch,
                infer_images_per_sec=round(infer_ips, 2),
                train_images_per_sec=round(train_ips, 2))


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    if not torch.cuda.is_available():
        print("note: no CUDA device — measuring torch CPU (NOT the "
              "reference GPU envelope; see BASELINE.md north-star estimate)",
              file=sys.stderr)
        # smaller iteration counts keep the CPU run tractable
        result = bench(batch=batch, iters=3, warmup=1, train_iters=2)
    else:
        result = bench(batch=batch)
    print(json.dumps(result))
